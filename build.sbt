ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gitmetadataextractorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Fixed heap + pre-touch: on virtualized hosts (measured on this
  // sandbox's Firecracker VM) G1 heap expansion faults pages in on first
  // touch inside allocation-heavy stages — 50-90% system CPU and negative
  // thread scaling (32-thread regex microbench: 28.3 s growing heap vs
  // 2.9 s pre-touched). Paying the fault-in once at JVM start restores
  // linear scaling; same flags belong in spark-submit conf on a cluster.
  //
  // Default 12g, not larger: this VM's memory is fast only up to ~14 GB
  // (measured: -Xms12g pre-touches in 1.8 s, 16g in 24 s, 24g in 70-270 s
  // — the region beyond is slow-backed host memory at ~100 MB/s first
  // touch, which also poisons shuffle/window stages that land in it). 12g
  // comfortably fits the driver-default bench (13.2M turns; 8g sufficed);
  // export SPARK_DRIVER_MEM=24g explicitly for the 52.8M-turn table.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq
