package graft

import org.apache.spark.sql.SparkSession

/** Targeted per-query pricing: time only the named [[SparkEntry.queries]]
  * entries (best of `SPARK_GRAFT_FACE_RUNS`, default 2) without paying for
  * the full [[Bench]] headline — the tool for A/B-ing two faces of one
  * operator (e.g. `t20_span_pairs_full` vs `t21_span_pairs_fast`) in one
  * JVM, same Spark conf as Bench.
  *
  * Usage: `runMain graft.FaceBench <sfDir> <query...>`; prints one JSON
  * line `{"sf":...,"cpus":N,"runs":R,"queries":{name:bestSec,...}}`.
  */
object FaceBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FaceBench <sfDir> <query...>")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_FACE_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timed = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val best = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      f""""$name":$best%.3f"""
    }
    // scalastyle:off println
    println(s"""{"sf":"$sfDir","cpus":$cpus,"runs":$runs,""" +
      s""""queries":{${timed.mkString(",")}}}""")
    // scalastyle:on println
    spark.stop()
  }
}
