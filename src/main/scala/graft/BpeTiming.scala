package graft

import org.apache.spark.sql.SparkSession

/** One-off timing harness for BASELINE.md: batched vs sequential BPE merge
  * learning wall-clock at 256 merges (and sequential at 64 to extrapolate).
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BpeTiming"
  */
object BpeTiming {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("bpe-timing").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // 20k-word Zipf-ish synthetic vocabulary (hash-derived 3-10 char words)
    // — the documents table's templated text has only ~31 distinct words,
    // far too small to exercise merge learning
    val wf = spark.range(20000).select(
      concat_ws("", transform(
        sequence(lit(1), (pmod(xxhash64(col("id")), lit(8)) + 3).cast("int")),
        i => element_at(
          typedlit("abcdefghijklmnopqrstuvwxyz".map(_.toString)),
          (pmod(xxhash64(col("id"), i), lit(26)) + 1).cast("int"))))
        .as("word"),
      (lit(1000000L) / (col("id") + 1L)).cast("long").as("freq"))
      .groupBy("word").agg(sum("freq").as("freq"))
      .cache()
    println(s"vocab size: ${wf.count()}")
    println(s"dir unused for vocab (docs text too templated): $dir")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val b256 = time("batched 256 merges (maxBatch=64)") {
      graft.ops.Bpe.learnMergesBatched(wf, 256, maxBatch = 64)
    }
    println(s"batched learned ${b256.size} merges")
    val s256 = time("sequential 256 merges") {
      graft.ops.Bpe.learnMerges(wf, 256)
    }
    println(s"sequential learned ${s256.size} merges")
    println(s"agreement: ${b256 == s256}")
    spark.stop()
  }
}
