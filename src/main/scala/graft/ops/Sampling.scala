package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * `df.sample()` is seed-stable only for a fixed partitioning — repartition
  * the input (or scale the cluster) and the sample changes, which poisons
  * reproducibility of 100 TB corpus builds. These operators instead derive
  * membership from a cryptographic hash of a row key: the same row lands in
  * the same sample on any cluster size, any partitioning, any engine (md5 is
  * byte-identical everywhere, so the DuckDB oracle replays them exactly).
  */
object Sampling {

  /** Hex-threshold membership: keep rows whose `md5(key)` prefix sorts below
    * `threshold`. Four hex chars ⇒ fraction = parsedHex / 65536 (e.g.
    * "1999" ≈ 10%). Map-only — no shuffle, fully pushdown-friendly.
    */
  def hashSample(df: DataFrame, keyCol: String, thresholdHex4: String): DataFrame = {
    require(thresholdHex4.matches("[0-9a-f]{4}"), "threshold = 4 lowercase hex chars")
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 4) < thresholdHex4)
  }

  /** Stratified deterministic top-k: k rows per stratum, chosen by md5 order
    * (uniform within the stratum, stable across partitionings; `keyCol`
    * breaks md5 ties). One hash-partition shuffle on the stratum column; at
    * scale prefer many strata over few hot ones (the window sorts per
    * stratum, so a single giant stratum serializes — same caveat as any
    * per-key window, documented in PLANS.md).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String, k: Int): DataFrame = {
    val w = Window
      .partitionBy(stratumCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
