package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded interval join: for each probe row, the build rows of the same key
  * whose timestamp falls in `[probe.ts - windowSec, probe.ts)`.
  *
  * Spark plans a raw `l.key = r.key && r.ts BETWEEN ...` as an equi-join on
  * `key` with the range as a post-join filter — fine until one key is hot,
  * at which point that key's full time history crosses the network into one
  * task. The scale-safe shape is time-banding: bucket both sides by
  * `floor(epoch / windowSec)`, fan the probe side out to its own bucket and
  * the one preceding (any interval of width `windowSec` spans at most two
  * such buckets), and equi-join on `(key, bucket)`. The join key now carries
  * time, so a hot key's rows spread over its whole time range instead of
  * one partition, and each task sees at most two buckets' worth of build
  * rows per probe bucket. The exact range predicate then trims the
  * candidates.
  *
  * Build-side rows carry only `key, ts, bucket` through the shuffle; join
  * wide columns back to the (rarer) matched pairs afterwards if needed.
  */
object RangeJoin {

  /** Inner-join probe rows to same-key build rows with
    * `build.ts ∈ [probe.ts - windowSec, probe.ts)`; output one row per
    * matched pair: all probe columns + `match_ts` (the build row's ts).
    */
  def pastWindowJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      tsCol: String,
      windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    // TIMESTAMP_NTZ has no direct double cast — hop through TIMESTAMP
    // (session tz is UTC everywhere in this engine) for fractional epoch
    def epochD(ts: Column): Column = ts.cast("timestamp").cast("double")
    def bucket(ts: Column): Column = floor(epochD(ts) / windowSec).cast("long")
    val probeCols = probe.columns
    // probe fans out to (bucket-1, bucket); build stays single-bucket — the
    // cheap side duplicates, the (usually bigger) history side does not
    val p = probe
      .withColumn("__b", explode(array(bucket(col(tsCol)) - 1, bucket(col(tsCol)))))
    val b = build.select(
      col(key).as("__bk"),
      col(tsCol).as("match_ts"),
      bucket(col(tsCol)).as("__b"))
    p.join(b, p(key) === b("__bk") && p("__b") === b("__b"))
      .filter(
        epochD(col("match_ts")) >= epochD(col(tsCol)) - windowSec &&
          col("match_ts") < col(tsCol))
      .select(probeCols.map(col) :+ col("match_ts"): _*)
  }
}
