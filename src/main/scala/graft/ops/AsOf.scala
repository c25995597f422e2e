package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (most recent `right` row at or before each `left` row's
  * timestamp, per key) via the union + running-last-value window — the
  * scale-safe formulation.
  *
  * Spark has no native as-of join. The naive formulations both die at scale:
  * a theta-join (`l.key = r.key && r.ts <= l.ts` + max) becomes
  * BroadcastNestedLoop or a per-key cross product; a windowed full join
  * explodes hot keys. This operator instead tags both inputs, unions them
  * (map-side, no shuffle), and runs ONE window per key ordered by
  * `(ts, side)`: `last(right_payload, ignoreNulls=true)` over
  * unbounded-preceding..current-row carries the latest right value forward
  * into each left row. Cost = exactly one hash-partition shuffle of
  * narrow rows + one sort — the same price as any windowed check in this
  * engine, and AQE-splittable on skewed keys.
  *
  * Tie semantics: a right row with `ts` equal to a left row's `ts` sorts
  * BEFORE it (side 0 < 1), so matches are `right.ts <= left.ts` — the same
  * contract as DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` (oracled in
  * SparkEntry q46). Among multiple right rows sharing the winning `ts`, the
  * one latest in `(ts, tieBreak)` order wins deterministically.
  *
  * Payload discipline: only `key`, `ts`, the tie-break, and the requested
  * right payload column travel through the shuffle; join wide left columns
  * back afterwards if needed (same text-ships-zero-times design as
  * `Validator.tsOrderViolations`).
  */
object AsOf {

  /** @param left      probe rows (kept, one output row per input row)
    * @param right     build rows (their latest-at-or-before values attach)
    * @param key       equi-join key column name (both sides)
    * @param tsCol     event-time column name (both sides)
    * @param payload   right column carried onto matched left rows
    * @param tieBreak  right column ordering equal-ts right rows (last wins)
    * @return left columns + `asof_ts` + `asof_<payload>` (null = no match)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      payload: String,
      tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r_ts", lit(null).cast(right.schema(tsCol).dataType))
      .withColumn("__r_payload", lit(null).cast(right.schema(payload).dataType))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))
    val r = right.select(
      col(key),
      col(tsCol),
      lit(0).as("__side"),
      col(tsCol).as("__r_ts"),
      col(payload).as("__r_payload"),
      col(tieBreak).as("__tie"))
    // left columns absent on the right side become nulls via unionByName
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(key)
      .orderBy(col(tsCol), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col("__r_ts"), ignoreNulls = true).over(w))
      .withColumn(
        s"asof_$payload", last(col("__r_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) :+ col("asof_ts") :+ col(s"asof_$payload"): _*)
  }
}
