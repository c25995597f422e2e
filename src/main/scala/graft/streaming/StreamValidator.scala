package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.checks.{Check, Checks}

/** Streaming validation: the identical constraint catalog applied to a
  * `readStream` of transcript appends (SURVEY.md §2.10 stance — the batch
  * `Column` predicates transfer unchanged; no stateful ops are required by
  * the reference semantics, so violations are a stateless map and verdicts
  * are a watermarked windowed aggregate).
  *
  * Usage:
  * {{{
  *   val stream = spark.readStream.schema(turnSchema).parquet(in)
  *   StreamValidator.violations(stream)
  *     .writeStream.format("parquet").option("path", out)
  *     .option("checkpointLocation", ck).trigger(Trigger.AvailableNow).start()
  * }}}
  * `Trigger.AvailableNow` + checkpoint gives the incremental
  * re-validation-of-new-data mode (batch-over-new-appends) described in
  * SURVEY.md §7.3 without a long-running cluster.
  */
object StreamValidator {

  /** Stateless per-row violation stream — same codegen'd projection as the
    * batch path (`Validator.rowViolations`), safe in append mode.
    */
  def violations(
      stream: DataFrame,
      checks: Seq[Check] = Checks.transcriptChecks): DataFrame =
    stream
      .select(
        col("conv_id"), col("turn_idx"), col("part_id"), col("text"),
        col("ts"),
        explode(Checks.violationsArray(checks)).as("v"))
      .select(
        col("conv_id"), col("turn_idx"), col("part_id"),
        col("v.rule_id").as("rule_id"),
        col("v.field").as("field"),
        col("v.message").as("message"),
        col("text"), col("ts"))

  /** Windowed verdict stream: per (event-time window × part_id) violation
    * counts with a watermark bounding state. Append-mode compatible.
    */
  def windowedVerdicts(
      stream: DataFrame,
      window_ : String = "10 minutes",
      watermark: String = "30 minutes",
      checks: Seq[Check] = Checks.transcriptChecks): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .select(col("ts"), col("part_id"),
        size(Checks.violationsArray(checks)).as("n_viol"))
      .groupBy(window(col("ts"), window_), col("part_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_viol")).as("n_violations"))
      .select(
        col("window.start").as("window_start"),
        col("part_id"),
        col("n_rows"),
        col("n_violations"),
        when(col("n_violations") === 0, lit("valid")).otherwise(lit("invalid"))
          .as("status"))
}
