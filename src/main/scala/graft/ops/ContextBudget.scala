package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Context-window tail selection over grouped, time-ordered rows — the
  * transcript-shaped cousin of `reduce_input_size`
  * (reference utils.py:20-46, which truncates ONE text to a token budget):
  * given a token budget per conversation, keep the MOST RECENT turns whose
  * running token total fits, always keeping at least the latest turn even
  * when it alone overflows (a context assembler never emits an empty
  * conversation).
  *
  * Scale shape: one hash shuffle on the group key for the window; the
  * natural downstream `groupBy(groupCol)` reuses that partitioning, so a
  * per-conversation summary costs ZERO additional exchanges
  * (PlanSpec-pinned via q86). Both window functions share one
  * WindowSpec → a single Window exec, and the reverse order means no
  * second sort for "latest first".
  */
object ContextBudget {

  /** Annotate `df` with `n_tokens` (the evaluated `tokens` expression) and
    * `kept` — true for the suffix of rows (ordered by `tsCol` then
    * `tieCol`, most recent first) whose cumulative `n_tokens` stays within
    * `budget`, with the single most recent row always kept. Ties on
    * `tsCol` are broken by `tieCol` descending so the result is
    * deterministic under any partitioning.
    */
  def tailWithinBudget(
      df: DataFrame, groupCol: String, tsCol: String, tieCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 1L, "budget >= 1")
    val w = Window.partitionBy(groupCol)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens)
      .withColumn("__cum", sum(col("n_tokens")).over(rows))
      .withColumn("__rn", row_number().over(w))
      .withColumn("kept", col("__cum") <= budget || col("__rn") === 1)
      .drop("__cum", "__rn")
  }
}
