package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the top-k characteristic terms per document.
  *
  * Scale shape: ONE tokenize pass of the corpus feeds the term-frequency
  * aggregate (groupBy doc, term); document frequency is a plain
  * `tf.groupBy(term).count()` AGGREGATE joined back onto tf — partial
  * (map-side) combine flattens hot terms before any exchange, so a term
  * present in a billion documents costs one partial count per task, never a
  * single-task window partition. (The earlier `count(*) over (partition by
  * term)` formulation serialized every row of a corpus-common term —
  * "license", "copyright" — through one window task; this was the one
  * scale-killer-shaped plan left in round 2.) The vocabulary frame is two
  * narrow columns, so Spark/AQE broadcasts it when small and shuffle-joins
  * otherwise; the duplicated tf subtree in the plan is deduplicated at
  * runtime by exchange/stage reuse (both occurrences share the same
  * canonical shuffle). The corpus row count joins as a broadcast one-row
  * aggregate, never a driver-side collect. Top-k per document is a bounded
  * window (rank ≤ k) over the per-doc term rows — skew-bounded because a
  * document has at most |tokens| distinct terms, independent of corpus
  * size.
  *
  * Determinism: rank orders by the ROUNDED score (then term) so the
  * tie-break never depends on sub-ulp float differences between engines —
  * the q54 DuckDB oracle replays the same ordering.
  */
object Tfidf {

  def topTerms(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      k: Int = 3,
      minTokenLen: Int = 5): DataFrame = {
    val tok = df.select(
      col(keyCol).as("id"),
      explode(split(lower(coalesce(col(textCol), lit(""))), "[^a-z]+"))
        .as("term"))
      .filter(length(col("term")) >= minTokenLen)
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // document frequency: tf already has one row per (id, term), so a plain
    // aggregate by term IS the doc count — partial combine bounds hot terms
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dft"))
    val total = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(total))
      .select(col("id"), col("term"),
        round(col("tf") * log((col("n_docs") + 1.0) / (col("dft") + 1.0)), 4)
          .as("score"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
