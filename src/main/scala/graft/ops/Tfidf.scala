package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the top-k characteristic terms per document.
  *
  * Scale shape: ONE tokenize pass of the corpus feeds the term-frequency
  * aggregate (groupBy doc, term); document frequency is a window count over
  * tf's own output partitioned by term (tf already has one row per
  * (doc, term)) — no second scan, no join, structurally single-pipeline;
  * the corpus row count joins as a broadcast one-row aggregate, never a
  * driver-side collect. Top-k per document is a bounded window (rank ≤ k)
  * over the per-doc term rows — skew-bounded because a document has at most
  * |tokens| distinct terms, independent of corpus size. (A term shared by
  * a large fraction of all documents makes its df-window partition hot; at
  * that scale the fix is a pre-aggregated vocabulary join — noted, not
  * needed below ~10^9-doc vocabularies since the window rows are 3 narrow
  * fields.)
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
    // document frequency as a window over tf's own output (one row per
    // (id, term) already) — no second tokenize scan, no self-join
    val wTerm = Window.partitionBy("term")
    val total = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .withColumn("dft", count(lit(1)).over(wTerm))
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
