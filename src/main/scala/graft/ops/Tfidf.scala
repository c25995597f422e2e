package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction: the top-k characteristic terms per document.
  *
  * Scale shape: one tokenize pass feeds both the term-frequency aggregate
  * (groupBy doc, term) and the document-frequency aggregate (groupBy term);
  * idf comes back via an equi-join on term (vocabulary rows are narrow);
  * the corpus row count joins as a broadcast one-row aggregate, never a
  * driver-side collect. Top-k per document is a bounded window (rank ≤ k)
  * over the per-doc term rows — skew-bounded because a document has at most
  * |tokens| distinct terms, independent of corpus size.
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
    val dfT = tok.groupBy("term").agg(count_distinct(col("id")).as("dft"))
    val total = df.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfT, "term")
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
