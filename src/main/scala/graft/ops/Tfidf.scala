package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{broadcast => bcast}

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

  /** Inverted-index construction: one row per term carrying document
    * frequency, collection frequency, and the top-`maxPostings` posting
    * entries ("doc:tf", highest-tf first, doc id tie-break) — the index
    * build step behind [[bm25TopK]]-style retrieval when the index is
    * materialized rather than recomputed per query batch.
    *
    * Scale shape: stats (dft, cf) are a plain hash aggregate over the
    * (id, term, tf) frame — partial combine bounds hot terms. The posting
    * CAP is the part that needs care: a rank-limit window over term
    * plants partial+final WindowGroupLimit (map-side heaps), so a
    * corpus-common term — "the", a billion documents — ships at most
    * `maxPostings` rows per map task instead of serializing its whole
    * posting list through one window task. collect_list then only ever
    * sees ≤ maxPostings rows per term (bounded by construction — the
    * ChatOps rule for when collect_list is legitimate).
    */
  def invertedIndex(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      maxPostings: Int = 10,
      minTokenLen: Int = 3): DataFrame = {
    require(maxPostings >= 1, "maxPostings >= 1")
    val tok = df.select(
      col(keyCol).as("id"),
      explode(split(lower(coalesce(col(textCol), lit(""))), "[^a-z]+"))
        .as("term"))
      .filter(length(col("term")) >= minTokenLen)
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("dft"), sum("tf").as("cf"))
    val w = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("id").asc)
    val posts = tf
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxPostings)
      .groupBy("term")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("rank"),
            concat(col("id").cast("string"), lit(":"),
              col("tf").cast("string")).as("p")))),
          x => x.getField("p")),
        " ").as("postings"))
    stats.join(posts, Seq("term"))
  }

  /** Zipf / vocabulary-coverage curve: for every DISTINCT term frequency
    * (descending), how many terms carry it and what cumulative share of
    * all tokens a vocabulary cut at that frequency would cover — the
    * sizing study behind tokenizer vocab choice ("top how many types
    * cover 99% of tokens?"). Rows: (freq, n_terms, cum_terms, cum_tokens,
    * coverage_ppm).
    *
    * Scale shape: term counts are one partial-combine aggregate; grouping
    * BY FREQUENCY collapses the (possibly billions-of-terms) vocabulary
    * to its distinct count values, whose cardinality is PROVABLY
    * ≤ √(2·total_tokens) (k distinct positive counts sum to ≥ k(k+1)/2
    * ≤ T) — ≤ 1.5e7 rows at 10¹⁴ tokens, so the cumulative window over
    * the frequency frame is one bounded task BY CONSTRUCTION (the
    * ChatOps bounded-group rule; if anyone ever runs at 10¹⁸ tokens, the
    * Packing segmented prefix sum is the drop-in escape hatch).
    * Coverage is the floor-ppm of two exact longs.
    */
  def zipfCurve(
      df: DataFrame, textCol: String, keyCol: String,
      minTokenLen: Int = 1): DataFrame = {
    val tok = df.select(
      explode(split(lower(coalesce(col(textCol), lit(""))), "[^a-z]+"))
        .as("term"))
      .filter(length(col("term")) >= minTokenLen)
    val counts = tok.groupBy("term").agg(count(lit(1)).as("freq"))
    val byFreq = counts.groupBy("freq")
      .agg(count(lit(1)).as("n_terms"))
    val w = Window.orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = byFreq.agg(sum(col("freq") * col("n_terms")).as("__tot"))
    byFreq
      .withColumn("cum_terms", sum("n_terms").over(w))
      .withColumn("cum_tokens", sum(col("freq") * col("n_terms")).over(w))
      .crossJoin(broadcast(total))
      .select(col("freq"), col("n_terms"), col("cum_terms"),
        col("cum_tokens"),
        floor(col("cum_tokens").cast("double") * lit(1000000.0) /
          col("__tot")).cast("long").as("coverage_ppm"))
  }

  /** BM25 top-k retrieval: score every document against a (small) query
    * set and keep the best `k` documents per query — the lexical
    * similarity-search face of the engine (embedding ANN lives in
    * [[Similarity]]; this is its sparse twin, the retrieval step a
    * RAG-style training-data pipeline runs to mine positives/negatives).
    *
    * Scale shape: the QUERY side is the small side by definition, so its
    * tokenized distinct (query_id, term) frame broadcasts and the first
    * join prunes the corpus term frame down to query-term postings before
    * anything wide happens. Corpus-side frames are all narrow aggregates
    * of the one tokenize pass — (id, term, tf), (id, dl), (term, dft) —
    * with map-side combine; document text never reaches an exchange. The
    * per-query top-k is a rank-limit window over (query_id), bounded by
    * the candidate postings, and plans with WindowGroupLimit partial mode
    * (map-side heap) like `Sampling.groupWeightedTopK`. Corpus totals ride
    * one broadcast one-row crossJoin (the Tfidf/Boilerplate pattern).
    *
    * Cross-engine parity (q97): every per-term factor is computed in ONE
    * pinned operand order — `ln(1.0 + (n_docs - dft + 0.5)/(dft + 0.5))`
    * for idf, `idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl/avgdl))`
    * for the weight, `avgdl = CAST(tot_toks AS DOUBLE)/n_docs` — all
    * inputs exact longs (the constants pinned as DOUBLE literals in the
    * twin, never DuckDB DECIMALs), so both engines run identical IEEE
    * sequences. The per-term weight lands as `floor(w · 10⁶)` — an exact
    * ppm long (floor parity holds on identical doubles; round() tie
    * behavior differs cross-engine, the q73 lesson) — so the per-doc score
    * is an exact integer sum, order-independent across any partitioning,
    * and ties at the k boundary break on doc id.
    *
    * @param queries (queryIdCol, queryTextCol) frame — must be small
    *                (it is broadcast); typically dozens-to-thousands of
    *                probe queries, never corpus-scale.
    */
  def bm25TopK(
      docs: DataFrame,
      textCol: String,
      keyCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      minTokenLen: Int = 3): DataFrame = {
    require(k >= 1, "k >= 1")
    val tok = docs.select(
      col(keyCol).as("id"),
      explode(split(lower(coalesce(col(textCol), lit(""))), "[^a-z]+"))
        .as("term"))
      .filter(length(col("term")) >= minTokenLen)
    val tf = tok.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dft"))
    // one-row corpus totals: doc count from the input frame (empty docs
    // count toward N and avgdl, the standard convention), token total from
    // the postings — broadcast, never a driver collect
    val stats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(tok.agg(count(lit(1)).as("tot_toks")))
    val qterms = queries.select(
      col(queryIdCol).as("query_id"),
      explode(split(lower(coalesce(col(queryTextCol), lit(""))), "[^a-z]+"))
        .as("term"))
      .filter(length(col("term")) >= minTokenLen)
      .distinct()
    val avgdl = col("tot_toks").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("dft") + lit(0.5)) / (col("dft") + lit(0.5)))
    val weight = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    val perTerm = tf
      .join(bcast(qterms), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(bcast(stats))
      .select(col("query_id"), col("id"),
        floor(weight * lit(1000000.0)).cast("long").as("w_ppm"))
    val perDoc = perTerm
      .groupBy("query_id", "id")
      .agg(sum("w_ppm").as("score_ppm"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_ppm").desc, col("id").asc)
    perDoc
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
