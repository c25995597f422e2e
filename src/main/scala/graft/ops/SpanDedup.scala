package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Substring-level duplicate-span detection via winnowing fingerprints
  * (the MOSS scheme; the signal behind "deduplicate repeated spans, not
  * just whole documents" in training-data pipelines). Whole-doc dedup
  * (exact/minhash/simhash, [[Dedup]]) misses a boilerplate paragraph
  * pasted into a million otherwise-distinct pages; span fingerprints
  * catch exactly that.
  *
  * Scheme: hash every k-char gram, then keep the MINIMUM hash of each
  * w-long window of consecutive gram hashes. The winnowing guarantee:
  * two documents sharing any verbatim span of length ≥ k + w − 1 share at
  * least one fingerprint (the shared span contains a full window, and a
  * window's min is position-independent); expected fingerprint density is
  * 2/(w+1) per character — the corpus-side cost knob.
  *
  * Scale shape mirrors [[Dedup]]: fingerprinting is map-only per document
  * (no cross-row state); candidate pairs come from a bucket self-join on
  * 8-byte fingerprints with id-only rows and a `maxBucket` cap (audited,
  * never silent); nothing is ever all-pairs. Two fingerprint faces share
  * that topology: the md5 face ([[fingerprints]], 60-bit md5-prefix gram
  * hashes) exists so the DuckDB oracle replays the whole pipeline
  * bit-for-bit (q70's conv technique); the production face
  * ([[fingerprintsFast]]) is the native one-pass rolling-hash +
  * monotonic-deque expression ([[graft.functions.WinnowFingerprints]]) —
  * O(1) amortized per byte, no per-gram allocation (measured A/B in
  * PLANS.md).
  */
object SpanDedup {

  /** Per-position k-gram hashes of `t` as 60-bit longs (1-based positions,
    * one per i ∈ [1, len−k+1]; empty array when the text is shorter than k).
    */
  private def gramHashes(t: Column, k: Int): Column =
    // guard: sequence(1, 0) counts DOWN in Spark, so short texts need an
    // explicit empty (same defense as Dedup.shingles' when())
    when(length(t) < k, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(1), length(t) - (k - 1)),
        i => conv(substring(md5(t.substr(i, lit(k))), 1, 15), 16, 10)
          .cast("long")))

  /** Distinct winnowed fingerprints per document: one row (id, fp) per
    * distinct window-minimum. Documents with fewer grams than one window
    * still emit the min of what they have (one fingerprint), so short docs
    * participate; documents shorter than k emit nothing.
    */
  def fingerprints(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, w: Int = 8): DataFrame = {
    require(k > 0 && w > 0, "k > 0, w > 0")
    val t = coalesce(col(textCol), lit(""))
    val hs = gramHashes(t, k)
    val fps = when(size(hs) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        // window starts [1, nGrams−w+1], clamped to one window for short
        // docs; slice() clamps the tail itself (DuckDB list-slice parity)
        sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
        j => array_min(slice(hs, j, lit(w))))))
    df.select(col(idCol).as("id"), explode(fps).as("fp"))
  }

  /** Document pairs sharing ≥ `minShared` fingerprints — i.e. sharing that
    * many distinct ~(k+w−1)-char verbatim regions. Bucket self-join on fp
    * (ids only); buckets over `maxBucket` dropped ([[spanBucketAudit]]
    * counts what the cap cost).
    */
  def spanPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, w: Int = 8, minShared: Int = 1,
      maxBucket: Int = 200): DataFrame =
    pairsFrom(fingerprints(df, textCol, idCol, k, w), minShared, maxBucket)

  /** The shared pair topology behind both fingerprint faces: bucket
    * self-join on fp (ids only), `maxBucket` capped, pair = docs sharing
    * ≥ `minShared` distinct fingerprints. Fingerprints are persisted
    * first (the [[Dedup.lshCandidates]] rule): they feed the bucket-count
    * aggregate AND both sides of the self-join, so without the persist the
    * per-character fingerprint scan re-runs 4× — at 10^12 rows that is the
    * whole job cost three times over.
    */
  private def pairsFrom(
      fpsRaw: DataFrame, minShared: Int, maxBucket: Int): DataFrame = {
    val fps = fpsRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ok = fps.join(
      fps.groupBy("fp").agg(count(lit(1)).as("bn"))
        .filter(col("bn") > 1 && col("bn") <= maxBucket),
      Seq("fp"))
    ok.as("a")
      .join(ok.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count_distinct(col("a.fp")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Fast-path fingerprints via the native one-pass rolling-hash
    * expression ([[graft.functions.WinnowFingerprints]]): same output
    * shape and structural guarantee as [[fingerprints]], ~O(n) per
    * document instead of O(n·(md5 + w)) — the production face for the
    * 10^12-row corpus; the md5 face stays as the DuckDB-replayable oracle
    * (WinnowSpec asserts the two faces find the identical duplicate-pair
    * set on an ASCII corpus, where their gram boundaries coincide).
    */
  def fingerprintsFast(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, w: Int = 8): DataFrame =
    df.select(col(idCol).as("id"),
      explode(graft.functions.WinnowFingerprints.winnowFingerprints(
        coalesce(col(textCol), lit("")), k, w)).as("fp"))

  /** [[spanPairs]] over the fast fingerprint face — identical bucket-join
    * topology, capped and auditable the same way.
    */
  def spanPairsFast(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, w: Int = 8, minShared: Int = 1,
      maxBucket: Int = 200): DataFrame =
    pairsFrom(fingerprintsFast(df, textCol, idCol, k, w), minShared, maxBucket)

  /** Per-document duplicated-span exposure: of a doc's fingerprints, how
    * many also occur in ≥ 1 other document (the "what fraction of me is
    * boilerplate shared with the corpus" quality signal — [[Boilerplate]]
    * answers the same question for frequent n-grams; this one needs no
    * frequency threshold). Docs shorter than k (zero fingerprints) are
    * absent from the output. `shared_frac` = n_shared_fps / n_fps,
    * rounded to 4 dp.
    */
  def spanIncidence(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, w: Int = 8): DataFrame = {
    // persisted for the same reason as [[pairsFrom]]: fps feeds both the
    // frequency aggregate and the join-back
    val fps = fingerprints(df, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = fps.groupBy("fp").agg(count(lit(1)).as("nf"))
      .filter(col("nf") > 1)
      .select(col("fp"), lit(1L).as("is_shared"))
    fps.join(shared, Seq("fp"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_fps"),
        coalesce(sum("is_shared"), lit(0L)).as("n_shared_fps"))
      .withColumn("shared_frac",
        round(col("n_shared_fps").cast("double") / col("n_fps"), 4))
  }

  /** [[Dedup.bucketAudit]] of [[spanPairs]]'s `maxBucket` cap: one row of
    * (n_buckets, n_oversized_buckets, n_dropped_rows, n_dropped_pairs_ub).
    */
  def spanBucketAudit(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, w: Int = 8, maxBucket: Int = 200): DataFrame =
    Dedup.bucketAudit(fingerprints(df, textCol, idCol, k, w), "fp", maxBucket)
}
