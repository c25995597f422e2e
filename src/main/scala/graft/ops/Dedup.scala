package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash-groupBy),
  * MinHash+LSH (shingle → minhash → band → bucket self-join), SimHash with
  * Hamming-band blocking, and word-shingle Jaccard verification. All pure
  * built-in column expressions + relational ops — distributed, no
  * driver-side loops; candidate generation never compares all pairs
  * (O(n·bands) bucket join, giant buckets capped to bound skew).
  */
object Dedup {

  /** Exact dedup via hash-groupBy: one shuffle on md5(text); emits one row
    * per content group with the canonical keeper (min key) and group size.
    */
  def exactGroups(df: DataFrame, textCol: String, keyCol: String): DataFrame =
    df.groupBy(md5(coalesce(col(textCol), lit(""))).as("content_hash"))
      .agg(
        count(lit(1)).as("n"),
        min(col(keyCol)).as("keep_id"))

  /** Lowercased word `n`-gram shingles, distinct. */
  def shingles(c: Column, n: Int = 3): Column = {
    val words = split(lower(trim(coalesce(c, lit("")))), "\\s+")
    array_distinct(
      when(size(words) < n, array(concat_ws(" ", words)))
        .otherwise(transform(
          sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n))))))
  }

  /** MinHash signature: k independent permutations approximated by
    * `xxhash64(shingle, seed_j)`; signature[j] = min over shingles.
    */
  def minhashSignature(shinglesCol: Column, k: Int = 64): Column =
    transform(
      sequence(lit(1), lit(k)),
      j => array_min(transform(shinglesCol, s => xxhash64(s, j))))

  /** LSH band keys: split the k-length signature into `bands` bands of
    * k/bands rows each; band key = hash(band slice, band index). Documents
    * sharing any band key become candidate pairs.
    */
  def bandKeys(sigCol: Column, k: Int = 64, bands: Int = 16): Column = {
    val r = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sigCol, b * r + 1, lit(r)), b))
  }

  /** MinHash-LSH near-duplicate candidate pairs with exact word-shingle
    * Jaccard verification. Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold.
    *
    * Scale design: candidates come from a self-equi-join on exploded band
    * keys (shuffle on band key, never all-pairs); buckets larger than
    * `maxBucket` are dropped (boilerplate-text buckets — they'd be caught by
    * exact dedup upstream and would otherwise square the join); the final
    * Jaccard check intersects the *signatures* (unbiased estimator,
    * |sig∩|/k) instead of re-joining full shingle sets, keeping the verify
    * stage O(pairs·k).
    */
  def minhashLshPairs(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      n: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 1000): DataFrame = {
    val sigs = df
      .select(col(keyCol).as("id"),
        minhashSignature(shingles(col(textCol), n), k).as("sig"))
      .withColumn("band", explode(bandKeys(col("sig"), k, bands)))
    val buckets = sigs
      .groupBy("band")
      .agg(collect_list(struct(col("id"), col("sig"))).as("docs"),
        count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucket)
    // pairs within bucket (combinations via double explode on the collected
    // list — bounded by maxBucket, so the blow-up is capped)
    val pairs = buckets
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sig"), col("b.sig"))).cast("double") / k)
          .as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
    pairs.groupBy("id_a", "id_b").agg(max("jaccard_est").as("jaccard"))
  }

  /** 64-bit SimHash over distinct whitespace tokens: bit i of the hash is
    * the sign of the sum over tokens of (token-hash bit i ? +1 : -1). Pure
    * column math — nested transform/aggregate over the token array; O(64·T)
    * per document, no UDF. Column-valued shift amounts go through
    * `call_function("shiftright", …)` (the SQL function accepts expression
    * shift counts; the Scala helper only takes Int).
    */
  def simhash(c: Column): Column = {
    val toks = array_distinct(split(lower(trim(coalesce(c, lit("")))), "\\s+"))
    val hashes = transform(toks, t => xxhash64(t))
    val bitWeights = array((0 to 63).map(i =>
      lit(if (i == 63) Long.MinValue else 1L << i)): _*)
    val bits = transform(
      sequence(lit(0), lit(63)),
      i =>
        when(
          aggregate(hashes, lit(0L), (acc, h) =>
            acc + call_function("shiftright", h, i).bitwiseAND(lit(1L)) * 2 - 1)
            > 0,
          lit(1L)).otherwise(lit(0L)))
    aggregate(zip_with(bits, bitWeights, (b, w) => b * w), lit(0L), _ + _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: block on 4×16-bit bands (two hashes
    * within Hamming distance ≤ 3 of each other share at least one exact
    * 16-bit band — pigeonhole), then verify Hamming ≤ maxHamming within
    * blocks. Bucket join, never all-pairs.
    */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      keyCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val sims = df.select(col(keyCol).as("id"), simhash(col(textCol)).as("sim"))
    val banded = sims.select(
      col("id"), col("sim"),
      explode(array((0 to 3).map(bnd =>
        struct(lit(bnd).as("bandno"),
          shiftrightunsigned(col("sim"), bnd * 16)
            .bitwiseAND(lit(0xffffL)).as("bandval"))): _*)).as("band"))
    val buckets = banded
      .groupBy(col("band.bandno"), col("band.bandval"))
      .agg(collect_list(struct(col("id"), col("sim"))).as("docs"),
        count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBucket)
    buckets
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sim"), col("b.sim")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("hamming"))
  }

  /** Exact word-shingle Jaccard between two text columns — the verification
    * primitive for near-dup candidates and the n-gram-Jaccard operator in
    * its own right.
    */
  def jaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = shingles(a, n)
    val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }
}
