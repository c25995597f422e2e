package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style n-gram repetition signals (Rae et al. 2021, "Scaling
  * Language Models", table A1): per document, the fraction of characters
  * covered by (a) the single heaviest word n-gram for small n — catches
  * "subscribe now subscribe now …" loops — and (b) all n-grams occurring
  * more than once for larger n — catches templated paragraph churn.
  *
  * Scale shape, the part that matters at 100 TB:
  *  - ALL n values ride ONE explode: each row emits (n, gram) structs for
  *    every requested n, so the corpus is scanned once, not once per n;
  *  - gram text never enters an exchange — grams hash to 60-bit md5
  *    longs (+ their char length) in the projection BEFORE the shuffle,
  *    the established house rule (cf. SpanDedup, Dedup);
  *  - two shuffles total: count (doc, n, hash) with map-side partial
  *    aggregation flattening hot grams, then one conditional-aggregate
  *    rollup straight to (doc) — no per-n intermediate aggregate.
  *
  * Fractions are emitted as exact parts-per-million BIGINTs
  * (`floor(cover·10⁶ / chars)`, clamped to 10⁶): both engines do the
  * same IEEE double division on the same exact integers, so floor-parity
  * is bit-exact and the q88 oracle hash-matches without any
  * round()-tie risk (the q73 lesson — see TextOps.qualityScoreScaled).
  *
  * "Cover" counts every occurrence times the gram's char length, the
  * standard Dolma/Gopher approximation (overlaps and shared words are
  * not de-duplicated), hence the clamp to 1.0.
  */
object NgramStats {

  /** Per-document repetition signals over whitespace words: columns
    * `top{n}_ppm` for n in `topNs` (heaviest single n-gram's char cover)
    * and `dup{n}_ppm` for n in `dupNs` (total cover of n-grams seen ≥2×
    * within the document). Documents with fewer words than some n score
    * ppm 0 for it (a zero sentinel row keeps even one-word docs in the
    * output).
    */
  def repetitionSignals(
      df: DataFrame, textCol: String, idCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 6)): DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty, "at least one n")
    require((topNs ++ dupNs).forall(_ >= 2), "n >= 2")
    val t0 = coalesce(col(textCol), lit(""))
    val nch = greatest(length(t0), lit(1)).cast("long")
    val ns = (topNs ++ dupNs).distinct.sorted
    // the word array MUST be materialized in its own projection before
    // the gram lambdas: interpreted HOFs have no subexpression
    // elimination, so an inlined split() re-tokenizes the document for
    // EVERY gram element (O(words²) splits per doc — the same trap as
    // SpanDedup.fingerprints' gram array, measured there at 50×)
    val withW = df.select(col(idCol), nch.as("__nch"),
      split(trim(t0), "\\s+").as("__w"))
    // ONE compiled pass ([[graft.functions.WordGramHashes]]) emits
    // (n, gram-hash, gram-char-length) for every requested n: word hashes
    // and length prefix-sums compute once per document, every window is a
    // handful of long multiplies — the previous nested interpreted lambdas
    // (a concat_ws'd gram string per position) paid ~µs of expression-tree
    // walk per gram and dominated the whole operator. emitShort=false:
    // positions whose window would run past the end emit nothing (the
    // original filter semantics — short docs rely on the zero sentinel).
    // The hash is internal grouping state (never exposed, the outputs are
    // coverage integers), so the engines need not hash identically — they
    // only must count the same groups.
    val exploded = withW
      .select(col(idCol), col("__nch"),
        explode(graft.functions.WordGramHashes.wordGramHashes(
          col("__w"), ns, emitShort = false)).as("t"))
      .select(col(idCol), col("__nch"), col("t.n").as("__n"),
        col("t.h").as("__h"), col("t.glen").as("__glen"))
      // zero sentinel keeps docs alive that are too short for ANY n
      // (n=0 never matches a requested n, so it contributes no cover)
      .unionByName(df.select(col(idCol), nch.as("__nch"),
        lit(0).as("__n"), lit(0L).as("__h"), lit(0L).as("__glen")))
    val counts = exploded
      .groupBy(col(idCol), col("__nch"), col("__n"), col("__h"), col("__glen"))
      .agg(count(lit(1)).as("__cnt"))
    val cover = col("__cnt") * col("__glen")
    val aggs =
      topNs.map(n =>
        max(when(col("__n") === n, cover)).as(s"__top${n}")) ++
      dupNs.map(n =>
        sum(when(col("__n") === n && col("__cnt") >= 2, cover)
          .otherwise(lit(0L))).as(s"__dup${n}"))
    val perDoc = counts.groupBy(col(idCol), col("__nch"))
      .agg(aggs.head, aggs.tail: _*)
    def ppm(src: String, name: String): Column =
      least(floor(coalesce(col(src), lit(0L)) * lit(1000000L) /
        col("__nch")), lit(1000000L)).cast("long").as(name)
    val outCols = col(idCol) +:
      (topNs.map(n => ppm(s"__top${n}", s"top${n}_ppm")) ++
        dupNs.map(n => ppm(s"__dup${n}", s"dup${n}_ppm")))
    perDoc.select(outCols: _*)
  }

  /** PMI collocations: the corpus's top-k adjacent word pairs by pointwise
    * mutual information, `ln(p(xy) / (p(x)·p(y)))` over adjacent-bigram
    * and unigram frequencies — the collocation-extraction step of corpus
    * analytics (tokenizer merge candidates, multi-word-entity discovery).
    *
    * Scale shape: the word array materializes once per document (the
    * interpreted-HOF rule), bigrams and unigrams are two partial-combine
    * hash aggregates over narrow string rows, totals ride one-row
    * broadcast crossJoins, and the global top-k is an `orderBy().limit()`
    * — TakeOrderedAndProject, per-partition heaps, never a global sort.
    *
    * Parity (q104): PMI = ln(cb·T²/(B·cx·cy)) is evaluated as the PINNED
    * double chain `cb/B·(T/cx)·(T/cy)` (each factor exact-integer inputs;
    * literal multiplication order mirrored in the twin) and lands as
    * floor(ln·10⁶) ppm; the k boundary tie-breaks on (w1, w2). A
    * `minCount` floor keeps one-off pairs (whose PMI is spuriously
    * maximal) out, the standard collocation practice.
    */
  def collocations(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 50, minCount: Long = 5, minTokenLen: Int = 3): DataFrame = {
    require(k >= 1 && minCount >= 1, "k, minCount >= 1")
    val words = filter(
      split(lower(coalesce(col(textCol), lit(""))), "[^a-z]+"),
      w => length(w) >= minTokenLen)
    val tokd = df.select(col(idCol), words.as("__w"))
    val uni = tokd
      .select(explode(col("__w")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val bi = tokd
      .filter(size(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__w")) - 1),
        i => struct(element_at(col("__w"), i).as("w1"),
          element_at(col("__w"), i + 1).as("w2")))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val totU = uni.agg(sum("cu").as("__tu"))
    val totB = tokd.select(
      greatest(size(col("__w")) - 1, lit(0)).cast("long").as("__nb"))
      .agg(sum("__nb").as("__tb"))
    bi
      .join(uni.select(col("w").as("w1"), col("cu").as("cx")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("cy")), Seq("w2"))
      .crossJoin(broadcast(totU))
      .crossJoin(broadcast(totB))
      .select(col("w1"), col("w2"), col("n_pair"),
        floor(log(col("n_pair").cast("double") / col("__tb") *
          (col("__tu").cast("double") / col("cx")) *
          (col("__tu").cast("double") / col("cy"))) * lit(1000000.0))
          .cast("long").as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
