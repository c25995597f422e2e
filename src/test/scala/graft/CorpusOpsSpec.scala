package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Boilerplate, Decontam, Dedup, Similarity, Tfidf}

/** Decontamination (n-gram overlap vs a benchmark set), boilerplate
  * coverage thresholds, and TF-IDF keyword extraction.
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decontam: flags exactly the docs sharing an n-gram, with hit counts") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a completely different sentence with no overlap at all here"),
      (3L, "quick brown fox jumps over the lazy dog sleeps now"),
      (4L, "short text")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val r = Decontam.contaminated(corpus, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1 contains all 5 benchmark 5-grams; doc 3 starts at "quick" so it
    // shares every benchmark gram except "the quick brown fox jumps";
    // docs 2/4 share none
    assert(r(1L) === 5L)
    assert(r(3L) === 4L)
    assert(!r.contains(2L) && !r.contains(4L))
  }

  test("decontam: sub-n-word docs compare as a single whole-text gram") {
    val corpus = Seq((1L, "tiny doc"), (2L, "other words")).toDF("doc_id", "text")
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val r = Decontam.contaminated(corpus, bench, "text", "doc_id", n = 13)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L))
  }

  test("contaminationReport: two separated planted spans yield two islands " +
    "— longest_run is the bigger one, frac counts both, repeats count " +
    "positionally") {
    // doc words: [b1 b2 b3 b4] x1 x2 x3 [b1 b2 b3] tail — with n=2 the
    // contaminated gram positions are 0,1,2 (run 3: b1b2,b2b3,b3b4) and
    // 7,8 (run 2: b1b2,b2b3); 11 words -> 10 positional 2-grams
    val corpus = Seq(
      (1L, "b1 b2 b3 b4 x1 x2 x3 b1 b2 b3 tail"),
      (2L, "clean words only nothing shared anywhere")).toDF("doc_id", "text")
    val bench = Seq((9L, "b1 b2 b3 b4")).toDF("doc_id", "text")
    val r = Decontam.contaminationReport(corpus, bench, "text", "doc_id", n = 2)
      .select("id", "n_grams", "n_hit_pos", "frac_ppm", "longest_run")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r === Seq((1L, 10L, 5L, 500000L, 3L)))
  }

  test("contaminationReport: a doc that IS the benchmark scores frac 10^6 " +
    "with one full-length run") {
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq((9L, "a b c d e f")).toDF("doc_id", "text")
    val Seq((ng, nh, fp, lr)) =
      Decontam.contaminationReport(corpus, bench, "text", "doc_id", n = 3)
        .select("n_grams", "n_hit_pos", "frac_ppm", "longest_run")
        .as[(Long, Long, Long, Long)].collect().toSeq
    assert((ng, nh, fp, lr) === (4L, 4L, 1000000L, 4L))
  }

  test("splitLeakage: flags exactly the non-train docs sharing an n-gram " +
    "with ANY train doc; train side and clean docs never appear") {
    val docs = Seq(
      (1L, "train", "alpha bravo charlie delta echo foxtrot golf"),
      (2L, "train", "one two three four five six seven"),
      (3L, "val", "alpha bravo charlie delta echo foxtrot golf"), // full dup of 1
      (4L, "val", "nothing in common with anything trained on here"),
      (5L, "test", "prefix words then one two three four five six seven"),
      (6L, "test", "entirely novel content again nothing shared at all")
    ).toDF("doc_id", "split", "text")
    val got = Decontam.splitLeakage(docs, "text", "doc_id", "split", "train", n = 5)
      .as[(String, Long, Long)].collect().toSet
    // doc 3 shares all three 5-grams of doc 1's 7 tokens; doc 5 contains
    // doc 2's full text so all three of its 5-grams leak
    assert(got === Set(("val", 3L, 3L), ("test", 5L, 3L)))
  }

  test("boilerplate coverageFrac: equals the equivalent absolute threshold, " +
    "stays scale-invariant where the absolute one drifts") {
    val base = (0 until 20).map(i => (i.toLong, s"the end unique$i words$i"))
    val docs20 = base.toDF("doc_id", "text")
    // frac 0.5 of 20 docs = count ≥ 10 — identical output to minCount=10
    val byFrac = Boilerplate.coverageFrac(docs20, "text", "doc_id", 2, 0.5)
      .collect().map(_.toSeq).toSet
    val byCount = Boilerplate.coverage(docs20, "text", "doc_id", 2, 10L)
      .collect().map(_.toSeq).toSet
    assert(byFrac === byCount)
    // each doc: grams ("the end", "end uniqueN", "uniqueN wordsN"+1) — only
    // "the end" is corpus-frequent
    val r = Boilerplate.coverageFrac(docs20, "text", "doc_id", 2, 0.5)
      .select("id", "n_boiler").as[(Long, Long)].collect().toMap
    assert(r.values.forall(_ === 1L))
    // double the corpus; plant a gram stuck at 10 occurrences. The absolute
    // threshold (10) now flags it, the fraction threshold (0.5·40 = 20)
    // correctly does not — the frequent set did not grow with the corpus.
    val docs40 = (base ++ (20 until 40).map(i =>
      (i.toLong, s"the end other$i tokens$i" +
        (if (i < 30) " semi common" else "")))).toDF("doc_id", "text")
    val fracBoiler = Boilerplate.coverageFrac(docs40, "text", "doc_id", 2, 0.5)
      .filter(col("id") === 25L).select("n_boiler").as[Long].head()
    val absBoiler = Boilerplate.coverage(docs40, "text", "doc_id", 2, 10L)
      .filter(col("id") === 25L).select("n_boiler").as[Long].head()
    assert(fracBoiler === 1L, "only 'the end' should stay frequent at 2x corpus")
    assert(absBoiler > fracBoiler, "fixed minCount should have drifted here")
  }

  test("bucket audits: a planted oversized bucket is counted, and the pair " +
    "ops drop exactly those candidates — truncation is never silent") {
    // 10 byte-identical docs -> identical minhash sigs and simhashes ->
    // every band's bucket holds all 10; with maxBucket = 5 the cap drops
    // them all, and the audit must say so
    val docs = ((0 until 10).map(i => (i.toLong, "same exact text in every copy")) ++
      (100 until 104).map(i => (i.toLong, s"unrelated doc number $i with its own words"))
      ).toDF("doc_id", "text")
    val mh = Dedup.minhashBucketAudit(docs, "text", "doc_id", maxBucket = 5)
      .as[(Long, Long, Long, Double)].head()
    // 16 bands, all oversized for the identical group: 16 buckets x 10 rows
    assert(mh._2 === 16L, s"expected 16 oversized minhash buckets, got $mh")
    assert(mh._3 === 160L && mh._4 === 16 * 45.0, s"audit counts wrong: $mh")
    // and the capped pair op indeed returns nothing for the identical group
    assert(Dedup.minhashLshPairs(docs, "text", "doc_id", maxBucket = 5)
      .filter(col("id_a") < 100).count() === 0L)
    val sh = Dedup.simhashBucketAudit(docs, "text", "doc_id", maxBucket = 5)
      .as[(Long, Long, Long, Double)].head()
    assert(sh._2 === 4L && sh._3 === 40L, s"simhash audit wrong: $sh")
    // uncapped corpora audit clean (no oversized buckets, nothing dropped)
    val clean = Dedup.minhashBucketAudit(docs, "text", "doc_id", maxBucket = 200)
      .as[(Long, Long, Long, Double)].head()
    assert(clean._2 === 0L && clean._3 === 0L && clean._4 === 0.0)
    // embedding-side: 8 identical vectors share a hyperplane bucket; the
    // outlier is their NEGATION, so every sign bit flips and it provably
    // lands in the complementary bucket
    val emb = ((0 until 8).map(i => (i.toLong, Seq.fill(16)(0.5))) ++
      Seq((100L, Seq.fill(16)(-0.5)))
      ).toDF("vec_id", "embedding")
    val ca = Similarity.cosineBucketAudit(emb, nBits = 8, dim = 16, maxBucket = 5)
      .as[(Long, Long, Long, Double)].head()
    assert(ca._2 === 1L && ca._3 === 8L && ca._4 === 28.0,
      s"cosine audit wrong: $ca")
    assert(Similarity.cosineNearDupPairs(emb, nBits = 8, dim = 16,
      maxBucket = 5).count() === 0L)
  }

  test("tfidf: corpus-wide terms score zero-ish, rare terms rank first") {
    // "common" appears in all 3 docs -> idf = ln(4/4) = 0; each doc's
    // distinctive term appears once -> tf=1, idf = ln(4/2)
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common bravo"),
      (3L, "common charlie")
    ).toDF("doc_id", "text")
    val r = Tfidf.topTerms(docs, "text", "doc_id", k = 1, minTokenLen = 4)
      .select(col("id"), col("term"), col("score"))
      .as[(Long, String, Double)].collect()
      .map { case (id, t, s) => id -> ((t, s)) }.toMap
    assert(r(1L)._1 === "alpha") // tf=2 beats common's idf=0
    assert(r(2L)._1 === "bravo")
    assert(r(3L)._1 === "charlie")
    val lnHalf = math.round(math.log(4.0 / 2.0) * 10000) / 10000.0
    assert(r(2L)._2 === lnHalf)
    assert(r(1L)._2 === math.round(2 * math.log(4.0 / 2.0) * 10000) / 10000.0)
  }

  test("tfidf: equal-score ties break alphabetically (rounded-score order)") {
    val docs = Seq(
      (1L, "zebra apple"),
      (2L, "filler words")
    ).toDF("doc_id", "text")
    val r = Tfidf.topTerms(docs, "text", "doc_id", k = 2, minTokenLen = 4)
      .filter(col("id") === 1L)
      .orderBy("rank")
      .select(col("term")).as[String].collect()
    assert(r.toSeq === Seq("apple", "zebra"))
  }

  test("bm25: exact ppm parity with a driver-side reference implementation") {
    val corpus = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "banana banana banana durian elderberry fig"),
      (3L, "cherry durian apple grape honeydew"),
      (4L, ""),
      (5L, "grape grape grape grape grape grape grape grape grape grape"))
    val probes = Seq((1, "apple banana"), (2, "grape"), (3, "durian cherry"))
    val got = Tfidf.bm25TopK(corpus.toDF("doc_id", "text"), "text", "doc_id",
        probes.toDF("qid", "qtext"), "qid", "qtext", k = 10)
      .select(col("query_id"), col("id"), col("score_ppm"))
      .as[(Int, Long, Long)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap

    // independent scalar replica of the documented formula
    def toks(s: String) =
      s.toLowerCase.split("[^a-z]+").filter(_.length >= 3).toSeq
    val docToks = corpus.map { case (id, t) => id -> toks(t) }.toMap
    val nDocs = corpus.size.toLong
    val totToks = docToks.values.map(_.size.toLong).sum
    val avgdl = totToks.toDouble / nDocs
    val dft = docToks.values.flatMap(_.distinct).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val (k1, b) = (1.2, 0.75)
    val expect = (for {
      (qid, qtext) <- probes
      (did, dtoks) <- docToks
      terms = toks(qtext).distinct.filter(dtoks.contains)
      if terms.nonEmpty // no shared term → no posting row → pair absent
    } yield {
      val s = terms.map { t =>
        val tf = dtoks.count(_ == t).toLong
        val dl = dtoks.size.toLong
        val idf = math.log(1.0 + (nDocs - dft(t) + 0.5) / (dft(t) + 0.5))
        val w = idf * (tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        math.floor(w * 1000000.0).toLong
      }.sum
      (qid, did) -> s
    }).toMap
    assert(got === expect)
  }

  test("invertedIndex: df/cf exact, postings capped and ordered by " +
    "(tf desc, doc asc)") {
    val corpus = Seq(
      (1L, "alpha alpha alpha bravo"),
      (2L, "alpha alpha bravo bravo"),
      (3L, "alpha bravo charlie"),
      (4L, "alpha delta"),
      (5L, "")).toDF("doc_id", "text")
    val idx = Tfidf.invertedIndex(corpus, "text", "doc_id",
        maxPostings = 2, minTokenLen = 3)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(idx("alpha") === ("alpha", 4L, 7L, "1:3 2:2"))  // cap drops 3,4
    assert(idx("bravo") === ("bravo", 3L, 4L, "2:2 1:1")) // tf desc, id asc
    assert(idx("charlie") === ("charlie", 1L, 1L, "3:1"))
    assert(idx("delta") === ("delta", 1L, 1L, "4:1"))
    assert(idx.size === 4)
  }

  test("zipfCurve: hand-computed coverage at every distinct frequency") {
    val docs = Seq((1L, "a a a b b c"), (2L, "")).toDF("doc_id", "text")
    val r = Tfidf.zipfCurve(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(-_._1)
    // freqs: a=3, b=2, c=1 → T=6
    assert(r.toSeq === Seq(
      (3L, 1L, 1L, 3L, 500000L),
      (2L, 1L, 2L, 5L, 833333L),
      (1L, 1L, 3L, 6L, 1000000L)))
  }

  test("bm25: idf ranks rare terms above common, length norm favors the " +
    "shorter doc, and k bounds every query's result") {
    val corpus = (1L to 20L).map(i => (i, "filler common words here")) ++ Seq(
      (21L, "needle common words here"),
      (22L, "needle common words here plus many extra padding tokens making" +
        " this document substantially longer than the short twin"))
    val probes = Seq((1, "needle"))
    val r = Tfidf.bm25TopK(corpus.toDF("doc_id", "text"), "text", "doc_id",
        probes.toDF("qid", "qtext"), "qid", "qtext", k = 2)
      .orderBy("rank")
      .select(col("id"), col("score_ppm")).as[(Long, Long)].collect()
    assert(r.map(_._1).toSeq === Seq(21L, 22L)) // same tf=1; shorter doc wins
    assert(r(0)._2 > r(1)._2 && r(1)._2 > 0L)
    assert(r.length <= 2)
  }
}
