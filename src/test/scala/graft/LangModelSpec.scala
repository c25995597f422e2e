package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LangModel

/** Char-trigram LM quality scoring: hand-computed exact values on a tiny
  * corpus, fraction-pruning semantics, and the in-distribution-scores-lower
  * sanity law the operator exists for.
  */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ln2 = LangModel.Ln2

  private def bits(ps: Double*): Double = {
    val s = ps.map(math.log).sum
    BigDecimal(-s / (ps.size * ln2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("exact add-1 smoothed cross-entropy on a hand-computed corpus") {
    // ref: "aaaa" -> {aaa x2}, "aab" -> {aab}; total=3, V={a,b}=2,
    // prefix aa: c2=3
    val ref = Seq((1L, "aaaa"), (2L, "aab")).toDF("doc_id", "text")
    val (m3, m2, v) = LangModel.train(ref, "doc_id", "text")
    assert(v === 2L)
    assert(m3.as[(String, Long)].collect().toMap ===
      Map("aaa" -> 2L, "aab" -> 1L))
    assert(m2.as[(String, Long)].collect().toMap === Map("aa" -> 3L))

    // "aaab": p(aaa)=(2+1)/(3+2), p(aab)=(1+1)/(3+2)
    // "xyzw": all unseen -> p=(0+1)/(0+2) each -> exactly 1.0 bits/char
    val docs = Seq((10L, "aaab"), (11L, "xyzw"), (12L, "ab")) // 12: no tris
      .toDF("doc_id", "text")
    val got = LangModel.crossEntropy(docs, "doc_id", "text", m3, m2, v)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(10L, 11L)) // doc 12 emits nothing
    assert(got(0)._2 === 2L)
    assert(got(0)._3 === bits(3.0 / 5, 2.0 / 5))
    assert(got(1)._3 === bits(0.5, 0.5)) // = 1.0 exactly
    assert(got(1)._3 === 1.0)
  }

  test("fraction pruning drops rare trigrams to the smoothed floor " +
    "(scale-invariant model cap)") {
    val ref = Seq((1L, "aaaa"), (2L, "aab")).toDF("doc_id", "text")
    // total=3, ceil(0.4*3)=2: aab (c3=1) pruned, aa prefix (c2=3) kept
    val (m3, m2, v) = LangModel.train(ref, "doc_id", "text", minFrac = 0.4)
    assert(m3.as[(String, Long)].collect().toMap === Map("aaa" -> 2L))
    assert(m2.as[(String, Long)].collect().toMap === Map("aa" -> 3L))
    val got = LangModel
      .crossEntropy(Seq((10L, "aaab")).toDF("doc_id", "text"),
        "doc_id", "text", m3, m2, v)
      .as[(Long, Long, Double)].collect()
    // aab now scores as unseen-under-kept-prefix: (0+1)/(3+2)
    assert(got.head._3 === bits(3.0 / 5, 1.0 / 5))
  }

  test("in-distribution text scores lower bits/char than gibberish") {
    val sentences = (0 until 50).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i"))
    val ref = sentences.toDF("doc_id", "text")
    val probe = Seq(
      (100L, "the quick brown fox jumps again"),
      (101L, "zxqj vwkp qqfzz jjxw pzzkv")).toDF("doc_id", "text")
    val (m3, m2, v) = LangModel.train(ref, "doc_id", "text")
    val r = LangModel.crossEntropy(probe, "doc_id", "text", m3, m2, v)
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(r(100L) < r(101L),
      s"in-dist ${r(100L)} should beat gibberish ${r(101L)}")
  }

  test("scoreAgainst composes train-on-slice with score-all") {
    val docs = Seq(
      (1L, "aaaa", "en"), (2L, "aab", "en"), (3L, "zzzz", "xx"))
      .toDF("doc_id", "text", "lang")
    val r = LangModel
      .scoreAgainst(docs, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // zzzz never seen by the en model: both trigrams hit the 1/V floor
    assert(r(2)._3 === 1.0)
  }

  test("importanceWeights: target-like docs weigh positive, off-target " +
    "negative; the weight equals xent_raw - xent_target on the same " +
    "models (compositional identity within rounding)") {
    // corpus: half english-ish (lang en), half consonant gibberish —
    // the raw model is the mixture, the target model is the en slice
    val corpus = ((0 until 30).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog $i", "en")) ++
      (100 until 130).map(i =>
        (i.toLong, s"zxq vwk pqf jjx wzk vqp xjz kwv $i", "xx")))
      .toDF("doc_id", "text", "lang")
    val w = LangModel
      .importanceWeights(corpus, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val enMean = (0 until 30).map(i => w(i.toLong)).sum / 30
    val xxMean = (100 until 130).map(i => w(i.toLong)).sum / 30
    assert(enMean > 0, s"en docs should be target-like: $enMean")
    assert(xxMean < 0, s"gibberish should be anti-target: $xxMean")
    assert(enMean > xxMean)

    // identity: weight = xent(raw model) - xent(target model), both per
    // q72's estimator on the same doc stream (4-dp rounding slack)
    val (m3t, m2t, vt) = LangModel.train(
      corpus.filter(col("lang") === "en"), "doc_id", "text", 1e-5)
    val (m3r, m2r, vr) = LangModel.train(corpus, "doc_id", "text", 1e-5)
    val xt = LangModel.crossEntropy(corpus, "doc_id", "text", m3t, m2t, vt)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val xr = LangModel.crossEntropy(corpus, "doc_id", "text", m3r, m2r, vr)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    w.keys.foreach { id =>
      assert(math.abs(w(id) - (xr(id) - xt(id))) <= 2e-4,
        s"doc $id: ${w(id)} vs ${xr(id) - xt(id)}")
    }
  }

  test("xentBuckets: percentile cuts split into thirds; bucket rollup " +
    "carries doc and trigram counts") {
    val scored = Seq(
      (1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0),
      (4L, 10L, 4.0), (5L, 10L, 5.0), (6L, 10L, 6.0))
      .toDF("doc_id", "n_tris", "xent_bits")
    val out = LangModel.xentBuckets(scored)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // cuts at 2.667 / 4.333: {1,2} head, {3,4} middle, {5,6} tail
    assert(out("head") === ("head", 2L, 20L))
    assert(out("middle") === ("middle", 2L, 20L))
    assert(out("tail") === ("tail", 2L, 20L))
  }
}
