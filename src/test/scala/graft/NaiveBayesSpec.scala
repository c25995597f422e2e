package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.NaiveBayes

/** Naive Bayes quality classifier: exact scalar replica of the ln-ppm
  * weight chain and the integer scoring sum, the prior-only degenerate
  * cases, minTotal pruning, partitioning invariance, and the actual
  * classification signal on a planted vocabulary split.
  */
class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // planted corpus: positives speak "good excellent", negatives "spam junk",
  // both share "common words here"
  private val corpus = Seq(
    (0L, "good excellent good common words here", 1),
    (1L, "excellent good prose common words here", 1),
    (2L, "spam junk spam common words here", 0),
    (3L, "junk spam noise common words here", 0),
    (4L, "", 1), // empty doc, positive
    (5L, "zzz qqq xxx", 0)) // all tokens below minTotal when pruned
    .toDF("doc_id", "text", "lab")

  private def tok(t: String): Seq[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.length >= 3).toSeq

  /** Exact scalar replica of tokenWeights + qualityScores. */
  private def replica(rows: Seq[(Long, String, Int)], minTotal: Long)
      : Map[Long, Long] = {
    val tf = rows.flatMap { case (_, t, lab) => tok(t).map(w => (w, lab)) }
    val cc = tf.groupBy(_._1).map { case (w, xs) =>
      (w, xs.count(_._2 == 1).toLong, xs.count(_._2 == 0).toLong)
    }.toSeq
    val tp = cc.map(_._2).sum; val tn = cc.map(_._3).sum; val v = cc.size.toLong
    val wts = cc.filter(c => c._2 + c._3 >= minTotal).map { case (w, cp, cn) =>
      w -> math.floor((math.log(cp.toDouble + 1.0) -
        math.log((tp + v).toDouble) - math.log(cn.toDouble + 1.0) +
        math.log((tn + v).toDouble)) * 1000000.0).toLong
    }.toMap
    val nP = rows.count(_._3 == 1).toLong; val nN = rows.count(_._3 == 0).toLong
    val prior = math.floor(
      (math.log(nP.toDouble) - math.log(nN.toDouble)) * 1000000.0).toLong
    rows.map { case (id, t, _) =>
      id -> (prior + tok(t).groupBy(identity).map { case (w, xs) =>
        xs.size.toLong * wts.getOrElse(w, 0L)
      }.sum)
    }.toMap
  }

  private def engine(minTotal: Long, parts: Int = 1): Map[Long, Long] =
    NaiveBayes.qualityScores(
        (if (parts > 1) corpus.repartition(parts) else corpus),
        "doc_id", "text", col("lab"), minTotal = minTotal)
      .as[(Long, Long)].collect().toMap

  private lazy val rows = corpus.as[(Long, String, Int)].collect().toSeq

  test("scores match an exact scalar replica (minTotal = 1)") {
    assert(engine(1L) === replica(rows, 1L))
  }

  test("minTotal pruning: rare tokens lose their weight rows and stop " +
    "contributing; scores still match the replica") {
    val w2 = NaiveBayes.tokenWeights(corpus, "text", col("lab"), minTotal = 2L)
      .as[(String, Long)].collect().toMap
    assert(!w2.contains("zzz") && !w2.contains("prose"))
    assert(w2.contains("common") && w2.contains("spam"))
    assert(engine(2L) === replica(rows, 2L))
  }

  test("empty and all-pruned docs score exactly the prior") {
    val prior = math.floor((math.log(3.0) - math.log(3.0)) * 1e6).toLong
    val got = engine(2L)
    assert(got(4L) === prior) // empty text
    assert(got(5L) === prior) // every token pruned at minTotal=2
  }

  test("partitioning invariance: 7 partitions, identical integer scores") {
    assert(engine(1L, parts = 7) === engine(1L))
  }

  test("classification signal: planted positive vocab scores above the " +
    "planted negative vocab; shared-vocab weight sits between them") {
    val got = engine(1L)
    assert(got(0L) > got(2L) && got(1L) > got(3L),
      s"positives must outscore negatives: $got")
    val w = NaiveBayes.tokenWeights(corpus, "text", col("lab"))
      .as[(String, Long)].collect().toMap
    assert(w("good") > w("common") && w("common") > w("spam"))
  }
}
