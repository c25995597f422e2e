package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Stats
import graft.ops.{Dedup, Sampling, TextOps}

/** Randomized law checks (fixed-seed, deterministic run-to-run): algebraic
  * invariants the hand-picked fixtures can't sweep — containment/Jaccard
  * order relations over random corpora, skew-audit arithmetic over random
  * key profiles, script-ppm disjointness over random codepoint soup,
  * shuffle-order bijection over random sizes.
  */
class LawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260818L)

  test("containment law: jaccard <= min(c_ab, c_ba) <= max <= 1, and a " +
    "planted prefix-subset doc has containment exactly 1") {
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0L until 30L).map { i =>
      i -> (0 until (5 + rnd.nextInt(40)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted subset: doc 100 = first 10 words of doc 0
    val subset = 100L -> docs.head._2.split(" ").take(10).mkString(" ")
    val corpus = (docs :+ subset).toDF("doc_id", "text")
    val pairs = (for (a <- 0L until 30L; b <- a + 1 until 30L) yield (a, b))
      .toDF("id_a", "id_b")
      .unionByName(Seq((0L, 100L)).toDF("id_a", "id_b"))
    val rows = Dedup.containmentPairs(corpus, pairs, "doc_id", "text",
        n = 3, minContainment = 0.0)
      .select("id_a", "id_b", "c_ab", "c_ba", "jaccard")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length === pairs.count())
    rows.foreach { case (a, b, cab, cba, j) =>
      assert(j >= 0 && cab <= 1 && cba <= 1, s"range ($a,$b)")
      assert(j <= math.min(cab, cba) + 1e-12, s"jaccard law ($a,$b)")
    }
    val Some((_, _, _, cba, _)) = rows.find(r => r._1 == 0L && r._2 == 100L)
    assert(cba === 1.0, "prefix-subset doc must have containment 1")
  }

  test("skewAudit arithmetic laws over random key profiles") {
    for (trial <- 0 until 5) {
      val target = 1L + rnd.nextInt(500)
      val rows = (0 until (20 + rnd.nextInt(50))).flatMap { k =>
        val n = 1 + rnd.nextInt(200)
        (0 until n).map(_ => s"k${trial}_$k")
      }
      val df = rows.toDF("k").repartition(5)
      val Seq((nk, nr, mx, share, p50, p99, salt)) =
        Stats.skewAudit(df, Seq("k"), targetPerTask = target)
          .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(nr === rows.size && nk === rows.distinct.size)
      assert(p50 <= p99 && p99 <= mx && mx <= nr)
      assert(share === mx * 1000000L / nr)
      assert(salt === (mx + target - 1) / target)
      assert(share <= 1000000L && salt >= 1L)
    }
  }

  test("scriptSignals: classes are disjoint, so the five ppm fractions " +
    "sum to at most 10^6 on random codepoint soup") {
    val pools =
      Seq('a' to 'z', '0' to '9', 'А' to 'я', ' ' to ' ', '!' to '/')
    val texts = (0L until 40L).map { i =>
      val body = (0 until (1 + rnd.nextInt(120))).map { _ =>
        val p = pools(rnd.nextInt(pools.size)); p(rnd.nextInt(p.size))
      }.mkString + (if (rnd.nextBoolean()) "日本語かな" else "")
      (i, body)
    }
    val rows = texts.toDF("id", "text")
      .select($"id", TextOps.scriptSignals($"text").as("s"))
      .select($"s.latin_ppm", $"s.digit_ppm", $"s.cjk_ppm",
        $"s.cyrillic_ppm", $"s.space_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { r =>
      val all = Seq(r._1, r._2, r._3, r._4, r._5)
      assert(all.forall(p => p >= 0 && p <= 1000000L), s"range: $r")
      assert(all.sum <= 1000000L, s"disjointness: $r")
    }
  }

  test("shuffleOrder bijection holds for random sizes and shard counts") {
    for (_ <- 0 until 4) {
      val n = 50 + rnd.nextInt(400)
      val shards = 1 + rnd.nextInt(40)
      val idx = Sampling.shuffleOrder(
          spark.range(n).toDF("doc_id"), "doc_id", s"s$n", shards)
        .select("global_idx").as[Long].collect().sorted
      assert(idx === (0L until n.toLong).toArray, s"n=$n shards=$shards")
    }
  }
}
