package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, SpanDedup}

/** Containment-based subset-duplicate detection: exact-replica laws for
  * the directional measure, the planted A-inside-B case the Jaccard family
  * misses by construction, and the span-candidate → containment-verify
  * composition (t23's shape).
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def shingleSet(t: String, n: Int = 3): Set[String] = {
    val w = t.toLowerCase.trim.split("\\s+").toVector
    if (w.length < n) Set(w.mkString(" "))
    else w.sliding(n).map(_.mkString(" ")).toSet
  }

  private val small = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val container = small + " phi chi psi omega one two three four " +
    "five six seven eight nine ten eleven twelve thirteen fourteen " +
    "fifteen sixteen seventeen eighteen nineteen twenty"
  private val unrelated = "completely different words that share nothing " +
    "with either document in this corpus at all whatsoever period done " +
    "finished over ended concluded terminated stopped halted"

  private val corpus = Seq(
    (0L, small), (1L, container), (2L, unrelated)).toDF("doc_id", "text")

  test("containmentPairs matches an exact scalar replica in both " +
    "directions, and jaccard agrees with the existing primitive") {
    val allPairs = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("id_a", "id_b")
    val got = Dedup.containmentPairs(corpus, allPairs, "doc_id", "text",
        n = 3, minContainment = 0.0)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val texts = Map(0L -> small, 1L -> container, 2L -> unrelated)
    for (((a, b), (cab, cba, jac)) <- got) {
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val inter = (sa intersect sb).size.toDouble
      assert(math.abs(cab - inter / sa.size) < 1e-12, s"c_ab($a,$b)")
      assert(math.abs(cba - inter / sb.size) < 1e-12, s"c_ba($a,$b)")
      assert(math.abs(jac - inter / (sa union sb).size) < 1e-12,
        s"jaccard($a,$b)")
    }
    assert(got.size === 3)
  }

  test("planted subset-dup: containment(A→B) is exactly 1.0 where jaccard " +
    "sits below a near-dup threshold — the pair Jaccard-gated dedup keeps") {
    val allPairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    val Array((cab, cba, jac)) =
      Dedup.containmentPairs(corpus, allPairs, "doc_id", "text",
          n = 3, minContainment = 0.0)
        .select("c_ab", "c_ba", "jaccard")
        .as[(Double, Double, Double)].collect()
    // every 3-gram of A is a 3-gram of A-prefixed B (append-only extension)
    assert(cab === 1.0)
    assert(cba < 0.6 && jac < 0.6, s"asymmetric by construction: $cba, $jac")
    assert(cba > 0.0 && jac > 0.0)
  }

  test("span-fingerprint candidates surface the contained pair and the " +
    "containment gate keeps only it (t23 composition)") {
    val cands = SpanDedup.spanPairsFast(corpus, "text", "doc_id",
      k = 16, w = 8, minShared = 2)
    val verified = Dedup.containmentPairs(corpus, cands, "doc_id", "text",
        n = 3, minContainment = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(verified.toSet === Set((0L, 1L)),
      "the A-inside-B pair and nothing else")
  }

  test("minContainment filters on the max direction; degenerate empties " +
    "score zero") {
    val deg = Seq((0L, ""), (1L, "   "), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("id_a", "id_b")
    val rows = Dedup.containmentPairs(deg, pairs, "doc_id", "text",
        n = 3, minContainment = 0.0)
      .select("id_a", "id_b", "c_ab", "c_ba")
      .as[(Long, Long, Double, Double)].collect().toSeq.sorted
    // "" and "   " both shingle to [""] — identical degenerate sets
    assert(rows === Seq((0L, 1L, 1.0, 1.0), (0L, 2L, 0.0, 0.0)))
    val gated = Dedup.containmentPairs(deg, pairs, "doc_id", "text",
      n = 3, minContainment = 0.5).count()
    assert(gated === 1L)
  }
}
