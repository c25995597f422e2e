package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFingerprints
import graft.ops.SpanDedup

/** Laws for the native one-pass winnowing expression, and its agreement
  * with the md5 oracle face at the pair level.
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val k = 16
  private val w = 8
  private val rnd = new scala.util.Random(47)
  private def randText(n: Int): String =
    (1 to n).map(_ => "0123456789abcdefghijklmnopqrstuv"(rnd.nextInt(32)))
      .mkString

  /** Driver-side reference: hash every k-byte gram directly (no rolling),
    * take each w-window min, distinct+sort. Recomputing each gram hash
    * from scratch cross-checks the rolling update and the deque at once.
    */
  private def reference(s: String, k: Int, w: Int): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length < k) return Seq.empty
    val base = 0x100000001b3L
    val grams = (0 to bytes.length - k).map { i =>
      var h = 0L
      (i until i + k).foreach(j => h = h * base + (bytes(j) & 0xff))
      h & 0x7fffffffffffffffL
    }
    val nWin = math.max(grams.length - w + 1, 1)
    (0 until nWin).map(j => grams.slice(j, j + w).min).distinct.sorted
  }

  private def viaExpr(texts: Seq[String]): Seq[Seq[Long]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    df.select(col("id"),
        WinnowFingerprints.winnowFingerprints(col("t"), k, w).as("fps"))
      .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
      .map(_._2.sorted)
  }

  test("expression matches the from-scratch reference on randomized texts " +
    "(multibyte UTF-8 included) and the edge lengths around k and k+w") {
    val edge = Seq("", "x", randText(k - 1), randText(k), randText(k + 1),
      randText(k + w - 2), randText(k + w - 1), randText(k + w))
    val multibyte = Seq(
      "café naïve résumé " + randText(40),
      "日本語のテキスト" * 6,
      randText(20) + "☃" + randText(20))
    val random = (1 to 40).map(_ => randText(rnd.nextInt(400)))
    val all = edge ++ multibyte ++ random
    val got = viaExpr(all)
    all.zip(got).foreach { case (t, fps) =>
      assert(fps === reference(t, k, w), s"mismatch on ${t.take(40)}…")
    }
  }

  test("winnowing guarantee holds for the rolling face: planted shared " +
    "spans of k+w-1 bytes always pair, disjoint random docs never do") {
    val span = k + w - 1
    val docs = (0 until 60).flatMap { p =>
      val shared = randText(span)
      Seq((2L * p, randText(rnd.nextInt(150)) + shared + randText(rnd.nextInt(150))),
          (2L * p + 1, randText(rnd.nextInt(150)) + shared))
    }.toDF("doc_id", "t")
    val pairs = SpanDedup.spanPairsFast(docs, "t", "doc_id", k, w)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    (0 until 60).foreach { p =>
      assert(pairs.contains((2L * p, 2L * p + 1)),
        s"planted pair $p missed by the rolling face")
    }
  }

  test("fast and md5 faces find the identical pair set on an ASCII corpus " +
    "with planted boilerplate") {
    val boiler = (0 until 3).map(i => s" shared boilerplate variant $i " +
      "repeated verbatim across documents for span dedup parity")
    val docs = (0 until 120).map { i =>
      val t = randText(100 + rnd.nextInt(100)) +
        (if (i % 5 == 0) boiler(i % 3) else "")
      (i.toLong, t)
    }.toDF("doc_id", "t")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val md5Pairs = pairSet(SpanDedup.spanPairs(docs, "t", "doc_id", k, w))
    val fastPairs = pairSet(SpanDedup.spanPairsFast(docs, "t", "doc_id", k, w))
    assert(md5Pairs === fastPairs,
      s"faces disagree: only-md5=${md5Pairs -- fastPairs} " +
        s"only-fast=${fastPairs -- md5Pairs}")
    assert(fastPairs.nonEmpty, "planted boilerplate must produce pairs")
  }

  test("expression is null-safe and stays in whole-stage codegen") {
    // build from spark.range — a local Seq folds to LocalTableScan and
    // there is no plan left to inspect (ConvertToLocalRelation)
    val text = randText(60)
    val df = spark.range(1, 3).select(col("id"),
      when(col("id") === 1, lit(null).cast("string"))
        .otherwise(concat(lit(text), col("id").cast("string"))).as("t"))
    val out = df.select(col("id"),
      WinnowFingerprints.winnowFingerprints(col("t"), k, w).as("fps"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).isNullAt(1), "null text must stay null")
    assert(rows(1).getSeq[Long](1).nonEmpty)
    // plan must show a codegen'd projection, not an eval fallback
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      s"winnow projection fell out of codegen:\n$p")
  }
}
