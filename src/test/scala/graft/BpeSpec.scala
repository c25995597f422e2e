package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE merge learning vs an exact scalar replica (same count-argmax
  * semantics, same lexicographic tie-break, same left-to-right
  * non-overlapping rewrite), plus encode laws.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def applyMergeScalar(
      syms: Vector[String], m: (String, String)): Vector[String] =
    syms.foldLeft(Vector.empty[String])((acc, x) =>
      if (acc.nonEmpty && acc.last == m._1 && x == m._2)
        acc.init :+ (m._1 + m._2)
      else acc :+ x)

  private def replicaLearn(
      words: Map[String, Long], n: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    var vocab = words.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < n) {
      i += 1
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += f
          case _         =>
        }
      }
      val valid = counts.filter(_._2 >= minCount)
      if (valid.isEmpty) return out.toSeq
      val best = valid.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }._1
      out += best
      vocab = vocab.map { case (s, f) => (applyMergeScalar(s, best), f) }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "the the the the the the the the")

  test("learnMerges equals the scalar replica merge-for-merge, including " +
    "tie-breaks and the overlap rewrite rule") {
    val wf = Bpe.wordFreqs(corpus.toDF("text"), "text")
    val wordMap = wf.as[(String, Long)].collect().toMap
    val got = Bpe.learnMerges(wf, nMerges = 8)
    val want = replicaLearn(wordMap, 8)
    assert(got === want)
    assert(got.nonEmpty && got.toSet.size === got.size, "merges distinct")
  }

  test("learnMerges stops when no pair clears minCount; overlap rule on a " +
    "planted aaaa word") {
    // 'aaaa' x3: pair (a,a) has weighted count 9 (3 per word);
    // after merge 1 ['aa','aa'], pair (aa,aa) count 3; then ['aaaa'] — done
    val wf = Seq(("aaaa", 3L)).toDF("word", "freq")
    val got = Bpe.learnMerges(wf, nMerges = 10)
    assert(got === Seq(("a", "a"), ("aa", "aa")))
  }

  test("encodeWords: tokens concatenate back to the word, merged symbols " +
    "appear as single tokens, merge order respected") {
    val wf = Bpe.wordFreqs(corpus.toDF("text"), "text")
    val merges = Bpe.learnMerges(wf, nMerges = 6)
    val enc = Bpe.encodeWords(corpus.toDF("text"), "text", merges)
      .select(col("text"), col("tokens")).as[(String, Seq[String])].collect()
    enc.foreach { case (text, tokens) =>
      val words = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      assert(tokens.mkString("") === words.mkString(""),
        "tokens are a partition of the character stream")
    }
    // the corpus's dominant word compresses: 'the' x8 must end as ≤2 tokens
    val theTokens = Bpe.encodeWords(Seq("the").toDF("text"), "text", merges)
      .select("tokens").as[Seq[String]].head()
    assert(theTokens.length <= 2, s"expected 'the' compressed, got $theTokens")
  }
}
