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

  test("learnMergesBatched with maxBatch=1 IS learnMerges on an arbitrary " +
    "hash-generated corpus (exact reduction, not just similar output)") {
    val texts = (0 until 200).map(i =>
      s"w${i % 17} tok${i % 7} ab${i % 5}cd common shared text piece ${i % 3}")
    val wf = Bpe.wordFreqs(texts.toDF("text"), "text")
    assert(Bpe.learnMergesBatched(wf, nMerges = 10, maxBatch = 1) ===
      Bpe.learnMerges(wf, nMerges = 10))
  }

  test("learnMergesBatched equals the sequential learner on corpora where " +
    "no in-round-created pair outranks a later candidate (disjoint-token " +
    "batching semantics), across batch sizes") {
    // four token-disjoint dominant pairs with strictly separated counts,
    // then second-tier merges built on the first round's outputs
    val words = Seq(
      ("ab", 50L), ("cd", 40L), ("ef", 30L), ("gh", 20L),
      ("abcd", 10L), ("efgh", 5L))
    val wf = words.toDF("word", "freq")
    val seqList = Bpe.learnMerges(wf, nMerges = 8)
    for (batch <- Seq(2, 4, 8)) {
      val got = Bpe.learnMergesBatched(wf, nMerges = 8, maxBatch = batch)
      assert(got === seqList, s"maxBatch=$batch diverged: $got vs $seqList")
    }
    // and the learned list actually contains the chained merges
    assert(seqList.take(4) === Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
    assert(seqList.contains(("ab", "cd")) && seqList.contains(("ef", "gh")))
  }

  test("batched overlap deferral: candidates sharing a symbol with an " +
    "accepted merge wait for the next round and the final list still " +
    "matches sequential (the 'abc' chain case)") {
    // (a,b) count 60 dominates; (b,c) count 30 shares b -> deferred; after
    // the round, 'abc' is ['ab','c'] so the next round sees (ab,c) —
    // sequential takes the identical path
    val words = Seq(("ab", 30L), ("abc", 30L))
    val wf = words.toDF("word", "freq")
    val seqList = Bpe.learnMerges(wf, nMerges = 4)
    val batched = Bpe.learnMergesBatched(wf, nMerges = 4, maxBatch = 4)
    assert(batched === seqList)
    assert(seqList === Seq(("a", "b"), ("ab", "c")))
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

  test("learned token budget (TextOps.bpeTokensLearned): lossless " +
    "partition, truncation is an exact prefix, counts match a scalar " +
    "replica and never exceed the pre-token upper bound") {
    import graft.ops.TextOps
    val merges = Seq(("t", "h"), ("th", "e"), (" ", "the"), ("i", "n"),
      ("a", "n"), ("an", "d"), ("e", "r"), ("o", "n"))
    val texts = Seq(
      "the then and another, in on thin air!",
      "The Thermal THE the", // case preserved: merges fire on lowercase only
      "  double  space\tand\nnewline", "", "no merges here: xyz qqq 42")
    def replica(t: String): Vector[String] = {
      val pre = TextOps.bpeTokenRe.r.findAllIn(t).toVector
      pre.flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector)((acc, m) =>
          applyMergeScalar(acc, m))
      }
    }
    val got = texts.toDF("t").select(
      col("t"),
      TextOps.bpeTokensLearned(col("t"), merges).as("toks"),
      TextOps.bpeTokenCountLearned(col("t"), merges).as("n"),
      TextOps.bpeTokenCount(col("t")).as("nPre"),
      TextOps.truncateToTokensLearned(col("t"), 5, merges).as("p5"))
      .as[(String, Seq[String], Int, Int, String)].collect()
    got.foreach { case (t, toks, n, nPre, p5) =>
      val want = replica(t)
      assert(toks === want, s"symbol stream for '$t'")
      assert(toks.mkString("") === t, s"lossless for '$t'")
      assert(t.startsWith(p5), s"'$p5' not a prefix of '$t'")
      assert(p5 === want.take(5).mkString(""), s"prefix symbols for '$t'")
      assert(n === want.length)
      // the learned count sits between the pre-token run count (every
      // pre-token yields >= 1 symbol) and the character count (merges
      // only fuse, never split)
      assert(n >= nPre && n <= t.length, s"bounds for '$t': $nPre <= $n")
    }
    // 'the' with the chain (t,h)(th,e)( ,the): " the" is ONE symbol
    val one = Seq(" the").toDF("t")
      .select(TextOps.bpeTokensLearned(col("t"), merges)).as[Seq[String]].head()
    assert(one === Seq(" the"))
  }
}
