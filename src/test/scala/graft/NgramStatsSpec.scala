package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{NgramStats, TextOps}

class NgramStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("repetitionSignals: hand-computed covers on a looping doc") {
    // "a b a b a b": chars=11; 2-grams "a b"×3 (len 3, cover 9),
    // "b a"×2 (cover 6) → top2 = floor(9e6/11); 3-grams "a b a"×2
    // (len 5, cover 10), "b a b"×2 (cover 10) → top3 = floor(10e6/11),
    // dup over n=3 would be 20/11 → clamps at 1e6 (checked via dupNs=3)
    val df = Seq((1L, "a b a b a b")).toDF("id", "t")
    val out = NgramStats
      .repetitionSignals(df, "t", "id", topNs = Seq(2, 3), dupNs = Seq(3, 5))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out._2 === math.floor(9e6 / 11).toLong)
    assert(out._3 === math.floor(10e6 / 11).toLong)
    assert(out._4 === 1000000L, "dup3 cover 20 chars of 11 clamps to 1e6")
    assert(out._5 === 0L, "no duplicate 5-gram in 6 words")
  }

  test("repetitionSignals: a no-repeat doc scores top = heaviest single " +
    "gram, dup = 0; too-short docs yield 0 for that n") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "single")).toDF("id", "t")
    val rows = NgramStats
      .repetitionSignals(df, "t", "id", topNs = Seq(2), dupNs = Seq(2))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc1: 2-grams "alpha beta"(10), "beta gamma"(10) each once →
    // top2 = floor(10e6/16), dup2 = 0
    assert(rows(0)._2 === math.floor(10e6 / 16).toLong)
    assert(rows(0)._3 === 0L)
    // doc2 has one word: no 2-grams at all → both 0
    assert(rows(1)._2 === 0L && rows(1)._3 === 0L)
  }

  test("repetitionSignals is invariant under repartitioning") {
    val df = (0L until 100L)
      .map(i => (i, s"w$i x y w$i x y tail token number $i"))
      .toDF("id", "t")
    val a = NgramStats.repetitionSignals(df, "t", "id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val b = NgramStats.repetitionSignals(df.repartition(7), "t", "id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(a === b && a.size === 100)
  }

  test("fixMojibake repairs the cp1252 round-trip and is a no-op on " +
    "clean text; marker count drops to zero") {
    val clean = "Café — “naïve” «extra» €5 don’t ü ß É"
    val broken = TextOps.utf8AsCp1252(clean)
    assert(broken !== clean)
    val df = Seq((1L, broken), (2L, clean)).toDF("id", "t")
    val out = df.select(col("id"), TextOps.fixMojibake(col("t")).as("f"),
      TextOps.mojibakeMarkers(col("t")).as("m"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0)._2 === clean)
    assert(out(0)._3 > 0)
    assert(out(1)._2 === clean)
    assert(out(1)._3 === 0)
  }

  test("collocations: hand-computed PMI over adjacent bigrams; minCount " +
    "floors rare pairs; k bounds the output") {
    // 5 × "aaa bbb aaa bbb": unigrams aaa=10, bbb=10 (T=20); bigrams
    // (aaa,bbb)=10, (bbb,aaa)=5 (B=15)
    val docs = (1 to 5).map(i => (i.toLong, "aaa bbb aaa bbb"))
      .toDF("doc_id", "text")
    val r = NgramStats.collocations(docs, "doc_id", "text", k = 10,
        minCount = 5)
      .as[(String, String, Long, Long)].collect()
      .map(x => (x._1, x._2) -> (x._3, x._4)).toMap
    def pmi(cb: Long, cx: Long, cy: Long) =
      math.floor(math.log(
        cb.toDouble / 15L * (20L.toDouble / cx) * (20L.toDouble / cy))
        * 1000000.0).toLong
    assert(r === Map(
      ("aaa", "bbb") -> ((10L, pmi(10, 10, 10))),
      ("bbb", "aaa") -> ((5L, pmi(5, 10, 10)))))
    assert(pmi(10, 10, 10) === 980829L) // ln(8/3) in ppm — sanity anchor

    val floored = NgramStats.collocations(docs, "doc_id", "text", k = 10,
        minCount = 6)
      .as[(String, String, Long, Long)].collect()
    assert(floored.map(x => (x._1, x._2)).toSeq === Seq(("aaa", "bbb")))

    val capped = NgramStats.collocations(docs, "doc_id", "text", k = 1,
        minCount = 1)
      .as[(String, String, Long, Long)].collect()
    assert(capped.length === 1)
    assert(capped.head._1 === "aaa", "higher PMI wins the cap")
  }

  test("mojibake table keys are longest-first so 3-char sequences never " +
    "get half-eaten, and every key round-trips from its target") {
    val lens = TextOps.mojibakeTable.dropRight(1).map(_._1.length)
    assert(lens === lens.sorted.reverse)
    TextOps.mojibakeTable.foreach { case (k, v) =>
      if (v != " ") assert(TextOps.utf8AsCp1252(v) === k)
    }
  }
}
