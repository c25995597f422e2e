package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity}

/** Quantified recall for the approximate operators: planted ground-truth
  * corpora, EXACT baselines computed inside the test, recall asserted
  * against stated bounds. Everything is hash-deterministic (fixed seeds,
  * xxhash64/md5 content), so the measured recalls are stable run-to-run —
  * the bounds sit a margin below the measured values, not at them.
  */
class RecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("minhash estimator pairs: recall ≥ 0.7 vs the exact-Jaccard ≥ 0.5 " +
    "pair set; every reported pair has exact jaccard ≥ 0.35") {
    // 60 base docs (13 words from a 211-word vocabulary) + 30 planted
    // near-dups (last word replaced → exact 3-shingle jaccard ≈ 8/14 ≈ 0.57,
    // right where k=64 estimator noise matters: sd ≈ 0.06 around a 0.5 cut)
    val base = (0 until 60).map { i =>
      (i.toLong,
        (0 until 13).map(w => s"w${(i * 7 + w * 3) % 211}").mkString(" "))
    }
    val nearDups = (0 until 30).map { i =>
      val words = base(i)._2.split(" ")
      (1000L + i, (words.dropRight(1) :+ "zzz").mkString(" "))
    }
    val docs = (base ++ nearDups).toDF("doc_id", "text")
    val truth = docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Dedup.jaccard(col("a.text"), col("b.text")).as("j"))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.size >= 25, s"planted ground truth too small: ${truth.size}")
    val got = Dedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.7,
      s"minhash estimator recall $recall over ${truth.size} true pairs")
    // estimator noise tolerance: nothing reported that exact Jaccard
    // contradicts (same LSH candidates, exact verify at the loosened cut)
    val atLooseCut = Dedup
      .minhashLshPairsExact(docs, "text", "doc_id", threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(atLooseCut), "reported pair with exact jaccard < 0.35")
  }

  test("ann LSH multiprobe and IVF: recall ≥ 0.6 vs exact brute force " +
    "on clustered embeddings") {
    // 20 planted clusters × 10 members: cluster signal from
    // xxhash64(cluster, dim), per-vector jitter an order of magnitude
    // smaller — a query's true top-10 is dominated by its cluster mates
    val nClusters = 20
    val emb = spark.range(200).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)), d =>
        pmod(xxhash64(pmod(col("id"), lit(nClusters)), d), lit(1000))
          .cast("double") / 1000.0 +
          pmod(xxhash64(col("id"), d), lit(100)).cast("double") / 2000.0)
        .as("embedding"))
      .cache()
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(exact.size === 50)
    val lsh = Similarity.annTopK(emb, queries, 10, nBits = 8, dim = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 10, nCentroids = 16, nProbe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lshRecall = lsh.intersect(exact).size.toDouble / exact.size
    val ivfRecall = ivf.intersect(exact).size.toDouble / exact.size
    assert(lshRecall >= 0.6, s"LSH multiprobe recall $lshRecall")
    assert(ivfRecall >= 0.6, s"IVF recall $ivfRecall")
  }
}
