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

  test("simhash banded blocking is EXACT at hamming ≤ 3 (pigeonhole): " +
    "equals the full signature cross-join") {
    // ≤3 differing bits cannot touch all four 16-bit bands, so every such
    // pair shares an exact band — blocking loses nothing. Corpus: 40 base
    // docs + 25 single-word-substituted variants (tiny hamming distances).
    val base = (0 until 40).map { i =>
      (i.toLong,
        (0 until 24).map(w => s"tok${(i * 11 + w * 5) % 331}").mkString(" "))
    }
    val dups = (0 until 10).map(i => (1000L + i, base(i)._2)) // h = 0 pairs
    val variants = (0 until 25).map { i =>
      val words = base(i)._2.split(" ")
      (2000L + i, (words.take(12) ++ Array("swapped") ++ words.drop(13)).mkString(" "))
    }
    val docs = (base ++ dups ++ variants).toDF("doc_id", "text")
    val sims = graft.ops.Dedup.simhashSignatures(docs, "text", "doc_id")
    val exactPairs = sims.as("a").crossJoin(sims.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        graft.ops.Dedup.hamming(col("a.sim"), col("b.sim")).as("h"))
      .filter(col("h") <= 3)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty, "planted corpus produced no close pairs")
    val blocked = graft.ops.Dedup
      .simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked === exactPairs,
      s"blocking must be lossless at h<=3: missing ${exactPairs -- blocked}, extra ${blocked -- exactPairs}")
  }

  // 20 planted clusters × 10 members: cluster signal from
  // xxhash64(cluster, dim), per-vector jitter an order of magnitude
  // smaller — a query's true top-10 is dominated by its cluster mates
  private lazy val clusteredEmb = {
    val nClusters = 20
    spark.range(200).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)), d =>
        pmod(xxhash64(pmod(col("id"), lit(nClusters)), d), lit(1000))
          .cast("double") / 1000.0 +
          pmod(xxhash64(col("id"), d), lit(100)).cast("double") / 2000.0)
        .as("embedding"))
      .cache()
  }
  private lazy val clusterQueries = clusteredEmb.filter(col("vec_id") < 5)
  private lazy val exactTop = Similarity
    .bruteForceTopK(clusteredEmb, clusterQueries, 10)
    .select("query_id", "vec_id").as[(Long, Long)].collect().toSet

  private def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
    val got = approx.select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    got.intersect(exactTop).size.toDouble / exactTop.size
  }

  test("ann LSH multiprobe and IVF: recall ≥ 0.85 vs exact brute force " +
    "on clustered embeddings") {
    // measured on this (deterministic) fixture, r04 probe: LSH nBits
    // 6/8/10 → 0.98/0.98/0.94; IVF seeds nProbe 4/6/8 → 0.98/0.98/1.0
    // (kmeans-refined: 1.0 at every probe count). Bound set a margin under
    // the weakest measured default, well above the 0.8 target.
    assert(exactTop.size === 50)
    val lshRecall = recallOf(
      Similarity.annTopK(clusteredEmb, clusterQueries, 10, nBits = 8, dim = 16))
    val ivfRecall = recallOf(
      Similarity.ivfTopK(clusteredEmb, clusterQueries, 10, nCentroids = 16, nProbe = 4))
    assert(lshRecall >= 0.85, s"LSH multiprobe recall $lshRecall")
    assert(ivfRecall >= 0.85, s"IVF recall $ivfRecall")
  }

  test("int8-quantized retrieval: brute-force top-10 over vectors " +
    "dequantized from the emitted codes keeps recall ≥ 0.9 vs full " +
    "precision") {
    // end-to-end through the op's OUTPUT (codes parsed back from the
    // qvec string), both corpus and query sides quantized — the setup an
    // int8 index scan actually runs
    val q = Similarity.quantizeInt8(clusteredEmb, "vec_id", "embedding")
    val deq = q.select(col("vec_id"),
      transform(split(col("qvec"), ","),
        s => s.cast("double") * col("scale") / 127.0).as("embedding"))
    val r = recallOf(
      Similarity.bruteForceTopK(deq, deq.filter(col("vec_id") < 5), 10))
    assert(r >= 0.9, s"int8 retrieval recall $r")
  }

  test("kmeans-refined centroids: deterministic, fit no worse than the " +
    "hash-sampled seeds, IVF recall holds") {
    val km = Similarity.kmeansCentroids(clusteredEmb, 16, iters = 2)
    // exact-decimal means -> identical centroids on every invocation
    assert(km === Similarity.kmeansCentroids(clusteredEmb, 16, iters = 2))
    // spherical update (unit-normalized members) makes the member-mean the
    // within-cluster cosine-fit maximizer — fit must not degrade vs seeds
    def meanFit(cs: Seq[Seq[Double]]): Double = clusteredEmb
      .select(array_max(array(cs.map(c =>
        Similarity.cosine(col("embedding"), typedlit(c))): _*)).as("f"))
      .agg(avg("f")).as[Double].head()
    val seeds = Similarity.ivfCentroids(clusteredEmb, 16)
    val (fitKm, fitSeeds) = (meanFit(km), meanFit(seeds))
    assert(fitKm >= fitSeeds - 1e-9, s"kmeans fit $fitKm < seed fit $fitSeeds")
    val r = recallOf(Similarity.ivfTopK(clusteredEmb, clusterQueries, 10,
      nProbe = 4, centroids = Some(km)))
    assert(r >= 0.85, s"IVF-with-kmeans recall $r") // measured 1.0 (r04)
  }

  test("hard negatives: every mined row is in-band, below every true " +
    "positive's similarity, ranked contiguously, and capped at k") {
    val mined = Similarity.hardNegatives(clusteredEmb, clusterQueries,
        k = 8, loSim = 0.2, hiSim = 0.95, nProbe = 6)
      .select("query_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(mined.nonEmpty)
    assert(mined.forall(r => r._3 >= 0.2 && r._3 < 0.95), "band violated")
    val byQ = mined.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(rs.size <= 8, s"query $q over k")
      assert(rs.map(_._4).sorted === (1 to rs.size), s"query $q ranks")
      // within a query, rank order follows cos descending
      val sorted = rs.sortBy(_._4).map(_._3)
      assert(sorted === sorted.sorted(Ordering[Double].reverse))
    }
    // no mined negative may be a hiSim-or-above near-dup of its query
    val nearDups = Similarity.cosineNearDupPairs(clusteredEmb,
        threshold = 0.95, dim = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p, p.swap)).toSet
    assert(!mined.exists(r => nearDups.contains((r._1, r._2))),
      "a >= hiSim near-dup leaked into the negatives")
  }
}
