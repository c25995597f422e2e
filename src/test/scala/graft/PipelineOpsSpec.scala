package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Boilerplate, Outliers, Sampling}

/** Boilerplate n-gram coverage, group-wise z-score outliers, and weighted
  * corpus mixture.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("boilerplate: coverage counts every occurrence of frequent grams") {
    // bigram "the end" appears in all 4 docs (5 occurrences incl. the double
    // in doc 4) -> frequent at minCount=4; nothing else repeats that often
    val docs = Seq(
      (1L, "alpha beta the end"),
      (2L, "gamma delta the end"),
      (3L, "epsilon the end zeta"),
      (4L, "the end the end")
    ).toDF("doc_id", "text")
    val r = Boilerplate.coverage(docs, "text", "doc_id", n = 2, minCount = 4L)
      .select(col("id"), col("n_grams"), col("n_boiler"), col("boiler_frac"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, g, b, f) => id -> ((g, b, f)) }.toMap
    assert(r(1L) === ((3L, 1L, 0.3333)))
    assert(r(2L) === ((3L, 1L, 0.3333)))
    assert(r(3L) === ((3L, 1L, 0.3333)))
    // doc 4 grams: "the end", "end the", "the end" -> 2 of 3 are boilerplate
    assert(r(4L) === ((3L, 2L, 0.6667)))
  }

  test("boilerplate: zero-hit docs report n_boiler=0, not absent") {
    val docs = Seq(
      (1L, "aa bb"), (2L, "aa bb"), (3L, "cc dd")
    ).toDF("doc_id", "text")
    val r = Boilerplate.coverage(docs, "text", "doc_id", n = 2, minCount = 2L)
      .select(col("id"), col("n_boiler")).as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("outliers: z-scores from exact decimal moments match direct math") {
    // group a: values 1..9 plus a 100.0 spike; group b: flat (sigma from a
    // clean set, no outlier)
    val rows = (1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 100.0)
    val flat = (1 to 10).map(i => ("b", 5.0 + (i % 2)))
    val df = (rows ++ flat).toDF("g", "v")
    val r = Outliers.zOutliers(df, "g", "v", zThreshold = 2.0)
      .select(col("g"), col("v"), col("z"))
      .as[(String, Double, Double)].collect()
    assert(r.length === 1)
    val (g, v, z) = r.head
    assert(g === "a" && v === 100.0)
    val xs = rows.map(_._2)
    val mu = xs.sum / xs.length
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1))
    assert(math.abs(z - (100.0 - mu) / sigma) < 5e-4)
  }

  test("outliers: constant group (sigma=0) emits no rows, no NaN blowup") {
    val df = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    assert(Outliers.zOutliers(df, "g", "v", 1.0).count() === 0L)
  }

  test("split: n-way assignment is disjoint, exhaustive, and band-ordered") {
    val df = (0L until 3000L).toDF("id")
    val r = df.withColumn("split", Sampling.splitColumn(col("id"),
        Seq("cccc" -> "train", "e666" -> "val"), "test"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(r.values.sum === 3000L) // exhaustive — every row got a label
    // ~80/10/10 with hash-noise bands
    assert(r("train") > 2250 && r("train") < 2550)
    assert(r("val") > 180 && r("val") < 420)
    assert(r("test") > 180 && r("test") < 420)
    // stable across partitioning: same rows land in 'val' every time
    val v1 = df.withColumn("s", Sampling.splitColumn(col("id"),
        Seq("cccc" -> "train", "e666" -> "val"), "test"))
      .filter(col("s") === "val").select("id").as[Long].collect().sorted.toSeq
    val v2 = df.repartition(7).withColumn("s", Sampling.splitColumn(col("id"),
        Seq("cccc" -> "train", "e666" -> "val"), "test"))
      .filter(col("s") === "val").select("id").as[Long].collect().sorted.toSeq
    assert(v1 === v2)
  }

  test("madOutliers: robust to the contamination that shifts z-scores") {
    // 20 clean points around 10 plus two extreme spikes: the spikes inflate
    // μ/σ (classic masking) but barely move median/MAD
    val clean = (1 to 20).map(i => ("a", 10.0 + (i % 5)))
    val spikes = Seq(("a", 1000.0), ("a", 1200.0))
    val df = (clean ++ spikes).toDF("g", "v")
    val r = graft.ops.Outliers.madOutliers(df, "g", "v", threshold = 6.0)
      .select(col("v")).as[Double].collect().toSet
    assert(r === Set(1000.0, 1200.0))
  }

  test("madOutliers: zero-MAD group (majority-constant) emits no rows") {
    val df = (1 to 9).map(_ => ("c", 5.0)).:+(("c", 6.0)).toDF("g", "v")
    // median=5, deviations are 0 for 9 of 10 rows -> MAD=0 -> guarded out
    assert(graft.ops.Outliers.madOutliers(df, "g", "v", 1.0).count() === 0L)
  }

  test("mixture: membership is per-stratum thresholded and partition-stable") {
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "big" else "small"))
      .toDF("id", "src")
    val rates = Map("big" -> "8000") // ~50%
    val m = Sampling.weightedMixture(df, "src", "id", rates, "0ccc") // ~5%
    val counts = m.groupBy("src").count().as[(String, Long)].collect().toMap
    // 1000 candidates per stratum; allow generous hash-noise bands
    assert(counts("big") > 400 && counts("big") < 600)
    assert(counts("small") > 20 && counts("small") < 90)
    // deterministic: same membership regardless of partitioning
    val ids1 = m.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling
      .weightedMixture(df.repartition(17), "src", "id", rates, "0ccc")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 === ids2)
    // per-stratum rate respected: every kept small-stratum id would also be
    // kept under the big threshold (thresholds nest)
    val smallKept = m.filter(col("src") === "small").select("id").as[Long]
      .collect().toSet
    val under5pct = Sampling.hashSample(df, "id", "0ccc")
      .select("id").as[Long].collect().toSet
    assert(smallKept.subsetOf(under5pct))
  }

  test("rankPpmByValue: exact ≤-fraction per row, top-X selection cuts " +
    "exactly, partitioning-invariant") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L))
      .toDF("id", "score").repartition(3)
    val r = graft.ops.Outliers.rankPpmByValue(df, "score")
      .select("id", "pct_le_ppm")
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 500000L, 2L -> 500000L,
      3L -> 750000L, 4L -> 1000000L))
    // "keep top half" = pct > 500000 keeps exactly the two best rows
    assert(r.filter(_._2 > 500000L).keySet === Set(3L, 4L))
    val r1 = graft.ops.Outliers.rankPpmByValue(df.repartition(1), "score")
      .select("id", "pct_le_ppm").as[(Long, Long)].collect().toMap
    assert(r1 === r)
  }

  test("rankPpmByValue enforces the bounded-domain contract: a domain " +
    "wider than maxDomain aborts up front with the remediation, instead " +
    "of OOMing the single-task window later") {
    val wide = spark.range(500).select(col("id"), (col("id") * 7).as("score"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Outliers.rankPpmByValue(wide, "score", maxDomain = 100)
    }
    assert(e.getMessage.contains("500 distinct values") &&
      e.getMessage.contains("t-digest"), e.getMessage)
    // at-the-bound passes (the guard is ≤, not <)
    val ok = graft.ops.Outliers.rankPpmByValue(wide, "score", maxDomain = 500)
    assert(ok.count() === 500)
  }
}
