package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AsOf, RangeJoin, Sampling, TextOps}

/** As-of join, banded range join, deterministic sampling, repetition
  * signals — the round-2 relational-operator additions.
  */
class RelOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key "a": clicks at :00, :10; purchases at :05 (matches :00), :10 (ties
  // with the :10 click — at-or-before semantics match it), :20 (matches :10)
  // key "b": purchase with no prior click (click is later)
  private lazy val purchases = Seq(
    ("a", ts("2024-01-01 10:00:05"), 101L),
    ("a", ts("2024-01-01 10:00:10"), 102L),
    ("a", ts("2024-01-01 10:00:20"), 103L),
    ("b", ts("2024-01-01 10:00:01"), 104L)
  ).toDF("k", "ts", "pid")

  private lazy val clicks = Seq(
    ("a", ts("2024-01-01 10:00:00"), 1L),
    ("a", ts("2024-01-01 10:00:10"), 2L),
    ("b", ts("2024-01-01 10:00:30"), 3L)
  ).toDF("k", "ts", "cid")

  test("asofJoin: latest right at-or-before each left row; null when none") {
    val r = AsOf.asofJoin(purchases, clicks, "k", "ts", "cid", "cid")
      .select(col("pid"), col("asof_cid")).as[(Long, Option[Long])]
      .collect().toMap
    assert(r(101L) === Some(1L)) // :05 -> click :00
    assert(r(102L) === Some(2L)) // :10 -> click :10 (equal ts matches)
    assert(r(103L) === Some(2L)) // :20 -> click :10
    assert(r(104L) === None)     // b: only a later click exists
  }

  test("asofJoin: equal-ts right rows resolve by tieBreak (last wins)") {
    val dupClicks = clicks.unionByName(
      Seq(("a", ts("2024-01-01 10:00:10"), 9L)).toDF("k", "ts", "cid"))
    val r = AsOf.asofJoin(purchases, dupClicks, "k", "ts", "cid", "cid")
      .select(col("pid"), col("asof_cid")).as[(Long, Option[Long])]
      .collect().toMap
    assert(r(102L) === Some(9L)) // max cid among the two :10 clicks
  }

  test("pastWindowJoin matches the naive theta-join on random-ish data") {
    val probe = (1 to 60).map(i =>
      ("u" + (i % 3), ts(f"2024-01-01 10:${i % 60}%02d:${(i * 7) % 60}%02d"), i.toLong))
      .toDF("k", "ts", "pid")
    val build = (1 to 80).map(i =>
      ("u" + (i % 3), ts(f"2024-01-01 10:${(i * 3) % 60}%02d:${(i * 11) % 60}%02d")))
      .toDF("k", "ts")
    val banded = RangeJoin.pastWindowJoin(probe, build, "k", "ts", 300L)
      .groupBy("pid").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val naive = probe.as("p").join(build.as("b"),
        col("p.k") === col("b.k") &&
          col("b.ts").cast("double") >= col("p.ts").cast("double") - 300 &&
          col("b.ts") < col("p.ts"))
      .groupBy(col("p.pid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(banded === naive)
    assert(naive.nonEmpty) // the fixture actually produces matches
  }

  test("hashSample: deterministic, partitioning-independent membership") {
    val df = spark.range(0, 2000).select(col("id").as("doc_id"))
    val once = Sampling.hashSample(df, "doc_id", "1999")
      .select("doc_id").as[Long].collect().toSet
    val repart = Sampling.hashSample(df.repartition(17), "doc_id", "1999")
      .select("doc_id").as[Long].collect().toSet
    assert(once === repart)
    // ~10% of 2000 with binomial spread
    assert(once.size > 120 && once.size < 280)
  }

  test("stratifiedSample: exactly k per stratum, stable across partitionings") {
    val df = spark.range(0, 1000)
      .select(col("id").as("doc_id"), (col("id") % 7).cast("string").as("g"))
    val a = Sampling.stratifiedSample(df, "g", "doc_id", 5)
      .select("g", "doc_id").as[(String, Long)].collect().toSet
    val b = Sampling.stratifiedSample(df.repartition(13), "g", "doc_id", 5)
      .select("g", "doc_id").as[(String, Long)].collect().toSet
    assert(a === b)
    assert(a.groupBy(_._1).forall(_._2.size == 5))
  }

  test("repetition fractions: empty=0, unique=0, full-dup line counted") {
    val r = Seq(
      (1L, "a\nb\na"),            // 3 lines, 2 distinct -> 1/3
      (2L, "x y z"),              // unique tokens -> 0
      (3L, ""),                   // empty -> 0
      (4L, "w w w w")             // 4 tokens 1 distinct -> 3/4
    ).toDF("id", "t")
      .select(col("id"),
        round(TextOps.dupLineFraction(col("t")), 4).as("dl"),
        round(TextOps.dupTokenFraction(col("t")), 4).as("dt"))
      .as[(Long, Double, Double)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(1L)._1 === 0.3333)
    assert(r(2L) === ((0.0, 0.0)))
    assert(r(3L) === ((0.0, 0.0)))
    assert(r(4L)._2 === 0.75)
  }
}
