package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ContextBudget

class ContextBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  test("tailWithinBudget keeps the most recent rows whose cumulative " +
    "tokens fit, drops the older overflow") {
    val df = Seq(
      (1L, ts(1), 10L, 30L), (1L, ts(2), 11L, 30L),
      (1L, ts(3), 12L, 30L), (1L, ts(4), 13L, 30L))
      .toDF("conv", "ts", "eid", "tok")
    val kept = ContextBudget
      .tailWithinBudget(df, "conv", "ts", "eid", col("tok"), 70L)
      .filter(col("kept")).select("eid").as[Long].collect().sorted
    // newest-first cumsum: 30, 60, 90 → eids 13 and 12 fit, 11/10 dropped
    assert(kept.toSeq === Seq(12L, 13L))
  }

  test("the single most recent row is always kept, even alone over budget") {
    val df = Seq((1L, ts(1), 1L, 500L), (1L, ts(2), 2L, 500L))
      .toDF("conv", "ts", "eid", "tok")
    val out = ContextBudget
      .tailWithinBudget(df, "conv", "ts", "eid", col("tok"), 100L)
      .select(col("eid"), col("kept")).as[(Long, Boolean)].collect().toMap
    assert(out(2L) === true && out(1L) === false)
  }

  test("groups are independent and ties on ts break by the tie column " +
    "descending (deterministic under repartitioning)") {
    val df = Seq(
      (1L, ts(5), 1L, 40L), (1L, ts(5), 2L, 40L), (1L, ts(5), 3L, 40L),
      (2L, ts(1), 9L, 5L))
      .toDF("conv", "ts", "eid", "tok")
    val a = ContextBudget
      .tailWithinBudget(df, "conv", "ts", "eid", col("tok"), 80L)
      .select("conv", "eid", "kept").as[(Long, Long, Boolean)]
      .collect().toSet
    val b = ContextBudget
      .tailWithinBudget(df.repartition(5), "conv", "ts", "eid", col("tok"), 80L)
      .select("conv", "eid", "kept").as[(Long, Long, Boolean)]
      .collect().toSet
    assert(a === b)
    // same ts: eid 3 then 2 fit (40+40), eid 1 overflows
    assert(a === Set((1L, 3L, true), (1L, 2L, true), (1L, 1L, false),
      (2L, 9L, true)))
  }
}
