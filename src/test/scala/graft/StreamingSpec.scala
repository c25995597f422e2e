package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Turn
import graft.streaming.StreamValidator

/** Streaming path: the batch constraint catalog over a MemoryStream-driven
  * micro-batch, results observed through an in-memory sink.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 00:${s / 60}%02d:${s % 60}%02d")

  test("violations stream finds planted rows, passes clean ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    input.addData(
      Turn("c1", 0, "user", "hello", null, ts(0), 0),
      Turn("c1", 1, "operator", "bad role", null, ts(5), 0), // enum violation
      Turn("c2", 0, "user", "", null, ts(0), 1))             // required violation
    val q = StreamValidator.violations(input.toDF())
      .writeStream.format("memory").queryName("viol_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rules = spark.table("viol_out")
      .select("rule_id").as[String].collect().sorted
    assert(rules.toSeq === Seq("ENUM_MEMBER_role", "REQUIRED_NONEMPTY_text"))
  }

  test("windowed verdicts aggregate per window x partition with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    input.addData(
      Turn("c1", 0, "user", "ok", null, ts(0), 0),
      Turn("c1", 1, "operator", "bad", null, ts(10), 0),
      Turn("c2", 0, "user", "fine", null, ts(0), 1))
    val q = StreamValidator.windowedVerdicts(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("verd_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("verd_out")
      .select("part_id", "n_rows", "n_violations", "status")
      .as[(Int, Long, Long, String)].collect().toSet
    assert(out === Set((0, 2L, 1L, "invalid"), (1, 1L, 0L, "valid")))
  }
}
