package graft

import scala.io.Source

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Validator
import graft.sources.TranscriptGen

/** Golden end-to-end byte comparison (SURVEY.md §5 item 3): the full
  * violations output of a fixed config, checked in as sorted JSON lines
  * (src/test/resources/golden_violations.jsonl). Guards the byte-level
  * contract — message formats, per-turn text pass-through (including
  * newlines, tabs, quotes, emoji, non-ASCII), rule semantics — against
  * accidental drift in any future change. Regenerate ONLY on a deliberate
  * semantics change, with the diff reviewed.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("violations byte-match the checked-in golden file") {
    val cfg = TranscriptGen.Config(nConvs = 60L, parts = 4)
    val got = Validator
      .allViolations(
        TranscriptGen.transcripts(spark, cfg),
        Some(TranscriptGen.conversations(spark, cfg)))
      .select(to_json(struct(
        col("conv_id"), col("turn_idx"), col("part_id"), col("rule_id"),
        col("field"), col("message"), col("text"))))
      .collect().map(_.getString(0)).sorted
    val expected = Source.fromInputStream(
      getClass.getResourceAsStream("/golden_violations.jsonl"), "UTF-8")
      .getLines().toArray
    assert(got.length === expected.length,
      s"row count ${got.length} != golden ${expected.length}")
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g === e, s"golden mismatch at line $i")
    }
  }
}
