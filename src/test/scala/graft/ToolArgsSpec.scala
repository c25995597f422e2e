package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks.ToolArgs
import graft.sources.TranscriptGen

/** Tool-call argument schema validation: the full rule matrix on handcrafted
  * payloads, the edge semantics q116 cannot plant (JSON-null values, unknown
  * tools, no-cascade on malformed rows), and the planted-count law over
  * [[TranscriptGen.toolCalls]] (t24's input).
  */
class ToolArgsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(rows: (Long, String, String)*): Seq[(Long, String, String, String)] =
    ToolArgs.violations(
        rows.toDF("id", "tool", "args"), "tool", "args", Seq("id"))
      .select("id", "rule_id", "field", "message")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(r => (r._1, r._2))

  test("rule matrix: one planted cause, one violation, exact messages") {
    val got = run(
      (0L, "search", "{\"q\":"),                         // malformed
      (1L, "search", "[1, 2]"),                          // non-object
      (2L, "search", "{}"),                              // missing q
      (3L, "search", "{\"q\":\"a\",\"zz\":2,\"extra\":1}"), // unknown, sorted
      (4L, "search", "{\"q\":\"a\",\"mode\":\"turbo\"}"),   // enum
      (5L, "search", "{\"q\":\"a\",\"limit\":\"many\"}"),   // non-int
      (6L, "search", "{\"q\":\"a\",\"limit\":1000}"),       // out of range
      (8L, "search", "{\"q\":\"a\",\"limit\":7,\"mode\":\"fast\"}"), // clean
      (9L, "fetch", "{\"url\":\"u\"}"))                  // missing method
    assert(got === Seq(
      (0L, "MALFORMED_ARGS", "args", "Malformed tool args: {\"q\":"),
      (1L, "MALFORMED_ARGS", "args", "Malformed tool args: [1, 2]"),
      (2L, "MISSING_ARG_q", "q", "Missing required arg `q` for search"),
      (3L, "UNKNOWN_ARG", "args", "Unknown args for search: extra, zz"),
      (4L, "ENUM_ARG_mode", "mode", "Invalid value in mode: turbo"),
      (5L, "INT_ARG_limit", "limit", "Out-of-range or non-integer limit: many"),
      (6L, "INT_ARG_limit", "limit", "Out-of-range or non-integer limit: 1000"),
      (9L, "MISSING_ARG_method", "method",
        "Missing required arg `method` for fetch")))
  }

  test("null args is an absent object: required rules fire, malformed does " +
    "not; fetch emits BOTH its missing keys") {
    val got = run((0L, "search", null), (1L, "fetch", null))
    assert(got === Seq(
      (0L, "MISSING_ARG_q", "q", "Missing required arg `q` for search"),
      (1L, "MISSING_ARG_method", "method",
        "Missing required arg `method` for fetch"),
      (1L, "MISSING_ARG_url", "url", "Missing required arg `url` for fetch")))
  }

  test("JSON-null values render as None: enum and int rules fire on a " +
    "present key with null value") {
    val got = run(
      (0L, "search", "{\"q\":\"a\",\"mode\":null}"),
      (1L, "search", "{\"q\":\"a\",\"limit\":null}"))
    assert(got === Seq(
      (0L, "ENUM_ARG_mode", "mode", "Invalid value in mode: None"),
      (1L, "INT_ARG_limit", "limit",
        "Out-of-range or non-integer limit: None")))
  }

  test("malformed payload yields exactly one violation (no schema cascade); " +
    "unknown tools get only the malformed check") {
    val got = run(
      (0L, "search", "{\"q\": broken"),
      (1L, "calc", "{\"anything\":1,\"goes\":2}"),
      (2L, "calc", "{"))
    assert(got === Seq(
      (0L, "MALFORMED_ARGS", "args", "Malformed tool args: {\"q\": broken"),
      (2L, "MALFORMED_ARGS", "args", "Malformed tool args: {")))
  }

  test("boundary ints pass; off-by-one fails (limit 0/100 in, -1/101 out)") {
    val got = run(
      (0L, "search", "{\"q\":\"a\",\"limit\":0}"),
      (1L, "search", "{\"q\":\"a\",\"limit\":100}"),
      (2L, "search", "{\"q\":\"a\",\"limit\":-1}"),
      (3L, "search", "{\"q\":\"a\",\"limit\":101}"))
    assert(got.map(_._1) === Seq(2L, 3L))
    assert(got.forall(_._2 == "INT_ARG_limit"))
  }

  test("planted-count law on toolCalls: every rule family observed, clean " +
    "majority, counts are a pure function of the config") {
    val cfg = TranscriptGen.Config(nConvs = 500L)
    val calls = TranscriptGen.toolCalls(spark, cfg)
    val v = ToolArgs.violations(calls, "tool", "args",
      Seq("conv_id", "turn_idx"))
    val byRule = v.groupBy("rule_id").count()
      .as[(String, Long)].collect().toMap
    val families = Set("MALFORMED_ARGS", "MISSING_ARG_q", "MISSING_ARG_url",
      "MISSING_ARG_method", "UNKNOWN_ARG", "ENUM_ARG_mode", "ENUM_ARG_method",
      "INT_ARG_limit", "INT_ARG_timeout_ms")
    assert(families.subsetOf(byRule.keySet), s"missing: ${families -- byRule.keySet}")
    val nCalls = calls.count()
    val nViolatedRows = v.select("conv_id", "turn_idx").distinct().count()
    assert(nViolatedRows < nCalls / 2, "violations must be the minority")
    // determinism: a second evaluation of the same config is identical
    val again = ToolArgs.violations(TranscriptGen.toolCalls(spark, cfg),
      "tool", "args", Seq("conv_id", "turn_idx"))
      .groupBy("rule_id").count().as[(String, Long)].collect().toMap
    assert(again === byRule)
  }
}
