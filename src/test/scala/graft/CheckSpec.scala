package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks._

/** Unit tests per constraint rule against literal rows, lifted from reference
  * behavior (`src/core/verification.py`) including its edge quirks:
  * empty-string-vs-null required semantics (verification.py:39), the
  * missing-URL double issue (66-73 + 30-43), anchored fullmatch vs unanchored
  * search (263-267 vs models.py:39,74), urllib-equivalent URL parsing
  * (249-254).
  */
class CheckSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def firedRules(
      row: (String, Integer, String, String, String, java.sql.Timestamp))
      : Set[String] = {
    val df = Seq(row).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .withColumn("part_id", lit(0))
    graft.engine.Validator.rowViolations(df)
      .select("rule_id").as[String].collect().toSet
  }

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  test("clean row fires nothing") {
    assert(firedRules(("c1", 0, "user", "hello world", null, ts)) === Set.empty)
  }

  test("required: null and empty text both fire (verification.py:39 empties)") {
    assert(firedRules(("c1", 0, "user", null, null, ts))
      .contains("REQUIRED_NONEMPTY_text"))
    assert(firedRules(("c1", 0, "user", "", null, ts))
      .contains("REQUIRED_NONEMPTY_text"))
    // whitespace is NOT empty in the reference ([None,"",[],{}])
    assert(!firedRules(("c1", 0, "user", " ", null, ts))
      .contains("REQUIRED_NONEMPTY_text"))
  }

  test("enum: out-of-vocabulary role fires; null role is required's job") {
    assert(firedRules(("c1", 0, "operator", "x", null, ts))
      .contains("ENUM_MEMBER_role"))
    val r = firedRules(("c1", 0, null, "x", null, ts))
    assert(r.contains("REQUIRED_NONEMPTY_role"))
    assert(!r.contains("ENUM_MEMBER_role"))
  }

  test("format: anchored fullmatch semantics (verification.py:266-267)") {
    // substring match must NOT pass: 'v1.2' contains no full identifier match
    assert(firedRules(("c1", 0, "tool", "x", "v1.2", ts))
      .contains("FORMAT_REGEX_tool"))
    assert(!firedRules(("c1", 0, "tool", "x", "search", ts))
      .contains("FORMAT_REGEX_tool"))
    assert(!firedRules(("c1", 0, "tool", "x", "code_run2", ts))
      .contains("FORMAT_REGEX_tool"))
    // prefix-only match must fail the fullmatch
    assert(firedRules(("c1", 0, "tool", "x", "search extra", ts))
      .contains("FORMAT_REGEX_tool"))
    // trailing newline: Python re.fullmatch rejects "search\n"; Java's $
    // would accept it — \z anchoring must reject (ADVICE r01 parity gap)
    assert(firedRules(("c1", 0, "tool", "x", "search\n", ts))
      .contains("FORMAT_REGEX_tool"))
  }

  test("url: urllib parity cases (verification.py:249-254)") {
    def urlFires(text: String): Boolean =
      firedRules(("c1", 0, "tool", text, "fetch", ts)).contains("URL_FORMAT_text")
    assert(!urlFires("https://example.org/x"))
    assert(!urlFires("http://h"))           // scheme + netloc, no path: valid
    assert(!urlFires("HTTP://EXAMPLE.ORG")) // urlparse lowercases scheme
    assert(urlFires("htp:/bad"))            // bad scheme
    assert(urlFires("http://"))             // empty netloc
    assert(urlFires("http:///path"))        // empty netloc, path present
    assert(urlFires("ftp://example.org"))   // scheme not in {http,https}
    assert(urlFires("example.org"))         // no scheme
  }

  test("url: missing value double-issues with required (verification.py:66-73 quirk)") {
    val r = firedRules(("c1", 0, "tool", null, "fetch", ts))
    assert(r.contains("URL_FORMAT_text"))
    assert(r.contains("REQUIRED_NONEMPTY_text"))
  }

  test("url rule scoped to fetch turns only") {
    assert(!firedRules(("c1", 0, "user", "not a url", null, ts))
      .contains("URL_FORMAT_text"))
  }

  test("length cap and min value") {
    assert(firedRules(("c1", 0, "user", "y" * 2001, null, ts))
      .contains("LENGTH_MAX_text"))
    assert(!firedRules(("c1", 0, "user", "y" * 2000, null, ts))
      .contains("LENGTH_MAX_text"))
    assert(firedRules(("c1", -1, "user", "x", null, ts))
      .contains("MIN_VALUE_turn_idx"))
  }

  test("cross-field: tool <-> role coupling both directions") {
    assert(firedRules(("c1", 1, "tool", "x", null, ts))
      .contains("CROSS_FIELD_tool_role"))
    assert(firedRules(("c1", 1, "user", "x", "search", ts))
      .contains("CROSS_FIELD_tool_role"))
    assert(!firedRules(("c1", 1, "tool", "x", "search", ts))
      .contains("CROSS_FIELD_tool_role"))
  }

  test("messages byte-match reference f-string formats incl. Python None") {
    val df = Seq(("c1", 0, "tool", null: String, "fetch", ts))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .withColumn("part_id", lit(0))
    val msgs = graft.engine.Validator.rowViolations(df)
      .select("rule_id", "message").as[(String, String)].collect().toMap
    assert(msgs("REQUIRED_NONEMPTY_text") === "Missing required field: text")
    assert(msgs("URL_FORMAT_text") === "Invalid or missing URL in text: None")
  }
}
