package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks.Checks
import graft.checks.NestedChecks._

private[graft] case class Author(name: String, orcidId: String)

/** Byte-parity of the array-valued checks against Python's actual behavior
  * (expected strings transcribed from `verification.py:88,111,118,141`
  * f-string + list-repr semantics).
  */
class NestedChecksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("url list: bad-items message embeds Python list repr (verification.py:88)") {
    val df = Seq(
      (1L, Seq("https://a.org", "htp:/bad", null, "ftp://x")),
      (2L, Seq("https://ok.org")),
      (3L, null: Seq[String])
    ).toDF("id", "codeRepository")
    val c = UrlList("codeRepository")
    val out = df.select(col("id"), coalesce(c.violated, lit(false)).as("v"),
      when(c.violated, c.message).as("m")).orderBy("id").collect()
    assert(out(0).getBoolean(1))
    // Python: f"{len(bad)} invalid URLs in codeRepository: {bad_items}"
    // bad_items list repr: strings single-quoted, None bare
    assert(out(0).getString(2) ===
      "3 invalid URLs in codeRepository: ['htp:/bad', None, 'ftp://x']")
    assert(!out(1).getBoolean(1))
    assert(!out(2).getBoolean(1)) // null list: required check's job
  }

  test("author shape + orcid checks (verification.py:110-121)") {
    val df = Seq(
      (1L, Seq(Author("Alice", "https://orcid.org/0000-0001"), Author(null, null))),
      (2L, Seq(Author("Bob", "0000-0002-1825-0097"))), // orcid not a URL
      (3L, Seq(Author("Carol", null)))
    ).toDF("id", "author")
    val name = AuthorName("author")
    val orcid = AuthorOrcid("author")
    val out = df.select(col("id"),
      coalesce(name.violated, lit(false)).as("nv"),
      coalesce(orcid.violated, lit(false)).as("ov"),
      when(name.violated, name.message).as("nm"),
      when(orcid.violated, orcid.message).as("om")).orderBy("id").collect()
    assert(out(0).getBoolean(1) && !out(0).getBoolean(2))
    assert(out(0).getString(3) === "Missing `name` in author object")
    assert(!out(1).getBoolean(1) && out(1).getBoolean(2))
    assert(out(1).getString(4) === "Invalid ORCID ID: 0000-0002-1825-0097")
    assert(!out(2).getBoolean(1) && !out(2).getBoolean(2))
  }

  test("version list (verification.py:140-144) and catalog composition") {
    val df = Seq(
      (1L, Seq(("img1", "1.2.3"), ("img2", "v1.2"))),
      (2L, Seq(("img3", "10.20.30")))
    ).toDF("id", "imgs")
      .select(col("id"), transform(col("imgs"), s =>
        struct(s.getField("_1").as("name"), s.getField("_2").as("softwareVersion")))
        .as("hasSoftwareImage"))
    val c = VersionList("hasSoftwareImage")
    // nested checks compose into the same violationsArray compiler
    val out = df.select(col("id"),
      explode(Checks.violationsArray(Seq(c))).as("v")).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 1L)
    assert(out(0).getStruct(1).getAs[String]("message") ===
      "Invalid softwareVersion: v1.2")
  }
}
