package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.checks.NestedChecks.{AuthorName, AuthorOrcid, UrlList, VersionList}
import graft.checks.{Check, ContainsSubstring}
import graft.engine.Sanitizer

/** List-semantics sanitize parity with the reference, pinned against an
  * actual run of `Verification.sanitize_metadata`
  * (`/root/reference/src/core/verification.py:175-222`, executed 2026-08-16
  * with `_url_responds` stubbed). Observed behavior the cases replay:
  *
  *  - mixed-validity URL list  → keeps only valid URL items
  *  - all-bad URL list         → whole field deleted
  *  - author bad name/orcid    → WHOLE author field deleted (the
  *    `elif field == "author"` branch is dead: the generic list branch
  *    URL-filters dict items to [], then deletes)
  *  - image bad version        → whole hasSoftwareImage deleted (same quirk)
  *  - scalar reason (license)  → field deleted
  *  - "" / [] empty sweep      → field deleted
  */
class NestedSanitizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val personT = new StructType()
    .add("name", StringType).add("orcidId", StringType)
  private val imageT = new StructType().add("softwareVersion", StringType)
  private val schema = new StructType()
    .add("id", IntegerType, nullable = false)
    .add("description", StringType)
    .add("license", StringType)
    .add("citation", ArrayType(StringType))
    .add("author", ArrayType(personT))
    .add("images", ArrayType(imageT))

  private def row(
      id: Int,
      description: String = "d",
      license: String = "https://spdx.org/licenses/MIT",
      citation: Seq[String] = Seq("https://doi.org/1"),
      author: Seq[Row] = Seq(Row("A", null)),
      images: Seq[Row] = Seq(Row("1.2.3"))): Row =
    Row(id, description, license, citation, author, images)

  private val checks: Seq[Check] = Seq(
    ContainsSubstring("license", "spdx.org/licenses/",
      "License is not a valid SPDX URL: "),
    UrlList("citation"),
    AuthorName("author"),
    AuthorOrcid("author"),
    VersionList("images"))

  private lazy val sanitized: Map[Int, Row] = {
    val data = Seq(
      row(1, citation = Seq("https://ok/a", "htp:/bad", null)),
      row(2, citation = Seq("htp:/bad", null)),
      row(3, author = Seq(Row("", null), Row("B", null))),
      row(4, author = Seq(Row("A", "not-a-url"))),
      row(5, images = Seq(Row("v1.2"))),
      row(6, license = "https://example.org/MIT"),
      row(7, description = "", citation = Seq.empty[String]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data), schema)
    Sanitizer.sanitize(df, checks).collect()
      .map(r => r.getInt(0) -> r).toMap
  }

  test("mixed URL list keeps only valid items (verification.py:188-190)") {
    assert(sanitized(1).getSeq[String](3) === Seq("https://ok/a"))
  }

  test("all-bad URL list deletes the whole field (verification.py:191-193)") {
    assert(sanitized(2).isNullAt(3))
  }

  test("author violations wipe the whole field — dead-elif quirk (195-203)") {
    assert(sanitized(3).isNullAt(4), "bad name -> field deleted")
    assert(sanitized(4).isNullAt(4), "bad orcid -> field deleted")
  }

  test("image version violation wipes hasSoftwareImage — dead-elif (205-213)") {
    assert(sanitized(5).isNullAt(5))
  }

  test("scalar reason deletes the field (verification.py:183-185)") {
    assert(sanitized(6).isNullAt(2))
  }

  test("empty-string and empty-list sweep (verification.py:216-219)") {
    assert(sanitized(7).isNullAt(1), "'' swept")
    assert(sanitized(7).isNullAt(3), "[] swept")
  }

  test("untouched fields survive byte-identical") {
    assert(sanitized(1).getString(2) === "https://spdx.org/licenses/MIT")
    assert(sanitized(1).getSeq[Row](4) === Seq(Row("A", null)))
    assert(sanitized(6).getSeq[String](3) === Seq("https://doi.org/1"))
  }
}
