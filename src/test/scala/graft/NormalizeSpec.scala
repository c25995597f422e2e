package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NfcNormalize
import graft.ops.TextOps

/** Unicode NFC expression + the canonicalize chain. The invariants corpus
  * reproducibility rests on: NFC agrees with the JDK reference (and hence,
  * by the Unicode standard, with DuckDB's utf8proc — q77 pins that
  * cross-engine), and canonicalization is idempotent so re-running a
  * pipeline stage can never re-change text. Combining marks are written as
  * \\u escapes throughout — source-file normalization must not be able to
  * silently rewrite the fixtures.
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val acute = "\u0301" // combining acute
  private val ring = "\u030A"  // combining ring above
  private val diaer = "\u0308" // combining diaeresis

  private def canonOf(ss: Seq[String]): Seq[String] =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
      .orderBy("id")
      .select(TextOps.canonicalize(col("t"))).as[String].collect().toSeq

  test("NFC composes decomposed sequences and passes ASCII through") {
    val in = Seq(
      s"Cafe$acute",            // e + combining acute → é
      s"A${ring}ngstro${diaer}m", // A+ring → Å, o+diaeresis → ö
      "plain ascii stays",
      "é already composed",
      "")
    val got = in.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "t").orderBy("id")
      .select(NfcNormalize.nfcNormalize(col("t"))).as[String].collect()
    assert(got(0) === "Café")
    assert(got(1) === "Ångström")
    assert(got(2) === "plain ascii stays")
    assert(got(3) === "é already composed")
    assert(got(4) === "")
  }

  test("NFC expression matches the JDK reference on randomized mixed strings") {
    val rnd = new scala.util.Random(11)
    val pool = Array("a", "b", " ", "e", acute, ring, diaer,
      "é", "Å", "Z", "9", "o")
    val ss = (1 to 200).map(_ =>
      (1 to rnd.nextInt(20)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val got = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "t").orderBy("id")
      .select(col("t"), NfcNormalize.nfcNormalize(col("t")).as("n"))
      .as[(String, String)].collect()
    got.foreach { case (orig, n) =>
      val ref = java.text.Normalizer
        .normalize(orig, java.text.Normalizer.Form.NFC)
      assert(n === ref, s"input ${orig.map(_.toInt.toHexString).mkString(",")}")
    }
  }

  test("NFC is null-safe") {
    val got = Seq((1L, null: String), (2L, "x")).toDF("id", "t")
      .orderBy("id")
      .select(NfcNormalize.nfcNormalize(col("t"))).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) === "x")
  }

  test("canonicalize: strips controls, unifies EOL, squeezes blanks, trims") {
    val got = canonOf(Seq(
      "  a\t\tb  ",                          // squeeze + trim
      "line1\r\nline2\rline3\nline4",        // CRLF, CR, LF → LF
      "bell\u0007 and\u0000 del\u007f char", // C0 + DEL stripped
      "tab\tkept as one space",
      s"Cafe$acute menu",                    // NFC first
      null))
    assert(got(0) === "a b")
    assert(got(1) === "line1\nline2\nline3\nline4")
    assert(got(2) === "bell and del char")
    assert(got(3) === "tab kept as one space")
    assert(got(4) === "Café menu")
    assert(got(5) === "") // null → empty, not null
  }

  test("canonicalize is idempotent on randomized adversarial strings") {
    val rnd = new scala.util.Random(23)
    val pool = Array("a", "b", " ", "\t", "\r", "\n", acute, "e",
      "é", ".", "x", "\u0007")
    val ss = (1 to 300).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val once = canonOf(ss)
    val twice = canonOf(once)
    once.zip(twice).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b,
        s"not idempotent on case $i: ${ss(i).map(_.toInt).mkString(",")}")
    }
  }
}
