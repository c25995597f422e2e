package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomFilterAgg, BloomMightContainLong}
import graft.ops.Decontam

/** Bloom-filter aggregate + membership expression, and the bloom-screened
  * decontamination built on them. The load-bearing property is one-sidedness:
  * no member is ever missed; false positives stay near the configured rate.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("aggregate: distributed build over many partitions has no false negatives") {
    val n = 10000L
    val bytes = spark.range(0, n).repartition(13)
      .agg(BloomFilterAgg.bloomFilterAgg(col("id"), n, 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)
    val filter = BloomFilterAgg.fromBytes(bytes)
    (0L until n).foreach(i => assert(filter.mightContainLong(i), s"missed $i"))
  }

  test("aggregate: false-positive rate stays near configured fpp") {
    val n = 10000L
    val bytes = spark.range(0, n)
      .agg(BloomFilterAgg.bloomFilterAgg(col("id"), n, 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)
    val filter = BloomFilterAgg.fromBytes(bytes)
    val fp = (n until 2 * n).count(i => filter.mightContainLong(i))
    assert(fp < n * 0.03, s"fp rate ${fp.toDouble / n} way over configured 0.01")
  }

  test("mightContain expression evaluates in codegen over a DataFrame") {
    val bytes = spark.range(0, 100)
      .agg(BloomFilterAgg.bloomFilterAgg(col("id"), 100, 0.01).as("bf"))
      .head().getAs[Array[Byte]](0)
    val filter = BloomFilterAgg.fromBytes(bytes)
    val kept = spark.range(0, 10000)
      .filter(BloomMightContainLong.bloomMightContain(col("id"), filter))
      .select("id").as[Long].collect().toSet
    assert((0L until 100L).forall(kept.contains), "dropped a member")
    assert(kept.size < 500, s"${kept.size} survivors — fpp far above configured")
  }

  test("contaminatedBloom is a superset of exact contaminated, counts >= exact") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a completely different sentence with no overlap at all here"),
      (3L, "quick brown fox jumps over the lazy dog sleeps now"),
      (4L, "short text")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val exact = Decontam.contaminated(corpus, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontam.contaminatedBloom(corpus, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (id, cnt) =>
      assert(bloom.contains(id), s"bloom missed contaminated doc $id")
      assert(bloom(id) >= cnt, s"bloom hit count below exact for $id")
    }
  }
}
