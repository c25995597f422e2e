package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Packing, Sampling}

/** Sequence packing (two-phase prefix sum) + per-group weighted sampling.
  * The load-bearing invariant: the segmented distributed prefix sum is
  * row-identical to the naive single-reducer window for EVERY segment size,
  * on any partitioning — that equivalence is what licenses the scalable
  * plan shape at 10^12 rows.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // sparse, shuffled ids (packing must not assume density), weights
  // spanning 0 .. 3x budget so docs straddle packs
  private val rows: Seq[(Long, Long)] =
    rnd.shuffle((0 until 500).map(i => i.toLong * 3 + (i % 2)).toVector)
      .map(id => id -> rnd.nextInt(3000).toLong)
  private val budget = 1000L

  private def naive(): Map[Long, (Long, Long)] = {
    // driver-side reference: exclusive cumsum in id order
    var cum = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val r = id -> ((cum, cum / budget)); cum += w; r
    }.toMap
  }

  test("packByBudget matches the naive global cumsum for many segment sizes") {
    val expected = naive()
    val df = rows.toDF("id", "w")
    for (segSize <- Seq(1L, 7L, 64L, 1L << 20)) {
      val got = Packing.packByBudget(df, "id", "w", budget, segSize)
        .select("id", "cum_before", "pack_id")
        .as[(Long, Long, Long)].collect()
      assert(got.length === rows.size, s"segSize $segSize")
      got.foreach { case (id, cum, pack) =>
        assert((cum, pack) === expected(id), s"id $id at segSize $segSize")
      }
    }
  }

  test("packByBudget is invariant under repartitioning") {
    val df = rows.toDF("id", "w")
    val a = Packing.packByBudget(df, "id", "w", budget, 64L)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    val b = Packing.packByBudget(df.repartition(7), "id", "w", budget, 64L)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("null weights count as zero; oversized docs start their own region") {
    val df = Seq(
      (1L, Some(300L)), (2L, None), (3L, Some(2500L)), (4L, Some(100L)))
      .toDF("id", "w")
    val got = Packing.packByBudget(df, "id", "w", 1000L, 2L)
      .select("id", "cum_before", "pack_id")
      .as[(Long, Long, Long)].collect()
      .map { case (id, cum, pack) => id -> ((cum, pack)) }.toMap
    // cum: 0, 300, 300, 2800 → packs 0, 0, 0, 2 (doc 3 straddles 0→2)
    assert(got === Map(1L -> ((0L, 0L)), 2L -> ((300L, 0L)),
      3L -> ((300L, 0L)), 4L -> ((2800L, 2L))))
  }

  test("packManifest accounts for every document and flags overflow packs") {
    val df = rows.toDF("id", "w")
    val packed = Packing.packByBudget(df, "id", "w", budget, 64L)
    val man = packed.groupBy().agg(count(lit(1))).as[Long].head()
    val m = Packing.packManifest(packed, "w", budget)
    val (nDocs, totW) = m.agg(sum("n_docs"), sum("total_w"))
      .as[(Long, Long)].head()
    assert(nDocs === man && nDocs === rows.size.toLong)
    assert(totW === rows.map(_._2).sum)
    // a pack whose starting doc overflows the budget must show fill > 1
    val overfull = m.filter(col("fill") > 1.0).count()
    assert(overfull > 0, "planted 3x-budget weights must overfill some pack")
  }

  // ---- per-group weighted sampling ----

  private def race(id: Long, w: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val bits = d.take(3).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    math.log((bits + 0.5) / (1 << 24).toDouble) / w
  }

  test("weightedTopKPerGroup matches a driver-side replica of the race") {
    val df = rows.map { case (id, w) => (id % 5, id, w.max(1L)) }
      .toDF("g", "id", "w")
    val got = Sampling.weightedTopKPerGroup(df, "g", "w", "id", 3)
      .select("g", "id").as[(Long, Long)].collect().toSet
    val expected = rows.map { case (id, w) => (id % 5, id, w.max(1L)) }
      .groupBy(_._1).toSeq.flatMap { case (g, members) =>
        members.sortBy { case (_, id, w) => (-race(id, w), id) }
          .take(3).map { case (_, id, _) => (g, id) }
      }.toSet
    assert(got === expected)
    assert(got.size === 15) // 3 winners in each of 5 groups
  }

  test("weightedTopKPerGroup: an overwhelming weight always wins its group") {
    val df = ((0L until 50L).map(id => ("a", id, 1L)) :+ (("a", 999L, 1000000L)))
      .toDF("g", "id", "w")
    val got = Sampling.weightedTopKPerGroup(df, "g", "w", "id", 5)
      .select("id").as[Long].collect().toSet
    assert(got.contains(999L),
      "a 10^6x weight's race key ln(u)/w ~ 0 must beat unit weights")
  }
}
