package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over a (src, dst) edge table — the web-corpus
  * companion of [[WebText]]'s URL/domain ops: a crawl-scale corpus build
  * ranks domains/documents by link structure (seed selection, spam
  * down-weighting, crawl-frontier priority) before any text is fetched.
  * The reference has no graph surface (one record at a time); this is part
  * of the training-data-pipeline additions from the builder brief.
  *
  * Design: EXACT INTEGER PageRank. Ranks live in ppm longs (initial rank
  * = 10⁶ = "1.0 per node"), each power iteration is
  * `new = (1−d) + d · Σ contrib` computed as
  * `150000 + (85 · Σ) div 100` in pure long arithmetic (d = 0.85 pinned as
  * the 85/100 rational). No doubles anywhere, so the result is
  * order-independent under any partitioning AND bit-identical in the
  * DuckDB twin (q102) — the ppm-family rule (q93/q94) applied to an
  * iterative algorithm, where float drift would otherwise compound per
  * round. Truncation (`div`) loses < 1 ppm per node per round — noise at
  * ranking granularity, and both engines truncate identically.
  *
  * Scale shape:
  *  - per iteration: ONE equi-join of the edge table with the narrow
  *    (node, rank) frame on src, then ONE hash aggregate on dst — both
  *    shuffle 16-byte rows keyed by node id; AQE handles hub skew
  *    (a 10⁸-in-degree hub is a hot aggregate key with map-side partial
  *    combine, never a window).
  *  - out-degrees are computed once, joined once per round (narrow).
  *  - `localCheckpoint` per round truncates the doubling logical plan
  *    (the [[Connected.components]] lesson — Catalyst analysis goes
  *    exponential by round ~4 otherwise); on a cluster this is reliable
  *    `checkpoint` for lineage fault tolerance.
  *  - dangling nodes (no out-edges) keep receiving rank but emit none —
  *    the standard no-redistribution variant; mass is not conserved and
  *    the scaladoc says so (redistribution would need one extra one-row
  *    broadcast sum per round; callers ranking by relative order don't
  *    need it).
  *
  * Overflow: Σ contrib per node is bounded by in_degree · max_rank;
  * `85 · Σ` is computed with the exact quotient/remainder split
  * `85·(Σ div 100) + (85·(Σ mod 100)) div 100` (the q93 technique), so
  * the headroom bound is Σ < 2⁶³/85 ≈ 1.08e17 ppm — an in-degree of
  * ~10¹¹ at typical ranks before saturation, far past any real hub at
  * 10¹² documents.
  */
object Graph {

  /** @param edges (srcCol, dstCol) long-keyed directed edges; duplicate
    *              edges count twice (pre-`distinct()` them to collapse)
    * @param iters power-iteration rounds (fixed count — rank ordering
    *              stabilizes in a handful of rounds; convergence testing
    *              would cost a driver action per round)
    * @return (node, rank_ppm) for every node appearing in `edges`
    */
  def pagerankInt(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters in [1, 50]")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)

    var rank = nodes.select(col("node"), lit(1000000L).as("rank_ppm"))
    var i = 0
    while (i < iters) {
      i += 1
      val contrib = e
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("rank_ppm div deg").as("__c"))
        .groupBy("node")
        .agg(sum("__c").as("__s"))
      // the round-1 frame is a plain select over `nodes`, not checkpointed —
      // only superseded checkpoints are dropped (the Bpe.learnMerges rule:
      // unpersist AFTER the new round materializes, so at most two (node,
      // rank) copies ever coexist instead of `iters` accumulating)
      val prev = if (i > 1) Some(rank) else None
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + when(col("__s").isNull, lit(0L)).otherwise(
            lit(85L) * expr("__s div 100") +
              expr("(85 * (__s % 100)) div 100"))).as("rank_ppm"))
        .localCheckpoint(true)
      prev.foreach(_.unpersist())
    }
    rank
  }
}
