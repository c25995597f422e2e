package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step that turns
  * near-duplicate PAIRS (minhash/simhash/cosine output) into duplicate
  * GROUPS with one canonical keeper per group. The reference resolves
  * `@id` references one record at a time (`/root/reference/src/core/models.py:282`);
  * at corpus scale the same "resolve everything reachable" semantics is a
  * connected-components problem.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). Each round is
  * two narrow (node, node) shuffles; converges in O(log n) rounds even on
  * chain graphs (where naive min-label propagation needs O(diameter) rounds).
  * No driver-side graph state — the driver loop only compares a (count,
  * hash-sum) fingerprint per round for convergence.
  *
  * Scale notes: edge rows are two longs — the shuffles stay tiny relative
  * to any text/dedup stage that produced the pairs; every round's result is
  * persisted and the previous round unpersisted, so peak footprint is two
  * edge sets; lineage is truncated with localCheckpoint every few rounds so
  * the plan does not grow across iterations (on a cluster this would be
  * `checkpoint` to the reliable store).
  */
object Connected {

  /** Canonical undirected edge form: (a, b) with a > b, self-loops dropped,
    * duplicates collapsed. Input columns must be two numeric id columns
    * named `a` and `b`.
    */
  private def canonical(e: DataFrame): DataFrame =
    e.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Large-star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). Output keeps the
    * a > b invariant: emitted (v, m) has v > u >= m.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .unionAll(e.select(col("b").as("u"), col("a").as("v")))
    val mins = adj.groupBy("u")
      .agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    adj.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Small-star: every node connects its smaller neighbors (and itself) to
    * the minimum of those. Input/output both hold the a > b invariant.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("a").agg(min(col("b")).as("m"))
    val moved = e.join(mins, "a")
      .select(col("b").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
    val self = mins.select(col("a"), col("m").as("b"))
    moved.unionAll(self).distinct()
  }

  /** Component assignment for every node that appears in `edges` (cols
    * `a`, `b`): returns (id, component) where component = min node id
    * reachable. Nodes with no edges are the caller's to union in (they are
    * their own component and never entered the edge list).
    */
  def components(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // localCheckpoint each round: a round is ~6 nested operators, so the
    // un-truncated logical plan doubles per iteration and Catalyst analysis
    // goes exponential by round ~4 (measured: minutes on a 500-edge input).
    // Eager checkpoint materializes the (tiny, two-long) edge rows and
    // resets the plan to a scan. On a cluster this would be reliable
    // `checkpoint` for fault tolerance.
    var e = canonical(edges).localCheckpoint(true)
    var fp = fingerprint(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nfp = fingerprint(next)
      e.unpersist()
      e = next
      converged = nfp == fp
      fp = nfp
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    // At the fixpoint the edge set is a forest of stars: (child, root).
    e.select(col("a").as("id"), col("b").as("component"))
      .unionAll(e.select(col("b").as("id"), col("b").as("component")))
      .distinct()
  }

  /** Cheap deterministic edge-set fingerprint for the convergence test:
    * (row count, xor of per-edge hashes). Order-independent, overflow-free
    * under ANSI mode (a long `sum` of hashes can overflow and throw).
    */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("a"), col("b"))), lit(0L)).as("h"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Duplicate-group resolution: given near-dup pairs (id_a, id_b, …) and
    * the full corpus keyed by `keyCol`, returns every document with its
    * `cluster_id` (min reachable id; singletons cluster to themselves) and
    * `is_keeper` — the boolean a dedup pipeline filters on.
    */
  def dedupClusters(
      corpus: DataFrame,
      pairs: DataFrame,
      keyCol: String): DataFrame = {
    val comp = components(
      pairs.select(col("id_a").as("a"), col("id_b").as("b")))
    corpus.select(col(keyCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("cluster_id"))
      .withColumn("is_keeper", col("id") === col("cluster_id"))
  }

  /** Quality-ranked duplicate resolution — the "dedup apply" step: like
    * [[dedupClusters]] but the keeper is the BEST document per cluster
    * (max `rankCol`, ties to the smallest id), not the smallest id. This is
    * what a corpus build actually wants: near-dup groups keep their
    * highest-quality member, not their numerically-first one.
    *
    * Skew note: keeper selection is `max(struct(rank, -id))` — a partial
    * aggregate (map-side combine), so an adversarial corpus where one
    * cluster swallows millions of documents never materializes on a single
    * task the way a per-cluster `row_number` window would. Only narrow
    * (id, cluster, rank) rows shuffle; text never enters.
    */
  def keepBestClusters(
      corpus: DataFrame,
      pairs: DataFrame,
      keyCol: String,
      rankCol: String): DataFrame = {
    val comp = components(
      pairs.select(col("id_a").as("a"), col("id_b").as("b")))
    val withComp = corpus.select(col(keyCol).as("id"), col(rankCol))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("cluster_id"), col(rankCol))
    val winners = withComp.groupBy("cluster_id")
      .agg(max(struct(col(rankCol).as("r"), (-col("id")).as("negid"))).as("w"))
      .select(col("cluster_id"), (-col("w.negid")).as("keep_id"))
    withComp.join(winners, "cluster_id")
      .select(col("id"), col("cluster_id"), col(rankCol),
        (col("id") === col("keep_id")).as("is_keeper"))
  }
}
