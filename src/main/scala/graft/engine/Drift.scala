package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between partitions (SURVEY.md §2.5 drift
  * row): Pearson chi-square of each partition's categorical frequency vector
  * (role or tool) against the pooled table, in pure `Column` arithmetic — no
  * UDF, no MLlib dependency.
  *
  * Only the first `groupBy(part_id, col)` touches big data (and it partial-
  * aggregates map-side to ≤ parts × |vocab| rows); everything after operates
  * on that tiny contingency table, including the parts × vocab cross join
  * that restores zero cells (a category absent from a partition still
  * contributes its expected count).
  */
object Drift {

  /** Per-partition chi-square statistic over `category` frequencies.
    * Output: (part_id, chi2, dof, n, drifted).
    */
  def chiSquare(
      df: DataFrame,
      category: String,
      threshold: Double = 30.0): DataFrame = {
    val counts = df
      .groupBy(col("part_id"), coalesce(col(category), lit("__null__")).as("cat"))
      .agg(count(lit(1)).as("o"))
    val rowTot = counts.groupBy("part_id").agg(sum("o").as("r"))
    val colTot = counts.groupBy("cat").agg(sum("o").as("c"))
    val grand = counts.agg(sum("o").as("g"))

    rowTot
      .crossJoin(broadcast(colTot))
      .join(counts, Seq("part_id", "cat"), "left_outer")
      .crossJoin(broadcast(grand))
      .withColumn("e", col("r") * col("c") / col("g"))
      .withColumn("term",
        pow(coalesce(col("o"), lit(0L)) - col("e"), 2) / col("e"))
      .groupBy("part_id")
      .agg(
        sum("term").as("chi2"),
        (count(lit(1)) - 1).as("dof"),
        max("r").as("n"))
      .withColumn("drifted", col("chi2") > threshold)
  }

  /** Population Stability Index of each partition's category distribution
    * against the pooled table: Σ (p − q)·ln(p/q), proportions floored at
    * `eps` so zero cells contribute finitely (the standard PSI smoothing).
    * Same shuffle shape as [[chiSquare]]: one big groupBy, then arithmetic
    * on the tiny contingency table. Common reading: < 0.1 stable, 0.1–0.25
    * moderate, > 0.25 drifted.
    */
  def psi(
      df: DataFrame,
      category: String,
      threshold: Double = 0.25,
      eps: Double = 1e-6): DataFrame = {
    val counts = df
      .groupBy(col("part_id"), coalesce(col(category), lit("__null__")).as("cat"))
      .agg(count(lit(1)).as("o"))
    val rowTot = counts.groupBy("part_id").agg(sum("o").as("r"))
    val colTot = counts.groupBy("cat").agg(sum("o").as("c"))
    val grand = counts.agg(sum("o").as("g"))
    rowTot
      .crossJoin(broadcast(colTot))
      .join(counts, Seq("part_id", "cat"), "left_outer")
      .crossJoin(broadcast(grand))
      .withColumn("p", greatest(coalesce(col("o"), lit(0L)) / col("r"), lit(eps)))
      .withColumn("q", greatest(col("c") / col("g"), lit(eps)))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy("part_id")
      .agg(sum("term").as("psi"), max("r").as("n"))
      .withColumn("drifted", col("psi") > threshold)
  }
}
