package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-name registration for the engine's custom expressions so
  * `spark.sql("SELECT cosine_similarity(a, b) …")` works alongside the
  * Column API (SURVEY.md §2.11 surface).
  */
object Registry {
  private def binary(name: String)(
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { es =>
    require(es.length == 2,
      s"$name expects exactly 2 arguments, got ${es.length}")
    f(es(0), es(1))
  }

  def registerAll(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Bridge.registerFunction(classic, "cosine_similarity",
      binary("cosine_similarity")(CosineSimilarity(_, _)))
    Bridge.registerFunction(classic, "dot_product",
      binary("dot_product")(DotProduct(_, _)))
    Bridge.registerFunction(classic, "tdigest_quantiles",
      es => TDigestQuantiles(
        es.head,
        // percentiles as a literal array argument, default p50/p90/p99
        es.lift(1).map(e =>
          e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toDoubleArray().toSeq).getOrElse(Seq(0.5, 0.9, 0.99)))
        .toAggregateExpression())
    Bridge.registerFunction(classic, "freq_items",
      es => FreqItems(
        es.head,
        es.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(10))
        .toAggregateExpression())
  }
}
