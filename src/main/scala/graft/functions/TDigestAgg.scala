package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** t-digest quantile sketch as a native Catalyst aggregate
  * (`TypedImperativeAggregate`) over `org.apache.datasketches.tdigest
  * .TDigestDouble` (datasketches-java 6.2.0, already on the Spark
  * classpath). Participates in partial aggregation: partials serialize the
  * sketch bytes (`toByteArray`/`heapify`) and merge with
  * `TDigestDouble.merge`, so the map-side combine the wide stats pass relies
  * on works exactly like the built-in HLL++ `approx_count_distinct`.
  *
  * The only custom Catalyst-adjacent code in the project (SURVEY.md §7.2):
  * every row-level check is built-in `Column` expressions; quantiles are the
  * one aggregate Spark's built-ins don't cover in t-digest form
  * (`percentile_approx` is KLL-ish GK, the north star names t-digest).
  */
case class TDigestQuantiles(
    child: Expression,
    percentiles: Seq[Double],
    k: Short = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestDouble]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k)

  override def update(buffer: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TDigestDouble, other: TDigestDouble): TDigestDouble = {
    if (!other.isEmpty) buffer.merge(other)
    buffer
  }

  override def eval(buffer: TDigestDouble): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(percentiles.map(p => buffer.getQuantile(p)).toArray)

  override def serialize(buffer: TDigestDouble): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  // Input must already be DoubleType — callers cast (see tdigestQuantiles).
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantiles"

  override def withNewMutableAggBufferOffset(offset: Int): TDigestQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantiles =
    copy(child = newChild)
}

object TDigestQuantiles {
  /** Column-facing constructor: `tdigestQuantiles($"x", Seq(0.5, 0.9, 0.99))`. */
  def tdigestQuantiles(c: Column, percentiles: Seq[Double]): Column =
    Bridge.column(
      TDigestQuantiles(Bridge.expression(c.cast("double")), percentiles)
        .toAggregateExpression())
}
