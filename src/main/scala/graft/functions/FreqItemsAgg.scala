package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) sketch as a native Catalyst aggregate over
  * `org.apache.datasketches.frequencies.ItemsSketch` — the 100 TB answer to
  * "top values of this column" when an exact `groupBy(col).count` shuffle of
  * the full distinct domain is unaffordable. Space is fixed (`maxMapSize`
  * counters); partials serialize the sketch bytes and merge associatively,
  * so map-side combine applies just like the t-digest and HLL++ aggregates
  * in the same wide stats pass.
  *
  * Determinism contract: while the stream stays under the sketch capacity
  * the counts are EXACT and order-independent. Beyond capacity the sketch
  * guarantees `estimate >= true count` and `estimate - true <= maximumError`
  * but estimates become partition-order dependent — callers that need a
  * byte-stable result at any scale (driver oracle entries) must stay in the
  * exact regime or compare with tolerance (the spec does both).
  */
case class FreqItems(
    child: Expression,
    k: Int,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(
      buffer: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    if (!other.isEmpty) buffer.merge(other)
    buffer
  }

  /** Top-k rows without false negatives, ordered (estimate desc, item asc)
    * so the exact regime is fully deterministic.
    */
  override def eval(buffer: ItemsSketch[String]): Any = {
    if (buffer.isEmpty) return new GenericArrayData(Array.empty[Any])
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map(r => InternalRow(UTF8String.fromString(r.getItem), r.getEstimate))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  // constructed per call: the serde class is not java.io.Serializable and
  // this Expression ships to executors
  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def withNewMutableAggBufferOffset(offset: Int): FreqItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FreqItems =
    copy(child = newChild)
}

object FreqItems {
  /** Column-facing constructor: `freqItems($"tool", 10)`. */
  def freqItems(c: Column, k: Int, maxMapSize: Int = 256): Column =
    Bridge.column(
      FreqItems(Bridge.expression(c.cast("string")), k, maxMapSize)
        .toAggregateExpression())
}
