package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter set membership as a native aggregate + scalar pair, for
  * membership screens where the reference set is too large to broadcast as
  * an exact join hash table (a 10⁹-gram eval-suite union, a prior crawl's
  * doc-hash set): the filter is 10-20× smaller than the equivalent
  * broadcast-join relation at a chosen false-positive rate, and membership
  * tests stay map-side.
  *
  * [[BloomFilterAgg]] builds the filter distributed (per-partition filters
  * OR-merge in partial aggregation — `spark.util.sketch.BloomFilter` bit
  * arrays merge losslessly), evaluating to the serialized bytes.
  * [[BloomMightContainLong]] tests a long column against a driver-held
  * filter inside whole-stage codegen (`addReferenceObj`, same mechanism as
  * Spark's injected runtime filters — no UDF, no per-row boxing).
  *
  * False positives are one-sided: a bloom screen may PASS extra rows, never
  * drop real members — callers either tolerate the FPP (decontamination
  * over-flagging is safe) or re-verify survivors exactly.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_filter_agg"

  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

object BloomFilterAgg {
  /** `bloomFilterAgg($"h", 1_000_000, 0.01)` — input must be LongType. */
  def bloomFilterAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    Bridge.column(
      BloomFilterAgg(Bridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** Membership test against a fixed (driver-built) bloom filter; ships to
  * executors as a codegen reference object. `BloomFilter` is Serializable,
  * so the task closure carries the bit array once per executor, not per row.
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomMightContainLong {
  def bloomMightContain(c: Column, filter: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), filter))
}
