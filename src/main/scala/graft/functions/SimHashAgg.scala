package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** 64-bit SimHash as ONE native aggregate: buffer = 64 bit-vote counters;
  * update adds ±1 per bit of the (already xxhash64'd) token hash; eval folds
  * the votes to the signature long (bit i set iff votes(i) > 0).
  *
  * Bit-identical to the relational form it replaced (64 independent
  * `sum(shiftright(h, i) & 1) * 2 - 1` aggregates folded through
  * when(v > 0, 1L << i) — spec-asserted), with the same two wins as
  * [[MinHashSignature]]: a short update loop instead of a 64-branch
  * generated method, and one buffer object with elementwise-add merge
  * (map-side combinable like the built-in sum).
  */
case class SimHash64(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buffer(i) += ((h >> i) & 1L) * 2L - 1L
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (buffer(i) > 0) sim |= 1L << i
      i += 1
    }
    sim
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def withNewMutableAggBufferOffset(offset: Int): SimHash64 =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHash64 =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-facing constructor over a LongType token-hash column. */
  def simhash64(h: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(h)).toAggregateExpression())
}
