package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** All-k MinHash signature in ONE native aggregate: buffer = k running
  * minima; update re-hashes the (already xxhash64'd) shingle hash k times
  * with Spark's own XXH64 mix and takes elementwise minima in a tight loop.
  *
  * Bit-identical to the relational formulation it replaces
  * (`min(xxhash64(col("h"), lit(j)))` for j = 1..k — i.e.
  * `XXH64.hashInt(j, XXH64.hashLong(h, 42))`, spec-asserted), but:
  *  - the outer hash `hashLong(h, seed)` is computed ONCE per row instead of
  *    k times (the k column expressions each re-fold from the seed);
  *  - the aggregate is one buffer object instead of k independent min
  *    aggregates, so the generated update path is a short loop rather than a
  *    k-branch generated method (the 64-agg form JIT-compiled for seconds on
  *    first use — the dominant cost of cold minhash runs);
  *  - partial/final merge is an elementwise-min over two long arrays,
  *    exactly as combinable map-side as the built-in min.
  */
case class MinHashSignature(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var j = 1
      while (j <= k) {
        val m = XXH64.hashInt(j, h1)
        if (m < buffer(j - 1)) buffer(j - 1) = m
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSignature =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-facing constructor over a LongType shingle-hash column. */
  def minhashSig(h: Column, k: Int): Column =
    Bridge.column(
      MinHashSignature(Bridge.expression(h), k).toAggregateExpression())
}
