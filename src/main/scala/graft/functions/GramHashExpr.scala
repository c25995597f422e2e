package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Word n-gram hashes as a native compiled expression — the hot inner loop
  * of the decontamination / repetition-signal family ([[graft.ops.Decontam]],
  * [[graft.ops.NgramStats]]).
  *
  * The composed-builtin formulation (`transform(sequence(...), i =>
  * xxhash64(slice(words, i, n)))` — or worse, a concat_ws gram string per
  * position) runs the lambda INTERPRETED: every gram position pays an
  * expression-tree walk plus a slice allocation, ~µs each, which at one gram
  * per word per requested n dominates the whole operator (measured: q120's
  * execution was ~3 s of which ~2.5 s was the gram lambda). This expression
  * hashes each word ONCE (FNV-1a over its UTF-8 bytes), then combines the
  * word hashes per window with a polynomial mix and reads gram char-lengths
  * off a prefix-sum — O(words · |ns|) long arithmetic, no per-gram
  * allocation beyond the output rows.
  *
  * Output: one `struct(n, h, glen)` per (requested n, gram position), in
  * (ns order, position order): `h` is the 64-bit gram hash, `glen` the gram's
  * char length (Σ word chars + n−1 separators — exactly
  * `length(concat_ws(" ", slice(words, i, n)))`, words being whitespace-free
  * by the split contract). Documents with fewer than n words degrade to ONE
  * whole-array gram for that n (the [[graft.ops.Dedup.shinglesOfWords]]
  * convention). The hash is internal matching/grouping state, never exposed:
  * gram equality ⟺ word-sequence equality (modulo 64-bit collision, the
  * same guarantee the xxhash64-of-gram-string form gave), so any consumer
  * that hashes BOTH sides of a match with this expression gets the identical
  * match relation.
  */
case class WordGramHashes(child: Expression, ns: Seq[Int],
    emitShort: Boolean = true)
    extends UnaryExpression {

  require(ns.nonEmpty && ns.forall(_ >= 1), "ns non-empty, all >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false),
      StructField("glen", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_gram_hashes"

  @transient private lazy val nsArr: Array[Int] = ns.toArray

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashes.compute(input.asInstanceOf[ArrayData], nsArr, emitShort)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", nsArr, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordGramHashes.compute($c, $nsRef, " +
        s"$emitShort);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramHashes = copy(child = newChild)
}

object WordGramHashes {

  /** FNV-1a offset basis / prime (public constants). */
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** Odd combiner base for the word-hash polynomial: wraparound
    * multiplication by an odd constant is a bijection, so gram windows
    * differing in one word never collide systematically.
    */
  private final val Base = 0x9e3779b97f4a7c15L | 1L

  private def fnv(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xff)) * FnvPrime; i += 1 }
    h
  }

  /** One pass: word hashes + char-length prefix sums once, then for every
    * requested n one polynomial window combine per position.
    */
  def compute(words: ArrayData, ns: Array[Int], emitShort: Boolean)
      : ArrayData = {
    val sz = words.numElements()
    val wh = new Array[Long](sz)
    val cum = new Array[Long](sz + 1) // cum(i) = chars of words [0, i)
    var i = 0
    while (i < sz) {
      val u = words.getUTF8String(i)
      wh(i) = fnv(u.getBytes)
      cum(i + 1) = cum(i) + u.numChars()
      i += 1
    }
    var total = 0
    var k = 0
    while (k < ns.length) {
      total += (if (sz < ns(k)) { if (emitShort) 1 else 0 }
        else sz - ns(k) + 1)
      k += 1
    }
    val out = new Array[Any](total)
    var o = 0
    k = 0
    while (k < ns.length) {
      val n = ns(k)
      if (sz < n) {
        // whole-array degenerate gram (the shinglesOfWords convention);
        // suppressed when emitShort=false (the NgramStats convention:
        // positions whose window passes the end emit nothing)
        if (emitShort) {
          var h = FnvOffset
          i = 0
          while (i < sz) { h = h * Base + wh(i); i += 1 }
          val glen = if (sz == 0) 0L else cum(sz) + (sz - 1)
          out(o) = new GenericInternalRow(Array[Any](n, h, glen))
          o += 1
        }
      } else {
        var j = 0
        val nG = sz - n + 1
        while (j < nG) {
          var h = FnvOffset
          var m = j
          val end = j + n
          while (m < end) { h = h * Base + wh(m); m += 1 }
          val glen = cum(end) - cum(j) + (n - 1)
          out(o) = new GenericInternalRow(Array[Any](n, h, glen))
          o += 1
          j += 1
        }
      }
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Column-facing constructor. */
  def wordGramHashes(
      words: Column, ns: Seq[Int], emitShort: Boolean = true): Column =
    Bridge.column(WordGramHashes(Bridge.expression(words), ns, emitShort))
}
