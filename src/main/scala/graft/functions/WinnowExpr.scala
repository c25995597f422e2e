package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints as a native codegen expression: the distinct
  * window-minima of a rolling polynomial hash over every k-byte gram — the
  * hot inner loop of span-level dedup ([[graft.ops.SpanDedup]]).
  *
  * The composed-builtin formulation ([[graft.ops.SpanDedup.fingerprints]],
  * kept as the DuckDB-replayable oracle face) pays one md5 per CHARACTER
  * plus an O(w) `array_min(slice(...))` per window — ~O(n·(md5 + w)) with
  * n substring allocations per document. This expression is the textbook
  * O(n) replacement: a Rabin-Karp rolling hash (one multiply-add-subtract
  * per byte, 64-bit wraparound arithmetic) feeding a monotonic deque
  * (each gram enters and leaves the deque at most once), emitting a
  * fingerprint only when the window minimum CHANGES — the winnowing paper's
  * own observation that consecutive windows usually share their minimum
  * (expected density 2/(w+1)). Output order is ascending-distinct, the
  * same set contract as the builtin face's `array_distinct`.
  *
  * Semantics note: grams are k BYTES of UTF-8 (the builtin face hashes k
  * CHARS through md5), so the two faces are different fingerprint families
  * with the same structural guarantee — any shared verbatim span of
  * ≥ k + w − 1 bytes/chars yields ≥ 1 shared fingerprint. On ASCII text
  * the gram boundaries coincide and WinnowSpec asserts the two faces find
  * the IDENTICAL duplicate-pair set on a planted corpus. Hashes are masked
  * to 63 bits (non-negative long) purely so downstream SQL comparisons
  * never meet Long.MinValue edge cases.
  *
  * Scale: map-only, one pass, O(w + output) working memory per row —
  * no per-gram allocation at all (the deque and ring buffer are reused
  * across the row via a ThreadLocal scratch). At 10^12 rows this is the
  * difference between the fingerprint stage costing ~a scan and costing
  * 50× a scan (measured A/B in PLANS.md).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "k > 0, w > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.winnow($c, $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {

  /** Odd 64-bit base (the FNV-1a prime): wraparound multiplication is a
    * bijection for odd multipliers, so grams differing in one byte never
    * collide systematically.
    */
  private final val Base = 0x100000001b3L

  /** Per-thread scratch (deque positions + ring of hashes + output buffer)
    * so the per-row fast path allocates nothing but the result array.
    */
  private final class Scratch {
    var deqPos: Array[Int] = new Array[Int](64)
    var deqHash: Array[Long] = new Array[Long](64)
    var out: Array[Long] = new Array[Long](64)
    def ensureDeq(n: Int): Unit = if (deqPos.length < n) {
      deqPos = new Array[Int](n); deqHash = new Array[Long](n)
    }
    def growOut(used: Int): Unit = if (used == out.length)
      out = java.util.Arrays.copyOf(out, used * 2)
  }

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  private final val Empty = new GenericArrayData(Array.emptyLongArray)

  /** One-pass winnow over the UTF-8 bytes of `s`: rolling k-byte hash →
    * sliding-w minimum via monotonic deque → emit on min change →
    * sort + dedupe. Shorter-than-one-window docs emit the min of their
    * grams; docs under k bytes emit nothing.
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return Empty
    val nGrams = n - k + 1

    // B^(k-1) for the leading-byte removal
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= Base; i += 1 }

    val sc = scratch.get()
    // the deque never holds more than w+1 live entries — ring-indexed so
    // head/tail can stay flat monotone counters
    val cap = math.min(nGrams, w) + 1
    sc.ensureDeq(cap)
    val deqPos = sc.deqPos
    val deqHash = sc.deqHash
    var head = 0 // deque front (flat counter, ring-indexed mod cap)
    var tail = 0 // one past back (flat counter, ring-indexed mod cap)
    var outN = 0

    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }

    var lastEmitted = Long.MinValue // sentinel: first window always emits
    var lastPos = -1
    var g = 0 // gram index
    while (g < nGrams) {
      if (g > 0) {
        h = (h - (bytes(g - 1) & 0xff) * bk) * Base + (bytes(g + k - 1) & 0xff)
      }
      val hv = h & 0x7fffffffffffffffL
      // monotonic deque: evict larger-or-equal from the back (keeping the
      // RIGHTMOST minimal gram, the robust-winnowing tie rule), expire the
      // front when it slides out of [g-w+1, g]
      while (tail > head && deqHash((tail - 1) % cap) >= hv) tail -= 1
      deqPos(tail % cap) = g; deqHash(tail % cap) = hv; tail += 1
      if (deqPos(head % cap) <= g - w) head += 1
      // a window ends at g once g >= w-1; short docs (< w grams) emit
      // their single overall min at the last gram
      if (g >= w - 1 || g == nGrams - 1) {
        val mv = deqHash(head % cap)
        val mp = deqPos(head % cap)
        if (mp != lastPos || mv != lastEmitted) {
          sc.growOut(outN)
          sc.out(outN) = mv
          outN += 1
          lastEmitted = mv; lastPos = mp
        }
      }
      g += 1
    }

    // ascending distinct (the emit-on-change stream can repeat a VALUE at
    // different positions)
    val buf = java.util.Arrays.copyOf(sc.out, outN)
    java.util.Arrays.sort(buf)
    var m = 0
    i = 0
    while (i < outN) {
      if (m == 0 || buf(i) != buf(m - 1)) { buf(m) = buf(i); m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, m))
  }

  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c.cast("string")), k, w))
}
