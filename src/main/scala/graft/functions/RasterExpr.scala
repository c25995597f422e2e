package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pixel stats for the UNCOMPRESSED raster formats (BMP 24-bit BI_RGB
  * bottom-up, PPM P6, PGM P5) as a fused codegen Expression — the third
  * sibling of [[PngPixelStats]] and [[GifPixelStats]], emitting the same
  * struct shape.
  *
  * This replaced a pure-column-expression implementation (nested
  * `aggregate(sequence(...))` folds per channel, round 1-3; preserved in
  * git history and PLANS.md) for two measured reasons: the 18-fold
  * expression tree cost 8-11 s of driver-side ANALYSIS per query — paid on
  * every planted-decode bench entry at any data size — and each image's
  * evaluation materialized O(n_pixels) sequence arrays per channel instead
  * of one compiled loop over the raw bytes. Semantics are byte-identical
  * to the column path (same guards, same `round(x,4)` HALF_UP, same
  * histogram binning); the OpsSpec exact-value tests and the q66 analytic
  * oracle pin that equivalence.
  *
  * Honest nulls, never throws: non-raster signatures, 16/32-bit or
  * compressed BMP, top-down BMP (negative height reads as a huge unsigned
  * — over the cap), PNM maxval > 255 or comment-bearing headers,
  * truncated payloads, and over-`maxPixels` dims all return null.
  */
case class RasterPixelStats(child: Expression, histBins: Int, maxPixels: Int)
    extends UnaryExpression {

  override def dataType: DataType = PngDecode.statsType(histBins)
  override def nullable: Boolean = true
  override def prettyName: String = "raster_pixel_stats"

  override protected def nullSafeEval(input: Any): Any =
    RasterDecode.stats(input.asInstanceOf[Array[Byte]], histBins, maxPixels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RasterDecode.stats($c, $histBins, $maxPixels);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RasterPixelStats = copy(child = newChild)
}

object RasterPixelStats {
  def rasterPixelStats(media: Column, histBins: Int, maxPixels: Int): Column =
    Bridge.column(RasterPixelStats(Bridge.expression(media), histBins, maxPixels))
}

object RasterDecode {

  private def u8(b: Byte): Int = b & 0xff

  private def le32(a: Array[Byte], off: Int): Long =
    (u8(a(off)).toLong | (u8(a(off + 1)).toLong << 8) |
      (u8(a(off + 2)).toLong << 16) | (u8(a(off + 3)).toLong << 24)) & 0xffffffffL

  private def le16(a: Array[Byte], off: Int): Int =
    u8(a(off)) | (u8(a(off + 1)) << 8)

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Same anchored header pattern the column path used: binary P6/P5,
    * whitespace-separated dims (≤7 digits) and maxval (≤3 digits), no
    * comment lines. Applied to a bounded latin-1 prefix — headers are a
    * few dozen bytes; pixel data must not be scanned.
    */
  private val pnmHdr =
    java.util.regex.Pattern.compile("^P([56])\\s+(\\d{1,7})\\s+(\\d{1,7})\\s+(\\d{1,3})\\s")

  def stats(bytes: Array[Byte], histBins: Int, maxPixels: Int): InternalRow =
    try decode(bytes, histBins, maxPixels)
    catch { case _: Exception => null }

  private def decode(
      bytes: Array[Byte], histBins: Int, maxPixels: Int): InternalRow = {
    if (bytes == null || bytes.length < 2) return null
    if (bytes(0) == 'B' && bytes(1) == 'M') bmp(bytes, histBins, maxPixels)
    else if (bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6'))
      pnm(bytes, histBins, maxPixels)
    else null
  }

  /** Accumulate one pixel's channels and emit the shared struct. */
  private final class Acc(histBins: Int) {
    var sr = 0L; var sg = 0L; var sb = 0L
    val hr = new Array[Long](histBins)
    val hg = new Array[Long](histBins)
    val hb = new Array[Long](histBins)
    def add(rv: Int, gv: Int, bv: Int): Unit = {
      sr += rv; sg += gv; sb += bv
      hr(rv * histBins / 256) += 1
      hg(gv * histBins / 256) += 1
      hb(bv * histBins / 256) += 1
    }
    def row(format: String, n: Long): InternalRow = {
      val nd = n.toDouble
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(format), n,
        round4(sr / nd), round4(sg / nd), round4(sb / nd),
        new GenericArrayData(hr), new GenericArrayData(hg),
        new GenericArrayData(hb)))
    }
  }

  /** BMP: 24-bit BI_RGB only; pixel array at the LE offset stored at byte
    * 10, rows of width·3 BGR bytes padded to 4-byte boundaries. A top-down
    * BMP stores height negative → reads as a huge unsigned → over the cap
    * → null, exactly like the column path.
    */
  private def bmp(bytes: Array[Byte], histBins: Int, maxPixels: Int): InternalRow = {
    if (bytes.length < 34) return null
    val off = le32(bytes, 10)
    val w = le32(bytes, 18)
    val h = le32(bytes, 22)
    if (le16(bytes, 28) != 24 || le32(bytes, 30) != 0L) return null
    if (w < 1 || h < 1 || w > maxPixels || h > maxPixels) return null
    val n = w * h // both ≤ 2^30: no overflow
    if (n > maxPixels) return null
    val rowBytes = (w * 3 + 3) / 4 * 4
    if (off + h * rowBytes > bytes.length) return null
    val acc = new Acc(histBins)
    val wi = w.toInt; val hi = h.toInt
    var y = 0
    while (y < hi) {
      var p = (off + y.toLong * rowBytes).toInt
      var x = 0
      while (x < wi) {
        acc.add(u8(bytes(p + 2)), u8(bytes(p + 1)), u8(bytes(p))) // BGR
        p += 3; x += 1
      }
      y += 1
    }
    acc.row("bmp24", n)
  }

  /** PPM (P6) / PGM (P5), binary, maxval ≤ 255: raw RGB triples (resp.
    * single gray bytes, reported on all three channels) after the matched
    * header.
    */
  private def pnm(bytes: Array[Byte], histBins: Int, maxPixels: Int): InternalRow = {
    val pfxLen = math.min(bytes.length, 64)
    val hdr = new String(bytes, 0, pfxLen, java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = pnmHdr.matcher(hdr)
    if (!m.find()) return null
    val isPpm = m.group(1) == "6"
    val w = m.group(2).toLong
    val h = m.group(3).toLong
    val maxval = m.group(4).toInt
    if (maxval > 255 || w < 1 || h < 1 || w > maxPixels || h > maxPixels) return null
    val n = w * h
    if (n > maxPixels) return null
    val dataOff = m.end()
    val need = if (isPpm) n * 3 else n
    if (dataOff + need > bytes.length) return null
    val acc = new Acc(histBins)
    val ni = n.toInt
    var i = 0
    if (isPpm) {
      var p = dataOff
      while (i < ni) {
        acc.add(u8(bytes(p)), u8(bytes(p + 1)), u8(bytes(p + 2)))
        p += 3; i += 1
      }
      acc.row("ppm", n)
    } else {
      while (i < ni) {
        val v = u8(bytes(dataOff + i))
        acc.add(v, v, v)
        i += 1
      }
      acc.row("pgm", n)
    }
  }
}
