package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch shapes, and
  * the column wiring are exactly what a production pipeline needs. Header
  * metadata (format, width, height) is decoded for REAL from the blob bytes
  * by [[imageHeaderMeta]] — pure column expressions, no codec libraries.
  * Only the pixel-level feature extraction is a **STUB**: this container has
  * no image/audio libraries, so `fakeDecodeFeatures` derives deterministic
  * pseudo-features from the bytes (clearly marked; swap in a real decoder
  * via mapInPandas on a cluster with the codec libs installed).
  */
object Multimodal {

  /** REAL image-header decode: container format + pixel dimensions parsed
    * from the leading bytes with pure built-in column expressions
    * (`substring`+`hex`+`conv` — codegen'd, no UDF, no codec library):
    *
    *  - PNG: 8-byte signature, then IHDR — width/height are 4-byte
    *    big-endian ints at offsets 16/20.
    *  - GIF (87a/89a): logical-screen width/height are 2-byte
    *    LITTLE-endian ints at offsets 6/8.
    *  - JPEG: SOI then marker segments; dimensions live in the first SOFn
    *    (FF C0..C3) segment — height/width big-endian at payload offsets
    *    3/5. The marker is located via a latin-1 byte view (1:1 char↔byte)
    *    + `instr`; a FF Cn byte pair inside a preceding segment could
    *    false-positive, which is the standard header-sniff tradeoff.
    *
    * Unknown/truncated blobs → format "unknown", null dimensions.
    */
  def imageHeaderMeta(media: Column): Column = {
    // big-endian unsigned int from a byte slice (1-based pos)
    def be(pos: Int, len: Int): Column =
      conv(hex(substring(media, pos, len)), 16, 10).cast("int")
    val isPng = hex(substring(media, 1, 8)) === "89504E470D0A1A0A"
    val isGif = hex(substring(media, 1, 6))
      .isin("474946383761", "474946383961") // GIF87a / GIF89a
    val isJpeg = hex(substring(media, 1, 2)) === "FFD8"
    // latin-1 view: chars map 1:1 to bytes, so instr/substr address bytes
    val s = decode(media, "ISO-8859-1")
    def byteAt(p: Column): Column = ascii(s.substr(p, lit(1)))
    val sofPos = Seq('À', 'Á', 'Â', 'Ã')
      .map(m => instr(s, s"ÿ$m"))
      .map(p => when(p > 0, p)) // least() skips nulls
      .reduce(least(_, _))
    val jpegH = byteAt(sofPos + 5) * 256 + byteAt(sofPos + 6)
    val jpegW = byteAt(sofPos + 7) * 256 + byteAt(sofPos + 8)
    val gifW = be(7, 1) + be(8, 1) * 256
    val gifH = be(9, 1) + be(10, 1) * 256
    struct(
      when(isPng, "png").when(isGif, "gif").when(isJpeg, "jpeg")
        .otherwise("unknown").as("format"),
      when(isPng, be(17, 4)).when(isGif, gifW)
        .when(isJpeg && sofPos.isNotNull, jpegW.cast("int"))
        .otherwise(lit(null).cast("int")).as("width"),
      when(isPng, be(21, 4)).when(isGif, gifH)
        .when(isJpeg && sofPos.isNotNull, jpegH.cast("int"))
        .otherwise(lit(null).cast("int")).as("height"))
  }

  /** REAL audio-header decode, same pure-column-expression approach as
    * [[imageHeaderMeta]] (no codec libraries):
    *
    *  - WAV: RIFF container ("RIFF" @1, "WAVE" @9); in the canonical
    *    fmt-chunk-first layout ("fmt " @13) channels / sample rate / bits
    *    per sample are little-endian ints at offsets 23 / 25 / 35. A
    *    non-canonical chunk order (rare: LIST before fmt) surfaces nulls —
    *    the standard header-sniff tradeoff, as with JPEG SOFn.
    *  - OGG ("OggS") and MP3 ("ID3" tag or FFEx/FFFx frame sync): format
    *    identified; rate extraction needs frame bit-unpacking, left null.
    *
    * Unknown/truncated blobs → format "unknown", null fields.
    */
  def audioHeaderMeta(media: Column): Column = {
    // little-endian unsigned int from a byte slice (1-based pos)
    def le(pos: Int, len: Int): Column =
      (0 until len).map(i =>
        conv(hex(substring(media, pos + i, 1)), 16, 10).cast("long") *
          (1L << (8 * i))).reduce(_ + _)
    val isWav = (hex(substring(media, 1, 4)) === "52494646") && // "RIFF"
      (hex(substring(media, 9, 4)) === "57415645")              // "WAVE"
    val fmtFirst = hex(substring(media, 13, 4)) === "666D7420" // "fmt "
    val isOgg = hex(substring(media, 1, 4)) === "4F676753"     // "OggS"
    val isId3 = hex(substring(media, 1, 3)) === "494433"       // "ID3"
    val isSync = (hex(substring(media, 1, 1)) === "FF") &&
      substring(hex(substring(media, 2, 1)), 1, 1).isin("E", "F")
    val isMp3 = isId3 || isSync
    val wavField = (pos: Int, len: Int) =>
      when(isWav && fmtFirst, le(pos, len).cast("int"))
        .otherwise(lit(null).cast("int"))
    struct(
      when(isWav, "wav").when(isOgg, "ogg").when(isMp3, "mp3")
        .otherwise("unknown").as("format"),
      wavField(23, 2).as("channels"),
      wavField(25, 4).as("sample_rate"),
      wavField(35, 2).as("bits_per_sample"))
  }

  /** Wrap a text table into a media table: (key, kind, media BINARY,
    * meta STRUCT<byte_len, format, width, height>). Stands in for reading
    * real blobs; the binary column round-trips Parquet losslessly. The meta
    * struct is decoded from the actual bytes by [[imageHeaderMeta]] (text
    * blobs honestly surface as format "unknown" with null dimensions).
    */
  def packFromText(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val media = coalesce(col(textCol), lit("")).cast("binary")
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(col(keyCol)), lit(3)) + 1).cast("int"))
    val hdr = imageHeaderMeta(media)
    df.select(
      col(keyCol).as("media_id"),
      kind.as("kind"),
      media.as("media"),
      struct(
        length(media).as("byte_len"),
        hdr.getField("format").as("format"),
        hdr.getField("width").as("width"),
        hdr.getField("height").as("height")).as("meta"))
  }

  /** STUB decode → feature vector: deterministic pseudo-features from the
    * raw bytes (`xxhash64(media, i)` per dimension, scaled to [0,1)). A real
    * deployment replaces exactly this expression with the decoder; everything
    * upstream/downstream (schema `array<double>`, partitioning, the ANN ops
    * in [[Similarity]]) is unchanged.
    */
  def fakeDecodeFeatures(media: Column, dim: Int = 64): Column =
    transform(
      sequence(lit(1), lit(dim)),
      i => pmod(xxhash64(media, i), lit(100000)).cast("double") / 100000.0)

  /** Frame sampling: n evenly spaced byte-window "frames" from the blob —
    * the batch-shape plumbing of video frame extraction (real decoder would
    * emit actual frames; offsets/stride logic is identical).
    */
  def frameSample(media: Column, n: Int = 4, frameBytes: Int = 32): Column = {
    val len = greatest(length(media), lit(1))
    transform(
      sequence(lit(0), lit(n - 1)),
      i =>
        struct(
          i.as("frame_no"),
          (i * len / n).as("offset"),
          call_function("substring", media, i * len / n + 1, lit(frameBytes))
            .as("frame")))
  }

  /** Full multimodal feature pipeline: pack → decode(stub) → features table
    * ready for the Similarity ops. Repartitions by hash of key so feature
    * extraction (the expensive stage in production) balances across
    * executors regardless of input file layout.
    */
  def featureTable(df: DataFrame, textCol: String, keyCol: String,
      dim: Int = 64, parts: Int = 0): DataFrame = {
    val packed = packFromText(df, textCol, keyCol)
    val balanced = if (parts > 0) packed.repartition(parts, col("media_id")) else packed
    balanced.select(
      col("media_id").as("vec_id"),
      col("kind"),
      col("meta"),
      fakeDecodeFeatures(col("media"), dim).as("embedding"),
      frameSample(col("media")).as("frames"))
  }
}
