package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing is real — schema, partitioning, batch shapes, and
  * the column wiring are exactly what a production pipeline needs. The codec
  * itself is a **STUB**: this container has no image/audio libraries, so
  * `fakeDecodeFeatures` derives deterministic pseudo-features from the bytes
  * (clearly marked; swap in a real decoder UDF / mapInPandas on a cluster
  * with the codec libs installed).
  */
object Multimodal {

  /** Wrap a text table into a media table: (key, kind, media BINARY,
    * meta STRUCT<byte_len, format, width, height>). Stands in for reading
    * real blobs; the binary column round-trips Parquet losslessly.
    */
  def packFromText(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val media = coalesce(col(textCol), lit("")).cast("binary")
    val kind = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(col(keyCol)), lit(3)) + 1).cast("int"))
    df.select(
      col(keyCol).as("media_id"),
      kind.as("kind"),
      media.as("media"),
      struct(
        length(media).as("byte_len"),
        lit("fake/raw").as("format"),
        (pmod(xxhash64(col(keyCol), lit("w")), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(keyCol), lit("h")), lit(1080)) + 1).cast("int").as("height"))
        .as("meta"))
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
