package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-corpus ingest: the engine's distributed replay of the reference's
  * repo-to-text assembly pipeline —
  * `combine_text_files` (glob + concatenate, reference
  * `src/core/genai_model.py:72-86`), `sort_files_by_priority` (stable sort by
  * (extension priority, path): docs=0 < code=1 < other=2, reference
  * `genai_model.py:42-70`), and `reduce_input_size` (truncate to a budget,
  * reference `genai_model.py:27-40`: both a character-budget form and the
  * call site's token-budget form via [[graft.ops.TextOps.truncateToTokens]]).
  */
object TextIngest {

  val docExts: Seq[String] = Seq("md", "txt", "html")
  val codeExts: Seq[String] = Seq("py", "r")

  /** File-extension extract + priority class (reference `genai_model.py:64`,
    * `regexp_extract(path, …)` + `lower`).
    */
  def extension(path: Column): Column =
    lower(regexp_extract(path, "\\.([^./\\\\]+)$", 1))

  def priority(path: Column): Column = {
    val ext = extension(path)
    when(ext.isin(docExts: _*), lit(0))
      .when(ext.isin(codeExts: _*), lit(1))
      .otherwise(lit(2))
  }

  /** One row per file: (path, priority, content). `wholetext` keeps each
    * file a single value, `input_file_name` supplies the sort key.
    */
  def readFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value").as("content"))
      .withColumn("priority", priority(col("path")))

  /** Ordered concatenation without a global sort shuffle: collect the
    * (priority, path, content) structs, `array_sort` them (stable composite
    * ordering — exactly the reference's sort key), then join. The result is
    * ONE record by construction (like the reference's combined text), so the
    * final aggregate is inherently single-row; the per-file reads stay
    * distributed.
    */
  /** Persist combined text — reference `store_combined_text`
    * (`genai_model.py:88-95`): `df.write.text`.
    */
  def writeText(combined: DataFrame, path: String): Unit =
    combined.select(col("combined_text")).coalesce(1)
      .write.mode("overwrite").text(path)

  def combine(files: DataFrame, charBudget: Int = 320000): DataFrame =
    files
      .agg(array_sort(collect_list(
        struct(col("priority"), col("path"), col("content")))).as("fs"))
      .select(
        substring(
          array_join(transform(col("fs"), f => f.getField("content")), "\n"),
          1, charBudget).as("combined_text"),
        size(col("fs")).as("n_files"))

  /** Token-budget variant — the reference's ACTUAL call site truncates the
    * combined text at `max_tokens=80000` BPE tokens (`genai_model.py:131` →
    * `reduce_input_size`, `:27-40`: encode, keep first N, decode).
    * [[graft.ops.TextOps.truncateToTokens]] reproduces the
    * keep-first-N-tokens-then-reassemble shape with the RE2-compatible
    * pre-tokenizer (tokens carry their whitespace, so the output is an
    * exact character prefix, like tiktoken's decode of a token prefix).
    */
  def combineTokenBudget(files: DataFrame, tokenBudget: Int = 80000): DataFrame =
    files
      .agg(array_sort(collect_list(
        struct(col("priority"), col("path"), col("content")))).as("fs"))
      .select(
        graft.ops.TextOps.truncateToTokens(
          array_join(transform(col("fs"), f => f.getField("content")), "\n"),
          tokenBudget).as("combined_text"),
        size(col("fs")).as("n_files"))
}
