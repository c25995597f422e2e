package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with an evaluation/benchmark set (the GPT-3-style 13-gram
  * exact-overlap method; `n` is a parameter because useful values depend on
  * document length).
  *
  * Scale shape: the benchmark side is small by construction (an eval set),
  * so its distinct n-gram hashes broadcast; the corpus side explodes to
  * narrow (id, 8-byte hash) rows and broadcast-joins — the 100 TB corpus is
  * never shuffled by content and no all-pairs comparison exists. Matching is
  * on xxhash64 of the gram (a false positive needs a 64-bit collision
  * against the benchmark set); the hit COUNT per document is therefore
  * identical to string-equality matching, which is what the DuckDB oracle
  * (q53) checks.
  */
object Decontam {

  /** Documents from `corpus` sharing at least one word `n`-gram with
    * `bench`: (id, n_hit_grams) where n_hit_grams counts the distinct
    * shared grams. Documents with zero overlap are absent (a filter, not a
    * left join — at corpus scale the output is the rare side).
    */
  def contaminated(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      keyCol: String,
      n: Int = 13): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .distinct()
    corpus
      .select(col(keyCol).as("id"),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy("id")
      .agg(count_distinct(col("gh")).as("n_hit_grams"))
  }
}
