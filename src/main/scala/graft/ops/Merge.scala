package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Priority merge — the engine's relational form of the reference's
  * `merge_jsonld` (reference `src/utils/utils.py:55-62`): for each key, the
  * primary ("GIMIE") side always wins; secondary ("LLM") values fill only the
  * keys/fields absent from the primary. Implemented as a full-outer join on
  * the key with per-column `coalesce(primary, secondary)` — the "only absent
  * keys are copied" semantics fall out of coalesce on the joined row
  * (SURVEY.md §2.4).
  */
object Merge {

  def priorityMerge(
      primary: DataFrame,
      secondary: DataFrame,
      key: String): DataFrame = {
    val valueCols = primary.columns.filterNot(_ == key)
    require(valueCols.sameElements(secondary.columns.filterNot(_ == key)),
      "primary and secondary must share a schema")
    val p = primary.select(col(key) +: valueCols.map(c =>
      col(c).as(s"__p_$c")): _*)
    val s = secondary.select(col(key) +: valueCols.map(c =>
      col(c).as(s"__s_$c")): _*)
    p.join(s, Seq(key), "full_outer")
      .select(col(key) +: valueCols.map(c =>
        coalesce(col(s"__p_$c"), col(s"__s_$c")).as(c)): _*)
  }

  /** Merged-field-count metric — the reference logs how many fields the merge
    * copied from the secondary side (`utils.py:57-62` "Merged {n} missing
    * fields from LLM"); distributed analog: per value column, the number of
    * merged rows whose value came from the secondary (primary null, secondary
    * present). One wide aggregate (single shuffle-free partial+final pass
    * over the same full-outer join), reshaped to one row per field.
    */
  def mergeFieldCounts(
      primary: DataFrame,
      secondary: DataFrame,
      key: String): DataFrame = {
    val valueCols = primary.columns.filterNot(_ == key)
    val p = primary.select(col(key) +: valueCols.map(c =>
      col(c).as(s"__p_$c")): _*)
    val s = secondary.select(col(key) +: valueCols.map(c =>
      col(c).as(s"__s_$c")): _*)
    val wide = p.join(s, Seq(key), "full_outer")
      .agg(
        count(lit(1)).as("__n"),
        valueCols.map(c =>
          sum(when(col(s"__p_$c").isNull && col(s"__s_$c").isNotNull, 1L)
            .otherwise(0L)).as(c)): _*)
    wide.select(explode(array(valueCols.map(c =>
      struct(lit(c).as("field"), col(c).as("n_filled_from_secondary"))): _*))
      .as("m"))
      .select(col("m.field").as("field"),
        col("m.n_filled_from_secondary").as("n_filled_from_secondary"))
  }
}
