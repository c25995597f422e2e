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
}
