package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Columnar replay of the reference's pydantic→zod-form conversion
  * (reference `src/core/models.py:301-425`,
  * `convert_pydantic_to_zod_form_dict`): each model field is renamed through
  * a declarative key map ("name" → "schema:name"), `None` fields are dropped,
  * dates become ISO-8601 midnight-UTC strings (`models.py:398-401`), and the
  * conversion recurses into nested models/lists (`models.py:420-424`).
  *
  * Spark-first shape: the rename map is a struct re-projection (pure
  * `Column`s, codegen'd, zero shuffle) and the null-dropping serialization is
  * `to_json(..., ignoreNullFields)` — Jackson skips null fields at every
  * nesting depth, which IS the reference's recursive `if value is not None`
  * guard.
  */
object ZodForm {

  /** Person key map — reference `PYDANTIC_TO_ZOD_MAPPING["Person"]`
    * (`models.py:302-306`).
    */
  val personMap: Seq[(String, String)] = Seq(
    "name" -> "schema:name",
    "orcidId" -> "md4i:orcidId",
    "affiliation" -> "schema:affiliation")

  /** Software-record key map (subset) — reference
    * `PYDANTIC_TO_ZOD_MAPPING["SoftwareApplication"]`-style top-level
    * entries (`models.py:340-384`: name/description/dateCreated/license/
    * author all map to their schema.org-prefixed zod keys).
    */
  val softwareRecordMap: Seq[(String, String)] = Seq(
    "name" -> "schema:name",
    "description" -> "schema:description",
    "dateCreated" -> "schema:dateCreated",
    "license" -> "schema:license",
    "author" -> "schema:author")

  /** Re-project a struct column through a (pydanticKey → zodKey) rename map;
    * unmapped fields are dropped, mirroring the reference's
    * `pydantic_key in key_map` guard (`models.py:419`).
    */
  def renameStruct(s: Column, keyMap: Seq[(String, String)]): Column =
    struct(keyMap.map { case (from, to) => s.getField(from).as(to) }: _*)

  /** Rename every element of an array-of-structs column (the reference's
    * list branch, `models.py:393-394`). `transform` is fine here: zod
    * projection is an output-shaping step over small record structs, not a
    * per-token hot loop.
    */
  def renameStructArray(arr: Column, keyMap: Seq[(String, String)]): Column =
    transform(arr, e => struct(keyMap.map { case (from, to) =>
      e.getField(from).as(to)
    }: _*))

  /** Null-dropping JSON serialization — the zod-form dict as one string
    * column. Field order = struct field order (the key map's order), like
    * the reference's insertion-ordered dict.
    */
  def toZodJson(s: Column): Column =
    TextOps.toCleanJson(s)
}
