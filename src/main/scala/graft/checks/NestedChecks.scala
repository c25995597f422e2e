package graft.checks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Checks over array-valued fields — the reference's list-of-URL and
  * author-object shape checks (`verification.py:76-91, 93-121`), including
  * the §7.3 hard part: the bad-items message embeds a **Python list repr**
  * (`verification.py:88` interpolates `bad_items`, a Python list, straight
  * into the f-string: `['htp:/bad', None]` — single-quoted strings, bare
  * `None` for nulls). These compile to `filter`/`exists`/`transform` +
  * `array_join` column expressions; per-element fan-out stays inside the
  * row (no explode needed until the violation itself is emitted).
  *
  * The transcript projection has no array columns, so these rules aren't in
  * `Checks.transcriptChecks`; they're the catalog members a
  * software-metadata-shaped table would use, spec'd byte-for-byte in
  * NestedChecksSpec.
  */
object NestedChecks {

  /** Python repr of a string-or-null element: `'x'` or `None`. */
  private def pyReprElem(x: Column): Column =
    when(x.isNull, lit("None")).otherwise(concat(lit("'"), x, lit("'")))

  /** Python repr of a string array: `['a', None, 'b']`. */
  def pyReprList(arr: Column): Column =
    concat(lit("["), array_join(transform(arr, x => pyReprElem(x)), ", "),
      lit("]"))

  /** List-of-URLs element check — reference `verification.py:76-91`:
    * collects bad items, message "{n} invalid URLs in {field}: {bad_items}".
    * A null ELEMENT is a bad item (fails `isinstance(v, str)`); a null/empty
    * LIST is the required check's job (reference iterates an empty list
    * silently).
    */
  final case class UrlList(field: String) extends Check {
    val ruleId = s"URL_LIST_$field"
    private def bad: Column =
      filter(col(field), x => x.isNull || !UrlFormat.isValidUrl(x))
    def violated: Column = col(field).isNotNull && size(bad) > 0
    def message: Column = concat(
      size(bad).cast("string"),
      lit(s" invalid URLs in $field: "),
      pyReprList(bad))
  }

  /** Author shape: `name` present and truthy per element — reference
    * `verification.py:110-114`, message "Missing `name` in author object".
    */
  final case class AuthorName(field: String) extends Check {
    val ruleId = s"AUTHOR_NAME_$field"
    def violated: Column = col(field).isNotNull &&
      exists(col(field), a =>
        a.getField("name").isNull || a.getField("name") === "")
    def message: Column = lit("Missing `name` in author object")
  }

  /** ORCID validity per author — reference `verification.py:116-121`,
    * message "Invalid ORCID ID: {orcid}" (first offending element embedded;
    * the reference emits one message per element, ours is per row with the
    * first bad value — the row-level projection of the same rule).
    */
  final case class AuthorOrcid(field: String) extends Check {
    val ruleId = s"AUTHOR_ORCID_$field"
    private def bad: Column = filter(col(field), a =>
      a.getField("orcidId").isNotNull && a.getField("orcidId") =!= "" &&
        !UrlFormat.isValidUrl(a.getField("orcidId")))
    def violated: Column = col(field).isNotNull && size(bad) > 0
    def message: Column = concat(lit("Invalid ORCID ID: "),
      element_at(bad, 1).getField("orcidId"))
  }

  /** Per-element version fullmatch — reference `verification.py:140-144`,
    * "Invalid softwareVersion: {v}".
    */
  final case class VersionList(field: String, sub: String = "softwareVersion")
      extends Check {
    val ruleId = s"VERSION_LIST_$field"
    private def bad: Column = filter(col(field), e =>
      e.getField(sub).isNotNull &&
        !e.getField(sub).rlike("^\\d+\\.\\d+\\.\\d+\\z")) // \z: fullmatch parity
    def violated: Column = col(field).isNotNull && size(bad) > 0
    def message: Column =
      concat(lit("Invalid softwareVersion: "), element_at(bad, 1).getField(sub))
  }
}
