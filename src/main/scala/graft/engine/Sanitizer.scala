package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}

import graft.checks.{Check, Checks, RequiredNonEmpty, UrlFormat}

/** Distributed replay of the reference's sanitization rewrite
  * (`sanitize_metadata`, reference `src/core/verification.py:175-222`):
  * a field whose (non-required) check failed is deleted — here, nulled, the
  * columnar equivalent of `del clean_data[field]` — and empty-string/empty-
  * list fields are removed (`verification.py:216-219`, the `in ["",[],{}]`
  * sweep).
  *
  * List semantics (`verification.py:185-193`): a violated list field keeps
  * only its valid items — and the reference's keep-filter is ALWAYS
  * `isinstance(v, str) and _is_valid_url(v)`, regardless of which element
  * rule flagged the field, because the generic
  * `isinstance(reason, list) and isinstance(value, list)` branch catches
  * every list-reason field first. That makes the `elif field == "author"`
  * and `elif field == "hasSoftwareImage"` branches (`verification.py:195-213`)
  * DEAD CODE: author/image lists hold dicts, no dict passes `isinstance(v,
  * str)`, so `valid_items == []` and the whole field is deleted. We replay
  * exactly that observable behavior (keep-valid-URLs for string lists; full
  * wipe for struct lists) rather than the dead branches' intent.
  *
  * Required-field violations do NOT null anything (the reference's `del` on
  * an already-missing field is a no-op), so sanitize(x) followed by
  * re-validation can only fire required/missing-side rules — the
  * "sanitize-then-validate is clean of format issues" invariant tested in
  * SanitizeSpec.
  *
  * Pure projection: one expression per column, whole-stage codegen'd, no
  * shuffle.
  */
object Sanitizer {

  def sanitize(
      turns: DataFrame,
      checks: Seq[Check] = Checks.transcriptChecks): DataFrame = {
    // group the format-style (non-required) checks by target field
    val byField: Map[String, Seq[Check]] = checks
      .filterNot(_.isInstanceOf[RequiredNonEmpty])
      .groupBy(_.field)
    // All violation flags are evaluated against the ORIGINAL column values in
    // one projection (the reference collects invalid_fields from the original
    // record, then deletes) — nulling a field must not change what another
    // field's check saw.
    val outCols = turns.columns.map { f =>
      val dt = turns.schema(f).dataType
      val nul = lit(null).cast(dt)
      val violatedHere: Column = byField.get(f)
        .map(cs => cs.map(_.violated).reduce(_ || _))
        .getOrElse(lit(false))
      val fired = coalesce(violatedHere, lit(false))
      val out = dt match {
        case ArrayType(StringType, _) =>
          // keep-valid-items (verification.py:188-193): the reference's
          // filter is URL-validity no matter which rule fired; an empty
          // survivor list deletes the field
          val kept = filter(col(f), x => UrlFormat.isValidUrl(x))
          val repaired = when(size(kept) > 0, kept).otherwise(nul)
          val emptySweep = col(f).isNotNull && size(col(f)) === 0
          when(fired, repaired).when(emptySweep, nul).otherwise(col(f))
        case ArrayType(_: StructType, _) =>
          // dead-elif quirk: struct elements never pass isinstance(v, str),
          // so ANY element violation wipes the whole field
          val emptySweep = col(f).isNotNull && size(col(f)) === 0
          when(fired || emptySweep, nul).otherwise(col(f))
        case StringType =>
          val emptySweep = col(f) === "" // verification.py:216-219
          when(fired || coalesce(emptySweep, lit(false)), nul).otherwise(col(f))
        case _ =>
          when(fired, nul).otherwise(col(f))
      }
      out.as(f)
    }
    turns.select(outCols.toIndexedSeq: _*)
  }
}
