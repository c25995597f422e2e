package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.checks.{Check, Checks, RequiredNonEmpty}

/** Distributed replay of the reference's sanitization rewrite
  * (`sanitize_metadata`, reference `src/core/verification.py:175-222`):
  * a field whose (non-required) check failed is deleted — here, nulled, the
  * columnar equivalent of `del clean_data[field]` — and empty-string fields
  * are removed (`verification.py:216-219`, the `in ["",[],{},[{}]]` sweep).
  *
  * Required-field violations do NOT null anything (the reference's `del` on
  * an already-missing field is a no-op), so sanitize(x) followed by
  * re-validation can only fire required/missing-side rules — the
  * "sanitize-then-validate is clean of format issues" invariant tested in
  * SanitizeSpec.
  *
  * Pure projection: one `withColumn` per checked field, whole-stage
  * codegen'd, no shuffle.
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
      val violatedHere = byField.get(f)
        .map(cs => cs.map(_.violated).reduce(_ || _))
        .getOrElse(lit(false))
      val emptySweep = // verification.py:216-219 empty-field removal
        if (turns.schema(f).dataType.typeName == "string") col(f) === ""
        else lit(false)
      when(coalesce(violatedHere || emptySweep, lit(false)),
        lit(null).cast(turns.schema(f).dataType))
        .otherwise(col(f)).as(f)
    }
    turns.select(outCols.toIndexedSeq: _*)
  }
}
