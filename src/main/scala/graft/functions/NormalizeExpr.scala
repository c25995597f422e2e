package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the first
  * step of text canonicalization in a corpus pipeline (decomposed accents,
  * compatibility glyph soup, and mixed-form crawl text all hash and dedup
  * differently until the corpus is on one normal form).
  *
  * Spark has no built-in normalization function, so this wraps the JDK's
  * `java.text.Normalizer` (Unicode-standard canonical composition — the
  * same algorithm DuckDB's `nfc_normalize` implements via utf8proc, which
  * is what lets q77 byte-match the two engines). The expression stays
  * inside whole-stage codegen: the generated code is a single static call,
  * no UDF registration, no serde boundary.
  *
  * Cost note for the 100 TB path: normalization inherently round-trips
  * UTF8String → UTF-16 `String`, but `Normalizer.isNormalized` short-cuts
  * the (overwhelmingly common) already-NFC case — ASCII returns the input
  * buffer untouched with zero allocation beyond the probe.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Static helper so the generated Java is one call. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c.cast("string"))))
}
