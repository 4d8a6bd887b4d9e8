package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, codegen'd expression —
  * Spark ships NO normalizer builtin, yet canonical composition is
  * the FIRST transform every web-scale text pipeline applies (the
  * same grapheme arrives composed from one crawler and decomposed
  * from another; unnormalized text silently breaks exact dedup
  * fingerprints, tokenizer vocabularies, and PII regexes on
  * non-ASCII scripts). Backed by the JDK's `java.text.Normalizer`
  * (ICU-conformant Unicode NFC — the same algorithm DuckDB's
  * `nfc_normalize` runs via utf8proc, which is what makes the result
  * oracle-checkable bit-for-bit).
  *
  * Hot-path shape: `Normalizer.isNormalized` is a cheap quick-check
  * pass (the common case — already-NFC or pure-ASCII input — returns
  * the INPUT UTF8String untouched, zero allocation); only strings
  * that genuinely need composing pay the String round-trip.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** NFC-normalize a UTF8String; already-normalized input (the common
    * case) is returned as-is without allocating. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
