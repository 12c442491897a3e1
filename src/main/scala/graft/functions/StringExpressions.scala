package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization of a STRING column — the
  * canonical-composition pass a multilingual training-data pipeline runs
  * before tokenization and dedup: without it, `é` (U+00E9) and
  * `e` + U+0301 are DIFFERENT strings, so the same sentence fingerprints,
  * tokenizes, and dedups differently depending on which editor or OCR
  * stage produced it (macOS file paths and some PDF extractors emit
  * decomposed forms). NFC is the W3C-recommended interchange form.
  *
  * Why an Expression and not a UDF: the repo's no-`udf()` discipline —
  * a Scala UDF breaks whole-stage codegen and serializes row values
  * through Scala functions. This expression stays inside codegen with a
  * single static call per row to `java.text.Normalizer` (ICU-free,
  * ships with the JDK, implements the Unicode standard's composition
  * tables). DuckDB's `nfc_normalize` implements the same standard, which
  * is what makes the d39 oracle a BYTE-exact cross-engine gate.
  *
  * Null → null; a string already in NFC passes through unchanged (the
  * normalizer's quick-check fast path makes that the cheap common case).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a STRING input, got ${other.simpleString(10)}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(
        input.asInstanceOf[UTF8String].toString,
        java.text.Normalizer.Form.NFC))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Column-API entry points for the native string expressions. */
object StringFunctions {
  import org.apache.spark.sql.classic.GraftSqlBridge

  /** Codegen'd Unicode NFC normalization; see [[NfcNormalizeExpr]]. */
  def nfc(s: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(s)))
}
