package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Crawled corpora mix composed and decomposed encodings of the SAME
  * text ("é" as U+00E9 vs "e"+U+0301): exact dedup, shingling, token
  * counting, and decontamination all treat those as different bytes
  * unless normalization runs first, so NFC is the mandatory first
  * stage of a text pipeline. Spark ships no normalizer; a Scala UDF
  * would drop the corpus-sized scan out of whole-stage codegen and
  * pay per-row encoder ser/de — this expression stays codegen'd
  * (same contract as [[DotProduct]]): the generated code calls
  * `java.text.Normalizer` (in-JDK ICU subset) directly on the row's
  * string. NFC is idempotent and locale-independent, and DuckDB's
  * `nfc_normalize` implements the same standard — which is what lets
  * the x23 entry hash-gate this against the SQL oracle.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextExpressions {
  /** `nfc_normalize(column)` as a Column. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
