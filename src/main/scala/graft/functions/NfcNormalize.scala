package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical first step of any web-corpus text pipeline
  * (crawled text mixes composed `é` with decomposed `e`+U+0301; every
  * downstream exact/shingle/MinHash dedup treats those as different
  * documents unless the corpus is normalized first).
  *
  * Spark 4 has no built-in normalizer, so this is the extension-point
  * demonstration for a scalar STRING function (beside the numeric
  * [[CosineSim]]): a `UnaryExpression` with `doGenCode`, registered in
  * SQL as `graft_nfc(...)` via `GraftExtensions`. The hot path stays
  * inside whole-stage codegen; the generated code calls
  * [[NfcNormalize.nfc]] directly (a static JVM call — no UDF
  * serialization, no Row boxing). The fast path cost is one
  * `Normalizer.isNormalized` scan — for ASCII/already-NFC text (the
  * overwhelming majority of a real corpus) no allocation happens and
  * the input UTF8String is returned as-is.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  /** Column API: `nfcNormalize($"text")`. */
  def nfcNormalize(c: Column): Column =
    graftbridge.column(NfcNormalize(graftbridge.expression(c)))
}
