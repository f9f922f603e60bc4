package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode normalization (NFC/NFD/NFKC/NFKD).
  *
  * Why a custom Expression: web-crawl text arrives in mixed normalization
  * forms — the same visible string ("café") hashes differently composed
  * (U+00E9) vs decomposed (U+0065 U+0301), which silently breaks exact
  * dedup, fingerprinting, and vocabulary counts. Every serious pipeline
  * normalizes to NFC (or NFKC) before any hash-keyed operator, so this
  * sits on the hottest path in the engine, ahead of `Dedup.exact`,
  * `TextAnalysis.fingerprint`, and `Vocabulary`. Spark's function library
  * has no normalizer, and a Scala UDF would box every row and block
  * whole-stage codegen; this compiles to a direct
  * `java.text.Normalizer.normalize` call inside the generated loop —
  * the ICU-equivalent JDK implementation DuckDB's `nfc_normalize`
  * mirrors, which is what lets the oracle hash-match.
  *
  * `Normalizer.isNormalized` short-circuits the (overwhelmingly common)
  * already-normalized case without allocating a new string.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects string, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |java.lang.String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized(
         |    $s, java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize(
         |      $s, java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Column-level API for the text expressions. */
object TextFunctions {

  /** Codegen'd Unicode normalization (see [[UnicodeNormalize]]). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  def nfc(c: Column): Column = unicodeNormalize(c, "NFC")
  def nfkc(c: Column): Column = unicodeNormalize(c, "NFKC")
}
