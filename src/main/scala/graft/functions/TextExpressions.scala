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

/** Shared fold routine for [[StripAccents]] — a plain object so scalac
  * emits a static forwarder the generated Java can call directly
  * (`graft.functions.AccentFold.strip(s)`), keeping eval and codegen on
  * ONE implementation instead of two hand-synced loops.
  *
  * Semantics chosen to match DuckDB's `strip_accents` (utf8proc
  * NFD + strip-mark + compose), probed case-by-case: decompose (NFD),
  * drop ALL mark categories — nonspacing `é`→e, spacing `का`→`क`,
  * enclosing — then recompose (NFC, so Hangul syllables come back
  * composed). `ß`, `ø`, ligatures and CJK pass through: they are not
  * canonically decomposable and compatibility folding is [[UnicodeNormalize]]
  * NFKC's job, not this one's. */
object AccentFold {
  def strip(s: String): String = {
    // fast path: ASCII has no marks and is NFD/NFC-stable — the
    // overwhelming bulk of crawl text skips all allocation
    var ascii = true
    var j = 0
    while (ascii && j < s.length) { if (s.charAt(j) >= 0x80) ascii = false; j += 1 }
    if (ascii) return s
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val b = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK.toInt &&
        t != Character.COMBINING_SPACING_MARK.toInt &&
        t != Character.ENCLOSING_MARK.toInt)
        b.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    java.text.Normalizer.normalize(b.toString, java.text.Normalizer.Form.NFC)
  }
}

/** Native Catalyst accent folding (diacritic stripping).
  *
  * Why a custom Expression: accent-insensitive match keys are the other
  * half of the [[UnicodeNormalize]] story — "café" vs "cafe" vs
  * "café" must collide for search keys, entity resolution, and
  * fuzzy dedup blocking, and Spark has no built-in (the usual answer is
  * a UDF, which boxes every row and blocks whole-stage codegen). This
  * compiles to one static call ([[AccentFold.strip]]) inside the
  * generated loop, with an ASCII fast path that makes the common case
  * allocation-free. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"strip_accents expects string, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = AccentFold.strip(s)
    if (out eq s) input else UTF8String.fromString(out)
  }

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |java.lang.String $s = $c.toString();
         |java.lang.String $out = graft.functions.AccentFold.strip($s);
         |${ev.value} = ($out == $s) ? $c :
         |  org.apache.spark.unsafe.types.UTF8String.fromString($out);
       """.stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

/** Column-level API for the text expressions. */
object TextFunctions {

  /** Codegen'd Unicode normalization (see [[UnicodeNormalize]]). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  def nfc(c: Column): Column = unicodeNormalize(c, "NFC")
  def nfkc(c: Column): Column = unicodeNormalize(c, "NFKC")

  /** Codegen'd accent folding (see [[StripAccents]]): DuckDB
    * `strip_accents` semantics — NFD, drop all marks, NFC. */
  def stripAccents(c: Column): Column =
    ColumnBridge.column(StripAccents(ColumnBridge.expression(c)))
}
