package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text-normalization expressions — the canonicalization
  * pass every text pipeline runs BEFORE tokenizing, hashing, or
  * deduplicating (the same byte sequence can spell "é" two ways; exact
  * dedup and shingle hashes see different documents until the corpus is
  * normalized to one form). Spark ships NO normalization builtin, so
  * without these the step falls to a Scala UDF — unacceptable for a
  * corpus-wide ingest pass (SURVEY §7.4 tier (b): a native Expression
  * with codegen beats a UDF).
  *
  * Both expressions implement `nullSafeEval` + `doGenCode`, so they run
  * inside WholeStageCodegen like any builtin, and both have exact
  * cross-engine twins (DuckDB `nfc_normalize` / `strip_accents`) that
  * the `text_normalize` driver gate replays:
  *  - [[UnicodeNormalize]] = `java.text.Normalizer` (canonical or compat
  *    forms; `nfc_normalize` is the NFC instance);
  *  - [[StripAccents]] = canonical-decompose then drop ALL mark
  *    codepoints — categories Mn, Mc AND Me, pinned to utf8proc's
  *    STRIPMARK set (verified: DuckDB strips U+0301 Mn, U+093E Mc,
  *    U+20DD Me alike), with NO recomposition and NO compatibility
  *    folding (DuckDB keeps ß, ﬁ, Æ, Ł verbatim — so does this).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  // eager validation: a bad form name is a usage error at plan time, not
  // a per-row exception on executors
  java.text.Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // form is one of NFC/NFD/NFKC/NFKD (validated above) — safe to embed
    // as a Java string literal in the generated source
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.TextExprUtil.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** See [[UnicodeNormalize]] scaladoc — the DuckDB `strip_accents` twin. */
case class StripAccents(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(input: Any): Any =
    TextExprUtil.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprUtil.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

/** Static kernels shared by interpreted eval and generated code. */
object TextExprUtil {
  import java.text.Normalizer

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = Normalizer.Form.valueOf(form)
    // fast path: already-normalized input (ALL pure-ASCII text) returns
    // the input buffer untouched — the common case for web corpora, so
    // the ingest pass pays one quick-check scan, not an allocation per row
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) && !hasMark(str)) s
    else {
      val d = Normalizer.normalize(str, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (!isMark(cp)) sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      val out = sb.toString
      if (out == str) s else UTF8String.fromString(out)
    }
  }

  private def hasMark(str: String): Boolean = {
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (isMark(cp)) return true
      i += Character.charCount(cp)
    }
    false
  }

  // utf8proc STRIPMARK's category set: Mn + Mc + Me (see scaladoc above)
  private def isMark(cp: Int): Boolean = Character.getType(cp) match {
    case Character.NON_SPACING_MARK | Character.COMBINING_SPACING_MARK |
         Character.ENCLOSING_MARK => true
    case _ => false
  }
}

/** Column wrappers (SQL names registered in [[GraftExtensions]]). */
object TextFunctions {
  import org.apache.spark.sql.functions.{call_function, lit, lower}

  def normalize(c: Column, form: String = "NFC"): Column =
    call_function("graft_normalize", c, lit(form))

  def stripAccents(c: Column): Column =
    call_function("graft_strip_accents", c)

  /** The standard dedup/match canonical key: NFC -> full Unicode
    * lowercase -> accent strip. Oracle twin:
    * `strip_accents(lower(nfc_normalize(x)))`. */
  def canonicalFold(c: Column): Column =
    stripAccents(lower(normalize(c, "NFC")))
}
