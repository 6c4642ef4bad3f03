package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization: `unicode_norm(str, 'NFC'|'NFD'|'NFKC'|
  * 'NFKD') → string` — the text-hygiene primitive every multilingual
  * corpus pass runs before hashing/dedup (decomposed accents, compatibility
  * codepoints like U+212B ANGSTROM SIGN, and ligatures otherwise make
  * byte-identical-looking documents hash differently).
  *
  * The form argument must be a foldable literal: it resolves ONCE at plan
  * time, and `doGenCode` emits a direct static call with the constant
  * `Normalizer.Form`, so per-row work inside whole-stage codegen is one
  * `isNormalized` fast-path check (true for ~all real text, allocation-free)
  * and only allocates when normalization actually changes the string.
  * Java's `java.text.Normalizer` implements the same Unicode standard annex
  * (UAX #15) as DuckDB's utf8proc `nfc_normalize`, so NFC output is
  * oracle-comparable bit-for-bit. */
case class UnicodeNorm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        val name = Option(right.eval(null)).map(_.toString.toUpperCase)
        if (name.exists(UnicodeNorm.forms.contains))
          TypeCheckResult.TypeCheckSuccess
        else
          TypeCheckResult.TypeCheckFailure(
            s"unicode_norm form must be one of ${UnicodeNorm.forms.keys.mkString("/")}, got $name")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"unicode_norm needs (string, foldable string form), got $other")
    }

  private lazy val form: Normalizer.Form =
    UnicodeNorm.forms(right.eval(null).toString.toUpperCase)

  override def nullSafeEval(a: Any, b: Any): Any =
    UnicodeNorm.normalizeUtf8(a.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = s"java.text.Normalizer.Form.${form.name()}"
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.functions.UnicodeNorm$$.MODULE$$.normalizeUtf8($a, $formRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UnicodeNorm = copy(left = newLeft, right = newRight)
}

object UnicodeNorm {

  private[functions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Fast path: already-normalized input (the overwhelmingly common case)
    * returns the SAME UTF8String, no decode/alloc. */
  def normalizeUtf8(s: UTF8String, f: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  /** Register `unicode_norm(str, form) → string` for use via expr(). */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerOnce(spark, "unicode_norm",
      exprs => UnicodeNorm(exprs(0), exprs(1)))
}
