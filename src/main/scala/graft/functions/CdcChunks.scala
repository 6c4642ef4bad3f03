package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunking of a word
  * array in ONE pass (SURVEY §4.B custom-Expression slot; the
  * q_text_cdc hot path).
  *
  * Semantics are EXACTLY the SQL fold q_text_cdc shipped with (and its
  * DuckDB lag-window oracle still pins): word hash
  * h(w) = fold over code points of (h·31 + cp) mod 1000003, and a
  * chunk boundary lands after word i ≥ 4 whenever
  * ((h(w_{i−3})·29791 + h(w_{i−2})·961 + h(w_{i−1})·31 + h(w_i))
  *  mod 1000003) mod 8 = 0 — the boundary word closes its chunk.
  *
  * Why native: the higher-order `aggregate` fold evaluates its lambda
  * INTERPRETED (no codegen for lambda functions), and the per-word
  * character-hash sub-fold appears in both the boundary predicate and
  * the state update, so every word is hashed twice through the
  * interpreted evaluator. This expression hashes each word once in
  * Java loops. CodegenFallback is deliberate (the SimHash64/MinHash16
  * precedent): evaluated once per document row, not in a join loop. */
case class CdcChunks(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cdc_chunks needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var p1 = 0L
    var p2 = 0L
    var p3 = 0L
    val done = new ArrayBuffer[GenericArrayData]()
    var cur = new ArrayBuffer[UTF8String]()
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      val wh = CdcChunks.wordHash(w)
      // boundary test uses the PRE-shift window (p1..p3) + this word
      val isB = (i + 1) >= 4 &&
        ((p1 * 29791L + p2 * 961L + p3 * 31L + wh) % 1000003L) % 8L == 0L
      p1 = p2; p2 = p3; p3 = wh
      cur += w
      if (isB) {
        done += new GenericArrayData(cur.toArray[Any])
        cur = new ArrayBuffer[UTF8String]()
      }
      i += 1
    }
    if (cur.nonEmpty) done += new GenericArrayData(cur.toArray[Any])
    new GenericArrayData(done.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CdcChunks = copy(child = newChild)
}

object CdcChunks {
  /** (h·31 + codepoint) mod 1000003 over the word's code points —
    * identical to `aggregate(split(w, ''), 0L,
    * (h, c) -> (h·31 + ascii(c)) % 1000003)`: Spark's split("")
    * yields one element per code point (Java regex is
    * surrogate-pair-aware) and ascii() returns the first code point. */
  private[functions] def wordHash(w: UTF8String): Long = {
    val s = w.toString
    var h = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000003L
      i += Character.charCount(cp)
    }
    h
  }

  /** Register `graft_cdc_chunks(array<string>) → array<array<string>>`. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerOnce(spark, "graft_cdc_chunks",
      exprs => CdcChunks(exprs.head))
}
