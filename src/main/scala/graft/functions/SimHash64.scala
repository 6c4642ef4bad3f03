package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash over a token array
  * (near-duplicate fingerprinting; SURVEY §2.C LLM ops, §4.B custom-
  * Expression slot).
  *
  * Each token is hashed with FNV-1a 64 (self-contained, engine-portable,
  * no dependency on Spark's internal hash utilities); per bit position
  * the signed votes (+1 if the token hash has the bit set, else −1) are
  * summed over all tokens, and the result bit is 1 when the vote is
  * positive. Documents differing in a few tokens land within a small
  * Hamming distance.
  *
  * CodegenFallback is deliberate: the expression is evaluated once per
  * document (not per token pair) and sits outside the tight join loops,
  * so interpreted eval is not on the hot path.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(i).getBytes)
        // per hash byte, add the precomputed ±1 vote vector for its 8 bits
        var chunk = 0
        while (chunk < 8) {
          val tbl = SimHash64.voteTable((h >>> (chunk * 8)).toInt & 0xff)
          val base = chunk * 8
          var j = 0
          while (j < 8) { votes(base + j) += tbl(j); j += 1 }
          chunk += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** voteTable(v)(j) = +1 if bit j of byte value v is set, else −1. */
  private[functions] val voteTable: Array[Array[Int]] =
    Array.tabulate(256)(v => Array.tabulate(8)(j => ((v >>> j) & 1) * 2 - 1))

  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Register `simhash64(array<string>) → bigint` for use via expr(). */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerOnce(spark, "simhash64",
      exprs => SimHash64(exprs.head))
}
