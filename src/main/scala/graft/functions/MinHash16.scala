package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 16 seeded minhashes over a pre-hashed
  * shingle array in ONE pass (SURVEY §2.C LLM dedup, §4.B custom-
  * Expression slot).
  *
  * The SQL formulation (`array(array_min(transform(hs, h -> mix(i, h)))
  * × 16)`) walks the shingle array 16 times and allocates 16 transient
  * arrays per document; this expression keeps 16 running minima in
  * locals and walks the array once. Each "permutation" is a splitmix64
  * finalizer over `h ^ seed(i)` — 16 independent-by-construction
  * mixers, self-contained and engine-portable (no dependency on
  * Spark's hash internals).
  *
  * CodegenFallback is deliberate (the SimHash64 precedent): evaluated
  * once per document, outside the tight join loops.
  */
case class MinHash16(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // nullSafeEval returns null for an EMPTY (not just null) input array, so
  // the declared nullability cannot inherit child.nullable: a non-nullable
  // child would let the optimizer assume a non-null result.
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash16 needs array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < 16) {
          val m = MinHash16.mix(h ^ MinHash16.seeds(k))
          if (m < mins(k)) mins(k) = m
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHash16 = copy(child = newChild)
}

object MinHash16 {
  /** splitmix64 stream seeds — 16 fixed, independent offsets. */
  private[functions] val seeds: Array[Long] = {
    var x = 0x9e3779b97f4a7c15L
    Array.fill(16) { x = mix(x); x }
  }

  /** splitmix64 finalizer: a full-avalanche 64-bit mixer. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Register `graft_minhash16(array<bigint>) → array<bigint>`. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerOnce(spark, "graft_minhash16",
      exprs => MinHash16(exprs.head))
}
