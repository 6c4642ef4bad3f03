package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized `BloomFilter` sketch — the
  * probe half of a bloom-pre-filtered join (the explicit form of
  * Spark's own runtime row-level filtering): the build side aggregates
  * its join keys into a small sketch, the probe side drops rows whose
  * key cannot be on the build side *before* the shuffle, and the real
  * join afterwards removes the sketch's false positives, so the result
  * is provably identical to the plain join (the DuckDB oracle of
  * q_join_bloom pins that).
  *
  * `left` must be a foldable binary expression holding the
  * `BloomFilter.writeTo` serialization; the filter is deserialized once
  * per expression instance (lazily) — per-row eval and the generated
  * code both hit the cached `mightContainLong`, and codegen ships the
  * deserialized (Serializable) sketch through the references array so
  * the probe loop stays inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains needs a foldable (literal) sketch operand")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_bloom_contains needs (binary, bigint), got $other")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(left.eval(InternalRow.empty).asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, b) => {
      // the deserialized sketch rides the codegen references array (it is
      // Serializable); the binary literal child is a no-op reference read
      val ref = ctx.addReferenceObj("graftBloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
