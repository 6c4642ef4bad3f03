package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two array<float> columns, accumulating in
  * double with a sequential left-to-right fold — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` but
  * without materializing the intermediate array (the higher-order
  * function chain allocates a 64-element array per pair, which dominated
  * the cosine-top-k profile). Generates tight Java via doGenCode so the
  * loop stays inside whole-stage codegen. */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"float_dot needs (array<float>, array<float>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatDot = copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Register `name` only if the session doesn't already have it: every
    * query body calls register() defensively, and an unguarded
    * createOrReplaceTempFunction logs a `SimpleFunctionRegistry ...
    * replaced` warning per call (hundreds per bench sweep). The builder
    * closures are stateless singletons, so skip-if-present is safe. */
  private[functions] def registerOnce(spark: SparkSession, name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** Register the engine's native expressions for use via expr()/SQL. */
  def register(spark: SparkSession): Unit = {
    SimHash64.register(spark)
    MinHash16.register(spark)
    CdcChunks.register(spark)
    registerOnce(spark, "float_dot", exprs => FloatDot(exprs(0), exprs(1)))
    registerOnce(spark, "graft_bloom_contains",
      exprs => BloomContains(exprs(0), exprs(1)))
    TDigestQuantiles.register(spark)
    UnicodeNorm.register(spark)
    DtwBand.register(spark)
  }
}
