package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native banded dynamic-time-warping distance:
  * `dtw_band(a: array<double>, b: array<double>, band: int) → double` —
  * the elastic series-similarity measure (two series tracking the same
  * signal with a lag/stretch score close; Euclidean alignment would
  * punish the shift). L1 point cost, Sakoe–Chiba band widened to
  * max(band, |len(a)−len(b)|) so a feasible path always exists.
  *
  * Cost is O(len·band) time and O(len) space (two rolling DP rows) —
  * the band is what makes pairwise series mining tractable: an
  * unbanded DP is O(L²) per pair. CodegenFallback is deliberate: the
  * expression runs once per series PAIR (bounded by entity-pair count,
  * e.g. nation²), not per row of the fact table — interpreted eval is
  * off the hot path, exactly the SimHash64 precedent. */
case class DtwBand(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"dtw_band needs (array<double>, array<double>, int), got $other")
    }

  override def nullSafeEval(a: Any, b: Any, w0: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    val ys = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = xs.length
    val m = ys.length
    if (n == 0 || m == 0) return null
    val w = math.max(w0.asInstanceOf[Int], math.abs(n - m))
    val inf = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(inf)
    var cur = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val jLo = math.max(1, i - w)
      val jHi = math.min(m, i + w)
      var j = jLo
      while (j <= jHi) {
        val cost = math.abs(xs(i - 1) - ys(j - 1))
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        cur(j) = cost + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    val r = prev(m)
    if (r.isInfinite) null else java.lang.Double.valueOf(r)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): DtwBand = copy(first = f, second = s, third = t)
}

object DtwBand {
  /** Register `dtw_band(array<double>, array<double>, int) → double`. */
  def register(spark: SparkSession): Unit =
    GraftFunctions.registerOnce(spark, "dtw_band",
      exprs => DtwBand(exprs(0), exprs(1), exprs(2)))
}
