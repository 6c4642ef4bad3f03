package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatDot, SimHash64}
import graft.plans.TopKPerGroupStrategy

/** Declarative installation of the engine's session extensions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the native expressions (`float_dot`, `simhash64`) into the
  * function registry and the top-k-per-group planner strategy — the
  * config-driven equivalent of the runtime installation that
  * `GraftFunctions.register` / `TopKPerGroup.apply` perform, for
  * clusters where the session is built by infrastructure rather than
  * application code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"float_dot takes 2 arguments, got ${exprs.length}")
        FloatDot(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"simhash64 takes 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("tdigest_agg"),
      new ExpressionInfo(classOf[graft.functions.TDigestAgg].getName,
        "tdigest_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"tdigest_agg takes 2 arguments, got ${exprs.length}")
        graft.functions.TDigestAgg(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("tdigest_merge_quantiles"),
      new ExpressionInfo(
        classOf[graft.functions.TDigestMergeQuantiles].getName,
        "tdigest_merge_quantiles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"tdigest_merge_quantiles takes 3 arguments, got ${exprs.length}")
        graft.functions.TDigestMergeQuantiles(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("tdigest_quantiles"),
      new ExpressionInfo(classOf[graft.functions.TDigestQuantiles].getName,
        "tdigest_quantiles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"tdigest_quantiles takes 3 arguments, got ${exprs.length}")
        graft.functions.TDigestQuantiles(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}
