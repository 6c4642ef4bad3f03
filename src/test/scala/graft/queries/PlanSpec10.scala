package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Plan-quality gates for the round-12 waves: the diagnostics must keep
  * the shapes their SURVEY rows claim — broadcast moment vectors (never
  * a shuffled join against a 1-row table), TakeOrdered for the top-k
  * report, map-side partial aggregation for the moment sweeps, and the
  * perplexity filter's token join hash-shuffled with NO per-doc global
  * sort anywhere. */
class PlanSpec10 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString()
      case other => other.toString()
    }
  }

  test("cooksd: 1-row moment vector broadcasts, top-20 is TakeOrdered") {
    val p = plan("q_agg_cooksd")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"moment vector not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 got a full sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"1-row cross join degenerated to a cartesian:\n$p")
  }

  test("partialcorr: one hash aggregate with map-side partials, no join") {
    val p = plan("q_agg_partialcorr")
    assert(p.contains("partial_"), s"no map-side partial agg:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected join:\n$p")
  }

  test("ppl_filter: token join is hash-shuffled, no global sort of docs") {
    val p = plan("q_text_ppl_filter")
    assert(p.contains("ShuffledHashJoin"),
      s"token-vocab join lost the shuffle_hash hint:\n$p")
    // the only Sort allowed is the 20-row presentation sort after the
    // per-source aggregate; a per-doc global Sort would surface as a
    // Sort ABOVE a non-aggregated child — assert the final plan sorts
    // only once (the orderBy(source) on the ~20-row report)
    val sorts = "(?m)^.*Sort \\[".r.findAllIn(p).length
    assert(sorts <= 2, s"unexpected sorts ($sorts):\n$p")
  }

  test("knngraph: the capped pair join broadcasts the 512-row side") {
    // assert on the edge-builder plan: the consumer checkpoints the
    // edge table (it is read twice), which truncates this stage out of
    // the final query's lineage
    val df = LlmSim6.knnEdges(spark, sf)
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        flatten(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(s.plan)
      case _ => p.children.flatMap(flatten)
    })
    val nodes = flatten(df.queryExecution.executedPlan).map(_.nodeName)
    assert(nodes.exists(_.contains("BroadcastNestedLoopJoin")),
      s"capped pair join not broadcast: ${nodes.distinct}")
  }

  test("weibull: the regression never ranks raw rows — the cumulative " +
      "window sits above the (gap, cnt) aggregate") {
    val df = SparkEntry.queries("q_agg_weibull")(spark, sf)
    val lp = df.queryExecution.optimizedPlan
    val windows = lp.collect {
      // only the GLOBAL cumulative window — the per-customer gap lag is
      // partitioned and legitimately rides the raw orders stream
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.child.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
        s"window rides a raw stream:\n$lp")
    }
  }
}
