package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-9 sixth wave:
  *  - the native t-digest aggregate must run as ObjectHashAggregate
  *    with a partial/final split (map-side sketch combine — the whole
  *    point of a mergeable TypedImperativeAggregate), never the
  *    sort-based fallback;
  *  - weighted SSSP must stay equi-join-only (no nested-loop / product
  *    anywhere in 4 relaxation rounds), and the localCheckpointed edge
  *    cache must cut the lineage: no lineitem parquet scan survives
  *    into the executed plan. */
class PlanSpec6 extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def flattenPlan(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flattenPlan(a.executedPlan)
    case q: QueryStageExec => flattenPlan(q.plan)
    case r: ReusedExchangeExec => flattenPlan(r.child)
    case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      flattenPlan(t.relation.cachedPlan)
    case _ => p.children.flatMap(flattenPlan)
  })

  private def nodes(q: String): Seq[SparkPlan] = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    flattenPlan(df.queryExecution.executedPlan)
  }

  test("q_agg_tdigest: the digest aggregate runs as ObjectHashAggregate " +
      "with a partial/final split (map-side sketch combine), not the " +
      "sort-based fallback") {
    val ns = nodes("q_agg_tdigest")
    val oha = ns.collect {
      case a: ObjectHashAggregateExec
          if a.aggregateExpressions.exists(
            _.aggregateFunction.prettyName == "tdigest_quantiles") => a
    }
    assert(oha.size >= 2,
      s"expected partial+final ObjectHashAggregate pair, got ${oha.size}")
    val modes = oha.flatMap(_.aggregateExpressions.map(_.mode.toString)).toSet
    assert(modes.exists(_.contains("Partial")) &&
      modes.exists(_.contains("Final")),
      s"expected Partial and Final digest stages, got $modes")
    val sortFallback = ns.collect {
      case a: SortAggregateExec
          if a.aggregateExpressions.exists(
            _.aggregateFunction.prettyName.startsWith("tdigest")) => a
    }
    assert(sortFallback.isEmpty,
      "digest aggregate fell back to SortAggregate")
  }

  test("q_agg_tdigest_rollup: both levels (tdigest_agg fine grain, " +
      "tdigest_merge_quantiles rollup) run as ObjectHashAggregate with " +
      "map-side partials") {
    val ns = nodes("q_agg_tdigest_rollup")
    for (fn <- Seq("tdigest_agg", "tdigest_merge_quantiles")) {
      val oha = ns.collect {
        case a: ObjectHashAggregateExec
            if a.aggregateExpressions.exists(
              _.aggregateFunction.prettyName == fn) => a
      }
      assert(oha.size >= 2,
        s"$fn: expected partial+final ObjectHashAggregate pair, " +
          s"got ${oha.size}")
    }
  }

  test("q_graph_sssp: equi-joins only across all four relaxation " +
      "rounds, and the checkpointed edge cache truncates lineage " +
      "(no lineitem scan in the executed plan)") {
    val ns = nodes("q_graph_sssp")
    val nested = ns.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(nested.isEmpty,
      s"nested-loop join in the SSSP plan: ${nested.map(_.nodeName)}")
    val liScans = ns.collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("lineitem.parquet")) => s
    }
    assert(liScans.isEmpty,
      "lineitem scan leaked past the localCheckpointed edge cache")
  }
}
