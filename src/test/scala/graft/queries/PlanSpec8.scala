package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-11 waves:
  *  - the rank/series ops' windows are all PARTITIONED (per event
  *    type / per block key) — the raw stream never funnels through a
  *    single-partition window (hodges–lehmann, permentropy, peaks,
  *    stratified split);
  *  - the statistic assemblies join their 1-row/bounded aggregates by
  *    BROADCAST, and no plan degenerates to a broadcast nested-loop
  *    join with a non-trivial build side;
  *  - kruskal's only unpartitioned window runs over the BOUNDED bucket
  *    table (post-aggregation), never the event stream. */
class PlanSpec8 extends AnyFunSuite {

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

  test("per-series ops keep every window PARTITIONED: hodges-lehmann, " +
      "permutation entropy, peaks, stratified split") {
    for (q <- Seq("q_agg_hodgeslehmann", "q_time_permentropy",
        "q_time_peaks", "q_split_stratified_lang")) {
      val globalWin = nodes(q).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWin.isEmpty,
        s"$q has ${globalWin.size} unpartitioned WindowExec node(s)")
    }
  }

  test("kruskal's unpartitioned cumulative window reads the bounded " +
      "bucket AGGREGATE, never the event stream") {
    val ns = nodes("q_agg_kruskal")
    val globalWins = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWins.nonEmpty, "expected the bucket-rank window")
    // every unpartitioned window must sit above an aggregation —
    // flattening its subtree must find a HashAggregate before any scan
    globalWins.foreach { w =>
      val sub = flattenPlan(w.child)
      val aggIdx = sub.indexWhere(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec])
      assert(aggIdx >= 0,
        "bucket-rank window not fed by an aggregate (would sort the " +
          "raw stream on one partition)")
    }
  }

  test("q_agg_iv collapses to a single aggregate chain — ZERO joins " +
      "of any kind") {
    val joins = nodes("q_agg_iv").collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      s"iv should be join-free, found ${joins.map(_.nodeName)}")
  }

  test("statistic assemblies broadcast their bounded sides (ate, " +
      "logrank, clustcoef, mixture) and never build a non-broadcast NLJ") {
    for (q <- Seq("q_agg_ate", "q_agg_logrank",
        "q_graph_clustcoef", "q_agg_mixture")) {
      val ns = nodes(q)
      val bnlj = ns.collect { case j: BroadcastNestedLoopJoinExec => j }
      // BNLJ is legal only as the 1-row-aggregate cross join shape:
      // every BNLJ in these plans must carry a broadcast side
      assert(bnlj.forall(_.buildSide != null), s"$q: malformed BNLJ")
      val bhj = ns.collect { case j: BroadcastHashJoinExec => j }
      // at least one broadcast join or broadcast-cross shape appears
      assert(bhj.nonEmpty || bnlj.nonEmpty,
        s"$q: expected broadcast assembly joins, found none")
    }
  }
}
