package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-11 late waves:
  *  - the technical indicators and ACF diagnostics keep every window
  *    PARTITIONED by event type — the raw stream never funnels into a
  *    single-partition sort;
  *  - the EDF tests' unpartitioned rank windows ride the bounded daily
  *    AGGREGATE, never raw events;
  *  - the ordinal-association grids pair-count via BROADCAST joins
  *    only (no shuffle join of two 2.5k grids, no SMJ anywhere);
  *  - the gibberish screen's top-20 is TakeOrderedAndProject (no
  *    global sort);
  *  - the bipartite projection broadcasts its degree tables. */
class PlanSpec9 extends AnyFunSuite {

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

  test("technical indicators + ACF diagnostics keep every window " +
      "partitioned by event type") {
    for (q <- Seq("q_time_bollinger", "q_time_rsi", "q_time_macd",
        "q_time_pacf", "q_agg_kendallw")) {
      val globalWin = nodes(q).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWin.isEmpty,
        s"$q has ${globalWin.size} unpartitioned WindowExec node(s)")
    }
  }

  test("EDF tests' unpartitioned rank windows sit above the bounded " +
      "daily aggregate, never the event stream") {
    for (q <- Seq("q_agg_cvm2", "q_agg_ad2")) {
      val globalWins = nodes(q).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(globalWins.nonEmpty, s"$q: expected pooled-rank windows")
      globalWins.foreach { w =>
        val sub = flattenPlan(w.child)
        val aggIdx = sub.indexWhere(_.isInstanceOf[
          org.apache.spark.sql.execution.aggregate.HashAggregateExec])
        assert(aggIdx >= 0,
          s"$q: pooled-rank window not fed by an aggregate")
      }
    }
  }

  test("ordinal-association grid pair counting joins by broadcast " +
      "only — no SortMergeJoin in somersd/gkgamma/cliffsdelta") {
    for (q <- Seq("q_agg_somersd", "q_agg_gkgamma", "q_agg_cliffsdelta")) {
      val ns = nodes(q)
      val smj = ns.collect { case j: SortMergeJoinExec => j }
      assert(smj.isEmpty, s"$q: SMJ found — grid should broadcast")
      val bcast = ns.collect {
        case j: BroadcastNestedLoopJoinExec => j
        case j: BroadcastHashJoinExec => j
      }
      assert(bcast.nonEmpty, s"$q: no broadcast join in plan")
    }
  }

  test("gibberish top-20 is TakeOrderedAndProject, not a global sort") {
    val ns = nodes("q_text_gibberish")
    assert(ns.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "expected TakeOrderedAndProject for the top-k")
  }

  test("bipartite projection broadcasts its degree tables") {
    val bhj = nodes("q_graph_bipartite").collect {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.size >= 2,
      s"expected 2 broadcast degree joins, found ${bhj.size}")
  }
}
