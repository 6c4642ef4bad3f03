package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-7 statistics/attribution waves —
  * each pins the SCALE claim its SURVEY §2 row makes:
  *  - the "join-free" window operators (nearest join, attribution,
  *    churn) must execute with ZERO join nodes;
  *  - Kendall's pair statistic must join the bounded GRID, never the
  *    row stream (the only join input is a post-aggregate);
  *  - Theil's per-region stats must broadcast back (no second
  *    region-keyed shuffle of the revenue table);
  *  - lexical diversity must stay a shuffle-free map until its final
  *    presentation sort (one exchange total). */
class PlanSpec2 extends AnyFunSuite {

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
    case _ => p.children.flatMap(flattenPlan)
  })

  private def nodes(q: String): Seq[SparkPlan] = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // finalize AQE so join strategy choices are real
    flattenPlan(df.queryExecution.executedPlan)
  }

  test("nearest join and attribution execute JOIN-FREE " +
      "(window picks, not per-user pair joins)") {
    for (q <- Seq("q_join_nearest", "q_win_attribution")) {
      val joins = nodes(q).collect { case j: BaseJoinExec => j }
      assert(joins.isEmpty,
        s"$q grew a join: ${joins.map(_.nodeName).mkString(", ")}")
    }
  }

  test("churn's only join is the 1-row broadcast max-period guard — " +
      "never a user- or period-keyed join") {
    val joins = nodes("q_win_churn").collect { case j: BaseJoinExec => j }
    assert(joins.size == 1, s"joins: ${joins.map(_.nodeName)}")
    // the single allowed join is the censoring guard: a cross/BNLJ
    // against a broadcast side that is itself a global aggregate (1 row)
    val j = joins.head
    assert(j.nodeName.contains("BroadcastNestedLoopJoin"),
      s"unexpected join kind: ${j.nodeName}")
    assert(j.children.exists(side => flattenPlan(side)
        .exists(_.nodeName.contains("HashAggregate"))),
      "broadcast side is not the 1-row max aggregate")
  }

  test("kendall joins the bounded grid: every join input is " +
      "post-aggregate (the row stream is never pair-joined)") {
    val ns = nodes("q_agg_kendall")
    val joins = ns.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, "expected the grid theta self-join")
    // each join subtree must contain a HashAggregate BELOW it on both
    // sides — i.e. the join consumes count tables, not raw lineitem
    joins.foreach { j =>
      j.children.foreach { side =>
        val agg = flattenPlan(side).exists(
          _.nodeName.contains("HashAggregate"))
        assert(agg, s"kendall join side reads pre-aggregate rows:\n$side")
      }
    }
  }

  test("theil broadcasts the per-region stats back (no second " +
      "region-keyed shuffle of the revenue table)") {
    val joins = nodes("q_agg_theil").collect { case j: BaseJoinExec => j }
    assert(joins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"stats join lost broadcast: ${joins.map(_.nodeName)}")
  }

  test("skyline, backtest, markov, and rollmedian execute JOIN-FREE " +
      "(level/daily windows, not dominance or calendar self-joins)") {
    for (q <- Seq("q_win_skyline", "q_agg_backtest", "q_agg_markov",
        "q_win_rollmedian")) {
      val joins = nodes(q).collect { case j: BaseJoinExec => j }
      assert(joins.isEmpty,
        s"$q grew a join: ${joins.map(_.nodeName).mkString(", ")}")
    }
  }

  test("lift's ranking is a TakeOrdered top-20, never a full sort of " +
      "the scored pairs") {
    val ns = nodes("q_agg_lift")
    assert(ns.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"lift lost TakeOrdered: ${ns.map(_.nodeName).distinct}")
  }

  test("lexdiv is map-only: exactly one exchange (the presentation " +
      "sort), zero joins, zero aggregates") {
    val ns = nodes("q_text_lexdiv")
    assert(ns.collect { case j: BaseJoinExec => j }.isEmpty, "grew a join")
    assert(!ns.exists(_.nodeName.contains("HashAggregate")),
      "grew an aggregate")
    val exchanges = ns.filter(_.nodeName.contains("Exchange"))
    assert(exchanges.size <= 1,
      s"more than the sort exchange: ${exchanges.map(_.nodeName)}")
  }
}
