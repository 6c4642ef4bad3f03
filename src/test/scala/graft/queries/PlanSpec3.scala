package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the closing round-7 waves — each pins the
  * scale claim its SURVEY §2 row makes:
  *  - elasticity must BROADCAST the part dimension (a shuffled dim
  *    join would move the fact table twice);
  *  - the OOV vocabulary must broadcast back over the token stream
  *    (it is a bounded top-K cut);
  *  - the per-column profile must be ONE shared-scan aggregation
  *    (no per-column jobs → exactly one parquet scan node);
  *  - CUPED and lifespan execute join-free up to their 1-row
  *    broadcast midpoint guard. */
class PlanSpec3 extends AnyFunSuite {

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
    df.collect()
    flattenPlan(df.queryExecution.executedPlan)
  }

  test("elasticity broadcasts the part dimension") {
    val joins = nodes("q_agg_elasticity").collect { case j: BaseJoinExec => j }
    assert(joins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"dimension join lost broadcast: ${joins.map(_.nodeName)}")
  }

  test("oov broadcasts the frozen vocabulary over the token stream") {
    val joins = nodes("q_text_oov").collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty &&
      joins.forall(_.isInstanceOf[BroadcastHashJoinExec]),
      s"vocab join not broadcast: ${joins.map(_.nodeName)}")
  }

  test("profile is one shared-scan aggregation: exactly one parquet " +
      "scan, zero joins") {
    val ns = nodes("q_quality_profile")
    assert(ns.collect { case j: BaseJoinExec => j }.isEmpty, "grew a join")
    val scans = ns.filter(_.nodeName.toLowerCase.contains("scan parquet"))
    assert(scans.size == 1,
      s"expected ONE scan, got ${scans.size}: ${ns.map(_.nodeName).distinct}")
  }

  test("cuped and lifespan execute join-free up to the 1-row " +
      "broadcast midpoint guard") {
    val cj = nodes("q_agg_cuped").collect { case j: BaseJoinExec => j }
    assert(cj.size <= 1 &&
      cj.forall(_.nodeName.contains("BroadcastNestedLoopJoin")),
      s"cuped joins: ${cj.map(_.nodeName)}")
    val lj = nodes("q_win_lifespan").collect { case j: BaseJoinExec => j }
    assert(lj.isEmpty, s"lifespan grew a join: ${lj.map(_.nodeName)}")
  }

  test("rank ops (ntile, spearman) never window-sort the raw fact " +
      "stream: every Window runs over a pre-aggregated lattice table") {
    // VERDICT r7 item 4: a Window.partitionBy(l_returnflag) over the raw
    // scan sorts the whole stream at parallelism = 3 group values. The
    // lattice rewrite keeps windows strictly ABOVE the (group, value)
    // count aggregate, so every WindowExec subtree must contain a
    // HashAggregate and the bounded sort it implies.
    for (q <- Seq("q_agg_ntile", "q_agg_spearman")) {
      val ns = nodes(q)
      val wins = ns.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.nonEmpty, s"$q: expected lattice-cumsum windows")
      wins.foreach { w =>
        assert(flattenPlan(w).exists(_.isInstanceOf[
            org.apache.spark.sql.execution.aggregate.HashAggregateExec]),
          s"$q: Window sorts un-aggregated input:\n$w")
      }
    }
  }
}
