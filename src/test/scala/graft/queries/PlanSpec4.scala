package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-8 waves — each pins the scale
  * claim its SURVEY §2 row makes:
  *  - the order-statistics family and gains never window-sort raw
  *    fact rows (every WindowExec sits above a HashAggregate);
  *  - containment's pair join reads only df-capped (semi-join
  *    filtered) shingle streams — a raw-corpus shingle self-join
  *    would be the quadratic accident the cap exists to prevent;
  *  - radius search broadcasts the bounded probe side and never
  *    shuffles the embedding table;
  *  - lag correlation joins the bounded daily AGGREGATE with itself,
  *    never raw events. */
class PlanSpec4 extends AnyFunSuite {

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
    // descend into persisted subtrees: the r8 queries cache their
    // shared grids, so the gated nodes live under InMemoryTableScan
    case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      flattenPlan(t.relation.cachedPlan)
    case _ => p.children.flatMap(flattenPlan)
  })

  private def nodes(q: String): Seq[SparkPlan] = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    flattenPlan(df.queryExecution.executedPlan)
  }

  test("order statistics and gains: every Window runs over a " +
      "pre-aggregated lattice/bucket table") {
    // gains derives its bucket table inline — its Window must sit over
    // the pre-aggregated grid inside the query plan itself
    for (q <- Seq("q_agg_gains")) {
      val wins = nodes(q).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.nonEmpty, s"$q: expected lattice cumsum windows")
      wins.foreach { w =>
        assert(flattenPlan(w).exists(_.isInstanceOf[HashAggregateExec]),
          s"$q: Window sorts un-aggregated input:\n$w")
      }
    }
    // the three Analytics36 consumers read the write-once grid artifact
    // (no per-query rebuild, no cache state); the cumsum Window lives in
    // the artifact BUILD plan, over the pre-aggregated lattice
    for (q <- Seq("q_agg_pctl_cont", "q_agg_iqr", "q_agg_trimmed")) {
      val scans = nodes(q).collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.toString.contains("pos_grid") => sc }
      assert(scans.nonEmpty, s"$q: does not read the pos_grid artifact")
    }
    val build = Analytics36.posGridPlan(spark, sf).queryExecution
      .executedPlan
    val bwins = flattenPlan(build).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(bwins.nonEmpty, "pos_grid build lost the cumsum window")
    bwins.foreach { w =>
      assert(flattenPlan(w).exists(_.isInstanceOf[HashAggregateExec]),
        s"pos_grid build: Window sorts un-aggregated input:\n$w")
    }
  }

  test("containment: both pair-join inputs read the df-capped artifact " +
      "(write-once parquet), never the raw shingle stream; the artifact " +
      "build carries the df-cap LeftSemi") {
    val ns = nodes("q_dedup_containment")
    val pairJoins = ns.collect {
      case j: BaseJoinExec
          if j.leftKeys.map(_.toString.toLowerCase)
            .exists(_.contains("sh")) &&
            j.joinType.toString == "Inner" => j
    }
    assert(pairJoins.nonEmpty, "no shingle-keyed pair join found")
    pairJoins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val scans = flattenPlan(side).collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
        assert(scans.nonEmpty, s"pair-join side has no file scan:\n$side")
        scans.foreach { sc =>
          assert(sc.toString.contains("capped_sh5"),
            s"pair-join side reads something other than the capped " +
              s"artifact:\n$sc")
        }
      }
    }
    // the df-cap lives in the artifact BUILD plan: a LeftSemi between
    // the exploded shingle stream and the [2,50]-df keep set
    val build = LlmText10.cappedShinglesPlan(spark, sf)
      .queryExecution.executedPlan
    assert(flattenPlan(build).exists {
      case jj: BaseJoinExec => jj.joinType.toString == "LeftSemi"
      case _ => false
    }, s"artifact build plan lost the df-cap semi-join:\n$build")
  }

  test("radius search broadcasts the probes and never shuffles the " +
      "embedding table") {
    val ns = nodes("q_sim_range")
    assert(ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "probes not broadcast")
    val hashing = ns.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    // the only hash exchange allowed is the probe min_by aggregate's
    // (label-keyed, bounded); the streamed corpus side must have none
    assert(hashing.size <= 1,
      s"embedding table shuffled (${hashing.size} hash exchanges)")
  }

  test("lag correlation self-joins the bounded daily aggregate, " +
      "never raw events") {
    val ns = nodes("q_time_lag_corr")
    val joins = ns.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, "no join found")
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        val scanFree = flattenPlan(side).forall {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            // a scan directly feeding a join side is only legal if an
            // aggregate sits between them
            false
          case _ => true
        }
        val hasAgg = flattenPlan(side)
          .exists(_.isInstanceOf[HashAggregateExec])
        assert(scanFree || hasAgg,
          s"lag-corr join side is a raw scan:\n$side")
      }
    }
  }
}
