package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-9 filtered vector search:
  *  - the metadata predicate reaches the documents parquet scan as a
  *    pushed filter (not a post-scan Filter over all rows);
  *  - the id semi-join prunes the embedding stream BEFORE probe
  *    scoring (exact variant) / INSIDE the probed cells, below the
  *    cell-keyed probe join (IVF variant) — never a post-rank filter,
  *    which would silently return < k results per probe. */
class PlanSpec5 extends AnyFunSuite {

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

  private def docScans(ns: Seq[SparkPlan]): Seq[FileSourceScanExec] =
    ns.collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("documents.parquet")) => s
    }

  test("q_sim_filtered: lang predicate is pushed into the documents " +
      "scan; semi-join prunes below the broadcast-probe join") {
    val ns = nodes("q_sim_filtered")
    val scans = docScans(ns)
    assert(scans.nonEmpty, "no documents scan found")
    scans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("EqualTo(lang,en)"),
        s"lang filter not pushed: $pushed")
    }
    val probeJoins = ns.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(probeJoins.nonEmpty, "probes not broadcast")
    // the probe cross-join's streamed side must already be semi-filtered
    probeJoins.foreach { j =>
      val semiBelow = (flattenPlan(j.left) ++ flattenPlan(j.right)).exists {
        case jj: BaseJoinExec => jj.joinType.toString == "LeftSemi"
        case _ => false
      }
      assert(semiBelow,
        s"probe join scores the unfiltered corpus:\n$j")
    }
  }

  test("q_sim_filtered_ivf: predicate semi-join sits BELOW the " +
      "cell-keyed probe join (filter inside cells, not post-rank)") {
    val ns = nodes("q_sim_filtered_ivf")
    val cellJoins = ns.collect {
      case j: BaseJoinExec
          if j.joinType.toString == "Inner" &&
            j.leftKeys.map(_.toString.toLowerCase)
              .exists(_.contains("cell")) => j
    }
    assert(cellJoins.nonEmpty, "no cell-keyed probe join found")
    cellJoins.foreach { j =>
      val semiBelow = (flattenPlan(j.left) ++ flattenPlan(j.right)).exists {
        case jj: BaseJoinExec => jj.joinType.toString == "LeftSemi"
        case _ => false
      }
      assert(semiBelow,
        s"cell join reads unfiltered cell members:\n$j")
    }
    // and the predicate still reaches the documents parquet scan
    val scans = docScans(ns)
    assert(scans.nonEmpty, "no documents scan found")
    scans.foreach { s =>
      val pushed = s.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("EqualTo(lang,en)"),
        s"lang filter not pushed: $pushed")
    }
  }
}
