package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan gates for the round-10 waves:
  *  - q_agg_hill's corpus-wide top-101 must plan as
  *    TakeOrderedAndProject (per-partition heaps + one bounded merge),
  *    never a global sort;
  *  - q_sample_coreset's farthest pick must be the struct argmax — NO
  *    unpartitioned window over the corpus anywhere in the plan;
  *  - q_embed_binary's two rank pipelines must each qualify for
  *    WindowGroupLimit map-side pruning. */
class PlanSpec7 extends AnyFunSuite {

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

  test("q_agg_hill: the global top-101 plans as " +
      "TakeOrderedAndProject, not a full sort") {
    val ns = nodes("q_agg_hill")
    val topk = ns.collect { case t: TakeOrderedAndProjectExec => t }
    assert(topk.nonEmpty, "no TakeOrderedAndProject in the hill plan")
  }

  test("q_sample_coreset: no unpartitioned window over the corpus — " +
      "the farthest pick is a combinable struct argmax") {
    val ns = nodes("q_sample_coreset")
    val globalWin = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWin.isEmpty,
      s"unpartitioned WindowExec in the coreset plan: ${globalWin.size}")
  }

  test("q_embed_binary: both rank pipelines carry WindowGroupLimit " +
      "map-side pruning") {
    val ns = nodes("q_embed_binary")
    val wgl = ns.collect { case w: WindowGroupLimitExec => w }
    // two rankings × (partial + final) = at least 4 nodes
    assert(wgl.size >= 4,
      s"expected >=4 WindowGroupLimit nodes (2 rankings, partial+final)" +
        s", got ${wgl.size}")
  }
}
