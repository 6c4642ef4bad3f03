package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Repo-wide gate for the one window-shape that cannot scale: a
  * partition-less (global) Window over an unbounded input serializes
  * the whole stream through one task. The repo's discipline is that a
  * global window may only ride a BOUNDED table (an aggregate output, a
  * grid, a sketch) — this spec makes that discipline mechanical
  * (VERDICT r11 item 4): every declared query's optimized logical plan
  * is swept; any global Window must (a) belong to a whitelisted id and
  * (b) have an Aggregate somewhere beneath it (the bounded-input
  * witness). A new op that puts a global window on a raw stream fails
  * here before it ships.
  *
  * Streaming rig ids (q_stream_*) are skipped: building them executes
  * the MemoryStream rigs (their state-boundedness is spec'd in
  * StreamingLlmSpec / StreamingQ*Spec instead). */
class WindowAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Ids allowed to carry a partition-less Window; each must still show
    * an Aggregate below the window (checked), and the comment names the
    * bounded table the window rides. */
  private val whitelist: Set[String] = Set(
    // ECDF / rank lattices: window rides the distinct value grid
    "q_agg_ad2", "q_agg_cvm2", "q_agg_kruskal", "q_agg_mannwhitney",
    "q_agg_auc", "q_agg_conformal", "q_agg_fdr", "q_agg_hill",
    // calibration / gains / psi / mixture: decile- or bin-bounded
    "q_agg_calibration", "q_agg_gains", "q_agg_psi", "q_agg_mixture",
    // survival: per-day removal table (calendar-bounded)
    "q_agg_survival", "q_agg_nelsonaalen", "q_agg_gst",
    // entropy-rate symbol grid
    "q_agg_entropy_rate",
    // embeddings: 64-dim stats / capped pair sample
    "q_embed_dimstats", "q_embed_isotropy",
    // fusion of two top-k rank lists (≤2k rows)
    "q_sim_fuse",
    // vocab/shingle aggregates (corpus-vocab-bounded)
    "q_text_coverage", "q_text_heaps", "q_text_jsd", "q_text_zipf",
    // calendar-bounded daily series
    "q_time_changepoint", "q_time_drawdown", "q_time_rolling_corr",
    // r12: day-ordinal + residual lag over the daily aggregate;
    // median-rank cumulative over the bounded (gap, cnt) grid;
    // P90 cumulative over the bounded (score, cnt) grid
    "q_agg_durbinwatson", "q_agg_weibull", "q_text_ppl_filter",
    // r12: KS cumulative over the bounded integer value grid
    "q_quality_drift_matrix",
    // r13: cumulative TP/FP over the q_agg_auc decimal bucket grid
    "q_agg_prauc", "q_agg_youden",
    // r13: log-factorial cumulative over the margin-bounded 0..n grid
    // (replicated under each broadcast join alias)
    "q_agg_fisherexact",
    // r13: cumulative counts over the bounded decimal bucket grid
    "q_agg_moodmedian",
    // r13: lag/rolling windows over the day-aligned daily-count table
    "q_time_coint", "q_time_rollbeta",
    // r13: global max(n) over the 256-cell covariance pair grid
    "q_embed_cka",
    // r13: Lorenz rank/cumsum over the per-customer spend aggregate
    "q_agg_lorenz",
    // r13: SPRT cumulative LLR over the calendar-bounded daily grid
    "q_agg_sprt",
    // r13: midrank cumulative over the bounded value-bucket grid
    "q_agg_dunn",
    // r13: P90 threshold cumulative over the bounded degree grid
    "q_graph_conductance",
    // r12: KM risk-set cumsums + step integral over the day-bounded curve
    "q_agg_survmedian",
    // per-user collapsed aggregates (user-universe-bounded)
    "q_win_lifespan", "q_win_purchasegap", "q_win_reorder", "q_win_rfm",
    "q_win_uplift",
    // 16-row coalition mask grid
    "q_win_shapley",
    // pareto frontier over the per-key aggregate
    "q_win_skyline",
    // r14: cumulative-revenue line over the per-customer aggregate
    // (customer-universe-bounded, the Lorenz shape)
    "q_sample_systematic",
    // r14: prefix sums over the ≤50-point quantity grid (minimax
    // isotonic closed form)
    "q_agg_isotonic",
    // r14: forward window stats + row_number over the calendar-bounded
    // daily click grid (motif / Yule-Walker)
    "q_time_motif", "q_time_yulewalker",
    // r14: nearest-control scan over the user-universe-bounded
    // propensity score line
    "q_agg_psmatch",
    // r14: CDF cumsums over the value-lattice-bounded support grid
    "q_agg_wasserstein",
    // r14: criterion ranks over the supplier-universe-bounded
    // aggregate (the rfm precedent); copeland consumes the
    // checkpointed 20-row slate
    "q_win_borda", "q_win_copeland",
    // r15: AB-score cumulative over the ≤50-cell quantity grid
    "q_agg_ansari",
    // r15: combined+within midrank cumulatives over the bounded
    // value-bucket grid (the mannwhitney precedent)
    "q_agg_brunnermunzel",
    // r15: block-range rank cumulative over the week-count-bounded
    // range-value table (quade); combined midrank cumulative over the
    // ≤50-cell quantity grid (cuzick)
    "q_agg_quade", "q_agg_cuzick",
  )

  /** The audit rule, factored out so negative cases can exercise it
    * directly: returns the offence string for (id, optimized plan), or
    * None. A global window is legal only when (a) the id is whitelisted
    * AND (b) every global window has a bounded-input witness beneath
    * it: an Aggregate (grid/sketch/collapsed table), a GlobalLimit
    * (top-k / capped sample), or a LogicalRDD — the eager-checkpoint-
    * of-a-bounded-aggregate pattern (r16; localCheckpoint(true)
    * truncates the plan to a LogicalRDD leaf, hiding the Aggregate the
    * window actually rides — q_win_borda). The LogicalRDD escape is
    * only reachable FOR WHITELISTED ids, whose comment must name the
    * bounded table the checkpoint materializes; an unwhitelisted
    * global window still fails regardless of what sits beneath it. */
  private def audit(id: String, plan: LogicalPlan): Option[String] = {
    val globals = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    if (globals.isEmpty) None
    else if (!whitelist.contains(id))
      Some(s"$id (${globals.size} global window(s), not whitelisted)")
    else if (!globals.forall(_.child.exists {
        case _: Aggregate => true    // grid/sketch/collapsed table
        case _: GlobalLimit => true  // top-k / capped sample
        case _: LogicalRDD => true   // eager checkpoint of a bounded aggregate
        case _ => false
      }))
      Some(s"$id (whitelisted but a global window has no " +
        "Aggregate/Limit/checkpoint beneath it — unbounded input)")
    else None
  }

  test("every partition-less Window rides a whitelisted bounded input") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val ids = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q_stream_"))
    ids.foreach { id =>
      val plan: LogicalPlan =
        try SparkEntry.queries(id)(spark, sf).queryExecution.optimizedPlan
        catch {
          case e: Exception =>
            fail(s"$id: failed to build/optimize at $sf: ${e.getMessage}")
        }
      audit(id, plan).foreach(offenders += _)
    }
    assert(offenders.isEmpty,
      "partition-less WindowExec on a non-whitelisted query:\n  " +
        offenders.mkString("\n  "))
  }

  test("negative: an unwhitelisted global window over a raw stream fails") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // a global rank directly over the raw fact scan — the exact shape
    // the gate exists to stop
    val bad = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
    val off = audit("q__not_whitelisted", bad.queryExecution.optimizedPlan)
    assert(off.exists(_.contains("not whitelisted")),
      s"expected the unwhitelisted global window to be flagged, got $off")
  }

  test("negative: a whitelisted id with a global window on a raw stream fails") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // same raw-stream window, but under a whitelisted id: the witness
    // check (Aggregate/Limit/checkpoint beneath) must still fire — the
    // whitelist alone is not a pass
    val bad = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("rk", row_number().over(Window.orderBy(col("l_orderkey"))))
    val off = audit("q_win_borda", bad.queryExecution.optimizedPlan)
    assert(off.exists(_.contains("no Aggregate/Limit/checkpoint")),
      s"expected the raw-input global window to be flagged, got $off")
  }

  test("positive: checkpoint-of-aggregate satisfies the witness for a whitelisted id") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the q_win_borda shape: global rank over an eagerly-checkpointed
    // aggregate (plan truncated to LogicalRDD)
    val agg = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("q"))
      .localCheckpoint(true)
    val good = agg.withColumn("rk",
      row_number().over(Window.orderBy(desc("q"), col("l_suppkey"))))
    assert(audit("q_win_borda", good.queryExecution.optimizedPlan).isEmpty)
    // ... but the same shape under an UNwhitelisted id still fails
    assert(audit("q__not_whitelisted", good.queryExecution.optimizedPlan)
      .exists(_.contains("not whitelisted")))
  }
}
