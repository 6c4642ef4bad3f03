package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries → PLANS.md —
  * the as-built evidence for the plan-quality claims in SCALE.md
  * (pushdown, pruning, broadcast choices, whole-stage codegen spans,
  * the custom top-k operator phases). Run after any planner-visible
  * change: `sbt "runMain graft.ExplainDump"`. */
object ExplainDump {

  private val headline = Seq(
    "q_scan_pruned",       // PushedFilters + ReadSchema
    "q_scan_partitioned",  // static partition pruning
    "q_agg_group",         // partial agg + WSCG (flagship)
    "q_join_broadcast",    // BroadcastHashJoin
    "q_join_multi",        // 5-way star, dims broadcast
    "q_join_bucketed",     // zero-exchange bucketed join
    "q_join_range",        // equi+band join, no BNLJ
    "q_subquery_exists",   // semi/anti decorrelation
    "q_topk",              // TakeOrderedAndProject
    "q_topk_native",       // custom partial/final TopKPerGroupExec
    "q_sim_cosine_topk",   // broadcast probes + native float_dot
    "q_dedup_minhash",     // LSH band self-join (blocked)
    "q_win_session",       // two window passes over one shuffle
    "q_text_decontaminate",// broadcast eval shingles, map-side funnel
    "q_agg_reagg",         // mergeable partials → final merge
    "q_fn_variant",        // variant parse-once path extraction (WSCG)
    "q_cte_recursive",     // UnionLoop recursion + gap-fill join
    "q_dedup_incremental", // delta bands ⋈ corpus index, no corpus self-join
    "q_sim_ann_ivfpq",     // map-only PQ encode, ADC over broadcast tables
    "q_join_skew_aqe",     // AQE skew-split SMJ (merge hint, hot key)
    "q_mm_phash",          // checkpointed hashes, 9-block pigeonhole join
    "q_text_unigram_lm",   // vocab shuffle-joins the exploded tokens
    "q_dedup_url",         // per-row canonicalize, one groupBy exchange
    "q_text_entropy",      // map-only sorted-run aggregate, no Generate
    "q_text_cdc",          // per-row boundary hashing, explode only output
    "q_text_bm25",         // map-only tf + one broadcast stats agg
    "q_text_bpe_pairs",    // pair explode above the (word,freq) aggregate
    "q_graph_pagerank",    // per-round message shuffle, cached edges
    "q_scd2_compress",     // two window passes over one exchange
    "q_win_retention",     // distinct-first activity, broadcast cohorts
    "q_win_funnel",        // cascaded per-user min-aggs, co-partitioned
    "q_agg_kstest",        // integer-lattice ECDF, one windowed pass
    "q_embed_kmeans",      // broadcast centroids, argmin window
    "q_join_dpp",          // dynamicpruningexpression partition filter
    "q_graph_triangles",   // support-pruned oriented wedge join
    "q_text_winnowing",    // shuffle-free per-row fingerprinting
    "q_sim_fuse",          // two TakeOrdered rank lists + tiny fusion join
    "q_agg_bootstrap",     // ×B explode, partial-agg'd replica means
    "q_join_nearest",      // JOIN-FREE bidirectional nearest via windows
    "q_win_attribution",   // RANGE-frame touch reads, no purchase×click join
    "q_agg_kendall",       // bounded grid theta self-join, never row pairs
    "q_agg_survival",      // user-keyed min-aggs + bounded KM curve windows
    "q_dedup_substring",   // map-only grams, semi-join dups, islands merge
    "q_embed_triplet",     // broadcast anchors, one argmin/argmax struct agg
    "q_win_concurrency",   // per-day sweep-line, no interval self-join
    "q_agg_auc",           // bucket-table rank statistic, no score sort
    "q_agg_lift",          // materialized pairs + shuffle_hash marginals
    "q_time_periodogram",  // 48-lag broadcast sweep over the hourly table
    "q_agg_ntile",         // lattice position grid, no raw-stream sort (r8)
    "q_agg_spearman",      // lattice rank algebra, no raw-stream sort (r8)
    "q_embed_covariance",  // bounded-state partition fold, no explode (r8)
    "q_agg_pctl_cont",     // exact interpolated percentiles off the grid
    "q_dedup_containment", // df-capped inverted-index pair blocking
    "q_time_lag_corr",     // bounded daily table, 8-lag broadcast join
    "q_graph_sssp",        // checkpointed edges, node-keyed min relax (r9)
    "q_agg_tdigest",       // ObjectHashAggregate partial/final digest (r9)
    "q_agg_tdigest_rollup",// stored-sketch merge, no second fact scan (r9)
    "q_sim_filtered",      // pushed predicate + pre-score semi-join (r9)
    "q_agg_cooksd",        // broadcast 1-row moments, TakeOrdered 20 (r12)
    "q_agg_boxcox",        // single-pass per-λ moment columns (r12)
    "q_text_ppl_filter",   // token shuffle_hash join, grid P90 (r12)
    "q_quality_drift_matrix", // bounded PSI/KS grids, 1-row mid (r12)
    "q_agg_ndcg",          // query-key window, 12dp DECIMAL terms (r13)
    "q_agg_prauc",         // bucket-grid cumulative, no score sort (r13)
    "q_graph_katz",        // exact BIGINT walk-count messages (r13)
    "q_agg_fisherexact",   // broadcast ln-lattice joins, margin grid (r13)
    "q_embed_cka",         // 16-dim explode → 256-cell moment grid (r13)
    "q_agg_psmatch",       // O(n) running score-line windows, no pairs (r14)
    "q_agg_isotonic",      // ≤50-point grid cover join, scale-invariant (r14)
    "q_agg_wasserstein",   // value-lattice CDF cumsums, 12dp segments (r14)
    "q_agg_assocrules",    // materialized pairs + broadcast marginals (r14)
    "q_agg_kde",           // broadcast 21-row grid, map-only kernel (r14)
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outPath = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.ExplainDump` over `$sfDir`. Plans are\n")
    sb.append("post-execution (AQE final). What to look for per query is\n")
    sb.append("annotated in the ExplainDump source; the assertions live in\n")
    sb.append("`src/test/scala/graft/queries/PlanSpec.scala`.\n")
    headline.foreach { id =>
      val df = SparkEntry.queries(id)(spark, sfDir)
      df.collect() // finalize AQE so join choices and codegen spans are real
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $id\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    spark.stop()
    println(s"[explain] wrote ${headline.size} plans to $outPath")
  }
}
