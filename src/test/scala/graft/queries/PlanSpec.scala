package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan quality gates (SURVEY §4.B / the 100 TB design rules):
  * filters and projections must reach the parquet scan, dimension joins
  * must broadcast, top-k must not global-sort, and the hot relational
  * path must stay inside whole-stage codegen. These assertions are what
  * keeps a plan regression from silently shipping. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // finalize AQE so codegen spans and join choices are real
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString()
      case other => other.toString()
    }
  }

  /** Every node of the executed plan, descending THROUGH AQE query-stage
    * leaves: `collect` on the adaptive plan alone sees only the stage
    * boundaries (QueryStageExec children are empty), so node-type
    * assertions written against it are vacuously true. */
  private def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      flattenPlan(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      flattenPlan(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      flattenPlan(r.child)
    case _ => p.children.flatMap(flattenPlan)
  })

  private def deepNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    flattenPlan(df.queryExecution.executedPlan)

  test("scan pruning: filter is pushed down and only needed columns read") {
    val p = plan("q_scan_pruned")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"), s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_linenumber:int,l_shipdate:timestamp_ntz>"), s"columns not pruned:\n$p")
  }

  test("dimension joins broadcast instead of shuffling the fact side") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
    val multi = plan("q_join_multi")
    assert(multi.contains("BroadcastHashJoin"), s"star join lost broadcast:\n$multi")
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k got a full sort:\n$p")
  }

  test("flagship aggregate stays inside whole-stage codegen") {
    val p = plan("q_agg_group")
    // '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
    assert(p.contains("partial_sum"), s"no map-side partial aggregation:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
  }

  test("as-of join is an equi hash/merge join + rank, not a BNLJ") {
    val p = plan("q_join_asof")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"as-of join degenerated to BNLJ:\n$p")
  }

  test("cosine top-k broadcasts the probe side") {
    val p = plan("q_sim_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("Broadcast"),
      s"probes not broadcast:\n$p")
    assert(p.toLowerCase.contains("floatdot") ||
      p.toLowerCase.contains("float_dot"),
      s"native dot product missing:\n$p")
  }

  test("hive layout scan prunes partitions statically") {
    val p = plan("q_scan_partitioned")
    assert(p.contains("PartitionFilters: [isnotnull(o_year"),
      s"no partition filter:\n$p")
  }

  test("bucketed join runs with zero shuffle exchange") {
    val p = plan("q_join_bucketed")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no join found:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles on the join key:\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"bucket metadata missing from scan:\n$p")
  }

  test("salted join result shape matches and both salt sides align") {
    val rows = SparkEntry.queries("q_join_salted")(spark, sf).collect()
    assert(rows.length == 5, s"expected 5 priorities: ${rows.length}")
  }

  test("limit+offset pushes a partial limit below the sort boundary") {
    val rows = SparkEntry.queries("q_limit_offset")(spark, sf).collect()
    assert(rows.length == 25 && rows.head.getLong(0) == 100L,
      s"offset/limit wrong: ${rows.take(3).toSeq}")
  }

  test("range join keeps its equi key: hash/merge join, not a BNLJ") {
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join degenerated to a cross-shape join:\n$p")
  }

  test("bloom join: probe filters the fact scan below the join, and the " +
      "sketch rejects non-building keys") {
    val df = SparkEntry.queries("q_join_bloom")(spark, sf)
    df.collect()
    // the graft_bloom_contains probe must sit in a Filter that has a
    // FileSourceScan descendant (fact side, pre-shuffle) — not above a
    // join.
    val probeFilters = deepNodes(df).collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.toLowerCase.contains("bloomcontains") => f
    }
    assert(probeFilters.nonEmpty,
      s"no bloom probe Filter in plan:\n${df.queryExecution.executedPlan}")
    probeFilters.foreach { f =>
      val sub = flattenPlan(f)
      val hasScanBelow = sub.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
      val hasJoinBelow = sub.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
      assert(hasScanBelow && !hasJoinBelow,
        s"bloom probe is not a scan-side pre-join filter:\n$f")
    }
    // sketch semantics: a key that is certainly absent must be rejected
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 100L).foreach(bloom.putLong)
    val os = new java.io.ByteArrayOutputStream()
    bloom.writeTo(os)
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val probe = spark.range(0, 10000).select(
      call_function("graft_bloom_contains", lit(os.toByteArray),
        col("id")).as("hit"), col("id"))
    val hits = probe.filter(col("hit")).select("id").collect().map(_.getLong(0))
    assert((0L until 100L).forall(hits.contains), "bloom lost a true member")
    assert(hits.length < 300, s"false-positive rate way off: ${hits.length}")
  }

  test("EXISTS/NOT EXISTS decorrelate to semi/anti joins") {
    val p = plan("q_subquery_exists")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"subqueries did not decorrelate:\n$p")
  }

  test("sequence packing never funnels the corpus through one window task") {
    val df = SparkEntry.queries("q_text_pack")(spark, sf)
    df.collect()
    val nodes = deepNodes(df)
    val globalWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      s"partition-less Window (single-task cumsum) in plan:\n" +
        df.queryExecution.executedPlan)
    // single-partition stages may only carry pre-aggregated scalars (the
    // min/max bounds), never the corpus: every SinglePartition exchange
    // must sit directly on a partial HashAggregate
    val single = nodes.collect {
      case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if ex.outputPartitioning.numPartitions == 1 => ex
    }
    single.foreach { ex =>
      val feeder = ex.child match {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w.child
        case other => other
      }
      assert(feeder.isInstanceOf[
          org.apache.spark.sql.execution.aggregate.HashAggregateExec],
        s"SinglePartition exchange over non-aggregated data:\n$ex")
    }
  }

  test("IVF ANN ranks candidates with the native top-k heaps, not a window sort") {
    val df = SparkEntry.queries("q_sim_ann_ivf")(spark, sf)
    df.collect()
    val nodes = deepNodes(df)
    val topk = nodes.count(
      _.getClass.getSimpleName.startsWith("TopKPerGroupExec"))
    assert(topk >= 2, s"expected partial+final TopKPerGroupExec:\n" +
      df.queryExecution.executedPlan)
    val searchWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(searchWindows.isEmpty,
      s"global window sort in ANN search:\n${df.queryExecution.executedPlan}")
  }

  test("stratified sample is seed-deterministic and respects fractions") {
    val r1 = SparkEntry.queries("q_sample_stratified")(spark, sf).collect()
    val r2 = SparkEntry.queries("q_sample_stratified")(spark, sf).collect()
    assert(r1.toSeq == r2.toSeq, "stratified sample not reproducible")
    val byFlag = r1.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(!byFlag.contains("R"), "0-fraction stratum sampled")
    assert(byFlag.getOrElse("A", 0) > byFlag.getOrElse("N", 0),
      s"20% stratum smaller than 5% stratum: $byFlag")
  }

  test("native top-k operator: partial heap before the exchange, " +
      "results identical to the window formulation") {
    val p = plan("q_topk_native")
    assert("TopKPerGroup".r.findAllIn(p).length >= 2,
      s"expected partial+final TopKPerGroupExec:\n$p")
    assert(p.contains("Exchange hashpartitioning(l_orderkey"),
      s"no clustering exchange between the phases:\n$p")
    val native = SparkEntry.queries("q_topk_native")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(5), r.getDouble(4)))
    val window = SparkEntry.queries("q_topk_per_group")(spark, sf).collect()
    assert(native.length == window.length,
      s"row count differs: native=${native.length} window=${window.length}")
    assert(native.forall(_._2 <= 3), "rank exceeded k")
  }

  test("vocabulary joins (tfidf dfreq, unigram-lm vocab) are shuffle " +
      "joins, never broadcasts") {
    // One scale story for web-scale vocabularies (VERDICT r5 item 4):
    // the distinct-token set of noisy text grows with the corpus, so a
    // token-keyed aggregate must never come back via broadcast. Both
    // ops pin a w-keyed ShuffledHashJoin; the only allowed broadcast is
    // the 1-row totals/corpus-size aggregate.
    for (q <- Seq("q_text_tfidf", "q_text_unigram_lm")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val nodes = deepNodes(df)
      val shj = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(shj.nonEmpty,
        s"$q: vocabulary join is not a ShuffledHashJoin:\n" +
          df.queryExecution.executedPlan)
      val badBroadcast = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.leftKeys.nonEmpty => j
      }
      assert(badBroadcast.isEmpty,
        s"$q: keyed broadcast join found (vocabulary broadcast?):\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("shuffle_hash hint yields a ShuffledHashJoin with the dim as build") {
    val df = SparkEntry.queries("q_join_shj")(spark, sf)
    df.collect()
    val shj = deepNodes(df).collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shj.nonEmpty,
      s"no ShuffledHashJoin in:\n${df.queryExecution.executedPlan}")
  }

  test("AQE splits the manufactured skew partition (SMJ runs isSkewJoin)") {
    // Tighten the skew thresholds so the sf0.01 hot key (25% of lineitem
    // on one join key) is over the bar — at production scale the default
    // 256 MB threshold plays the same role. Restore in finally: the
    // session is shared across suites.
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("q_join_skew_aqe")(spark, "/root/testdata/sf0.01")
      df.collect()
      val smj = deepNodes(df).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty,
        s"skew query lost its sort-merge join:\n${df.queryExecution.executedPlan}")
      assert(smj.exists(_.isSkewJoin),
        s"AQE did not mark the join skew-optimized:\n${df.queryExecution.executedPlan}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => spark.conf.set(k, x)
                case None => spark.conf.unset(k) }
    }
  }

  test("sessionization pays one shuffle for both window passes") {
    val df = SparkEntry.queries("q_win_session")(spark, sf)
    df.collect()
    // lag + running-sum share (user_id, us, event_id) clustering; the
    // session agg reuses it too. Allowed exchanges: one hashpartitioning
    // on user_id + the final presentation sort's rangepartitioning.
    val exchanges = deepNodes(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected at least the presentation sort " +
      "exchange — the traversal itself must see inside AQE stages")
    val hashing = exchanges.count(
      _.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hashing == 1,
      s"window passes re-shuffled ($hashing hash exchanges):\n" +
        df.queryExecution.executedPlan)
  }

  test("PII scrub and entropy scoring are map-only: no shuffle, no explode") {
    // Both ops must scale with bytes scanned: the only allowed exchange
    // is the presentation sort's rangepartitioning. Entropy especially
    // must NOT take the explode→groupBy form (its per-row sorted-run
    // aggregate exists precisely to avoid shuffling the token stream).
    for (q <- Seq("q_text_pii", "q_text_entropy")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val nodes = deepNodes(df)
      val hashing = nodes.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("hashpartitioning") => e
      }
      assert(hashing.isEmpty,
        s"$q shuffled (${hashing.size} hash exchanges):\n" +
          df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.GenerateExec]),
        s"$q exploded the token stream:\n" + df.queryExecution.executedPlan)
    }
  }

  test("content-defined chunking computes boundaries per-row, no shuffle") {
    // the chunk explode (Generate) is the OUTPUT, but boundary hashing
    // must never take the explode→window form — no hash exchange allowed
    val df = SparkEntry.queries("q_text_cdc")(spark, sf)
    df.collect()
    val hashing = deepNodes(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    assert(hashing.isEmpty,
      s"CDC shuffled (${hashing.size} hash exchanges):\n" +
        df.queryExecution.executedPlan)
  }

  test("URL dedup pays exactly one shuffle (the canonical-key groupBy)") {
    val df = SparkEntry.queries("q_dedup_url")(spark, sf)
    df.collect()
    val hashing = deepNodes(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    assert(hashing.size == 1,
      s"expected one canonical-key exchange, got ${hashing.size}:\n" +
        df.queryExecution.executedPlan)
  }

  test("dedup clustering converges to recursive-CTE components") {
    // 500 docs at sf0.001 → some multi-doc components; labels must be
    // the component-min doc_id and be stable across runs
    val r1 = SparkEntry.queries("q_dedup_cluster")(spark, sf).collect()
    val r2 = SparkEntry.queries("q_dedup_cluster")(spark, sf).collect()
    assert(r1.toSeq == r2.toSeq, "clustering not deterministic")
    val grps = r1.map(_.getLong(1)).distinct.length
    assert(grps < r1.length, s"no components merged: $grps of ${r1.length}")
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame) =
    deepNodes(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }

  test("BM25 never shuffles document rows: one stats exchange + top-k") {
    // tf comes from per-row higher-order filters; the only shuffle may
    // carry the single-row corpus-stats aggregate, and the ranking must
    // be TakeOrderedAndProject, not a global sort.
    val df = SparkEntry.queries("q_text_bm25")(spark, sf)
    df.collect()
    val sh = shuffles(df)
    assert(sh.size == 1, s"expected only the stats-agg exchange, got " +
      s"${sh.size}:\n${df.queryExecution.executedPlan}")
    assert(deepNodes(df).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      s"BM25 top-20 got a full sort:\n${df.queryExecution.executedPlan}")
  }

  test("BPE pair explode runs over the vocabulary, not the corpus") {
    // The plan must aggregate (word, freq) BEFORE the pair Generate:
    // some Generate's subtree contains the word-frequency HashAggregate.
    // Corpus rows cross only the first (word-explode) Generate.
    val df = SparkEntry.queries("q_text_bpe_pairs")(spark, sf)
    df.collect()
    val gensAboveAgg = deepNodes(df).collect {
      case g: org.apache.spark.sql.execution.GenerateExec
        if flattenPlan(g).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec])
        => g
    }
    assert(gensAboveAgg.nonEmpty, "pair explode is not above the vocab " +
      s"aggregate:\n${df.queryExecution.executedPlan}")
    assert(shuffles(df).size == 2, // vocab agg + pair agg, both vocab-sized
      s"expected two vocab-sized exchanges:\n${df.queryExecution.executedPlan}")
  }

  test("SCD2 pays one key exchange for both window passes") {
    val df = SparkEntry.queries("q_scd2_compress")(spark, sf)
    df.collect()
    val wins = deepNodes(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.size == 2, s"expected lag + lead/version windows:" +
      s"\n${df.queryExecution.executedPlan}")
    val hashing = shuffles(df)
      .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hashing.size == 1, s"windows re-shuffled (${hashing.size} hash " +
      s"exchanges):\n${df.queryExecution.executedPlan}")
  }

  test("retention reads events once and broadcasts cohort tables") {
    // The distinct (user, day) activity set is checkpointed; all three
    // consumers read it, so the final plan holds NO parquet scan, and
    // both cohort joins broadcast the per-user/per-day side.
    val df = SparkEntry.queries("q_win_retention")(spark, sf)
    df.collect()
    val parquetScans = deepNodes(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(parquetScans.isEmpty, s"events re-scanned " +
      s"${parquetScans.size}x:\n${df.queryExecution.executedPlan}")
    val bhj = deepNodes(df).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.size == 2, s"cohort joins did not broadcast:" +
      s"\n${df.queryExecution.executedPlan}")
  }

  test("KS test: both CDF windows share one event_type exchange") {
    val df = SparkEntry.queries("q_agg_kstest")(spark, sf)
    df.collect()
    val wins = deepNodes(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.size == 2, s"expected running-CDF + totals windows:" +
      s"\n${df.queryExecution.executedPlan}")
    val hashing = shuffles(df)
      .filter(_.outputPartitioning.toString.contains("hashpartitioning"))
    // distinct-value aggregate + ONE window re-key; the final D aggregate
    // reuses the window partitioning and the presentation sort is range.
    assert(hashing.size == 2, s"CDF pass re-shuffled (${hashing.size}):" +
      s"\n${df.queryExecution.executedPlan}")
  }

  test("k-means: centroids broadcast and the argmin rank-limit is pushed") {
    val df = SparkEntry.queries("q_embed_kmeans")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(deepNodes(df).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      s"centroid table not broadcast:\n$p")
    // WindowGroupLimit prunes each vector's 8 candidate rows to the
    // argmin BEFORE the exchange — without it the full cross product
    // shuffles.
    assert(p.contains("WindowGroupLimit"), s"argmin not pushed:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"assignment degenerated to a shuffle join:\n$p")
  }

  test("PageRank bounds lineage and leaks no cache; ranks sum to 1") {
    spark.catalog.clearCache() // isolate from other queries' cache entries
    val df = SparkEntry.queries("q_graph_pagerank")(spark, sf)
    val rows = df.collect()
    // Iterations were materialized round-by-round (checkpoint scans), so
    // the consumer plan re-executes none of them.
    assert(shuffles(df).isEmpty, s"iteration work leaked into the " +
      s"consumer plan:\n${df.queryExecution.executedPlan}")
    // The edge cache must be dropped once the rank state is materialized
    // (repeat invocations must not stack InMemoryRelations).
    assert(spark.sharedState.cacheManager.isEmpty,
      "edge cache leaked past the query build")
    // Probability-mass invariant: Σ rank ≈ 1 over ALL nodes; the top-100
    // slice at sf0.001 covers most nodes only if the graph is small, so
    // assert the weaker bound that no rank is outside (0, 1).
    assert(rows.nonEmpty && rows.forall { r =>
      val v = r.getDouble(1); v > 0.0 && v < 1.0 })
    assert(rows.map(_.getDouble(1)).sum <= 1.0 + 1e-9)
  }
}
