package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Analytics wave: graph centrality (fixed-iteration PageRank), warehouse
  * dimension history (change-compressed SCD2), cohort retention,
  * conversion funnels, exact-moment correlation, a KS drift test,
  * time-series resample/EMA, and embedding analytics (power-iteration
  * PCA, a Lloyd k-means step) — the standing analytical workloads an
  * engine replacing the reference would be asked to run next to the
  * LLM-curation pipeline.
  *
  * Scale notes (the per-operator Scaladoc carries details):
  *  - PageRank: edges persist ALREADY hash-partitioned on the join key
  *    (one edge shuffle for the whole run); per-round shuffles carry
  *    only messages and the node-sized rank table, which
  *    eager-checkpoints each round (flat lineage, droppable edge cache).
  *  - SCD2 / KS: both window passes share ONE key exchange
  *    (PlanSpec-gated).
  *  - Retention / resample: the corpus-shrunk aggregate (distinct
  *    activity, hourly sums) is checkpointed so every consumer reads it
  *    instead of re-scanning raw events.
  *  - Funnel: cascaded per-user min-aggregates, co-partitioned stage
  *    joins, no per-user event list ever materialized.
  *  - PCA / k-means: bounded driver-side model state (64 doubles / 8
  *    centroids); the data side is scans + small-group aggregates.
  *
  * Cross-engine determinism: wherever an engine-ordered SUM would touch
  * doubles, contributions are floor-scaled to exact BIGINTs first
  * (`floor` has no rounding-mode ambiguity, unlike double→DECIMAL
  * casts, which tie-break HALF_UP in Spark vs half-even in DuckDB) —
  * PageRank at 1e15, PCA/k-means at 1e9 — or the arithmetic is exact by
  * construction (KS's integer lattice, correlation's DECIMAL moments,
  * EMA's dyadic taps). Fixed-order double expressions are mirrored
  * textually in the oracles.
  */
object Analytics {

  /** 3 iterations of PageRank (d = 0.85) over the bipartite
    * customer–part interaction graph (who ordered what), undirected.
    * Node encoding: custkey·2 / partkey·2+1. No dangling nodes by
    * construction (every node enters via an edge). */
  private def qGraphPagerank(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions): the whole
    // body is plan construction + eager per-round checkpoints, so the
    // wrapper covers every unrolled round — oracled, results identical
    val e0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"),
        (col("l_partkey") * 2 + 1).as("v"))
      .distinct()
    // Persist the edges ALREADY hash-partitioned on the join key: the
    // cached layout satisfies each iteration's join requirement, so only
    // the node-sized rank table shuffles per round — the edge relation
    // (the 100-TB side) is shuffled exactly once for the whole run.
    val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .repartition(col("u")).persist()
    // Checkpoint the degree table FIRST (r15): the old shape derived the
    // node count via crossJoin(broadcast(deg.agg(count))) — a broadcast
    // SUBQUERY whose future raced the main job to materialize the
    // not-yet-cached edge lineage, so the orders⋈lineitem→distinct→
    // union→repartition derivation ran 3× concurrently (StageProbe:
    // three ~12.5 s-runMs scan+shuffle stages for one logical scan).
    // One eager checkpoint materializes the edge cache exactly once;
    // the node count then comes off the checkpointed (node-sized) deg
    // and folds into the init/teleport literals — bit-identical values
    // (same IEEE-754 divisions), one scan in the plan.
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nn = deg.count()
    var r = deg.select(col("u"), lit(1.0 / nn).as("r"), col("deg"))
    // shuffle_hash on the node-sized side (r15, guide §3.1): the planner
    // defaulted every round's edge⋈rank join to SortMergeJoin, re-sorting
    // the CACHED 1.2M-row edge relation per round (plan audit: Sort over
    // InMemoryTableScan inside each round's stage). Hash-building the
    // node table per partition streams the edge cache unsorted — A/B on
    // this loop (r15 dev A/B, 5 rounds): SMJ 9.30 s vs SHJ 5.16 s.
    // Scale-safe: the build side is the per-partition slice of the node
    // state table, bounded by nodes/partitions, while the streamed side
    // is the 100-TB edge relation that must not be re-sorted per round.
    for (_ <- 1 to 3) {
      val contrib = e.join(r.hint("shuffle_hash"), "u")
        .select(col("v").as("u"),
          expr("CAST(floor(r * 1000000000000000.0 / CAST(deg AS DOUBLE))" +
            " AS BIGINT)").as("c"))
      val sums = contrib.groupBy(col("u")).agg(sum(col("c")).as("s"))
      // Eager checkpoint per round (node-sized, tiny): truncates lineage
      // AND lets the edge cache be dropped before the result is consumed,
      // so repeated invocations in one session don't stack cache entries.
      r = sums.join(r.select(col("u"), col("deg")).hint("shuffle_hash"), "u")
        .select(col("u"), (lit(0.15 / nn)
          + lit(0.85) * (col("s").cast("double") / lit(1000000000000000.0)))
          .as("r"), col("deg"))
        .localCheckpoint(true)
    }
    e.unpersist()
    r.select(col("u").as("node"), round(col("r"), 12).as("rank"))
      .orderBy(desc("rank"), col("node")).limit(100)
  }

  /** Slowly-changing-dimension type 2: collapse each customer's order
    * stream into priority "eras" — (valid_from, valid_to) intervals with
    * a version counter, open-ended on the current era. The
    * change-data-capture → dimension-history build of every warehouse
    * load, and the dataset-versioning primitive of a curation pipeline. */
  private def qScd2(s: SparkSession, d: String): DataFrame = {
    val byKey = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(byKey))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      // one projection → one Window node (withColumn chains interpose
      // Projects that block CollapseWindow)
      .select(col("*"),
        lead(col("o_orderdate"), 1).over(byKey).as("valid_to"),
        row_number().over(byKey).cast("int").as("version"))
      .select(col("o_custkey").as("custkey"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("valid_from"), col("valid_to"), col("version"))
      .orderBy(col("custkey"), col("version"))
  }

  /** Daily cohort retention over the events stream: cohort = a user's
    * first active day, retention = fraction of the cohort active again
    * at each day offset ≤ 14. The engagement curve behind every product
    * dashboard — and the freshness-decay curve of a data flywheel. */
  private def qWinRetention(s: SparkSession, d: String): DataFrame = {
    // Materialize distinct (user, day) once: the three consumers (join
    // probe, cohort min, cohort sizes) otherwise each re-scan the raw
    // events — 3× the dominant scan at 100 TB. The checkpointed activity
    // set is corpus-shrunk (bounded by users × days).
    val a = events(s, d)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct().localCheckpoint(true)
    val c = a.groupBy(col("user_id")).agg(min(col("day")).as("cday"))
    val cs = c.groupBy(col("cday")).agg(count(lit(1)).as("cohort_size"))
    a.join(c, "user_id")
      .filter(col("day") - col("cday") <= 14)
      .select(col("cday"), (col("day") - col("cday")).as("offset_d"),
        col("user_id"))
      .join(broadcast(cs), "cday")
      .groupBy(col("cday"), col("offset_d"), col("cohort_size"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .select(col("cday").as("cohort_day"), col("offset_d"),
        col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double")
          / col("cohort_size").cast("double"), 6).as("pct"))
      .orderBy(col("cohort_day"), col("offset_d"))
  }

  /** Ordered conversion funnel (view → click → purchase, each stage
    * strictly after the previous stage's FIRST event for that user) with
    * per-stage conversion rates. Three cascaded per-user min-aggregates,
    * all shuffle-partitioned on user_id — the stage joins are
    * co-partitioned, and the final stage table is three rows. */
  private def qWinFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"), col("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_buy"))
    v.agg(count(lit(1)).as("nv"))
      .crossJoin(c.agg(count(lit(1)).as("nc")))
      .crossJoin(p.agg(count(lit(1)).as("np")))
      .selectExpr(
        """stack(3,
          |  1, 'view', nv, CAST(1.0 AS DOUBLE),
          |  2, 'click', nc, CASE WHEN nv > 0 THEN
          |    round(CAST(nc AS DOUBLE) / CAST(nv AS DOUBLE), 6) END,
          |  3, 'purchase', np, CASE WHEN nc > 0 THEN
          |    round(CAST(np AS DOUBLE) / CAST(nc AS DOUBLE), 6) END
          |) AS (stage, name, n_users, conv)""".stripMargin)
      .orderBy(col("stage"))
  }

  /** Per-group Pearson correlation + sample covariance from exact
    * DECIMAL moments (n, Σx, Σy, Σxy, Σx², Σy² — order-independent
    * sums; the q_agg_ttest discipline), finished in fixed-order double
    * arithmetic. One map-side-combining aggregate over the corpus. */
  private def qAggCorr(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .withColumn("x", col("l_quantity").cast("decimal(19,4)"))
      .withColumn("y", col("l_extendedprice").cast("decimal(19,4)"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr("l_returnflag", "n",
        """ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          | / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
          |AS corr_qty_price""".stripMargin,
        """ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          | / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 4)
          |AS cov_qty_price""".stripMargin)
      .orderBy(col("l_returnflag"))

  /** Hourly resample + gap-fill: per-user hourly grid between first and
    * last activity, hours with no events flagged and forward-filled from
    * the last observed value (`last(..., ignoreNulls)` running frame).
    * The time-series regularization step before any windowed model. The
    * hourly aggregate is checkpointed (same single-scan discipline as
    * q_win_retention); the grid explode is per-user bounded. */
  private def qTimeResample(s: SparkSession, d: String): DataFrame = {
    val agg = events(s, d)
      .select(col("user_id"), expr("us div 3600000000").as("hr"),
        col("value").cast("decimal(18,4)").as("v"))
      .groupBy(col("user_id"), col("hr"))
      .agg(sum(col("v")).as("v"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    val grid = agg.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hr"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"), col("n").isNull.as("is_gap"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        round(last(col("v"), ignoreNulls = true).over(w).cast("double"), 4)
          .as("v_fill"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** Per-user EMA smoothing with power-of-two decay taps (α = 1/2,
    * 8 taps): 0.5^k is exactly representable, so every product and the
    * fixed-order tap sum are bit-identical across engines — an EMA whose
    * window-frame summation order never matters. Availability-normalized
    * at the sequence head (missing lags contribute zero weight). */
  private def qTimeEma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val weights = Seq("0.5", "0.25", "0.125", "0.0625", "0.03125",
      "0.015625", "0.0078125")
    val base = events(s, d)
      .select(col("user_id"), col("event_id"), col("us"), col("value"))
    val withLags = (1 to 7).foldLeft(base) { (df, k) =>
      df.withColumn(s"x$k", lag(col("value"), k).over(w))
    }
    val num = weights.zipWithIndex.map { case (wk, i) =>
      s"CASE WHEN x${i + 1} IS NULL THEN 0.0 ELSE x${i + 1} * $wk END"
    }.mkString("\n    + ")
    val den = weights.zipWithIndex.map { case (wk, i) =>
      s"CASE WHEN x${i + 1} IS NULL THEN 0.0 ELSE $wk END"
    }.mkString("\n    + ")
    withLags
      .withColumn("ema", expr(s"round((value\n    + $num)\n / (1.0\n    + $den), 6)"))
      .select(col("user_id"), col("event_id"), col("us"), col("ema"))
      .orderBy(col("user_id"), col("us"), col("event_id"))
  }

  /** Top principal direction of the embedding cloud (uncentered PCA /
    * leading singular direction) via 3 power iterations. Per iteration:
    * one scan computing t = v·x per row (fixed-order fold), per-dimension
    * contributions floor-scaled to exact BIGINTs at 1e9 (the PageRank
    * determinism trick — engine aggregation order cannot perturb the
    * sums), then a 64-double normalize. The iterate x is bounded model
    * state (64 doubles on the driver — the IVF-centroid shape); the data
    * side is one scan + one 64-group aggregate per iteration at any
    * corpus size. Scala's reduceLeft mirrors DuckDB's list_reduce
    * bracketing exactly. */
  private def qEmbedPca(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").select(col("embedding")).persist()
    var x = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to 3) {
      val xArr = s"array(${x.map(v => s"CAST($v AS DOUBLE)").mkString(", ")})"
      val sums = e
        .select(col("embedding"), expr(
          s"""aggregate(zip_with(embedding, $xArr,
             |  (a, b) -> CAST(a AS DOUBLE) * b), 0D,
             |  (acc, p) -> acc + p)""".stripMargin).as("t"))
        .select(posexplode(col("embedding")).as(Seq("i0", "v")), col("t"))
        .select((col("i0") + 1).cast("long").as("i"), expr(
          "CAST(floor(t * CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)")
          .as("c"))
        .groupBy(col("i")).agg(sum(col("c")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val y = (1 to 64).map(i => sums(i.toLong).toDouble / 1000000000.0)
      val nrm = math.sqrt(y.map(v => v * v).reduceLeft(_ + _))
      x = y.map(_ / nrm).toArray
    }
    e.unpersist()
    val rows = x.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }
    import s.implicits._
    rows.toSeq.toDF("dim", "loading")
      .select(col("dim"), round(col("loading"), 6).as("loading"))
      .orderBy(col("dim"))
  }

  /** One Lloyd iteration of k-means (k = 8, seeds = vec_id 0..7):
    * nearest-centroid assignment by squared distance (fixed-order fold;
    * argmin tie-broken by centroid id), then exact centroid recompute —
    * per-dimension sums floor-scaled to BIGINTs (the PageRank/PCA
    * determinism trick). The centroid table is 8 rows BROADCAST; the
    * data side is one crossJoin-scan + one (vector)-keyed argmin + one
    * (cluster, dim)-keyed aggregate — every stage partitions freely.
    * Both engines derive the seed centroids from the table (no literal
    * round-tripping anywhere). */
  private def qEmbedKmeans(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val c = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("j"), col("embedding").as("cemb"))
    val d2 = expr(
      """aggregate(transform(sequence(1, 64),
        |  i -> (CAST(element_at(embedding, i) AS DOUBLE)
        |        - CAST(element_at(cemb, i) AS DOUBLE))
        |     * (CAST(element_at(embedding, i) AS DOUBLE)
        |        - CAST(element_at(cemb, i) AS DOUBLE))), 0D,
        |  (acc, p) -> acc + p)""".stripMargin)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("j"))
    emb.crossJoin(broadcast(c)).withColumn("d2", d2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("j"), posexplode(col("embedding")).as(Seq("i0", "v")))
      .select(col("j"), (col("i0") + 1).cast("long").as("dim"), expr(
        "CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)").as("c"))
      .groupBy(col("j"), col("dim"))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
      .select(col("j").as("cluster"), col("n").as("size"), col("dim"),
        round(expr(
          "CAST(s AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE)"), 6)
          .as("center"))
      .orderBy(col("cluster"), col("dim"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic between the first and
    * second half of the event stream, per event type — the
    * distribution-level companion to q_agg_ttest (means) and q_agg_psi
    * (binned drift). ENTIRELY exact until the last division: the ECDF
    * max-difference is computed on the integer lattice
    * max |ca·nb − cb·na| (no per-point double ratios to order), so engine
    * aggregation order cannot perturb D. One distinct-value aggregate +
    * one windowed pass, both keyed on event_type. */
  private def qAggKstest(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val cdf = byType.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("a",
        when(expr("us div 86400000000") < 19738, 1L).otherwise(0L))
      .groupBy(col("event_type"), col("value"))
      .agg(sum(col("a")).as("ia"), sum(lit(1L) - col("a")).as("ib"))
      .select(col("event_type"),
        sum(col("ia")).over(cdf).as("ca"), sum(col("ib")).over(cdf).as("cb"),
        sum(col("ia")).over(byType).as("na"),
        sum(col("ib")).over(byType).as("nb"))
      .groupBy(col("event_type"), col("na"), col("nb"))
      .agg(max(abs(col("ca") * col("nb") - col("cb") * col("na")))
        .as("num"))
      .selectExpr("event_type", "na", "nb",
        """CASE WHEN na > 0 AND nb > 0 THEN
          |  round(CAST(num AS DOUBLE)
          |        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
          |END AS ks_d""".stripMargin)
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_kstest" -> (qAggKstest _),
    "q_graph_pagerank" -> (qGraphPagerank _),
    "q_scd2_compress" -> (qScd2 _),
    "q_win_retention" -> (qWinRetention _),
    "q_win_funnel" -> (qWinFunnel _),
    "q_agg_corr" -> (qAggCorr _),
    "q_time_resample" -> (qTimeResample _),
    "q_time_ema" -> (qTimeEma _),
    "q_embed_pca" -> (qEmbedPca _),
    "q_embed_kmeans" -> (qEmbedKmeans _),
  )

  val sql: Map[String, String] = Map(
    // Iterations unrolled as CTE chains; arithmetic mirrored textually.
    "q_graph_pagerank" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 2 AS u, l_partkey * 2 + 1 AS v
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY u),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM deg),
        |r0 AS (SELECT u, CAST(1 AS DOUBLE) / CAST(nn AS DOUBLE) AS r,
        |              deg, nn FROM deg, nn),
        |c1 AS (SELECT e.v AS u, CAST(floor(r0.r * 1000000000000000.0
        |         / CAST(r0.deg AS DOUBLE)) AS BIGINT) AS c
        |       FROM e JOIN r0 ON e.u = r0.u),
        |s1 AS (SELECT u, CAST(sum(c) AS BIGINT) AS s FROM c1 GROUP BY u),
        |r1 AS (SELECT d.u, CAST(0.15 AS DOUBLE) / CAST(d.nn AS DOUBLE)
        |         + CAST(0.85 AS DOUBLE)
        |           * (CAST(s.s AS DOUBLE) / 1000000000000000.0) AS r,
        |         d.deg, d.nn
        |       FROM s1 s JOIN r0 d ON s.u = d.u),
        |c2 AS (SELECT e.v AS u, CAST(floor(r1.r * 1000000000000000.0
        |         / CAST(r1.deg AS DOUBLE)) AS BIGINT) AS c
        |       FROM e JOIN r1 ON e.u = r1.u),
        |s2 AS (SELECT u, CAST(sum(c) AS BIGINT) AS s FROM c2 GROUP BY u),
        |r2 AS (SELECT d.u, CAST(0.15 AS DOUBLE) / CAST(d.nn AS DOUBLE)
        |         + CAST(0.85 AS DOUBLE)
        |           * (CAST(s.s AS DOUBLE) / 1000000000000000.0) AS r,
        |         d.deg, d.nn
        |       FROM s2 s JOIN r1 d ON s.u = d.u),
        |c3 AS (SELECT e.v AS u, CAST(floor(r2.r * 1000000000000000.0
        |         / CAST(r2.deg AS DOUBLE)) AS BIGINT) AS c
        |       FROM e JOIN r2 ON e.u = r2.u),
        |s3 AS (SELECT u, CAST(sum(c) AS BIGINT) AS s FROM c3 GROUP BY u),
        |r3 AS (SELECT d.u, CAST(0.15 AS DOUBLE) / CAST(d.nn AS DOUBLE)
        |         + CAST(0.85 AS DOUBLE)
        |           * (CAST(s.s AS DOUBLE) / 1000000000000000.0) AS r
        |       FROM s3 s JOIN r2 d ON s.u = d.u)
        |SELECT u AS node, round(r, 12) AS rank FROM r3
        |ORDER BY round(r, 12) DESC, node LIMIT 100""".stripMargin,
    "q_scd2_compress" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |c2 AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        |  FROM ch WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey AS custkey, o_orderpriority AS priority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS INT) AS version
        |FROM c2 ORDER BY custkey, version""".stripMargin,
    "q_win_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |    CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cday FROM a GROUP BY user_id),
        |cs AS (SELECT cday, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM c GROUP BY cday),
        |j AS (
        |  SELECT c.cday, CAST(a.day - c.cday AS BIGINT) AS offset_d,
        |         a.user_id
        |  FROM a JOIN c ON a.user_id = c.user_id
        |  WHERE a.day - c.cday <= 14)
        |SELECT j.cday AS cohort_day, j.offset_d,
        |  CAST(count(DISTINCT j.user_id) AS BIGINT) AS n_active,
        |  cs.cohort_size,
        |  round(CAST(count(DISTINCT j.user_id) AS DOUBLE)
        |        / CAST(cs.cohort_size AS DOUBLE), 6) AS pct
        |FROM j JOIN cs ON j.cday = cs.cday
        |GROUP BY j.cday, j.offset_d, cs.cohort_size
        |ORDER BY cohort_day, offset_d""".stripMargin,
    "q_win_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.us) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.us > v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.us) AS t_buy
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.us > c.t_click
        |      GROUP BY e.user_id),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
        |SELECT CAST(1 AS INT) AS stage, 'view' AS name,
        |  (SELECT n FROM nv) AS n_users, CAST(1.0 AS DOUBLE) AS conv
        |UNION ALL SELECT 2, 'click', (SELECT n FROM nc),
        |  CASE WHEN (SELECT n FROM nv) > 0 THEN
        |    round(CAST((SELECT n FROM nc) AS DOUBLE)
        |          / CAST((SELECT n FROM nv) AS DOUBLE), 6) END
        |UNION ALL SELECT 3, 'purchase', (SELECT n FROM np),
        |  CASE WHEN (SELECT n FROM nc) > 0 THEN
        |    round(CAST((SELECT n FROM np) AS DOUBLE)
        |          / CAST((SELECT n FROM nc) AS DOUBLE), 6) END
        |ORDER BY stage""".stripMargin,
    "q_agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
        |    sum(CAST(l_quantity AS DECIMAL(19,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy,
        |    sum(CAST(l_quantity AS DECIMAL(19,4))
        |        * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(19,4))
        |        * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  AS corr_qty_price,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 4)
        |  AS cov_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_time_resample" ->
      """WITH ev AS (SELECT user_id,
        |              CAST(epoch_us(ts) AS BIGINT) // 3600000000 AS hr,
        |              CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |agg AS (SELECT user_id, hr, sum(v) AS v,
        |               CAST(count(*) AS BIGINT) AS n
        |        FROM ev GROUP BY user_id, hr),
        |span AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |         FROM agg GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS hr
        |         FROM span),
        |j AS (SELECT g.user_id, g.hr, a.v, a.n FROM grid g
        |      LEFT JOIN agg a ON g.user_id = a.user_id AND g.hr = a.hr)
        |SELECT user_id, hr, CAST(n IS NULL AS BOOLEAN) AS is_gap,
        |  CAST(coalesce(n, 0) AS BIGINT) AS n_events,
        |  round(CAST(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE),
        |    4) AS v_fill
        |FROM j ORDER BY user_id, hr""".stripMargin,
    "q_time_ema" ->
      """WITH ev AS (SELECT user_id, event_id,
        |              CAST(epoch_us(ts) AS BIGINT) AS us, value
        |            FROM events),
        |l AS (SELECT user_id, event_id, us, value,
        |  lag(value, 1) OVER w AS x1, lag(value, 2) OVER w AS x2,
        |  lag(value, 3) OVER w AS x3, lag(value, 4) OVER w AS x4,
        |  lag(value, 5) OVER w AS x5, lag(value, 6) OVER w AS x6,
        |  lag(value, 7) OVER w AS x7
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, event_id, us,
        |  round((value
        |    + CASE WHEN x1 IS NULL THEN 0.0 ELSE x1 * 0.5 END
        |    + CASE WHEN x2 IS NULL THEN 0.0 ELSE x2 * 0.25 END
        |    + CASE WHEN x3 IS NULL THEN 0.0 ELSE x3 * 0.125 END
        |    + CASE WHEN x4 IS NULL THEN 0.0 ELSE x4 * 0.0625 END
        |    + CASE WHEN x5 IS NULL THEN 0.0 ELSE x5 * 0.03125 END
        |    + CASE WHEN x6 IS NULL THEN 0.0 ELSE x6 * 0.015625 END
        |    + CASE WHEN x7 IS NULL THEN 0.0 ELSE x7 * 0.0078125 END)
        | / (1.0
        |    + CASE WHEN x1 IS NULL THEN 0.0 ELSE 0.5 END
        |    + CASE WHEN x2 IS NULL THEN 0.0 ELSE 0.25 END
        |    + CASE WHEN x3 IS NULL THEN 0.0 ELSE 0.125 END
        |    + CASE WHEN x4 IS NULL THEN 0.0 ELSE 0.0625 END
        |    + CASE WHEN x5 IS NULL THEN 0.0 ELSE 0.03125 END
        |    + CASE WHEN x6 IS NULL THEN 0.0 ELSE 0.015625 END
        |    + CASE WHEN x7 IS NULL THEN 0.0 ELSE 0.0078125 END), 6) AS ema
        |FROM l ORDER BY user_id, us, event_id""".stripMargin,
    "q_embed_pca" ->
      """WITH x0 AS (SELECT list_transform(generate_series(1, 64),
        |  i -> CASE WHEN i = 1 THEN CAST(1.0 AS DOUBLE)
        |       ELSE CAST(0.0 AS DOUBLE) END) AS x),
        |t1 AS (SELECT e.embedding,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * x[i]), (a, b) -> a + b) AS t
        |  FROM embeddings e, x0),
        |c1 AS (SELECT u.i AS i,
        |    CAST(sum(CAST(floor(t * CAST(embedding[u.i] AS DOUBLE)
        |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS s
        |  FROM t1, unnest(generate_series(1, 64)) AS u(i) GROUP BY u.i),
        |y1 AS (SELECT list(CAST(s AS DOUBLE) / 1000000000.0 ORDER BY i) AS y
        |  FROM c1),
        |n1 AS (SELECT sqrt(list_reduce(list_transform(y, e -> e * e),
        |    (a, b) -> a + b)) AS nrm, y FROM y1),
        |x1 AS (SELECT list_transform(y, e -> e / nrm) AS x FROM n1),
        |t2 AS (SELECT e.embedding,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * x[i]), (a, b) -> a + b) AS t
        |  FROM embeddings e, x1),
        |c2 AS (SELECT u.i AS i,
        |    CAST(sum(CAST(floor(t * CAST(embedding[u.i] AS DOUBLE)
        |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS s
        |  FROM t2, unnest(generate_series(1, 64)) AS u(i) GROUP BY u.i),
        |y2 AS (SELECT list(CAST(s AS DOUBLE) / 1000000000.0 ORDER BY i) AS y
        |  FROM c2),
        |n2 AS (SELECT sqrt(list_reduce(list_transform(y, e -> e * e),
        |    (a, b) -> a + b)) AS nrm, y FROM y2),
        |x2 AS (SELECT list_transform(y, e -> e / nrm) AS x FROM n2),
        |t3 AS (SELECT e.embedding,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * x[i]), (a, b) -> a + b) AS t
        |  FROM embeddings e, x2),
        |c3 AS (SELECT u.i AS i,
        |    CAST(sum(CAST(floor(t * CAST(embedding[u.i] AS DOUBLE)
        |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS s
        |  FROM t3, unnest(generate_series(1, 64)) AS u(i) GROUP BY u.i),
        |y3 AS (SELECT list(CAST(s AS DOUBLE) / 1000000000.0 ORDER BY i) AS y
        |  FROM c3),
        |n3 AS (SELECT sqrt(list_reduce(list_transform(y, e -> e * e),
        |    (a, b) -> a + b)) AS nrm, y FROM y3),
        |x3 AS (SELECT list_transform(y, e -> e / nrm) AS x FROM n3)
        |SELECT u.i AS dim, round(x[u.i], 6) AS loading
        |FROM x3, unnest(generate_series(1, 64)) AS u(i)
        |ORDER BY dim""".stripMargin,
    "q_embed_kmeans" ->
      """WITH c AS (SELECT vec_id AS j, embedding AS cemb
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.j, e.embedding,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE))),
        |      (a, b) -> a + b) AS d2
        |  FROM embeddings e, c),
        |asg AS (SELECT vec_id, j, embedding FROM (
        |    SELECT vec_id, j, embedding,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn FROM d)
        |  WHERE rn = 1),
        |sums AS (SELECT j, u.i AS dim,
        |    CAST(sum(CAST(floor(CAST(embedding[u.i] AS DOUBLE)
        |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM asg, unnest(generate_series(1, 64)) AS u(i) GROUP BY j, u.i)
        |SELECT j AS cluster, n AS size, dim,
        |  round(CAST(s AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6) AS center
        |FROM sums ORDER BY cluster, dim""".stripMargin,
    "q_agg_kstest" ->
      """WITH pts AS (
        |  SELECT event_type, value,
        |    CAST(sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT) // 86400000000 < 19738
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ia,
        |    CAST(sum(CASE WHEN CAST(epoch_us(ts) AS BIGINT) // 86400000000 < 19738
        |      THEN 0 ELSE 1 END) AS BIGINT) AS ib
        |  FROM events GROUP BY event_type, value),
        |cum AS (
        |  SELECT event_type,
        |    sum(ia) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    sum(ib) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
        |    sum(ia) OVER (PARTITION BY event_type) AS na,
        |    sum(ib) OVER (PARTITION BY event_type) AS nb
        |  FROM pts)
        |SELECT event_type, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  CASE WHEN na > 0 AND nb > 0 THEN
        |    round(CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
        |          / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) END AS ks_d
        |FROM cum GROUP BY event_type, na, nb ORDER BY event_type""".stripMargin,
  )
}
