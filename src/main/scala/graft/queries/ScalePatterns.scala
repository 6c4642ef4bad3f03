package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** The three layout/shuffle patterns that decide whether a plan survives
  * 100 TB (SURVEY §4.B physical-execution targets), each exercised as a
  * first-class query with a DuckDB oracle proving the optimized plan is
  * semantics-preserving:
  *
  *  - partition pruning over a hive `ship_date=…` layout (the
  *    reference's production data is exactly this shape,
  *    `/root/reference/src/services/repair-avro.ts:92`);
  *  - salted join: pre-shuffle salt on the skewed big side, replicated
  *    small side — the manual fallback when AQE skew splitting isn't
  *    enough;
  *  - bucketed co-located join: both sides pre-bucketed on the join key
  *    so the join runs with zero exchange.
  */
object ScalePatterns {

  private val workRoot = "/root/repo/target/qtmp"

  /** Hive-partitioned copy of orders by order year (written once per
    * scale factor), then a pruned scan: only the matching year's
    * directories are listed and read. */
  private def qScanPartitioned(s: SparkSession, d: String): DataFrame = {
    val dir = s"$workRoot/orders_hive_${math.abs(d.hashCode)}"
    if (!pathExists(s"$dir/_SUCCESS")) {
      t(s, d, "orders").withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    }
    s.read.parquet(dir)
      .filter(col("o_year") === 1997) // static partition pruning
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dec(col("o_totalprice")))).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** Salted skew join: big side gets a row-derived salt in 0..7, small
    * side is replicated 8×, join on (key, salt). Result ≡ plain join —
    * the oracle proves it. */
  private def qJoinSalted(s: SparkSession, d: String): DataFrame = {
    val salts = 8
    val li = t(s, d, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_partkey"), col("l_suppkey")),
        lit(salts)).cast("int"))
    val o = t(s, d, "orders")
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    li.join(o, li("l_orderkey") === o("o_orderkey") &&
        li("salt") === o("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** AQE-managed skew join — the runtime counterpart of q_join_salted:
    * instead of pre-salting by hand, the join is left on its natural
    * (here: deliberately skewed) key and Spark's adaptive execution
    * splits oversized shuffle partitions at runtime
    * (OptimizeSkewedJoin replicates the matching build-side partition
    * per split — no semantic change, no manual salt plumbing). Every
    * 4th lineitem row collapses onto one hot key, so a static plan
    * would funnel >25% of the shuffle through a single reducer. The
    * `merge` hint keeps the join a sort-merge join (the skew-split
    * target; a broadcast would dodge the skew instead of demonstrating
    * its handling — at 100 TB the build side isn't broadcastable).
    * The oracle proves result ≡ the plain skewed-key join; PlanSpec
    * executes it under tightened skew thresholds and asserts the SMJ
    * actually ran with isSkewJoin=true. */
  private def qJoinSkewAqe(s: SparkSession, d: String): DataFrame = {
    // The repartition models the producer layout (fact data lands
    // clustered by supplier, not by the join key) — and it matters for
    // the skew demo: AQE splits a hot reduce partition at MAPPER
    // granularity, and the testdata is one parquet file = one mapper,
    // which would make the hot partition unsplittable. At 100 TB the
    // input always has thousands of mappers; 8 stands in for that here.
    val li = t(s, d, "lineitem")
      .repartition(8, col("l_suppkey"))
      .withColumn("jk",
        when(pmod(col("l_orderkey"), lit(4)) === 0, lit(1L))
          .otherwise(col("l_orderkey")))
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    li.hint("merge").join(o, col("jk") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Shuffled-hash-join strategy control: for a build side too large to
    * broadcast but far smaller than the probe side, SHJ beats the
    * default sort-merge join — it hashes the small side per partition
    * and STREAMS the big side unsorted, skipping both sort passes. The
    * `shuffle_hash` hint is the production knob when the planner's
    * size estimates miss; result ≡ the plain join (oracle), and
    * PlanSpec asserts a ShuffledHashJoin actually ran with the small
    * side as build. */
  private def qJoinShj(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Interval join with NO equi key — the grid-bucketing pattern: a
    * pure point-in-interval predicate would plan as a broadcast-nested-
    * loop (points × intervals); instead both sides bucketize time into
    * fixed-width grid cells wide enough that an interval covers ≤ 2
    * cells (cell = 14 d ≥ interval = 14 d), the interval side explodes
    * to its covered cells, and the join becomes a plain equi join on
    * the cell id + an exact containment post-filter. A point lives in
    * exactly one cell, so no dedup is needed. At 100 TB each side
    * shuffles once on the cell key and the per-task work is
    * cell-local — the manufactured-equi-key answer whenever no natural
    * join key exists. */
  private def qJoinIntervalGrid(s: SparkSession, d: String): DataFrame = {
    val cellW = 14
    val iv = t(s, d, "lineitem").filter(col("l_partkey") < 10)
      .select(expr("cast(datediff(cast(l_shipdate as date), date'1970-01-01') as bigint)")
        .as("sd"))
      .withColumn("ed", col("sd") + 13)
      .withColumn("cell",
        explode(expr(s"sequence(sd div $cellW, ed div $cellW)")))
    val pts = t(s, d, "orders")
      .select(expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
        .as("pd"))
      .withColumn("cell", expr(s"pd div $cellW"))
    iv.join(pts, "cell")
      .filter(col("pd") >= col("sd") && col("pd") <= col("ed"))
      .groupBy(col("sd"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("pd")).as("n_days"))
      .orderBy("sd")
  }

  /** Bucketed co-located join: both sides written bucketed by the join
    * key (8 buckets), then joined — the physical plan has no shuffle
    * exchange on either side (asserted in PlanSpec). */
  private def qJoinBucketed(s: SparkSession, d: String): DataFrame = {
    val tag = math.abs(d.hashCode)
    val (to, tl) = (s"orders_bkt_$tag", s"lineitem_bkt_$tag")
    if (!s.catalog.tableExists(to)) {
      def bucketize(name: String, src: String, key: String): Unit = {
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        val df = t(s, d, src)
        if (fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS"))) {
          // Bucket files from a previous session survive in the
          // warehouse; re-register them as an external bucketed table
          // instead of rewriting (bucket ids live in the file names).
          s.sql(s"""CREATE TABLE $name (${df.schema.toDDL}) USING PARQUET
                   |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                   |LOCATION '$loc'""".stripMargin)
        } else {
          // A fresh session has an empty in-memory catalog but a stale
          // partial location would fail saveAsTable with
          // LOCATION_ALREADY_EXISTS — drop both layers, then write.
          s.sql(s"DROP TABLE IF EXISTS $name")
          fs.delete(loc, true)
          df.write.bucketBy(8, key).sortBy(key).mode("overwrite")
            .saveAsTable(name)
        }
      }
      bucketize(to, "orders", "o_orderkey")
      bucketize(tl, "lineitem", "l_orderkey")
    }
    s.table(tl).join(s.table(to), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  /** Bloom-pre-filtered join — the explicit form of runtime row-level
    * filtering, the standard 100 TB trick for a selective dim⋈fact join:
    * the selective build side (urgent orders, ~1/5 of keys) aggregates
    * its join keys into a ~1 MiB sketch with a distributed treeAggregate
    * (`stat.bloomFilter` — no row ever reaches the driver, only sketch
    * merges), and the fact side drops non-matching rows *before* the
    * join shuffle via the native codegen'd `graft_bloom_contains`
    * probe (graft.functions.BloomContains). False positives survive the
    * probe but not the real join, so the result is exactly the plain
    * join — the oracle proves it; PlanSpec asserts the probe sits in a
    * scan-side Filter below the join. */
  private def qJoinBloom(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val dim = t(s, d, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderstatus"))
    // expected-items sizing: a distributed count of the build side (one
    // cheap pre-pass; at scale this is the dim scan, not the fact scan)
    val bloom = dim.stat.bloomFilter(col("o_orderkey"),
      expectedNumItems = math.max(dim.count(), 1L), fpp = 0.01)
    val bytes = {
      val os = new java.io.ByteArrayOutputStream()
      bloom.writeTo(os)
      os.toByteArray
    }
    val li = t(s, d, "lineitem")
      .filter(call_function("graft_bloom_contains", lit(bytes),
        col("l_orderkey")))
    li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** Bit-interleave (Morton) z-value of two 8-bit-quantized keys —
    * generated once and rendered identically into the Spark expression
    * and the DuckDB oracle SQL, so the layout math itself is oracled. */
  private[queries] def zExpr(x: String, y: String): String =
    (0 until 8).map(k =>
      s"(((($x) >> $k) & 1) * ${1L << (2 * k)}) + " +
        s"(((($y) >> $k) & 1) * ${1L << (2 * k + 1)})")
      .mkString(" + ")

  /** Z-order clustered layout: lineitem rewritten range-partitioned +
    * sorted by the Morton interleave of (l_partkey, l_suppkey) mod 256 —
    * the data-layout operator behind multi-dimensional file skipping
    * (each output file covers a compact square-ish region of the key
    * plane, so a box predicate on either or both keys prunes most
    * files via parquet min/max). The oracled aggregate reads the
    * *rewritten* files and proves the round trip preserved content and
    * that every z-bucket holds exactly the rows whose interleave maps
    * there; LayoutSpec measures the actual file-skipping win vs a
    * single-key sort. */
  private def qLayoutZorder(s: SparkSession, d: String): DataFrame = {
    val dir = zorderDir(s, d)
    s.read.parquet(dir)
      .groupBy(expr("zval div 256").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("px")).as("px_min"), max(col("px")).as("px_max"),
        min(col("py")).as("py_min"), max(col("py")).as("py_max"),
        dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy("zbucket")
  }

  /** Write (once per sf) the z-ordered lineitem copy; returns its path.
    *
    * Each dimension is min-max bucketized into the 0..255 grid before
    * interleaving — the same per-column range binning Delta/Iceberg
    * z-order applies. A raw `key % 256` wastes grid resolution whenever
    * the key's actual domain is narrower than 256 (l_suppkey spans only
    * ~100 values at small sf, so its tiles were 64-tall over a 100-wide
    * domain and a box predicate could not skip), and bucketization is
    * what keeps tiles square at ANY domain width — at 100 TB the bounds
    * aggregate is one cheap scan-reduce broadcast, independent of corpus
    * size. The layout itself is one directory per aligned 64×64 z-tile
    * (zval div 4096), which is deterministic — no sampled range
    * boundaries — so every file's parquet min/max covers exactly one
    * tile and a box predicate on either axis prunes 3/4 of the files. */
  private[queries] def zorderDir(s: SparkSession, d: String): String = {
    // v2: bucketized grid + tile-aligned layout (name versioned so a
    // cached v1 directory is never mistaken for this layout)
    val dir = s"$workRoot/lineitem_z2_${math.abs(d.hashCode)}"
    if (!pathExists(s"$dir/_SUCCESS")) {
      val bounds = t(s, d, "lineitem")
        .agg(min("l_partkey").as("mnp"), max("l_partkey").as("mxp"),
          min("l_suppkey").as("mns"), max("l_suppkey").as("mxs"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
        .crossJoin(broadcast(bounds))
        .withColumn("px",
          expr("CAST(((l_partkey - mnp) * 256) div (mxp - mnp + 1) AS INT)"))
        .withColumn("py",
          expr("CAST(((l_suppkey - mns) * 256) div (mxs - mns + 1) AS INT)"))
        .withColumn("zval", expr(zExpr("px", "py")))
        .withColumn("ztile", expr("CAST(zval div 4096 AS INT)"))
        .drop("mnp", "mxp", "mns", "mxs")
        .repartition(16, col("ztile"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").partitionBy("ztile").parquet(dir)
    }
    dir
  }

  /** Welch's two-sample t-test per event type between the stream's two
    * halves (the A/B significance gate behind every metric-drift alarm):
    * unequal-variance t statistic and Welch–Satterthwaite df. All
    * moments (n, Σv, Σv²) accumulate in exact DECIMAL — one scan, one
    * partial-agg'd shuffle bounded by event types — and the t/df
    * arithmetic runs on the exact sums cast to double in an identical
    * expression order on both engines (the q_agg_stats discipline), so
    * the 6-dp rounds compare exactly. Nothing scales with the corpus
    * but the scan. */
  private def qAggTtest(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("half",
        when(expr("us div 86400000000") < 19738, "a").otherwise("b"))
      .withColumn("v", col("value").cast("decimal(18,6)"))
      .groupBy(col("event_type"))
      .agg(
        expr("count_if(half = 'a')").as("na"),
        expr("count_if(half = 'b')").as("nb"),
        sum(when(col("half") === "a", col("v"))).as("sa"),
        sum(when(col("half") === "b", col("v"))).as("sb"),
        sum(when(col("half") === "a", col("v") * col("v"))).as("qa"),
        sum(when(col("half") === "b", col("v") * col("v"))).as("qb"))
      // Degenerate halves are gated IDENTICALLY on both engines: a
      // variance needs n > 1, a mean n > 0, and t/df a positive pooled
      // variance term — otherwise Spark's non-ANSI division and
      // DuckDB's error/inf behavior diverge on sparse event types
      // instead of both degrading to NULL.
      .selectExpr("event_type", "na", "nb",
        "CASE WHEN na > 0 THEN CAST(sa AS DOUBLE) / na END AS ma",
        "CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / nb END AS mb",
        "CASE WHEN na > 1 THEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1) END AS va",
        "CASE WHEN nb > 1 THEN (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1) END AS vb")
      .selectExpr("event_type", "na", "nb",
        "ROUND(ma, 6) AS mean_a", "ROUND(mb, 6) AS mean_b",
        "CASE WHEN va / na + vb / nb > 0 THEN " +
          "ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) END AS t_stat",
        "CASE WHEN va / na + vb / nb > 0 THEN " +
          "ROUND(pow(va / na + vb / nb, 2) / " +
          "(pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 2) " +
          "END AS df")
      .orderBy("event_type")

  /** Distribution-drift monitor (PSI — population stability index)
    * between the first and second half of the event stream: equi-width
    * value bins, Laplace-smoothed bin fractions, per-bin drift terms
    * (pa−pb)·ln(pa/pb) and their total. The standard production gate
    * for "did this feed's distribution move" — at 100 TB it is two
    * count_if aggregates over one scan plus a 10-row broadcast; nothing
    * scales with the corpus. Per-bin terms round to 9 dp and total
    * through DECIMAL so the index is summation-order-independent. */
  private def qAggPsi(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .withColumn("bin",
        least(floor(col("value") / 50).cast("int"), lit(9)))
      // 2024-01-01 = epoch day 19723; split after day 14 of the stream
      .withColumn("half",
        when(expr("us div 86400000000") < 19738, "a").otherwise("b"))
    val counts = ev.groupBy(col("bin"))
      .agg(expr("count_if(half = 'a')").as("na"),
        expr("count_if(half = 'b')").as("nb"))
    val tot = ev.agg(expr("count_if(half = 'a')").as("ta"),
      expr("count_if(half = 'b')").as("tb"))
    counts.crossJoin(broadcast(tot))
      .withColumn("pa", (col("na") + 1).cast("double") / (col("ta") + 10))
      .withColumn("pb", (col("nb") + 1).cast("double") / (col("tb") + 10))
      .withColumn("term", expr("round((pa - pb) * ln(pa / pb), 9)"))
      .withColumn("psi_total", round(
        sum(col("term").cast("decimal(18,9)"))
          .over(Window.partitionBy(lit(1))).cast("double"), 6))
      .select(col("bin"), col("na"), col("nb"), col("term"),
        col("psi_total"))
      .orderBy("bin")
  }

  /** Two-level reaggregation — the materialized-rollup pattern: partial
    * aggregates per (priority, month) shard, then a final merge per
    * priority. Every partial is mergeable (count→sum, sum→sum, min/max→
    * min/max), which is exactly what lets a 100 TB pipeline keep daily
    * rollups and answer coarser queries without rescanning raw data.
    * The oracle computes the direct one-level aggregate, proving the
    * reaggregation is lossless. */
  private def qAggReagg(s: SparkSession, d: String): DataFrame = {
    val partial = t(s, d, "orders")
      .groupBy(col("o_orderpriority"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("pn"),
        sum(dec(col("o_totalprice"))).as("psum"),
        min(col("o_orderdate")).as("pmin"),
        max(col("o_orderdate")).as("pmax"))
    partial.groupBy(col("o_orderpriority"))
      .agg(sum(col("pn")).as("n"),
        dbl(sum(col("psum"))).as("sum_price"),
        min(col("pmin")).as("first_order"),
        max(col("pmax")).as("last_order"))
      .orderBy("o_orderpriority")
  }

  /** Mergeable distinct-count sketches (Apache DataSketches HLL via
    * Spark built-ins): per-month sketches union-merged per priority,
    * next to the direct sketch and the exact count. HLL registers merge
    * by element-wise max, so shard-merge loses no register information —
    * the reaggregable distinct-count every 100 TB pipeline needs (exact
    * COUNT DISTINCT does not reaggregate). The merged ESTIMATE can
    * differ slightly from the direct build: union invalidates
    * DataSketches' HIP estimator, falling back to the composite
    * estimator. Estimates are DataSketches-specific → no DuckDB oracle;
    * ScalaTest asserts merged ≈ direct and both within HLL error of the
    * exact count. */
  private def qAggSketch(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val monthly = o
      .groupBy(col("o_orderpriority"), month(col("o_orderdate")).as("m"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = monthly.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_merged"))
    val direct = o.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))
        .as("approx_direct"),
        countDistinct(col("o_custkey")).as("exact"))
    direct.join(merged, "o_orderpriority")
      .select(col("o_orderpriority"), col("exact"),
        col("approx_direct"), col("approx_merged"))
      .orderBy("o_orderpriority")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_scan_partitioned" -> (qScanPartitioned _),
    "q_join_salted" -> (qJoinSalted _),
    "q_join_skew_aqe" -> (qJoinSkewAqe _),
    "q_join_interval_grid" -> (qJoinIntervalGrid _),
    "q_join_shj" -> (qJoinShj _),
    "q_join_bucketed" -> (qJoinBucketed _),
    "q_join_bloom" -> (qJoinBloom _),
    "q_layout_zorder" -> (qLayoutZorder _),
    "q_agg_reagg" -> (qAggReagg _),
    "q_agg_psi" -> (qAggPsi _),
    "q_agg_ttest" -> (qAggTtest _),
    "q_agg_sketch" -> (qAggSketch _),
  )

  val sql: Map[String, String] = Map(
    "q_scan_partitioned" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders WHERE CAST(year(o_orderdate) AS INT) = 1997
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // plain join — the SHJ strategy hint must not change the result
    "q_join_shj" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // plain BETWEEN interval join — the grid-cell rewrite must be
    // semantics-preserving
    "q_join_interval_grid" ->
      """WITH iv AS (SELECT CAST(datediff('day', DATE '1970-01-01',
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS sd
        |    FROM lineitem WHERE l_partkey < 10),
        |p AS (SELECT CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS pd FROM orders)
        |SELECT sd, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(COUNT(DISTINCT pd) AS BIGINT) AS n_days
        |FROM iv JOIN p ON pd BETWEEN sd AND sd + 13
        |GROUP BY sd ORDER BY sd""".stripMargin,
    // plain skewed-key join — AQE's runtime splitting must not change
    // the result
    "q_join_skew_aqe" ->
      """WITH li AS (SELECT CASE WHEN l_orderkey % 4 = 0 THEN 1
        |    ELSE l_orderkey END AS jk, l_extendedprice FROM lineitem)
        |SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM li JOIN orders ON jk = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_bucketed" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_bloom" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_layout_zorder" ->
      s"""WITH b AS (
        |  SELECT MIN(l_partkey) AS mnp, MAX(l_partkey) AS mxp,
        |    MIN(l_suppkey) AS mns, MAX(l_suppkey) AS mxs FROM lineitem),
        |sc AS (
        |  SELECT CAST(((l_partkey - mnp) * 256) // (mxp - mnp + 1) AS INT)
        |      AS px,
        |    CAST(((l_suppkey - mns) * 256) // (mxs - mns + 1) AS INT)
        |      AS py,
        |    l_quantity
        |  FROM lineitem CROSS JOIN b),
        |z AS (
        |  SELECT (${zExpr("px", "py")}) AS zval, px, py, l_quantity
        |  FROM sc)
        |SELECT zval // 256 AS zbucket, COUNT(*) AS n,
        |  MIN(px) AS px_min, MAX(px) AS px_max,
        |  MIN(py) AS py_min, MAX(py) AS py_max,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    // identical binning/smoothing/rounding; epoch-day split both sides
    "q_agg_psi" ->
      """WITH e AS (SELECT
        |    LEAST(CAST(FLOOR(value / 50) AS INTEGER), 9) AS bin,
        |    CASE WHEN CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |        AS BIGINT) < 19738 THEN 'a' ELSE 'b' END AS half
        |  FROM events),
        |c AS (SELECT bin, COUNT(*) FILTER (WHERE half = 'a') AS na,
        |    COUNT(*) FILTER (WHERE half = 'b') AS nb FROM e GROUP BY bin),
        |t AS (SELECT COUNT(*) FILTER (WHERE half = 'a') AS ta,
        |    COUNT(*) FILTER (WHERE half = 'b') AS tb FROM e),
        |x AS (SELECT bin, na, nb,
        |    CAST(na + 1 AS DOUBLE) / (ta + 10) AS pa,
        |    CAST(nb + 1 AS DOUBLE) / (tb + 10) AS pb
        |  FROM c CROSS JOIN t),
        |y AS (SELECT bin, na, nb,
        |    ROUND((pa - pb) * ln(pa / pb), 9) AS term FROM x)
        |SELECT bin, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
        |  term,
        |  ROUND(CAST(SUM(CAST(term AS DECIMAL(18,9))) OVER () AS DOUBLE), 6)
        |    AS psi_total
        |FROM y ORDER BY bin""".stripMargin,
    // exact DECIMAL moments; t/df arithmetic in the same double
    // expression order as the Spark side (q_agg_stats discipline)
    "q_agg_ttest" ->
      """WITH e AS (SELECT event_type,
        |    CASE WHEN CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |        AS BIGINT) < 19738 THEN 'a' ELSE 'b' END AS half,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events),
        |m AS (SELECT event_type,
        |    CAST(COUNT(*) FILTER (WHERE half = 'a') AS BIGINT) AS na,
        |    CAST(COUNT(*) FILTER (WHERE half = 'b') AS BIGINT) AS nb,
        |    SUM(v) FILTER (WHERE half = 'a') AS sa,
        |    SUM(v) FILTER (WHERE half = 'b') AS sb,
        |    SUM(v * v) FILTER (WHERE half = 'a') AS qa,
        |    SUM(v * v) FILTER (WHERE half = 'b') AS qb
        |  FROM e GROUP BY event_type),
        |x AS (SELECT event_type, na, nb,
        |    CASE WHEN na > 0 THEN CAST(sa AS DOUBLE) / na END AS ma,
        |    CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / nb END AS mb,
        |    CASE WHEN na > 1 THEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na) / (na - 1) END AS va,
        |    CASE WHEN nb > 1 THEN (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb) / (nb - 1) END AS vb
        |  FROM m)
        |SELECT event_type, na, nb,
        |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        |  CASE WHEN va / na + vb / nb > 0 THEN
        |    ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) END AS t_stat,
        |  CASE WHEN va / na + vb / nb > 0 THEN
        |    ROUND(pow(va / na + vb / nb, 2) /
        |      (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)), 2)
        |  END AS df
        |FROM x ORDER BY event_type""".stripMargin,
    // direct one-level aggregate: proves the two-level partial merge on
    // the Spark side is lossless
    "q_agg_reagg" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
