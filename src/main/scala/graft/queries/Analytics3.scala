package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 second analytics wave: per-group OLS regression, inequality /
  * concentration metrics (Gini, Pareto top-decile share), rolling z-score
  * anomaly detection on the event stream, and exact co-occurrence Jaccard
  * link prediction on the co-purchase graph — the monitoring/analysis
  * primitives layered on the earlier stats (corr, t-test, KS, PSI) and
  * graph (PageRank, degree, triangles) families.
  *
  * Scale notes:
  *  - OLS/Gini/Pareto all reduce to exact integer/DECIMAL moments with a
  *    fixed-order double finish (the q_agg_corr discipline): the data
  *    makes ONE partial-aggregated pass, per-group state is O(1) moments.
  *  - Gini's rank-weighted sum needs one per-region sort (window
  *    row_number); the following per-region aggregate reuses the same
  *    hash partitioning, so the whole query is a single key exchange.
  *  - Pareto: revenue per customer is a map-side-combined hash agg on
  *    o_custkey; the per-region ranking windows (ordered row_number +
  *    unordered count) share one r_name exchange.
  *  - Anomaly detection is a per-type ordered window over the HOURLY
  *    aggregate — the frame runs over ~8.8k rows/year/type no matter how
  *    many raw events exist; raw data is touched exactly once by the
  *    hourly agg. The 24-hour trailing frame excludes the current point
  *    (ROWS -24..-1), so a spike can't suppress its own baseline.
  *  - Jaccard neighborhoods are ORDER sets: the common-neighbor count of
  *    two parts is exactly their co-purchase weight, computed by the
  *    l_orderkey-co-partitioned self-join whose fan-out is bounded by
  *    order size (≤ C(7,2) pairs at TPC-H shape) — never the hub-squared
  *    wedge blowup of adjacency-list common-neighbor joins. Degree tables
  *    are node-count-sized → shuffle_hash joins, not broadcast.
  *
  * Determinism: every double is produced by a textually-mirrored
  * fixed-order expression over exact BIGINT/DECIMAL moments, rounded to
  * 6 dp; ranks tie-break on the unique key. */
object Analytics3 {

  /** Per-group OLS regression y = a·x + b of extendedprice on quantity
    * (slope, intercept, r²) from exact DECIMAL moments — the regr_slope /
    * regr_intercept / regr_r2 family computed the hash-stable way. */
  private def qAggOls(s: SparkSession, d: String): DataFrame = {
    // n·Σxy − ΣxΣy and n·Σxx − (Σx)² in identical textual order on both
    // engines; slope is substituted in full where intercept needs it so
    // the double op sequence is the same everywhere.
    val cov = """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))""".stripMargin
    val varx = """(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))""".stripMargin
    val vary = """(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 |  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))""".stripMargin
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
        s"ROUND($cov / $varx, 6) AS slope",
        s"""ROUND((CAST(sy AS DOUBLE) - $cov / $varx
           |  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
           |AS intercept""".stripMargin,
        s"ROUND($cov * $cov / ($varx * $vary), 6) AS r2")
      .orderBy(col("l_returnflag"))
  }

  /** Per-region Gini coefficient of (non-negative) customer account
    * balances in exact cents: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with
    * x sorted ascending — the standard inequality/concentration report.
    * One ordered window and the region aggregate share a single r_name
    * exchange; all sums are BIGINT-exact until the final division. */
  private def qAggGini(s: SparkSession, d: String): DataFrame = {
    val cents = expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val w = Window.partitionBy(col("r_name"))
      .orderBy(col("cents"), col("c_custkey"))
    t(s, d, "customer").filter(col("c_acctbal") >= 0)
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("c_custkey"), cents.as("cents"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
        sum(col("i") * col("cents")).as("swx"))
      .selectExpr("r_name", "n",
        """ROUND((2.0 * CAST(swx AS DOUBLE)
          |  - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
          | / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini"""
          .stripMargin)
      .orderBy(col("r_name"))
  }

  /** Per-region revenue concentration (Pareto report): share of total
    * order revenue held by the top decile of customers (k = ⌈n/10⌉) and
    * by the single top customer. Revenue is exact cents; the per-region
    * rank and partition-count windows share one exchange. */
  private def qAggPareto(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "orders")
      .select(col("o_custkey"), expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("rev"))
    val wRank = Window.partitionBy(col("r_name"))
      .orderBy(desc("rev"), col("o_custkey"))
    val wAll = Window.partitionBy(col("r_name"))
    rev
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("o_custkey"), col("rev"))
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("k", expr("(count(*) OVER "
        + "(PARTITION BY r_name) + 9) div 10"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"), max(col("k")).as("k_top"),
        sum(col("rev")).as("total_cents"),
        sum(when(col("rn") <= col("k"), col("rev")).otherwise(lit(0L)))
          .as("top_cents"),
        sum(when(col("rn") === 1, col("rev")).otherwise(lit(0L)))
          .as("top1_cents"))
      .selectExpr("r_name", "n_cust", "k_top", "total_cents",
        """ROUND(CAST(top_cents AS DOUBLE)
          | / CAST(total_cents AS DOUBLE), 6) AS top_decile_share"""
          .stripMargin,
        """ROUND(CAST(top1_cents AS DOUBLE)
          | / CAST(total_cents AS DOUBLE), 6) AS top1_share""".stripMargin)
      .orderBy(col("r_name"))
  }

  /** Rolling z-score anomaly detection on hourly event counts per type:
    * a point is anomalous when it sits more than 2σ from the mean of the
    * TRAILING 24 observed hours (frame ROWS −24..−1 — the baseline never
    * includes the point under test). The variance guard (24·Σc² > (Σc)²)
    * is exact integer arithmetic, so both engines agree on which rows
    * even have a defined z. */
  private def qTimeAnomaly(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(-24, -1)
    hourly
      // one projection → one Window node over the shared frame
      .select(col("*"),
        count(lit(1)).over(w).as("n24"),
        sum(col("c")).over(w).as("sc"),
        sum(col("c") * col("c")).over(w).as("scc"))
      .filter(col("n24") === 24)
      .filter(expr("24 * scc > sc * sc"))
      .withColumn("z", expr(
        """ROUND((CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / 24.0)
          | / sqrt(CAST(scc AS DOUBLE) / 24.0
          |        - (CAST(sc AS DOUBLE) / 24.0)
          |          * (CAST(sc AS DOUBLE) / 24.0)), 6)""".stripMargin))
      .filter(abs(col("z")) > 2.0)
      .select(col("event_type"), col("hr"), col("c").as("n_events"),
        col("z").as("zscore"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** Top-20 co-purchase part pairs by exact Jaccard similarity of their
    * ORDER neighborhoods (link prediction / related-items). |A∩B| is the
    * pair's co-occurrence count from the order-co-partitioned self-join;
    * |A∪B| = deg(u) + deg(v) − |A∩B|. Support floor cn ≥ 2 prunes
    * one-off co-occurrences before the degree joins. */
  private def qGraphJaccard(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val deg = li.groupBy(col("pk")).agg(count(lit(1)).as("deg"))
    val cn = coPairCounts(s, d).filter(col("cn") >= 2)
    cn
      .join(deg.select(col("pk").as("u"), col("deg").as("du"))
        .hint("shuffle_hash"), Seq("u"))
      .join(deg.select(col("pk").as("v"), col("deg").as("dv"))
        .hint("shuffle_hash"), Seq("v"))
      .selectExpr("u", "v", "cn", "du", "dv",
        """ROUND(CAST(cn AS DOUBLE)
          | / CAST(du + dv - cn AS DOUBLE), 6) AS jaccard""".stripMargin)
      .orderBy(desc("jaccard"), col("u"), col("v")).limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_ols" -> (qAggOls _),
    "q_agg_gini" -> (qAggGini _),
    "q_agg_pareto" -> (qAggPareto _),
    "q_time_anomaly" -> (qTimeAnomaly _),
    "q_graph_jaccard" -> (qGraphJaccard _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_ols" ->
      """WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(19,4)) AS x,
        |          CAST(l_extendedprice AS DECIMAL(19,4)) AS y
        |        FROM lineitem) z
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  ROUND((CAST(sy AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_gini" ->
      """WITH c AS (
        |  SELECT r.r_name, cu.c_custkey,
        |    CAST(CAST(cu.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM customer cu
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE cu.c_acctbal >= 0),
        |ranked AS (
        |  SELECT r_name, cents,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY r_name
        |      ORDER BY cents, c_custkey) AS BIGINT) AS i
        |  FROM c),
        |m AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS BIGINT) AS sx,
        |        CAST(sum(i * cents) AS BIGINT) AS swx
        |      FROM ranked GROUP BY r_name)
        |SELECT r_name, n,
        |  ROUND((2.0 * CAST(swx AS DOUBLE)
        |    - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
        |FROM m ORDER BY r_name""".stripMargin,
    "q_agg_pareto" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT r.r_name, rev.o_custkey, rev.rev
        |  FROM rev
        |  JOIN customer cu ON rev.o_custkey = cu.c_custkey
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey),
        |ranked AS (
        |  SELECT r_name, rev,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY r_name
        |      ORDER BY rev DESC, o_custkey) AS BIGINT) AS rn,
        |    (CAST(COUNT(*) OVER (PARTITION BY r_name) AS BIGINT) + 9) // 10
        |      AS k
        |  FROM j),
        |m AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n_cust,
        |        CAST(max(k) AS BIGINT) AS k_top,
        |        CAST(sum(rev) AS BIGINT) AS total_cents,
        |        CAST(sum(CASE WHEN rn <= k THEN rev ELSE 0 END) AS BIGINT)
        |          AS top_cents,
        |        CAST(sum(CASE WHEN rn = 1 THEN rev ELSE 0 END) AS BIGINT)
        |          AS top1_cents
        |      FROM ranked GROUP BY r_name)
        |SELECT r_name, n_cust, k_top, total_cents,
        |  ROUND(CAST(top_cents AS DOUBLE)
        |   / CAST(total_cents AS DOUBLE), 6) AS top_decile_share,
        |  ROUND(CAST(top1_cents AS DOUBLE)
        |   / CAST(total_cents AS DOUBLE), 6) AS top1_share
        |FROM m ORDER BY r_name""".stripMargin,
    "q_time_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hr, c,
        |    CAST(count(*) OVER f AS BIGINT) AS n24,
        |    CAST(sum(c) OVER f AS BIGINT) AS sc,
        |    CAST(sum(c * c) OVER f AS BIGINT) AS scc
        |  FROM hourly
        |  WINDOW f AS (PARTITION BY event_type ORDER BY hr
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, hr, c,
        |    ROUND((CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / 24.0)
        |     / sqrt(CAST(scc AS DOUBLE) / 24.0
        |            - (CAST(sc AS DOUBLE) / 24.0)
        |              * (CAST(sc AS DOUBLE) / 24.0)), 6) AS z
        |  FROM w WHERE n24 = 24 AND 24 * scc > sc * sc)
        |SELECT event_type, hr, c AS n_events, z AS zscore
        |FROM z WHERE abs(z) > 2.0
        |ORDER BY event_type, hr""".stripMargin,
    "q_graph_jaccard" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |deg AS (SELECT pk, CAST(count(*) AS BIGINT) AS deg
        |        FROM li GROUP BY pk),
        |cn AS (SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS cn
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT cn.u, cn.v, cn.cn, du.deg AS du, dv.deg AS dv,
        |  ROUND(CAST(cn.cn AS DOUBLE)
        |   / CAST(du.deg + dv.deg - cn.cn AS DOUBLE), 6) AS jaccard
        |FROM cn JOIN deg du ON cn.u = du.pk
        |        JOIN deg dv ON cn.v = dv.pk
        |ORDER BY jaccard DESC, cn.u, cn.v LIMIT 20""".stripMargin,
  )
}
