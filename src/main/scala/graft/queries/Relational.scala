package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Relational core (SURVEY.md §2.C: scans, predicates, joins, aggregates,
  * sorts/limits, set ops). Every query is a declarative DataFrame plan —
  * Catalyst handles pushdown/pruning/join selection; `broadcast()` hints
  * mark dimension tables. Each oracled query ends in a total-order sort.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- scans

  private def qScanParquet(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select($c("l_orderkey"), $c("l_linenumber"), $c("l_quantity"),
        $c("l_extendedprice"), $c("l_returnflag"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
      // the total order must cover every output column.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag")

  private def qScanPruned(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= ntz("1998-01-01"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber", "ship_date")

  // ------------------------------------------------------ filter / project

  private def qFilterPred(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(
        (col("l_shipdate").between(ntz("1995-01-01"), ntz("1996-12-31")) &&
          col("l_quantity").isin(1, 5, 10, 25, 50) &&
          col("l_returnflag") =!= "N") ||
        (col("l_tax") > 0.07 && col("l_linestatus") === "F") ||
        (col("l_returnflag") <=> "R" && col("l_discount") === 0.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_linestatus"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_linestatus")

  /** `charge` is computed in exact decimal arithmetic: its true value has
    * scale 6, so a double→DECIMAL(18,4) cast would hit exact rounding ties
    * (Spark HALF_UP vs DuckDB half-even). price fits DECIMAL(9,2), rates
    * DECIMAL(4,2); products stay exact at scale 6 with no 38-digit
    * overflow on either engine. */
  private def chargeExact = {
    val price = col("l_extendedprice").cast("decimal(9,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val tax = col("l_tax").cast("decimal(4,2)")
    (price * (lit(1) - disc) * (lit(1) + tax)).cast("decimal(18,6)")
  }

  private def qProjectExpr(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        dbl(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"),
        dbl(chargeExact).as("charge"),
        when(col("l_quantity") > 25, "bulk")
          .when(col("l_quantity") > 10, "mid")
          .otherwise("small").as("bucket"))
      .orderBy("l_orderkey", "l_linenumber", "revenue", "charge", "bucket")

  // ----------------------------------------------------------------- joins

  private def qJoinInner(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"),
        col("c_mktsegment"))
      .orderBy("o_orderkey")

  private def qJoinLeft(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  private def qJoinRight(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"),
        "right")
      .select(col("c_custkey"), col("o_orderkey"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  private def qJoinFull(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
    val o = t(s, d, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(col("c_custkey"), col("o_custkey"), col("n_orders"))
      .orderBy(col("c_custkey").asc_nulls_first,
        col("o_custkey").asc_nulls_first)
  }

  private def qJoinSemi(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private def qJoinAnti(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private def qJoinCross(s: SparkSession, d: String): DataFrame =
    t(s, d, "region").crossJoin(t(s, d, "nation"))
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"),
        col("n_name"))
      .orderBy("r_regionkey", "n_nationkey")

  private def qJoinBroadcast(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
      .orderBy("n_name")

  private def qJoinTheta(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier")
      .join(t(s, d, "customer"),
        col("s_nationkey") === col("c_nationkey") &&
          col("c_acctbal") > col("s_acctbal"))
      .select(col("s_suppkey"), col("c_custkey"))
      .orderBy("s_suppkey", "c_custkey")

  /** As-of join: latest order at-or-before each event's timestamp, per
    * user. Spark has no native ASOF (reference-class engines do); the
    * scale-safe composition is equi-join on the user key (hash join, no
    * BNLJ) + range predicate + argmax. The argmax is a lexicographic
    * `max(struct(ts, key))` hash aggregate — partially aggregatable, so
    * the match blowup combines map-side instead of shuffling into a
    * window sort (SURVEY §4.B). */
  private def qJoinAsof(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_id"), col("user_id"), col("us"))
    val o = t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
    e.join(o, col("user_id") === col("o_custkey") && col("ous") <= col("us"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(struct(col("ous"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("user_id"),
        col("m.o_orderkey").as("o_orderkey"), col("m.ous").as("ous"))
      .orderBy("event_id")
  }

  /** 5-way star join (region→nation→customer→orders→lineitem), TPC-H
    * Q5 shape. nation/region are broadcast dims; the fact-side joins
    * shuffle on their keys. */
  private def qJoinMulti(s: SparkSession, d: String): DataFrame =
    broadcast(t(s, d, "region").filter(col("r_regionkey") < 3))
      .join(broadcast(t(s, d, "nation")),
        col("r_regionkey") === col("n_regionkey"))
      .join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
      .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dbl(sum(dec(col("l_extendedprice") * (lit(1.0) -
        col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")

  // ------------------------------------------------------------ aggregates

  private def qAggGlobal(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
      min(col("l_shipdate").cast("date")).as("min_ship"),
      max(col("l_shipdate").cast("date")).as("max_ship"))

  /** TPC-H Q1 shape — the flagship aggregate. */
  def qAggGroup(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= ntz("2002-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
        // money totals ROUND IN DECIMAL to their natural 2dp BEFORE the
        // double cast: past 2^53 micro-units (sf≈1) DuckDB's
        // int128-decimal→double two-part conversion is off by ulps
        // where Spark's BigDecimal is correctly rounded — the
        // q_agg_chow class, caught by the r15 sf1 value campaign; the
        // 2dp decimal keeps the final cast sub-2^53 (exact) to sf≈1000
        dbl(round(sum(dec(col("l_extendedprice"))), 2))
          .as("sum_base_price"),
        dbl(round(sum(dec(col("l_extendedprice") * (lit(1.0) -
          col("l_discount")))), 2)).as("sum_disc_price"),
        dbl(round(sum(chargeExact), 2)).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private def qAggDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_ps"),
        dbl(sum_distinct(dec(col("l_quantity")))).as("sum_dist_qty"))
      .orderBy("l_returnflag")

  private def qAggHaving(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy(col("o_custkey"))
      .agg(dbl(sum(dec(col("o_totalprice")))).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .filter(col("total_spent") > 1000000)
      .orderBy("o_custkey")

  private def qAggRollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(grouping(col("r_name")).as("g_r"), grouping(col("n_name"))
        .as("g_n"), count(lit(1)).as("n_cust"),
        dbl(sum(dec(col("c_acctbal")))).as("sum_bal"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first,
        col("n_name").asc_nulls_first)

  private def qAggCube(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(grouping(col("c_mktsegment")).as("g_s"), grouping(col("n_name"))
        .as("g_n"), count(lit(1)).as("n_cust"))
      .orderBy(col("g_s"), col("g_n"), col("c_mktsegment").asc_nulls_first,
        col("n_name").asc_nulls_first)

  private def qAggGsets(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq()),
        col("c_mktsegment"), col("n_name"))
      .agg(grouping(col("c_mktsegment")).as("g_s"), grouping(col("n_name"))
        .as("g_n"), count(lit(1)).as("n_cust"))
      .orderBy(col("g_s"), col("g_n"), col("c_mktsegment").asc_nulls_first,
        col("n_name").asc_nulls_first)
  }

  /** Sketch aggregates (HLL++ distinct, quantile sketch). Approximate by
    * construction → ScalaTest error-bound checks, no oracle. */
  private def qAggApprox(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_qty"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000))
          .as("p95_price"))
      .orderBy("l_returnflag")

  /** Moment statistics recomputed from *exact* integer sums so the final
    * double formula is bit-identical across engines (IEEE ops on identical
    * inputs). l_quantity / l_linenumber are integer-valued. */
  private def qAggStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("bigint").as("x"),
        col("l_linenumber").cast("bigint").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .selectExpr("l_returnflag", "n",
        "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_x",
        "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS stddev_x",
        "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS covar_xy",
        "(CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr_xy")
      .orderBy("l_returnflag")

  // --------------------------------------------------- sort / limit / topk

  private def qSortMulti(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("c_acctbal").desc,
        col("c_custkey").asc)

  private def qLimitOffset(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey").offset(100).limit(25)

  /** Global top-k: plans as TakeOrderedAndProject (no full sort). */
  private def qTopk(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Seeded Bernoulli sample (reference B7, samplerate knob). RNG differs
    * across engines → ScalaTest-verified, no oracle. */
  private def qSample(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").sample(withReplacement = false, 0.01, seed = 42L)
      .select(col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- setops

  private def qSetUnion(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey").as("k"))
      .union(t(s, d, "orders").select(col("o_custkey").as("k")))
      .distinct()
      .orderBy("k")

  private def qSetIntersect(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey").as("k"))
      .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))
      .orderBy("k")

  /** EXCEPT over a date-restricted right side. The unrestricted form
    * (customer EXCEPT all order custkeys) is empty at every test SF —
    * a hash-match on zero rows is vacuous evidence, since any bug that
    * yields nothing also "passes". Restricting the right side to
    * recent orders leaves customers whose orders are all pre-2000
    * (135 rows at sf0.01, 14 at sf0.001), so the oracle can actually
    * fail if EXCEPT semantics break. */
  private def qSetExcept(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey").as("k"))
      .except(t(s, d, "orders")
        .filter(col("o_orderdate") >= "2000-01-01")
        .select(col("o_custkey").as("k")))
      .orderBy("k")

  private def $c(n: String) = col(n)

  // -------------------------------------------------------------- registry

  val defs: Map[String, Q] = Map(
    "q_scan_parquet" -> (qScanParquet _),
    "q_scan_pruned" -> (qScanPruned _),
    "q_filter_pred" -> (qFilterPred _),
    "q_project_expr" -> (qProjectExpr _),
    "q_join_inner" -> (qJoinInner _),
    "q_join_left" -> (qJoinLeft _),
    "q_join_right" -> (qJoinRight _),
    "q_join_full" -> (qJoinFull _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_cross" -> (qJoinCross _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_theta" -> (qJoinTheta _),
    "q_join_asof" -> (qJoinAsof _),
    "q_join_multi" -> (qJoinMulti _),
    "q_agg_global" -> (qAggGlobal _),
    "q_agg_group" -> (qAggGroup _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_having" -> (qAggHaving _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_gsets" -> (qAggGsets _),
    "q_agg_approx" -> (qAggApprox _),
    "q_agg_stats" -> (qAggStats _),
    "q_sort_multi" -> (qSortMulti _),
    "q_limit_offset" -> (qLimitOffset _),
    "q_topk" -> (qTopk _),
    "q_sample" -> (qSample _),
    "q_set_union" -> (qSetUnion _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_set_except" -> (qSetExcept _),
  )

  /** DuckDB-portable oracle SQL, one per oracle-able id. */
  val sql: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag""".stripMargin,
    "q_scan_pruned" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber, ship_date""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE (l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        |       AND l_quantity IN (1, 5, 10, 25, 50) AND l_returnflag <> 'N')
        |   OR (l_tax > 0.07 AND l_linestatus = 'F')
        |   OR (l_returnflag IS NOT DISTINCT FROM 'R' AND l_discount = 0.0)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  CAST(CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6)) AS DOUBLE) AS charge,
        |  CASE WHEN l_quantity > 25 THEN 'bulk' WHEN l_quantity > 10 THEN 'mid' ELSE 'small' END AS bucket
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue, charge, bucket""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT c_custkey, o_custkey, n_orders
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_theta" ->
      """SELECT s_suppkey, c_custkey
        |FROM supplier JOIN customer
        |  ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
        |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "q_join_asof" ->
      """SELECT event_id, user_id, o_orderkey, ous FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |         epoch_us(o.o_orderdate) AS ous,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |           ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
        |  FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |        FROM events) e
        |  JOIN orders o ON e.user_id = o.o_custkey
        |               AND epoch_us(o.o_orderdate) <= e.us) z
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM region
        |JOIN nation   ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders   ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE r_regionkey < 3
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_agg_global" ->
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(MIN(l_shipdate) AS DATE) AS min_ship,
        |  CAST(MAX(l_shipdate) AS DATE) AS max_ship
        |FROM lineitem""".stripMargin,
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2002-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS nd_ps,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_dist_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_having" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) > 1000000
        |ORDER BY o_custkey""".stripMargin,
    "q_agg_rollup" ->
      """SELECT r_name, n_name, GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      """SELECT c_mktsegment, n_name, GROUPING(c_mktsegment) AS g_s,
        |  GROUPING(n_name) AS g_n, COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(c_mktsegment, n_name)
        |ORDER BY g_s, g_n, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_agg_gsets" ->
      """SELECT c_mktsegment, n_name, GROUPING(c_mktsegment) AS g_s,
        |  GROUPING(n_name) AS g_n, COUNT(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        |ORDER BY g_s, g_n, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_agg_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS BIGINT)) AS sx,
        |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |    SUM(CAST(l_linenumber AS BIGINT)) AS sy,
        |    SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS syy,
        |    SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_x,
        |  sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS stddev_x,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS covar_xy,
        |  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS corr_xy
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_sort_multi" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC""".stripMargin,
    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 25 OFFSET 100""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_set_union" ->
      """SELECT c_custkey AS k FROM customer
        |UNION SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey AS k FROM orders
        |WHERE o_orderdate >= '2000-01-01' ORDER BY k""".stripMargin,
  )
}
