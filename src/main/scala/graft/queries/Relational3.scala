package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Third relational wave: argmin/argmax + boolean/bitwise/histogram
  * aggregates, event-time range join, lateral join, EXISTS / NOT IN
  * subqueries, IGNORE NULLS windows, batch MERGE (upsert) semantics,
  * SCD2 history build, multi-reference CTE, calendar functions.
  *
  * Determinism notes (same discipline as the earlier waves):
  *  - arg_max/arg_min tie-break through a composite integer score
  *    (`round(balance*100)*1e7 + key`) — both engines compare the same
  *    exact BIGINT, no double ordering;
  *  - the range join keys on an equi user column before the time band, so
  *    Spark plans a hash/merge join with a post-filter, never a
  *    broadcast-nested-loop over the cross product;
  *  - MERGE output totals are plain double additions (exact binary fp op,
  *    engine-independent) — no summation-order hazard. */
object Relational3 {

  /** arg_max/arg_min per group: the customer holding the highest/lowest
    * balance per nation (reference has nothing comparable; standard OLAP
    * argmax). Composite BIGINT score makes ties impossible: the 1e12
    * multiplier keys cents (|round(bal*100)| ≤ 1e6, product ≤ 1e18 <
    * Long.Max) above custkey, which stays unique below 1e12 — TPC-H
    * custkey = 150k×SF, so collision-free past SF 6,000,000. */
  private def qAggArgmax(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        expr("max_by(c_name, cast(round(c_acctbal*100) as bigint)*1000000000000 + c_custkey)")
          .as("richest"),
        expr("min_by(c_name, cast(round(c_acctbal*100) as bigint)*1000000000000 + c_custkey)")
          .as("poorest"),
        count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")

  /** Deterministic statistical mode per group: most frequent value,
    * smallest value on frequency ties. Engine-native `mode()` leaves
    * tie-breaking unspecified on both engines, so the portable form is
    * the two-level aggregate — (group, value) counts, then an arg-max
    * on the composite key cnt·10⁶ − value (same integer-packing trick
    * as q_agg_argmax; l_quantity ∈ [1,50] ≪ 10⁶): two bounded shuffles,
    * partial-agg'd, no windows. */
  private def qAggMode(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity").cast("bigint").as("q"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("l_returnflag"))
      .agg(expr("max_by(q, cnt * 1000000 - q)").as("mode_qty"),
        max(col("cnt")).as("mode_n"))
      .orderBy("l_returnflag")

  /** Boolean aggregates: bool_and / bool_or / count_if. */
  private def qAggBool(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(expr("bool_and(o_totalprice > 1000)").as("all_above_1k"),
        expr("bool_or(o_totalprice > 400000)").as("any_above_400k"),
        expr("count_if(o_orderstatus = 'F')").as("n_f"))
      .orderBy("o_orderpriority")

  /** Bitwise aggregates over the order keys of each line number. */
  private def qAggBitagg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_linenumber"))
      .agg(expr("bit_and(l_orderkey)").as("band"),
        expr("bit_or(l_orderkey)").as("bor"),
        expr("bit_xor(l_orderkey)").as("bxor"))
      .orderBy("l_linenumber")

  /** Equi-width histogram: 50k-wide price bins. floor() is explicit on
    * both engines (Spark truncates double→int casts, DuckDB rounds). */
  private def qAggHist(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(expr("cast(floor(o_totalprice/50000) as bigint)").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("bin")

  /** Event-time range join: for every purchase, clicks by the same user
    * in the preceding hour. Equi key (user_id) + time band — planned as
    * a hash join with a band post-filter, which is the shape that scales
    * (the pure-interval version would need bucketization first). */
  private def qJoinRange(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("us").as("c_us"))
    p.join(c, p("user_id") === c("c_user") &&
        col("c_us") >= col("p_us") - lit(3600L * 1000000L) &&
        col("c_us") < col("p_us"), "left")
      .groupBy(col("event_id"))
      .agg(count(col("c_us")).as("n_clicks_1h"))
      .orderBy("event_id")
  }

  /** Lateral join: top-2 customers by balance per nation, correlated
    * ORDER BY + LIMIT inside the lateral subquery. */
  private def qJoinLateral(s: SparkSession, d: String): DataFrame = {
    t(s, d, "nation").createOrReplaceTempView("nation")
    t(s, d, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
  }

  /** EXISTS + NOT EXISTS in one predicate (both decorrelate to semi /
    * anti joins). */
  private def qSubqueryExists(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("customer")
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** NOT IN subquery (null-aware anti join — the subquery column is
    * non-null here, so it reduces to a plain anti join, but the planner
    * must prove that). */
  private def qSubqueryNotin(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("customer")
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** IGNORE NULLS windows: the running first/last 'F'-status price per
    * customer. Explicit ROWS frame — DuckDB's default RANGE frame would
    * differ on order ties. */
  private def qWinIgnorenulls(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fPrice = when(col("o_orderstatus") === "F", col("o_totalprice"))
    t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        last(fPrice, ignoreNulls = true).over(w).as("last_f_price"),
        first(fPrice, ignoreNulls = true).over(w).as("first_f_price"))
      .orderBy("o_orderkey")
  }

  /** Batch MERGE (upsert): updates (key%3=0, bumped price, status 'U')
    * and inserts (shifted keys, status 'N') merged into the base via a
    * full outer join — the engine's MERGE INTO building block. */
  private def qMergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("b_st"),
        col("o_totalprice").as("b_tp"))
    val o = t(s, d, "orders")
    val upd = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"), lit("U").as("s_st"),
        (col("o_totalprice") + 10.0).as("s_tp"))
    // negated keys can never collide with real (non-negative) order keys
    // at any scale factor, keeping the output ORDER BY a total order
    val ins = o.filter(col("o_orderkey") % 1000 === 0)
      .select((-col("o_orderkey") - 1).as("k"), lit("N").as("s_st"),
        col("o_totalprice").as("s_tp"))
    val source = upd.union(ins)
    base.join(source, Seq("k"), "full_outer")
      .select(col("k").as("o_orderkey"),
        coalesce(col("s_st"), col("b_st")).as("status"),
        coalesce(col("s_tp"), col("b_tp")).as("totalprice"),
        when(col("b_st").isNull, "insert")
          .when(col("s_st").isNull, "keep").otherwise("update").as("action"))
      .orderBy("o_orderkey")
  }

  /** SCD2 history build: each order becomes a validity interval of the
    * customer's order status, closed by the next order (lead window),
    * open intervals flagged current. */
  private def qScd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderstatus").as("status"),
        col("o_orderdate").cast("date").as("valid_from"),
        coalesce(lead(col("o_orderdate").cast("date"), 1).over(w),
          lit("9999-12-31").cast("date")).as("valid_to"))
      .withColumn("is_current", col("valid_to") === lit("9999-12-31").cast("date"))
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** Multi-reference CTE (TPC-H Q15 shape): revenue per supplier,
    * referenced once for the join and once for the MAX — exercises plan
    * reuse of the shared subtree. */
  private def qCte(s: SparkSession, d: String): DataFrame = {
    t(s, d, "supplier").createOrReplaceTempView("supplier")
    t(s, d, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """WITH rev AS (
        |  SELECT l_suppkey AS sk,
        |         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS r
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = sk
        |WHERE r = (SELECT MAX(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** Recursive CTE (Spark 4.1 WITH RECURSIVE): a generated calendar
    * spine left-joined to daily order aggregates — the gap-filling
    * time-series pattern (days with zero orders appear as explicit
    * zero rows, which a plain GROUP BY can never produce). The
    * recursion depth is the calendar length (90 days), independent of
    * data size; the join is the only corpus-touching stage. DuckDB
    * runs the identical SQL. */
  private def qCteRecursive(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """WITH RECURSIVE cal(day) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM cal
        |  WHERE day < DATE '1995-03-31')
        |SELECT cal.day, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(o.sp, 0) AS DOUBLE) AS sum_price
        |FROM cal LEFT JOIN (
        |  SELECT CAST(o_orderdate AS DATE) AS dd, COUNT(*) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sp
        |  FROM orders GROUP BY 1) o ON o.dd = cal.day
        |ORDER BY cal.day""".stripMargin)
  }

  /** Calendar functions: quarter, month truncation, end-of-month,
    * add-months clamping, days-in-month. */
  private def qFnDatetime2(s: SparkSession, d: String): DataFrame = {
    val dt = col("o_orderdate").cast("date")
    t(s, d, "orders")
      .select(col("o_orderkey"),
        quarter(dt).as("q"),
        trunc(dt, "MM").as("month_start"),
        last_day(dt).as("month_end"),
        add_months(dt, 3).as("plus3m"),
        (datediff(last_day(dt), trunc(dt, "MM")) + 1).as("days_in_month"))
      .orderBy("o_orderkey")
  }

  /** Native top-k-per-group via the custom physical operator
    * (graft.plans.TopKPerGroup): partial per-partition heaps → shuffle
    * ≤k rows per (group, partition) → final heaps + rank. Same result
    * as the window formulation (q_topk_per_group), a fraction of its
    * shuffle. */
  private def qTopkNative(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerGroup(
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice")),
      groupCols = Seq("l_orderkey"), orderCol = "l_extendedprice",
      tieCols = Seq("l_linenumber", "l_partkey", "l_suppkey", "l_quantity"),
      k = 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"), col("rnk"))
      .orderBy("l_orderkey", "rnk")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk_native" -> (qTopkNative _),
    "q_agg_argmax" -> (qAggArgmax _),
    "q_agg_mode" -> (qAggMode _),
    "q_agg_bool" -> (qAggBool _),
    "q_agg_bitagg" -> (qAggBitagg _),
    "q_agg_hist" -> (qAggHist _),
    "q_join_range" -> (qJoinRange _),
    "q_join_lateral" -> (qJoinLateral _),
    "q_subquery_exists" -> (qSubqueryExists _),
    "q_subquery_notin" -> (qSubqueryNotin _),
    "q_win_ignorenulls" -> (qWinIgnorenulls _),
    "q_merge_upsert" -> (qMergeUpsert _),
    "q_scd2" -> (qScd2 _),
    "q_cte" -> (qCte _),
    "q_cte_recursive" -> (qCteRecursive _),
    "q_fn_datetime2" -> (qFnDatetime2 _),
  )

  val sql: Map[String, String] = Map(
    "q_topk_native" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, rnk
        |FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey, l_quantity) AS INT) AS rnk
        |  FROM lineitem)
        |WHERE rnk <= 3 ORDER BY l_orderkey, rnk""".stripMargin,
    "q_agg_argmax" ->
      """SELECT c_nationkey,
        |  arg_max(c_name, CAST(round(c_acctbal*100) AS BIGINT)*1000000000000 + c_custkey) AS richest,
        |  arg_min(c_name, CAST(round(c_acctbal*100) AS BIGINT)*1000000000000 + c_custkey) AS poorest,
        |  COUNT(*) AS n_cust
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_agg_mode" ->
      """WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT))
        |SELECT l_returnflag, arg_max(q, cnt * 1000000 - q) AS mode_qty,
        |  CAST(MAX(cnt) AS BIGINT) AS mode_n
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_bool" ->
      """SELECT o_orderpriority,
        |  bool_and(o_totalprice > 1000) AS all_above_1k,
        |  bool_or(o_totalprice > 400000) AS any_above_400k,
        |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_bitagg" ->
      """SELECT l_linenumber, bit_and(l_orderkey) AS band,
        |  bit_or(l_orderkey) AS bor, bit_xor(l_orderkey) AS bxor
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,
    "q_agg_hist" ->
      """SELECT CAST(floor(o_totalprice/50000) AS BIGINT) AS bin, COUNT(*) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
    "q_join_range" ->
      """SELECT p.event_id, COUNT(c.ts) AS n_clicks_1h
        |FROM events p LEFT JOIN events c
        |  ON p.user_id = c.user_id AND c.event_type = 'click'
        | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(p.ts AS TIMESTAMP)) - CAST(3600 AS BIGINT)*1000000
        | AND epoch_us(CAST(c.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP))
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_join_lateral" ->
      """SELECT n_name, t.c_name, t.c_acctbal
        |FROM nation,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, t.c_acctbal DESC, t.c_name""".stripMargin,
    "q_subquery_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_notin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_win_ignorenulls" ->
      """SELECT o_orderkey, o_custkey,
        |  last_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS) OVER w AS last_f_price,
        |  first_value(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END IGNORE NULLS) OVER w AS first_f_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS b_st, o_totalprice AS b_tp FROM orders),
        |source AS (
        |  SELECT o_orderkey AS k, 'U' AS s_st, o_totalprice + 10.0 AS s_tp
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1 AS k, 'N' AS s_st, o_totalprice AS s_tp
        |  FROM orders WHERE o_orderkey % 1000 = 0)
        |SELECT COALESCE(b.k, s.k) AS o_orderkey,
        |  COALESCE(s.s_st, b.b_st) AS status,
        |  COALESCE(s.s_tp, b.b_tp) AS totalprice,
        |  CASE WHEN b.b_st IS NULL THEN 'insert'
        |       WHEN s.s_st IS NULL THEN 'keep' ELSE 'update' END AS action
        |FROM base b FULL JOIN source s ON b.k = s.k
        |ORDER BY o_orderkey""".stripMargin,
    "q_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus AS status,
        |  CAST(o_orderdate AS DATE) AS valid_from,
        |  COALESCE(lead(CAST(o_orderdate AS DATE), 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    DATE '9999-12-31') AS valid_to,
        |  COALESCE(lead(CAST(o_orderdate AS DATE), 1) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    DATE '9999-12-31') = DATE '9999-12-31' AS is_current
        |FROM orders ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "q_cte_recursive" ->
      """WITH RECURSIVE cal(day) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM cal
        |  WHERE day < DATE '1995-03-31')
        |SELECT cal.day, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(o.sp, 0) AS DOUBLE) AS sum_price
        |FROM cal LEFT JOIN (
        |  SELECT CAST(o_orderdate AS DATE) AS dd, COUNT(*) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sp
        |  FROM orders GROUP BY 1) o ON o.dd = cal.day
        |ORDER BY cal.day""".stripMargin,
    "q_cte" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS sk,
        |         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS r
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = sk
        |WHERE r = (SELECT MAX(r) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_fn_datetime2" ->
      """SELECT o_orderkey,
        |  CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(date_diff('day', date_trunc('month', CAST(o_orderdate AS DATE)),
        |       last_day(CAST(o_orderdate AS DATE))) + 1 AS INT) AS days_in_month
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
