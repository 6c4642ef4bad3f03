package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Second relational wave: subqueries (scalar / IN / correlated —
  * exercising Catalyst's decorrelation), pivot/unpivot, multiset set
  * ops, distribution window functions, bitwise + struct functions.
  *
  * Scalar-subquery thresholds are computed as `CAST(SUM(DECIMAL)/COUNT
  * AS DOUBLE)` on both engines: the decimal sum is exact, so the double
  * division is bit-identical — a plain AVG(double) would be
  * summation-order-dependent. */
object Relational2 {

  /** Uncorrelated scalar subquery: customers above the global mean
    * balance. SQL-first (temp view + spark.sql) — the same Catalyst
    * path, exercising the subquery rewrite rules. */
  private def qSubqueryScalar(s: SparkSession, d: String): DataFrame = {
    t(s, d, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** IN subquery (rewrites to a semi join). */
  private def qSubqueryIn(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    t(s, d, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Correlated scalar subquery with an aggregate — Catalyst
    * decorrelates this into a join against a grouped subplan. */
  private def qSubqueryCorr(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """SELECT o1.o_orderkey, o1.o_custkey FROM orders o1
        |WHERE o1.o_totalprice >
        |  (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |   FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
        |ORDER BY o1.o_orderkey""".stripMargin)
  }

  private def qPivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec(col("l_quantity"))))
      .select(col("l_returnflag"),
        dbl(col("F")).as("qty_f"),
        dbl(col("O")).as("qty_o"))
      .orderBy("l_returnflag")

  private def qUnpivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .selectExpr("p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retail', p_retailprice) AS (metric, value)")
      .orderBy("p_partkey", "metric")

  private def qSetIntersectAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_suppkey").as("k"))
      .intersectAll(t(s, d, "lineitem").filter(col("l_linestatus") === "F")
        .select(col("l_suppkey").as("k")))
      .orderBy("k")

  /** EXCEPT ALL with the full multiset on the left and the R-flag
    * subset on the right. The old R-minus-F form produced zero rows at
    * every test SF (each suppkey's F multiplicity covers its R
    * multiplicity) — a vacuous hash-match. Left ⊇ right by
    * construction here, so the result is exactly the per-key
    * multiplicity differences (~40k rows at sf0.01) and a broken
    * multiset subtraction shows up as a real mismatch. */
  private def qSetExceptAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_suppkey").as("k"))
      .exceptAll(t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_suppkey").as("k")))
      .orderBy("k")

  /** percent_rank / cume_dist (exact rational arithmetic on both
    * engines: (rank-1)/(n-1) and peers/n in double). */
  private def qWinPercent(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact order statistics: median + interpolated quartiles over
    * integer-valued quantities (linear interpolation between exact-int
    * order stats → identical double formula on both engines). */
  private def qAggMedian(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .withColumn("xq", col("l_quantity").cast("bigint"))
      .groupBy(col("l_returnflag"))
      .agg(expr("median(xq)").as("med"),
        expr("percentile(xq, 0.25)").as("q1"),
        expr("percentile(xq, 0.75)").as("q3"))
      .orderBy("l_returnflag")

  /** Array construction/manipulation wave 2: sort, zip, flatten,
    * sequence, slicing, distinct/union over built arrays. Array outputs
    * are serialized to comma-joined strings: the driver's row-sort
    * (pandas lexsort) cannot order raw array cells. */
  private def qFnArray2(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"),
        sort_array(collect_set(col("l_suppkey"))).as("supps"))
      .select(col("l_orderkey"),
        concat_ws(",", col("lns")).as("lns"),
        size(col("supps")).as("n_supp"),
        concat_ws(",", slice(col("lns"), 1, 3)).as("first3"),
        concat_ws(",", array_distinct(col("lns"))).as("dlns"),
        concat_ws(",", expr("sequence(1, size(lns))")).as("seq"))
      .orderBy("l_orderkey")

  /** String aggregation (LISTAGG shape): deterministic via sorted
    * distinct sets joined with a fixed separator. */
  private def qAggListagg(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(concat_ws(",", sort_array(collect_set(col("l_linestatus"))))
        .as("statuses"),
        concat_ws("|", sort_array(collect_set(col("l_shipdate").cast("date")
          .cast("string")))).as("d1"))
      .select(col("l_returnflag"), col("statuses"),
        substring(col("d1"), 1, 21).as("first_dates"))
      .orderBy("l_returnflag")

  /** nth_value + first/last over an explicit frame. */
  private def qWinNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
      nth_value(col("o_orderkey"), 2).over(w).as("second_ok"),
      count(lit(1)).over(w).as("n_orders"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private def qFnBitwise(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(col("o_orderkey"),
      (col("o_orderkey").bitwiseAND(255)).as("b_and"),
      (col("o_orderkey").bitwiseOR(4096)).as("b_or"),
      shiftleft(col("o_orderkey"), 2).as("b_shl"),
      shiftright(col("o_orderkey"), 3).as("b_shr"))
      .orderBy("o_orderkey")

  /** Struct build + field access + nested sort key. */
  private def qFnStruct(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("info", struct(col("c_name").as("name"),
        col("c_acctbal").as("bal"),
        struct(col("c_nationkey").as("nk")).as("geo")))
      .select(col("c_custkey"),
        col("info.name").as("name"),
        col("info.bal").as("bal"),
        col("info.geo.nk").as("nk"))
      .orderBy("c_custkey")

  val defs: Map[String, Relational.Q] = Map(
    "q_subquery_scalar" -> (qSubqueryScalar _),
    "q_subquery_in" -> (qSubqueryIn _),
    "q_subquery_corr" -> (qSubqueryCorr _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_set_intersect_all" -> (qSetIntersectAll _),
    "q_set_except_all" -> (qSetExceptAll _),
    "q_win_percent" -> (qWinPercent _),
    "q_agg_median" -> (qAggMedian _),
    "q_agg_listagg" -> (qAggListagg _),
    "q_win_nth" -> (qWinNth _),
    "q_fn_array2" -> (qFnArray2 _),
    "q_fn_bitwise" -> (qFnBitwise _),
    "q_fn_struct" -> (qFnStruct _),
  )

  val sql: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_corr" ->
      """SELECT o1.o_orderkey, o1.o_custkey FROM orders o1
        |WHERE o1.o_totalprice >
        |  (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |   FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
        |ORDER BY o1.o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retail' AS metric, p_retailprice AS value FROM part) z
        |ORDER BY p_partkey, metric""".stripMargin,
    "q_set_intersect_all" ->
      """SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |INTERSECT ALL
        |SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'
        |ORDER BY k""".stripMargin,
    "q_set_except_all" ->
      """SELECT l_suppkey AS k FROM lineitem
        |EXCEPT ALL
        |SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY k""".stripMargin,
    "q_win_percent" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |  ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_agg_listagg" ->
      """SELECT l_returnflag,
        |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
        |  substring(string_agg(DISTINCT CAST(CAST(l_shipdate AS DATE) AS VARCHAR), '|'
        |    ORDER BY CAST(CAST(l_shipdate AS DATE) AS VARCHAR)), 1, 21) AS first_dates
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_ok,
        |  COUNT(*) OVER w AS n_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_agg_median" ->
      """SELECT l_returnflag,
        |  median(CAST(l_quantity AS BIGINT)) AS med,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS q1,
        |  quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS q3
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_fn_array2" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lns,
        |  CAST(len(list_distinct(list(l_suppkey))) AS INT) AS n_supp,
        |  array_to_string(list_sort(list(l_linenumber))[1:3], ',') AS first3,
        |  array_to_string(list_sort(list_distinct(list(l_linenumber))), ',') AS dlns,
        |  array_to_string(range(1, len(list(l_linenumber)) + 1), ',') AS seq
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 4096 AS b_or,
        |  o_orderkey << 2 AS b_shl,
        |  o_orderkey >> 3 AS b_shr
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_fn_struct" ->
      """SELECT c_custkey, c_name AS name, c_acctbal AS bal, c_nationkey AS nk
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
