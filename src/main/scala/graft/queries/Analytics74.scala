package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 first wave: regression & outlier DIAGNOSTICS — the "can I
  * trust this fit / this point" layer that sits next to the existing
  * estimators (q_agg_ols, q_agg_theilsen):
  *
  *  - q_agg_cooksd: per-point leverage + Cook's distance for the
  *    order-size → order-value regression, top-20 most influential
  *    orders — the classic "which rows own my slope" audit;
  *  - q_agg_durbinwatson: Durbin–Watson serial-correlation statistic
  *    of the daily-revenue trend residuals — "is the OLS iid
  *    assumption already broken by autocorrelation";
  *  - q_agg_grubbs: per-nation Grubbs statistic (max studentized
  *    deviation) with the offending customer — the single-outlier
  *    test behind acctbal sanity checks;
  *  - q_agg_partialcorr: partial correlation of quantity and price
  *    controlling for discount, per returnflag — the confounder-
  *    removed dependence the raw corr matrix overstates.
  *
  * Determinism: every moment (Σx, Σx², Σxy…) sums in DECIMAL (exact,
  * order-free); residual/score sums round each term to a fixed scale
  * BEFORE the DECIMAL sum (the round-then-sum discipline); divisions
  * and sqrt are single final IEEE expressions both engines evaluate
  * identically; every emitted double rounds to 6 dp.
  *
  * Scale: cooksd is one order-keyed aggregate + a 1-row broadcast of
  * the moment vector + TakeOrdered(20); durbinwatson/grubbs ride
  * calendar-/nation-bounded tables; partialcorr is a single map-side-
  * combined moment aggregate per returnflag. No unbounded window, no
  * driver loop. */
object Analytics74 {

  /** (o_orderkey, x = line count, y = total price DECIMAL). */
  private def orderPts(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("x"))
      .join(t(s, d, "orders").select(col("o_orderkey").as("ok"),
        dec(col("o_totalprice")).as("y")), Seq("ok"))

  /** Top-20 Cook's distance orders for y = a + b·x. */
  private def qAggCooksd(s: SparkSession, d: String): DataFrame = {
    val pts = orderPts(s, d)
    val m = pts.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("y") * col("x")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", dbl(col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("b", expr(
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
          "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / den"))
      .withColumn("a", expr(
        "(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
      .withColumn("sxxc", expr(
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) " +
          "/ CAST(n AS DOUBLE)"))
      .withColumn("xbar", expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
    val resid = pts.crossJoin(broadcast(m))
      .withColumn("e6", expr(
        "ROUND(CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE), 6)"))
    // SSE: per-term round to 4 dp → exact DECIMAL sum (order-free)
    val sse = resid
      .agg(sum(expr("CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4))")).as("se2"))
    resid.crossJoin(broadcast(sse))
      .withColumn("mse", expr(
        "CAST(se2 AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)"))
      .withColumn("lev", expr(
        "1.0 / CAST(n AS DOUBLE) " +
          "+ (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar) / sxxc"))
      .withColumn("cooksd", expr(
        "ROUND(e6 * e6 / (2.0 * mse) * lev / ((1.0 - lev) * (1.0 - lev)), 6)"))
      .select(col("ok").as("o_orderkey"), col("x").as("n_lines"),
        dbl(col("y")).as("total"), col("e6").as("resid"),
        expr("ROUND(lev, 6)").as("leverage"), col("cooksd"))
      .orderBy(desc("cooksd"), col("o_orderkey")).limit(20)
  }

  /** (day ordinal t, daily revenue v DECIMAL) — calendar-bounded. */
  private def daily(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("day")).agg(sum(col("vv")).as("v"))
      .withColumn("tt",
        row_number().over(Window.orderBy(col("day"))).cast("long"))

  /** Durbin–Watson on the daily-revenue OLS-trend residuals. */
  private def qAggDurbinwatson(s: SparkSession, d: String): DataFrame = {
    val g = daily(s, d)
    val m = g.agg(count(lit(1)).as("n"),
      sum(col("tt")).as("sx"), sum(col("v")).as("sy"),
      sum(col("v") * col("tt")).as("sxy"),
      sum(col("tt") * col("tt")).as("sxx"))
      .withColumn("b", expr(
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
          "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) " +
          "/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
          "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
      .withColumn("a", expr(
        "(CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
    val e = g.crossJoin(broadcast(m))
      .withColumn("e6", expr(
        "ROUND(CAST(v AS DOUBLE) - a - b * CAST(tt AS DOUBLE), 6)"))
      .withColumn("ep", lag(col("e6"), 1).over(Window.orderBy(col("tt"))))
    e.agg(max(col("n")).as("n"),
        max(expr("ROUND(b, 6)")).as("slope"),
        sum(expr("CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4))")).as("den"),
        sum(expr("CAST(ROUND((e6 - ep) * (e6 - ep), 4) " +
          "AS DECIMAL(38,4))")).as("num"))
      .select(col("n"), col("slope"),
        expr("ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)").as("dw"),
        expr("ROUND(1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) " +
          "/ 2.0, 6)").as("rho"))
  }

  /** Per-nation Grubbs statistic with the offending customer. */
  private def qAggGrubbs(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), dec(col("c_acctbal")).as("x"))
    val stats = c.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 3)
      .withColumn("mean", expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("sd", expr(
        "sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) " +
          "/ CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"))
      .filter(col("sd") > 0)
    val wTop = Window.partitionBy(col("n_name"))
      .orderBy(desc("g"), col("c_custkey"))
    c.join(broadcast(stats), Seq("n_name"))
      .withColumn("g", expr(
        "ROUND(abs(CAST(x AS DOUBLE) - mean) / sd, 6)"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("n"), expr("ROUND(mean, 6)").as("mean"),
        expr("ROUND(sd, 6)").as("sd"), col("c_custkey").as("outlier_key"),
        dbl(col("x")).as("outlier_val"), col("g"))
      .orderBy(col("n_name"))
  }

  /** Partial correlation r(x,y | z) per returnflag:
    * x = quantity, y = extendedprice, z = discount. */
  private def qAggPartialcorr(s: SparkSession, d: String): DataFrame = {
    val pts = t(s, d, "lineitem").select(col("l_returnflag"),
      expr("CAST(l_quantity AS DECIMAL(19,4))").as("x"),
      expr("CAST(l_extendedprice AS DECIMAL(19,4))").as("y"),
      expr("CAST(l_discount AS DECIMAL(19,4))").as("z"))
    val m = pts.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"),
      sum(col("y") * col("z")).as("syz"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"))
    def r(ab: String, a: String, b: String, aa: String, bb: String) =
      s"""((CAST(n AS DOUBLE) * CAST($ab AS DOUBLE)
         |  - CAST($a AS DOUBLE) * CAST($b AS DOUBLE))
         | / sqrt((CAST(n AS DOUBLE) * CAST($aa AS DOUBLE)
         |    - CAST($a AS DOUBLE) * CAST($a AS DOUBLE))
         |  * (CAST(n AS DOUBLE) * CAST($bb AS DOUBLE)
         |    - CAST($b AS DOUBLE) * CAST($b AS DOUBLE))))""".stripMargin
    m.withColumn("rxy", expr(r("sxy", "sx", "sy", "sxx", "syy")))
      .withColumn("rxz", expr(r("sxz", "sx", "sz", "sxx", "szz")))
      .withColumn("ryz", expr(r("syz", "sy", "sz", "syy", "szz")))
      .select(col("l_returnflag"), col("n"),
        expr("ROUND(rxy, 6)").as("r_xy"),
        expr("ROUND(rxz, 6)").as("r_xz"),
        expr("ROUND(ryz, 6)").as("r_yz"),
        expr("ROUND((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) " +
          "* (1.0 - ryz * ryz)), 6)").as("r_xy_given_z"))
      .orderBy(col("l_returnflag"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_cooksd" -> (qAggCooksd _),
    "q_agg_durbinwatson" -> (qAggDurbinwatson _),
    "q_agg_grubbs" -> (qAggGrubbs _),
    "q_agg_partialcorr" -> (qAggPartialcorr _),
  )

  private val ptsSql =
    """pts AS (
      |  SELECT l.ok, l.x, CAST(o.o_totalprice AS DECIMAL(18,4)) AS y
      |  FROM (SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS x
      |        FROM lineitem GROUP BY 1) l
      |  JOIN orders o ON o.o_orderkey = l.ok)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_cooksd" ->
      s"""WITH $ptsSql,
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(y * x) AS sxy, sum(x * x) AS sxx
        |  FROM pts),
        |md AS (
        |  SELECT n, sx, sy,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS sxxc,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
        |  FROM m),
        |md2 AS (
        |  SELECT *, (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS a FROM md),
        |resid AS (
        |  SELECT pts.*, md2.*,
        |    ROUND(CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE), 6) AS e6
        |  FROM pts CROSS JOIN md2),
        |sse AS (
        |  SELECT sum(CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4))) AS se2
        |  FROM resid)
        |SELECT ok AS o_orderkey, x AS n_lines, CAST(y AS DOUBLE) AS total,
        |  e6 AS resid,
        |  ROUND(1.0 / CAST(n AS DOUBLE)
        |    + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar)
        |      / sxxc, 6) AS leverage,
        |  ROUND(e6 * e6
        |      / (2.0 * CAST(se2 AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0))
        |    * (1.0 / CAST(n AS DOUBLE)
        |       + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar)
        |         / sxxc)
        |    / ((1.0 - (1.0 / CAST(n AS DOUBLE)
        |        + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar)
        |          / sxxc))
        |     * (1.0 - (1.0 / CAST(n AS DOUBLE)
        |        + (CAST(x AS DOUBLE) - xbar) * (CAST(x AS DOUBLE) - xbar)
        |          / sxxc))), 6) AS cooksd
        |FROM resid CROSS JOIN sse
        |ORDER BY cooksd DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_agg_durbinwatson" ->
      """WITH g0 AS (
        |  SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      AS BIGINT) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT day, v,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS tt
        |  FROM g0),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(tt) AS sx, sum(v) AS sy,
        |    sum(v * tt) AS sxy, sum(tt * tt) AS sxx
        |  FROM g),
        |md AS (
        |  SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
        |    sx, sy FROM m),
        |md2 AS (
        |  SELECT *, (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) AS a FROM md),
        |e AS (
        |  SELECT n, b,
        |    ROUND(CAST(v AS DOUBLE) - a - b * CAST(tt AS DOUBLE), 6) AS e6,
        |    lag(ROUND(CAST(v AS DOUBLE) - a - b * CAST(tt AS DOUBLE), 6))
        |      OVER (ORDER BY tt) AS ep
        |  FROM g CROSS JOIN md2)
        |SELECT max(n) AS n, max(ROUND(b, 6)) AS slope,
        |  ROUND(CAST(sum(CAST(ROUND((e6 - ep) * (e6 - ep), 4)
        |      AS DECIMAL(38,4))) AS DOUBLE)
        |    / CAST(sum(CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4)))
        |      AS DOUBLE), 6) AS dw,
        |  ROUND(1.0 - CAST(sum(CAST(ROUND((e6 - ep) * (e6 - ep), 4)
        |      AS DECIMAL(38,4))) AS DOUBLE)
        |    / CAST(sum(CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4)))
        |      AS DOUBLE) / 2.0, 6) AS rho
        |FROM e""".stripMargin,
    "q_agg_grubbs" ->
      """WITH c AS (
        |  SELECT n.n_name, c.c_custkey,
        |    CAST(c.c_acctbal AS DECIMAL(18,4)) AS x
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |stats AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
        |    sqrt((CAST(sum(x * x) AS DOUBLE)
        |      - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE))
        |     / (CAST(count(*) AS DOUBLE) - 1.0)) AS sd
        |  FROM c GROUP BY n_name HAVING count(*) >= 3),
        |z AS (
        |  SELECT c.n_name, c.c_custkey, c.x, s.n, s.mean, s.sd,
        |    ROUND(abs(CAST(c.x AS DOUBLE) - s.mean) / s.sd, 6) AS g,
        |    row_number() OVER (PARTITION BY c.n_name
        |      ORDER BY ROUND(abs(CAST(c.x AS DOUBLE) - s.mean) / s.sd, 6)
        |        DESC, c.c_custkey) AS rn
        |  FROM c JOIN stats s ON c.n_name = s.n_name
        |  WHERE s.sd > 0)
        |SELECT n_name, n, ROUND(mean, 6) AS mean, ROUND(sd, 6) AS sd,
        |  c_custkey AS outlier_key, CAST(x AS DOUBLE) AS outlier_val, g
        |FROM z WHERE rn = 1 ORDER BY n_name""".stripMargin,
    "q_agg_partialcorr" ->
      """WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |    sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(19,4)) AS x,
        |          CAST(l_extendedprice AS DECIMAL(19,4)) AS y,
        |          CAST(l_discount AS DECIMAL(19,4)) AS z
        |        FROM lineitem) p
        |  GROUP BY l_returnflag),
        |r AS (
        |  SELECT l_returnflag, n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
        |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
        |     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
        |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
        |     / sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
        |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
        |  FROM m)
        |SELECT l_returnflag, n, ROUND(rxy, 6) AS r_xy,
        |  ROUND(rxz, 6) AS r_xz, ROUND(ryz, 6) AS r_yz,
        |  ROUND((rxy - rxz * ryz)
        |    / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
        |    AS r_xy_given_z
        |FROM r ORDER BY l_returnflag""".stripMargin,
  )
}
