package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 sixth wave: ordinal-association measures — the rank-based
  * effect sizes between ordered categoricals that chi-square (nominal)
  * and Pearson r (interval) both miss:
  *
  *  - q_agg_somersd: Somers' D of order priority vs price bucket, the
  *    asymmetric concordance measure (d_yx = does knowing priority
  *    predict price rank?), both directions;
  *  - q_agg_gkgamma: Goodman–Kruskal gamma of lineitem quantity vs
  *    discount bucket — the ties-excluded concordance ratio;
  *  - q_agg_kendallw: Kendall's W (coefficient of concordance) across
  *    the five event types ranking the seven days-of-week by total
  *    value — do all activity streams agree on the weekly shape?
  *
  * Scale notes (the contingency-grid discipline, q_agg_chisq /
  * q_agg_cramersv): every measure reduces the fact table to a bounded
  * grid in ONE map-side-combined aggregate — 5×10 priority×bucket,
  * 50×11 quantity×discount, 5×7 type×dow — and all pair counting runs
  * on the grid self-join (≤ 2.5k combos, broadcast), never on row
  * pairs. Concordant/discordant/tied totals are products of BIGINT
  * cell counts summed as BIGINT — exact at any scale — and the only
  * division is the final statistic. 100 TB changes the grid's cell
  * values, not its size. */
object Analytics68 {

  /** Ordered-pair concordance totals over a (x, y, n) grid: each
    * unordered pair of observations is counted exactly once by
    * requiring x2 > x1 for C/D/TY and y2 > y1 for TX. */
  private def pairTotals(grid: DataFrame): DataFrame = {
    val g1 = grid.select(col("x").as("x1"), col("y").as("y1"),
      col("n").as("n1"))
    val g2 = grid.select(col("x").as("x2"), col("y").as("y2"),
      col("n").as("n2"))
    g1.crossJoin(broadcast(g2))
      .agg(
        sum(when(col("x2") > col("x1") && col("y2") > col("y1"),
          col("n1") * col("n2")).otherwise(0L)).as("c"),
        sum(when(col("x2") > col("x1") && col("y2") < col("y1"),
          col("n1") * col("n2")).otherwise(0L)).as("d"),
        sum(when(col("x2") === col("x1") && col("y2") > col("y1"),
          col("n1") * col("n2")).otherwise(0L)).as("t_x"),
        sum(when(col("y2") === col("y1") && col("x2") > col("x1"),
          col("n1") * col("n2")).otherwise(0L)).as("t_y"))
  }

  /** Somers' D (both directions) of priority ordinal vs 50k price
    * bucket: d_yx = (C-D)/(C+D+T_y), d_xy = (C-D)/(C+D+T_x). */
  private def qAggSomersd(s: SparkSession, d: String): DataFrame = {
    val grid = t(s, d, "orders")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS INT)").as("x"),
        expr("CAST(floor(o_totalprice / 50000.0) AS INT)").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    pairTotals(grid).select(col("c"), col("d"), col("t_x"), col("t_y"),
      when(col("c") + col("d") + col("t_y") > 0,
        round(dbl(col("c") - col("d")) /
          dbl(col("c") + col("d") + col("t_y")), 6)).as("d_yx"),
      when(col("c") + col("d") + col("t_x") > 0,
        round(dbl(col("c") - col("d")) /
          dbl(col("c") + col("d") + col("t_x")), 6)).as("d_xy"))
  }

  /** Goodman–Kruskal gamma of quantity vs discount percent bucket:
    * (C-D)/(C+D) — concordance among untied pairs only. */
  private def qAggGkgamma(s: SparkSession, d: String): DataFrame = {
    val grid = t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS INT)").as("x"),
        expr("CAST(round(l_discount * 100.0, 0) AS INT)").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    pairTotals(grid).select(col("c"), col("d"),
      when(col("c") + col("d") > 0,
        round(dbl(col("c") - col("d")) / dbl(col("c") + col("d")), 6))
        .as("gamma"))
  }

  /** Kendall's W across event types ranking days-of-week by exact
    * DECIMAL value totals; rank ties broken by dow so the rank
    * assignment is a total order in both engines. With integer rank
    * sums R_j, S4 = sum_j (2*R_j - m*(n+1))^2 = 4*S and
    * W = 3*S4 / (m^2 * (n^3 - n)). */
  private def qAggKendallw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = events(s, d)
      .select(col("event_type"),
        expr("(us div 86400000000) % 7").as("item"),
        dec(col("value")).as("v"))
      .groupBy(col("event_type"), col("item"))
      .agg(sum(col("v")).as("s"))
    val rk = cell.withColumn("rank",
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("s").desc, col("item"))).cast("long"))
    val dims = rk.agg(
      countDistinct(col("event_type")).as("m"),
      countDistinct(col("item")).as("n"))
    rk.groupBy(col("item")).agg(sum(col("rank")).as("r"))
      .crossJoin(broadcast(dims))
      .agg(max(col("m")).as("n_rankers"), max(col("n")).as("n_items"),
        sum((col("r") * 2 - col("m") * (col("n") + 1)) *
          (col("r") * 2 - col("m") * (col("n") + 1))).as("s4"),
        max(col("m") * col("m") *
          (col("n") * col("n") * col("n") - col("n"))).as("den"))
      .select(col("n_rankers"), col("n_items"), col("s4"),
        when(col("den") > 0,
          round(dbl(col("s4") * 3) / dbl(col("den")), 6)).as("w"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_somersd" -> (qAggSomersd _),
    "q_agg_gkgamma" -> (qAggGkgamma _),
    "q_agg_kendallw" -> (qAggKendallw _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_somersd" ->
      """WITH g AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS x,
        |         CAST(floor(o_totalprice / 50000.0) AS INT) AS y,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |p AS (
        |  SELECT
        |    sum(CASE WHEN g2.x > g1.x AND g2.y > g1.y
        |        THEN g1.n * g2.n ELSE 0 END) AS c,
        |    sum(CASE WHEN g2.x > g1.x AND g2.y < g1.y
        |        THEN g1.n * g2.n ELSE 0 END) AS d,
        |    sum(CASE WHEN g2.x = g1.x AND g2.y > g1.y
        |        THEN g1.n * g2.n ELSE 0 END) AS t_x,
        |    sum(CASE WHEN g2.y = g1.y AND g2.x > g1.x
        |        THEN g1.n * g2.n ELSE 0 END) AS t_y
        |  FROM g g1 CROSS JOIN g g2)
        |SELECT CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |  CAST(t_x AS BIGINT) AS t_x, CAST(t_y AS BIGINT) AS t_y,
        |  CASE WHEN c + d + t_y > 0 THEN
        |    round(CAST(c - d AS DOUBLE) / CAST(c + d + t_y AS DOUBLE), 6)
        |  END AS d_yx,
        |  CASE WHEN c + d + t_x > 0 THEN
        |    round(CAST(c - d AS DOUBLE) / CAST(c + d + t_x AS DOUBLE), 6)
        |  END AS d_xy
        |FROM p""".stripMargin,
    "q_agg_gkgamma" ->
      """WITH g AS (
        |  SELECT CAST(l_quantity AS INT) AS x,
        |         CAST(round(l_discount * 100.0, 0) AS INT) AS y,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |p AS (
        |  SELECT
        |    sum(CASE WHEN g2.x > g1.x AND g2.y > g1.y
        |        THEN g1.n * g2.n ELSE 0 END) AS c,
        |    sum(CASE WHEN g2.x > g1.x AND g2.y < g1.y
        |        THEN g1.n * g2.n ELSE 0 END) AS d
        |  FROM g g1 CROSS JOIN g g2)
        |SELECT CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |  CASE WHEN c + d > 0 THEN
        |    round(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE), 6)
        |  END AS gamma
        |FROM p""".stripMargin,
    "q_agg_kendallw" ->
      """WITH cell AS (
        |  SELECT event_type,
        |    (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
        |      // 86400000000) % 7 AS item,
        |    sum(CAST(value AS DECIMAL(18,4))) AS s
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, item,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY s DESC, item) AS BIGINT) AS rank
        |  FROM cell),
        |dims AS (
        |  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS m,
        |         CAST(count(DISTINCT item) AS BIGINT) AS n
        |  FROM rk),
        |rs AS (
        |  SELECT item, sum(rank) AS r FROM rk GROUP BY item)
        |SELECT max(m) AS n_rankers, max(n) AS n_items,
        |  CAST(sum((r * 2 - m * (n + 1)) * (r * 2 - m * (n + 1)))
        |    AS BIGINT) AS s4,
        |  CASE WHEN max(m * m * (n * n * n - n)) > 0 THEN
        |    round(CAST(sum((r * 2 - m * (n + 1)) * (r * 2 - m * (n + 1)))
        |        * 3 AS DOUBLE)
        |      / CAST(max(m * m * (n * n * n - n)) AS DOUBLE), 6)
        |  END AS w
        |FROM rs CROSS JOIN dims""".stripMargin,
  )
}
