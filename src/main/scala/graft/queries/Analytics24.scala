package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-fourth wave: the 2-D skyline operator (Pareto
  * frontier — classic database operator: parts no other part beats on
  * BOTH price and size), the drawdown curve of daily revenue — running
  * peak and distance below it (the risk/health-report staple), and a
  * one-step naive-forecast backtest (MAE/MAPE of lag-1 — the baseline
  * every forecasting pipeline must beat).
  *
  * Scale notes:
  *  - Skyline: the naive shape is the O(n²) dominance self-join. This
  *    collapses to one row per price level (max size), then a single
  *    running-max window over the bounded price-level table — the
  *    sort-filter skyline algorithm as two windows, no pair joins.
  *  - Drawdown computes ENTIRELY on the exact decimal lattice: daily
  *    sums, running peak, and the gap are all DECIMAL — no rounding
  *    anywhere. Finals then cast through dbl() per the Tables.dbl
  *    output convention (exact value → same IEEE double both engines).
  *  - Backtest: one shuffle to the bounded daily table, lag + two
  *    aggregates; the only rational terms (MAPE) ride the round-9dp
  *    DECIMAL-sum discipline. */
object Analytics24 {

  /** 2-D skyline of parts: minimize retail price, maximize size.
    * Output: surviving (price, size) frontier levels with part
    * counts. */
  private def qWinSkyline(s: SparkSession, d: String): DataFrame = {
    val pp = t(s, d, "part")
      .groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("best_size"),
        count(lit(1)).as("n_parts_at_price"))
    val w = Window.orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pp.withColumn("prev_best", max(col("best_size")).over(w))
      .filter(col("prev_best").isNull ||
        col("best_size") > col("prev_best"))
      .select(col("price"), col("best_size").as("size"),
        col("n_parts_at_price"))
      .orderBy(col("price"))
  }

  /** Drawdown curve of DAILY order revenue: running peak and how far
    * each day sits below it — exact DECIMAL internally, dbl() finals
    * (Tables.scala output convention). */
  private def qTimeDrawdown(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "orders")
      .select(
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"),
        dec(col("o_totalprice")).as("p"))
      .groupBy(col("day")).agg(sum(col("p")).as("rev"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .select(col("day"), col("rev"), max(col("rev")).over(wCum).as("peak"))
      .select(col("day"),
        dbl(col("rev")).as("rev"),
        dbl(col("peak")).as("peak"),
        dbl(col("peak") - col("rev")).as("drawdown"))
      .orderBy(col("day"))
  }

  /** One-step naive-forecast backtest per event type: MAE and MAPE of
    * the lag-1 daily-count forecast. */
  private def qAggBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("et"), expr("us div 86400000000").as("day"))
      .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
    daily
      .withColumn("prev", lag(col("c"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("ae", abs(col("c") - col("prev")))
      .withColumn("ape", expr(
        "CAST(ROUND(CAST(abs(c - prev) AS DOUBLE) / CAST(c AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n_days"), sum(col("ae")).as("sae"),
        sum(col("ape")).as("sape"))
      .select(col("et").as("event_type"), col("n_days"),
        round(dbl(col("sae")) / dbl(col("n_days")), 6).as("mae"),
        round(dbl(col("sape")) / dbl(col("n_days")), 6).as("mape"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_skyline" -> (qWinSkyline _),
    "q_time_drawdown" -> (qTimeDrawdown _),
    "q_agg_backtest" -> (qAggBacktest _),
  )

  val sql: Map[String, String] = Map(
    "q_win_skyline" ->
      """WITH pp AS (
        |  SELECT p_retailprice AS price,
        |    CAST(max(p_size) AS INT) AS best_size,
        |    CAST(count(*) AS BIGINT) AS n_parts_at_price
        |  FROM part GROUP BY p_retailprice),
        |run AS (
        |  SELECT price, best_size, n_parts_at_price,
        |    max(best_size) OVER (ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_best
        |  FROM pp)
        |SELECT price, best_size AS size, n_parts_at_price
        |FROM run
        |WHERE prev_best IS NULL OR best_size > prev_best
        |ORDER BY price""".stripMargin,
    "q_time_drawdown" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP))
        |      // 86400000000 AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        |  FROM orders GROUP BY 1),
        |peaks AS (
        |  SELECT day, rev,
        |    max(rev) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM daily)
        |SELECT day, CAST(rev AS DOUBLE) AS rev,
        |  CAST(peak AS DOUBLE) AS peak,
        |  CAST(peak - rev AS DOUBLE) AS drawdown
        |FROM peaks ORDER BY day""".stripMargin,
    "q_agg_backtest" ->
      """WITH daily AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT et, day, c,
        |    lag(c, 1) OVER (PARTITION BY et ORDER BY day) AS prev
        |  FROM daily),
        |e AS (
        |  SELECT et, abs(c - prev) AS ae,
        |    CAST(ROUND(CAST(abs(c - prev) AS DOUBLE)
        |      / CAST(c AS DOUBLE), 9) AS DECIMAL(28,9)) AS ape
        |  FROM f WHERE prev IS NOT NULL)
        |SELECT et AS event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  round(CAST(sum(ae) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS mae,
        |  round(CAST(CAST(sum(ape) AS DECIMAL(38,9)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS mape
        |FROM e GROUP BY et ORDER BY event_type""".stripMargin,
  )
}
