package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 fifth wave: three time-series operators —
  *
  *  - q_time_mase: the scale-free forecast-quality triple (MASE,
  *    sMAPE, WAPE) of the lag-7 seasonal-naive forecast per event
  *    type, with the lag-1 naive in-sample MAE as MASE's denominator
  *    — the metrics a demand-forecasting pipeline reports where
  *    q_agg_backtest's plain MAE/MAPE stops;
  *  - q_time_coint: Engle–Granger two-step cointegration of the
  *    daily view/purchase count series — stage-1 OLS hedge ratio on
  *    EXACT integer count sums, stage-2 ADF t-statistic on the
  *    residuals (Δe on e_{t-1}); "do these two series share a
  *    long-run equilibrium" — the pairs-trading / leading-indicator
  *    test;
  *  - q_time_rollbeta: 14-day rolling OLS slope + intercept of
  *    purchases on views — the time-varying elasticity companion to
  *    q_time_rolling_corr, on exact BIGINT rolling sums.
  *
  * Determinism: daily counts are integers, so every OLS moment in
  * mase/rollbeta/coint-stage-1 is an exact BIGINT sum; the only
  * doubles (stage-2 residual products, per-day sMAPE ratios) are
  * rounded to a fixed lattice before DECIMAL summation (the ADF/
  * backtest discipline). Scale: everything runs on the
  * calendar-bounded daily table after one events scan. */
object Analytics87 {

  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"))
      .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))

  /** MASE / sMAPE / WAPE of the lag-7 seasonal naive, per type. */
  private def qTimeMase(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
    val g = dailyCounts(s, d)
      .withColumn("l1", lag(col("c"), 1).over(w))
      .withColumn("l7", lag(col("c"), 7).over(w))
    g.groupBy(col("et"))
      .agg(
        sum(when(col("l7").isNotNull, 1L)).as("n7"),
        sum(when(col("l7").isNotNull, abs(col("c") - col("l7"))))
          .as("sae7"),
        sum(when(col("l7").isNotNull, col("c"))).as("sa7"),
        sum(when(col("l7").isNotNull, expr(
          """CAST(ROUND(2.0 * CAST(abs(c - l7) AS DOUBLE)
            |  / CAST(c + l7 AS DOUBLE), 9) AS DECIMAL(28,9))"""
            .stripMargin))).as("ssm"),
        sum(when(col("l1").isNotNull, 1L)).as("n1"),
        sum(when(col("l1").isNotNull, abs(col("c") - col("l1"))))
          .as("sae1"))
      .select(col("et").as("event_type"), col("n7").as("n_days"),
        when(col("n7") > 0 && col("n1") > 0 && col("sae1") > 0,
          round((dbl(col("sae7")) / dbl(col("n7")))
            / (dbl(col("sae1")) / dbl(col("n1"))), 6)).as("mase"),
        when(col("n7") > 0,
          round(dbl(col("ssm")) / dbl(col("n7")), 6)).as("smape"),
        when(col("sa7") > 0,
          round(dbl(col("sae7")) / dbl(col("sa7")), 6)).as("wape"))
      .orderBy(col("event_type"))
  }

  /** day-aligned (view, purchase) daily count pairs. */
  private def aligned(s: SparkSession, d: String): DataFrame = {
    val g = dailyCounts(s, d)
    g.filter(col("et") === "view").select(col("day"), col("c").as("x"))
      .join(g.filter(col("et") === "purchase")
        .select(col("day"), col("c").as("y")), Seq("day"))
  }

  /** Engle–Granger: OLS hedge ratio, then ADF t on the residuals. */
  private def qTimeCoint(s: SparkSession, d: String): DataFrame = {
    val p = aligned(s, d).localCheckpoint(true)
    val m = p.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val ab = m.select(col("n"), col("sx"), col("sy"),
      expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
             |(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END"""
        .stripMargin).as("b"))
      .select(col("n"), col("b"),
        expr("CASE WHEN n > 0 THEN (CAST(sy AS DOUBLE)" +
          " - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END").as("a"))
    // residuals on the stage-1 line, then the no-constant ADF
    val wd = Window.orderBy(col("day"))
    val e = p.crossJoin(broadcast(ab))
      .select(col("day"), col("n"), col("b"), col("a"),
        (dbl(col("y")) - col("a") - col("b") * dbl(col("x"))).as("e"))
      .withColumn("ep", lag(col("e"), 1).over(wd))
      .filter(col("ep").isNotNull)
      .select(col("n"), col("b"),
        expr("CAST(ROUND(ep * ep, 9) AS DECIMAL(38,9))").as("t_ee"),
        expr("CAST(ROUND(ep * (e - ep), 9) AS DECIMAL(38,9))").as("t_ed"),
        expr("CAST(ROUND((e - ep) * (e - ep), 9) AS DECIMAL(38,9))")
          .as("t_dd"))
    e.groupBy(col("n"), col("b"))
      .agg(count(lit(1)).as("m"), sum(col("t_ee")).as("see"),
        sum(col("t_ed")).as("sed"), sum(col("t_dd")).as("sdd"))
      .select(col("n").as("n_days"), round(col("b"), 6).as("hedge_beta"),
        when(dbl(col("see")) > 0 && col("m") > 2,
          round(expr(
            """(CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
              |/ sqrt(((CAST(sdd AS DOUBLE)
              |  - (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
              |    * CAST(sed AS DOUBLE)) / (CAST(m AS DOUBLE) - 1.0))
              |  / CAST(see AS DOUBLE))""".stripMargin), 4))
          .as("adf_t"),
        when(dbl(col("see")) > 0 && col("m") > 2, expr(
          """CAST(CASE WHEN (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
            |/ sqrt(((CAST(sdd AS DOUBLE)
            |  - (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
            |    * CAST(sed AS DOUBLE)) / (CAST(m AS DOUBLE) - 1.0))
            |  / CAST(see AS DOUBLE)) < -3.37 THEN 1 ELSE 0 END
            | AS BIGINT)""".stripMargin)).as("coint_5pct"))
  }

  /** 14-day rolling OLS slope/intercept of purchases on views. */
  private def qTimeRollbeta(s: SparkSession, d: String): DataFrame = {
    val wr = Window.orderBy(col("day")).rowsBetween(-13, 0)
    aligned(s, d)
      .withColumn("nw", count(lit(1)).over(wr))
      .withColumn("sx", sum(col("x")).over(wr))
      .withColumn("sy", sum(col("y")).over(wr))
      .withColumn("sxy", sum(col("x") * col("y")).over(wr))
      .withColumn("sxx", sum(col("x") * col("x")).over(wr))
      .withColumn("den", col("nw") * col("sxx") - col("sx") * col("sx"))
      .filter(col("nw") >= 14)
      .select(col("day"),
        when(col("den") > 0, round(expr(
          """(CAST(nw AS DOUBLE) * CAST(sxy AS DOUBLE)
            |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |/ CAST(den AS DOUBLE)""".stripMargin), 6)).as("beta"),
        when(col("den") > 0, round(expr(
          """(CAST(sy AS DOUBLE) - (CAST(nw AS DOUBLE)
            |    * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
            |    * CAST(sy AS DOUBLE)) / CAST(den AS DOUBLE)
            |  * CAST(sx AS DOUBLE)) / CAST(nw AS DOUBLE)"""
            .stripMargin), 6)).as("alpha"))
      .orderBy(col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_mase" -> (qTimeMase _),
    "q_time_coint" -> (qTimeCoint _),
    "q_time_rollbeta" -> (qTimeRollbeta _),
  )

  private val daily =
    """WITH g AS (
      |  SELECT event_type AS et,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |""".stripMargin

  private val alignedSql =
    """p AS (
      |  SELECT a.day, a.c AS x, b.c AS y
      |  FROM g a JOIN g b ON a.day = b.day
      |  WHERE a.et = 'view' AND b.et = 'purchase'),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_mase" -> (daily +
      """l AS (
        |  SELECT et, c,
        |    lag(c, 1) OVER (PARTITION BY et ORDER BY day) AS l1,
        |    lag(c, 7) OVER (PARTITION BY et ORDER BY day) AS l7
        |  FROM g),
        |a AS (
        |  SELECT et,
        |    CAST(sum(CASE WHEN l7 IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n7,
        |    CAST(sum(CASE WHEN l7 IS NOT NULL THEN abs(c - l7) END)
        |      AS BIGINT) AS sae7,
        |    CAST(sum(CASE WHEN l7 IS NOT NULL THEN c END) AS BIGINT)
        |      AS sa7,
        |    sum(CASE WHEN l7 IS NOT NULL THEN
        |      CAST(ROUND(2.0 * CAST(abs(c - l7) AS DOUBLE)
        |        / CAST(c + l7 AS DOUBLE), 9) AS DECIMAL(28,9)) END)
        |      AS ssm,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN abs(c - l1) END)
        |      AS BIGINT) AS sae1
        |  FROM l GROUP BY et)
        |SELECT et AS event_type, n7 AS n_days,
        |  CASE WHEN n7 > 0 AND n1 > 0 AND sae1 > 0 THEN
        |    ROUND((CAST(sae7 AS DOUBLE) / CAST(n7 AS DOUBLE))
        |      / (CAST(sae1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) END
        |    AS mase,
        |  CASE WHEN n7 > 0 THEN
        |    ROUND(CAST(ssm AS DOUBLE) / CAST(n7 AS DOUBLE), 6) END
        |    AS smape,
        |  CASE WHEN sa7 > 0 THEN
        |    ROUND(CAST(sae7 AS DOUBLE) / CAST(sa7 AS DOUBLE), 6) END
        |    AS wape
        |FROM a ORDER BY event_type""".stripMargin),
    "q_time_coint" -> (daily + alignedSql +
      """m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM p),
        |ab AS (
        |  SELECT n,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
        |    sx, sy
        |  FROM m),
        |ab2 AS (
        |  SELECT n, b, CASE WHEN n > 0 THEN
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) END AS a FROM ab),
        |e AS (
        |  SELECT n, b, ee, lag(ee, 1) OVER (ORDER BY day) AS ep
        |  FROM (SELECT p.day, ab2.n, ab2.b,
        |          CAST(y AS DOUBLE) - ab2.a - ab2.b * CAST(x AS DOUBLE)
        |            AS ee
        |        FROM p, ab2)),
        |t AS (
        |  SELECT n, b, CAST(count(*) AS BIGINT) AS m,
        |    sum(CAST(ROUND(ep * ep, 9) AS DECIMAL(38,9))) AS see,
        |    sum(CAST(ROUND(ep * (ee - ep), 9) AS DECIMAL(38,9))) AS sed,
        |    sum(CAST(ROUND((ee - ep) * (ee - ep), 9) AS DECIMAL(38,9)))
        |      AS sdd
        |  FROM e WHERE ep IS NOT NULL GROUP BY n, b)
        |SELECT n AS n_days, ROUND(b, 6) AS hedge_beta,
        |  CASE WHEN CAST(see AS DOUBLE) > 0 AND m > 2 THEN
        |    ROUND((CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
        |      / sqrt(((CAST(sdd AS DOUBLE)
        |        - (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
        |          * CAST(sed AS DOUBLE)) / (CAST(m AS DOUBLE) - 1.0))
        |        / CAST(see AS DOUBLE)), 4) END AS adf_t,
        |  CASE WHEN CAST(see AS DOUBLE) > 0 AND m > 2 THEN
        |    CAST(CASE WHEN (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
        |      / sqrt(((CAST(sdd AS DOUBLE)
        |        - (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
        |          * CAST(sed AS DOUBLE)) / (CAST(m AS DOUBLE) - 1.0))
        |        / CAST(see AS DOUBLE)) < -3.37 THEN 1 ELSE 0 END
        |      AS BIGINT) END AS coint_5pct
        |FROM t""".stripMargin),
    "q_time_rollbeta" -> (daily + alignedSql +
      """r AS (
        |  SELECT day,
        |    CAST(count(*) OVER w AS BIGINT) AS nw,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx
        |  FROM p
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day,
        |  CASE WHEN nw * sxx - sx * sx > 0 THEN
        |    ROUND((CAST(nw AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / CAST(nw * sxx - sx * sx AS DOUBLE), 6) END AS beta,
        |  CASE WHEN nw * sxx - sx * sx > 0 THEN
        |    ROUND((CAST(sy AS DOUBLE) - (CAST(nw AS DOUBLE)
        |        * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sy AS DOUBLE)) / CAST(nw * sxx - sx * sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE)) / CAST(nw AS DOUBLE), 6) END AS alpha
        |FROM r WHERE nw >= 14 ORDER BY day""".stripMargin),
  )
}
