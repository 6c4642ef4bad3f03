package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 thirty-seventh wave: r×c contingency effect sizes (Cramér's
  * V and the G-test — the "is event mix independent of weekday"
  * questions q_agg_chisq's fixed-expectation form cannot answer) and
  * the model-evaluation pair every ranking/score pipeline reports:
  * cumulative gains/lift at score thresholds and the calibration
  * (reliability) table with ECE.
  *
  * Scale notes:
  *  - Contingency: one map-side-combined shuffle collapses the stream
  *    to the bounded |types|×7 cell table; margins are two tiny
  *    re-aggregations broadcast back. Per-cell χ²/G terms round to 9dp
  *    and sum in DECIMAL so engine aggregation order cannot flip a
  *    bit (the Analytics9 discipline).
  *  - Gains: the q_agg_auc lattice discipline — scores bucket to the
  *    exact 1dp grid, cumulative windows run over the bounded bucket
  *    table, ratios are exact-count divisions. Thresholds, not
  *    ntile rows: tie handling is value-based and deterministic.
  *  - Calibration: ten fixed probability bins, one shuffle; predicted
  *    mass rides DECIMAL(18,4) sums of the CLIPPED raw value (never a
  *    double→decimal division that could hit a rounding tie); ECE is
  *    a 9dp-rounded DECIMAL sum over the 10-row bin table. */
object Analytics37 {

  /** Bounded event_type × day-of-week contingency cells with margins
    * and totals attached. */
  private def contingency(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select(col("event_type").as("t"),
      expr("CAST((us div 86400000000 + 3) % 7 AS INT)").as("dow"))
    val cells = base.groupBy(col("t"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("t")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("dow")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("t")).as("r"), countDistinct(col("dow")).as("c"))
    cells.join(broadcast(rt), Seq("t")).join(broadcast(ct), Seq("dow"))
      .crossJoin(broadcast(tot))
      .withColumn("e", dbl(col("rt")) * dbl(col("ct")) / dbl(col("n")))
  }

  /** Cramér's V of event_type × day-of-week: χ² over the bounded cell
    * table, normalized by n·(min(r,c)−1). */
  private def qAggCramersv(s: SparkSession, d: String): DataFrame = {
    contingency(s, d)
      .withColumn("term", expr(
        "CAST(ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e," +
          " 9) AS DECIMAL(28,9))"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("term")).as("st"))
      .select(col("n"), col("r"), col("c"),
        round(dbl(col("st")), 6).as("chi2"),
        when(least(col("r"), col("c")) > 1 && col("n") > 0,
          round(sqrt(dbl(col("st")) /
            (dbl(col("n")) * (least(dbl(col("r")), dbl(col("c"))) - 1.0))),
            6)).as("cramers_v"))
  }

  /** G-test (log-likelihood ratio) on the same contingency:
    * G = 2·Σ o·ln(o/e), zero cells contribute nothing. */
  private def qAggGtest(s: SparkSession, d: String): DataFrame = {
    contingency(s, d)
      .withColumn("term", expr(
        "CAST(ROUND(2.0 * CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE) / e)," +
          " 9) AS DECIMAL(28,9))"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("term")).as("st"))
      .select(col("n"), col("r"), col("c"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(dbl(col("st")), 6).as("g_stat"))
  }

  /** Cumulative gains/lift at each score threshold (descending):
    * scoring `value` against purchase (positive) vs view (negative),
    * on the exact 1dp score lattice. */
  private def qAggGains(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("m"), sum(col("pos")).as("np"))
    val wCum = Window.orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b.select(col("sc"),
      sum(col("m")).over(wCum).as("cum_n"),
      sum(col("np")).over(wCum).as("cum_pos"),
      sum(col("m")).over(wAll).as("n"),
      sum(col("np")).over(wAll).as("tot_pos"))
      .select(dbl(col("sc")).as("threshold"), col("cum_n"), col("cum_pos"),
        when(col("tot_pos") > 0,
          round(dbl(col("cum_pos")) / dbl(col("tot_pos")), 6)).as("gain"),
        when(col("tot_pos") > 0 && col("cum_n") > 0,
          round((dbl(col("cum_pos")) / dbl(col("cum_n"))) /
            (dbl(col("tot_pos")) / dbl(col("n"))), 6)).as("lift"))
      .orderBy(col("threshold").desc)
  }

  /** Calibration (reliability) table: value/100 clipped to [0,1] as
    * the predicted probability, purchase-vs-view as the outcome, ten
    * fixed bins, plus expected calibration error. */
  private def qAggCalibration(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(
        expr("CAST(least(floor(least(value, 100.0) / 10.0), 9.0) AS INT)")
          .as("bin"),
        dec(least(col("value"), lit(100.0))).as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("pos")).as("npb"),
        sum(col("v")).as("sv"))
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b.withColumn("pred", dbl(col("sv")) / (lit(100.0) * dbl(col("nb"))))
      .withColumn("obs", dbl(col("npb")) / dbl(col("nb")))
      .withColumn("gap9", expr(
        "CAST(ROUND(CAST(nb AS DOUBLE) * abs(obs - pred), 9)" +
          " AS DECIMAL(28,9))"))
      .select(col("bin"), col("nb").as("n_events"),
        round(col("pred"), 6).as("pred_mean"),
        round(col("obs"), 6).as("obs_rate"),
        round(abs(col("obs") - col("pred")), 6).as("abs_gap"),
        round(dbl(sum(col("gap9")).over(wAll)) /
          dbl(sum(col("nb")).over(wAll)), 6).as("ece"))
      .orderBy(col("bin"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_cramersv" -> (qAggCramersv _),
    "q_agg_gtest" -> (qAggGtest _),
    "q_agg_gains" -> (qAggGains _),
    "q_agg_calibration" -> (qAggCalibration _),
  )

  private val contSql =
    """base AS (
      |  SELECT event_type AS t,
      |    CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 3) % 7
      |      AS INT) AS dow
      |  FROM events),
      |cells AS (SELECT t, dow, CAST(count(*) AS BIGINT) AS o
      |          FROM base GROUP BY 1, 2),
      |rt AS (SELECT t, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY t),
      |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct
      |       FROM cells GROUP BY dow),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |          CAST(count(DISTINCT t) AS BIGINT) AS r,
      |          CAST(count(DISTINCT dow) AS BIGINT) AS c
      |        FROM cells),
      |j AS (
      |  SELECT o, n, r, c,
      |    CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
      |      / CAST(n AS DOUBLE) AS e
      |  FROM cells JOIN rt ON cells.t = rt.t
      |    JOIN ct ON cells.dow = ct.dow, tot)
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_cramersv" ->
      s"""WITH $contSql,
        |terms AS (
        |  SELECT n, r, c,
        |    CAST(ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
        |      / e, 9) AS DECIMAL(28,9)) AS term
        |  FROM j),
        |agg AS (SELECT n, r, c, CAST(sum(term) AS DECIMAL(38,9)) AS st
        |        FROM terms GROUP BY n, r, c)
        |SELECT n, r, c, round(CAST(st AS DOUBLE), 6) AS chi2,
        |  CASE WHEN least(r, c) > 1 AND n > 0 THEN
        |    round(sqrt(CAST(st AS DOUBLE)
        |      / (CAST(n AS DOUBLE)
        |        * (least(CAST(r AS DOUBLE), CAST(c AS DOUBLE)) - 1.0))), 6)
        |  END AS cramers_v
        |FROM agg""".stripMargin,
    "q_agg_gtest" ->
      s"""WITH $contSql,
        |terms AS (
        |  SELECT n, r, c,
        |    CAST(ROUND(2.0 * CAST(o AS DOUBLE)
        |      * ln(CAST(o AS DOUBLE) / e), 9) AS DECIMAL(28,9)) AS term
        |  FROM j),
        |agg AS (SELECT n, r, c, CAST(sum(term) AS DECIMAL(38,9)) AS st
        |        FROM terms GROUP BY n, r, c)
        |SELECT n, r, c, CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
        |  round(CAST(st AS DOUBLE), 6) AS g_stat
        |FROM agg""".stripMargin,
    "q_agg_gains" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS sc,
        |    CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |c AS (
        |  SELECT sc,
        |    sum(m) OVER (ORDER BY sc DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
        |    sum(np) OVER (ORDER BY sc DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
        |    sum(m) OVER () AS n, sum(np) OVER () AS tot_pos
        |  FROM b)
        |SELECT CAST(sc AS DOUBLE) AS threshold,
        |  CAST(cum_n AS BIGINT) AS cum_n,
        |  CAST(cum_pos AS BIGINT) AS cum_pos,
        |  CASE WHEN tot_pos > 0 THEN
        |    round(CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE), 6)
        |  END AS gain,
        |  CASE WHEN tot_pos > 0 AND cum_n > 0 THEN
        |    round((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))
        |      / (CAST(tot_pos AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |  END AS lift
        |FROM c ORDER BY threshold DESC""".stripMargin,
    "q_agg_calibration" ->
      """WITH b AS (
        |  SELECT
        |    CAST(least(floor(least(value, 100.0) / 10.0), 9.0) AS INT)
        |      AS bin,
        |    CAST(least(value, 100.0) AS DECIMAL(18,4)) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |g AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(pos) AS BIGINT) AS npb,
        |    CAST(sum(v) AS DECIMAL(38,4)) AS sv
        |  FROM b GROUP BY bin),
        |p AS (
        |  SELECT bin, nb, npb,
        |    CAST(sv AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE)) AS pred,
        |    CAST(npb AS DOUBLE) / CAST(nb AS DOUBLE) AS obs
        |  FROM g),
        |w AS (
        |  SELECT bin, nb, pred, obs,
        |    CAST(ROUND(CAST(nb AS DOUBLE) * abs(obs - pred), 9)
        |      AS DECIMAL(28,9)) AS gap9
        |  FROM p)
        |SELECT bin, nb AS n_events, round(pred, 6) AS pred_mean,
        |  round(obs, 6) AS obs_rate, round(abs(obs - pred), 6) AS abs_gap,
        |  round(CAST(CAST(sum(gap9) OVER () AS DECIMAL(38,9)) AS DOUBLE)
        |    / CAST(sum(nb) OVER () AS DOUBLE), 6) AS ece
        |FROM w ORDER BY bin""".stripMargin,
  )
}
