package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 ninth wave: classifier evaluation, the stratified 2×2
  * test, and decayed engagement —
  *
  *  - q_agg_confusion: the full confusion-matrix report (precision /
  *    recall / F1 / accuracy / MCC) of the fixed value≥50 threshold
  *    separating purchases from views — the numbers a model card
  *    quotes next to q_agg_auc's ranking view and q_agg_youden's
  *    threshold choice;
  *  - q_agg_logloss: binary cross-entropy of the calibrated
  *    value/100 score, with the prevalence-predictor baseline and the
  *    skill score 1 − LL/LL₀ — the proper scoring rule next to
  *    q_agg_brier;
  *  - q_agg_cmh: Cochran–Mantel–Haenszel chi-square (no continuity
  *    correction) + the Mantel–Haenszel pooled odds ratio for
  *    segment × balance across nation strata — the confounder-aware
  *    2×2 test q_agg_oddsratio cannot provide;
  *  - q_agg_decay: exponentially time-decayed engagement score per
  *    user (τ = 7 days to the corpus horizon), top-20 — the recsys
  *    recency-weighting primitive; order-independent because decay
  *    weights anchor to the fixed horizon, never to row order.
  *
  * Determinism: counts are exact BIGINTs; per-row ln/exp terms are
  * rounded to a 9dp lattice before DECIMAL summation; final ratios
  * are fixed double trees rounded to 6dp. Scale: confusion/logloss
  * are one map-side-combined aggregate; CMH collapses to one row per
  * stratum; decay is one user-keyed aggregate with a TakeOrdered
  * top-20. */
object Analytics91 {

  /** Confusion matrix + MCC at the value≥50 threshold. */
  private def qAggConfusion(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(when(col("event_type") === "purchase", 1L).otherwise(0L)
        .as("y"), when(col("value") >= 50.0, 1L).otherwise(0L).as("yh"))
      .agg(sum(expr("y * yh")).as("tp"),
        sum(expr("(1 - y) * yh")).as("fp"),
        sum(expr("y * (1 - yh)")).as("fn"),
        sum(expr("(1 - y) * (1 - yh)")).as("tn"))
      .selectExpr("tp", "fp", "fn", "tn",
        """CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE)
          |  / CAST(tp + fp AS DOUBLE), 6) END AS precision""".stripMargin,
        """CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE)
          |  / CAST(tp + fn AS DOUBLE), 6) END AS recall""".stripMargin,
        """CASE WHEN 2 * tp + fp + fn > 0 THEN
          |  ROUND(2.0 * CAST(tp AS DOUBLE)
          |    / CAST(2 * tp + fp + fn AS DOUBLE), 6) END AS f1"""
          .stripMargin,
        """ROUND(CAST(tp + tn AS DOUBLE)
          |  / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy"""
          .stripMargin,
        // the guard product rides DOUBLE: four ~n/2 BIGINT margins
        // multiply past 2^63 at sf1 (ANSI overflow on one side, DuckDB
        // INT64 error on the other — r15 sf1 campaign)
        """CASE WHEN CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
          |    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE) > 0
          |  THEN ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
          |    - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
          |  / sqrt(CAST((tp + fp) AS DOUBLE) * CAST((tp + fn) AS DOUBLE)
          |    * CAST((tn + fp) AS DOUBLE) * CAST((tn + fn) AS DOUBLE)),
          |  6) END AS mcc""".stripMargin)

  /** Binary cross-entropy of value/100 vs the prevalence baseline. */
  private def qAggLogloss(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("y"),
        expr("least(greatest(value / 100.0, 0.001), 0.999)").as("p"))
      .select(col("y"),
        expr("""CAST(ROUND(CASE WHEN y = 1 THEN -ln(p)
               |  ELSE -ln(1.0 - p) END, 9) AS DECIMAL(28,9))"""
          .stripMargin).as("t"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"),
        sum(col("t")).as("st"))
      .selectExpr("n", "np",
        "CASE WHEN n > 0 THEN ROUND(CAST(st AS DOUBLE)" +
          " / CAST(n AS DOUBLE), 6) END AS logloss",
        """CASE WHEN np > 0 AND np < n THEN ROUND(
          |  -(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
          |      * ln(CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
          |    + (1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
          |      * ln(1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))), 6)
          |  END AS baseline_logloss""".stripMargin,
        """CASE WHEN np > 0 AND np < n THEN ROUND(
          |  1.0 - (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
          |  / (-(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
          |      * ln(CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
          |    + (1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
          |      * ln(1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
          |  END AS skill""".stripMargin)

  /** CMH chi-square + MH pooled OR across nation strata. */
  private def qAggCmh(s: SparkSession, d: String): DataFrame = {
    val strata = t(s, d, "customer")
      .select(col("c_nationkey").as("k"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("e"),
        when(col("c_acctbal") > 5000.0, 1L).otherwise(0L).as("o"))
      .groupBy(col("k"))
      .agg(sum(expr("e * o")).as("a"), sum(expr("e * (1 - o)")).as("b"),
        sum(expr("(1 - e) * o")).as("c"),
        sum(expr("(1 - e) * (1 - o)")).as("dd"))
      .withColumn("nn", col("a") + col("b") + col("c") + col("dd"))
      .filter(col("nn") > 1)
      .select(col("k"),
        expr("""CAST(ROUND(CAST(a AS DOUBLE)
               |  - CAST((a + b) AS DOUBLE) * CAST((a + c) AS DOUBLE)
               |    / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))"""
          .stripMargin).as("dev"),
        expr("""CAST(ROUND(CAST((a + b) AS DOUBLE)
               |  * CAST((c + dd) AS DOUBLE) * CAST((a + c) AS DOUBLE)
               |  * CAST((b + dd) AS DOUBLE)
               |  / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
               |     * CAST(nn - 1 AS DOUBLE)), 9) AS DECIMAL(28,9))"""
          .stripMargin).as("vr"),
        expr("CAST(ROUND(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)" +
          " / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))").as("adn"),
        expr("CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)" +
          " / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))").as("bcn"))
    strata.agg(count(lit(1)).as("k_strata"), sum(col("dev")).as("sd"),
        sum(col("vr")).as("sv"), sum(col("adn")).as("sad"),
        sum(col("bcn")).as("sbc"))
      .selectExpr("k_strata",
        """CASE WHEN CAST(sv AS DOUBLE) > 0 THEN
          |  ROUND(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
          |    / CAST(sv AS DOUBLE), 6) END AS cmh_chi2""".stripMargin,
        """CASE WHEN CAST(sbc AS DOUBLE) > 0 THEN
          |  ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6) END
          |  AS mh_odds_ratio""".stripMargin)
  }

  /** Top-20 users by exponentially decayed engagement (τ = 7 days). */
  private def qAggDecay(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val horizon = ev.agg(max(col("us")).as("hz"))
    ev.crossJoin(broadcast(horizon))
      .select(col("user_id"),
        expr("""CAST(ROUND(value * exp(-(CAST(hz - us AS DOUBLE)
               |  / 604800000000.0)), 9) AS DECIMAL(28,9))"""
          .stripMargin).as("w"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("sw"))
      .select(col("user_id"), col("n_events"),
        round(dbl(col("sw")), 6).as("decayed_score"))
      .orderBy(desc("decayed_score"), col("user_id")).limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_confusion" -> (qAggConfusion _),
    "q_agg_logloss" -> (qAggLogloss _),
    "q_agg_cmh" -> (qAggCmh _),
    "q_agg_decay" -> (qAggDecay _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_confusion" ->
      """WITH b AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS y,
        |    CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS yh
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |m AS (
        |  SELECT CAST(sum(y * yh) AS BIGINT) AS tp,
        |    CAST(sum((1 - y) * yh) AS BIGINT) AS fp,
        |    CAST(sum(y * (1 - yh)) AS BIGINT) AS fn,
        |    CAST(sum((1 - y) * (1 - yh)) AS BIGINT) AS tn
        |  FROM b)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE)
        |    / CAST(tp + fp AS DOUBLE), 6) END AS precision,
        |  CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE)
        |    / CAST(tp + fn AS DOUBLE), 6) END AS recall,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    ROUND(2.0 * CAST(tp AS DOUBLE)
        |      / CAST(2 * tp + fp + fn AS DOUBLE), 6) END AS f1,
        |  ROUND(CAST(tp + tn AS DOUBLE)
        |    / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy,
        |  CASE WHEN CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
        |      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE) > 0
        |    THEN ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |      - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |    / sqrt(CAST((tp + fp) AS DOUBLE) * CAST((tp + fn) AS DOUBLE)
        |      * CAST((tn + fp) AS DOUBLE) * CAST((tn + fn) AS DOUBLE)),
        |    6) END AS mcc
        |FROM m""".stripMargin,
    "q_agg_logloss" ->
      """WITH b AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS y,
        |    least(greatest(value / 100.0, 0.001), 0.999) AS p
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS np,
        |    sum(CAST(ROUND(CASE WHEN y = 1 THEN -ln(p)
        |      ELSE -ln(1.0 - p) END, 9) AS DECIMAL(28,9))) AS st
        |  FROM b)
        |SELECT n, np,
        |  CASE WHEN n > 0 THEN ROUND(CAST(st AS DOUBLE)
        |    / CAST(n AS DOUBLE), 6) END AS logloss,
        |  CASE WHEN np > 0 AND np < n THEN ROUND(
        |    -(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |        * ln(CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |      + (1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |        * ln(1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))), 6)
        |    END AS baseline_logloss,
        |  CASE WHEN np > 0 AND np < n THEN ROUND(
        |    1.0 - (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (-(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
        |        * ln(CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |      + (1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE))
        |        * ln(1.0 - CAST(np AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
        |    END AS skill
        |FROM m""".stripMargin,
    "q_agg_cmh" ->
      """WITH s2 AS (
        |  SELECT c_nationkey AS k,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
        |    CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END AS o
        |  FROM customer),
        |st AS (
        |  SELECT k, CAST(sum(e * o) AS BIGINT) AS a,
        |    CAST(sum(e * (1 - o)) AS BIGINT) AS b,
        |    CAST(sum((1 - e) * o) AS BIGINT) AS c,
        |    CAST(sum((1 - e) * (1 - o)) AS BIGINT) AS dd
        |  FROM s2 GROUP BY k),
        |t AS (
        |  SELECT k, a, b, c, dd, a + b + c + dd AS nn FROM st
        |  WHERE a + b + c + dd > 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |    sum(CAST(ROUND(CAST(a AS DOUBLE)
        |      - CAST((a + b) AS DOUBLE) * CAST((a + c) AS DOUBLE)
        |        / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sd,
        |    sum(CAST(ROUND(CAST((a + b) AS DOUBLE)
        |      * CAST((c + dd) AS DOUBLE) * CAST((a + c) AS DOUBLE)
        |      * CAST((b + dd) AS DOUBLE)
        |      / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
        |         * CAST(nn - 1 AS DOUBLE)), 9) AS DECIMAL(28,9))) AS sv,
        |    sum(CAST(ROUND(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |      / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sad,
        |    sum(CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |      / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sbc
        |  FROM t)
        |SELECT k_strata,
        |  CASE WHEN CAST(sv AS DOUBLE) > 0 THEN
        |    ROUND(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / CAST(sv AS DOUBLE), 6) END AS cmh_chi2,
        |  CASE WHEN CAST(sbc AS DOUBLE) > 0 THEN
        |    ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6) END
        |    AS mh_odds_ratio
        |FROM agg""".stripMargin,
    "q_agg_decay" ->
      """WITH ev AS (
        |  SELECT user_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |hz AS (SELECT max(us) AS hz FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  ROUND(CAST(sum(CAST(ROUND(value
        |    * exp(-(CAST(hz - us AS DOUBLE) / 604800000000.0)), 9)
        |    AS DECIMAL(28,9))) AS DOUBLE), 6) AS decayed_score
        |FROM ev, hz GROUP BY user_id
        |ORDER BY decayed_score DESC, user_id LIMIT 20""".stripMargin,
  )
}
