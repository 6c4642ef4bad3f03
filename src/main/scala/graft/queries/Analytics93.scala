package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 eleventh wave: distribution fitting, rate comparison, and
  * sampling design —
  *
  *  - q_agg_gammafit: method-of-moments Gamma fit of event value per
  *    type (k̂ = m²/v, θ̂ = v/m) — the waiting-time/spend-shape
  *    companion to the r12 negbin/weibull/gumbel fits;
  *  - q_agg_ratetest: two-sample Poisson rate comparison
  *    (purchases vs signups over the shared observation span): rate
  *    ratio with the log-scale 95% CI and the conditional-binomial
  *    exact-style z — "did the purchase rate really exceed the signup
  *    rate";
  *  - q_sample_neyman: Neyman-optimal stratified sample allocation of
  *    a 1000-unit budget across nations (n_h ∝ N_h·σ_h of account
  *    balance) side-by-side with proportional allocation — the
  *    sampling-design table q_sample_stratified executes.
  *
  * Determinism: moments are exact DECIMAL sums; per-stratum N_h·σ_h
  * terms round to the 9dp lattice before the DECIMAL normalizing sum;
  * final ratios are fixed double trees rounded to 6dp. All three are
  * one-scan aggregates over bounded group tables. */
object Analytics93 {

  /** Gamma MoM fit of value per event type. */
  private def qAggGammafit(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), dec(col("value")).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sxx"))
      .selectExpr("event_type", "n",
        """ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
          | AS mean""".stripMargin,
        """CASE WHEN n > 1 THEN ROUND((CAST(sxx AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          |    / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0), 6)
          |  END AS variance""".stripMargin,
        """CASE WHEN n > 1 AND CAST(sx AS DOUBLE) > 0
          |  AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0 THEN
          |ROUND(pow(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 2)
          |  / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |    / (CAST(n AS DOUBLE) - 1.0)), 6) END
          | AS shape_k""".stripMargin,
        """CASE WHEN n > 1 AND CAST(sx AS DOUBLE) > 0
          |  AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0 THEN
          |ROUND(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |    * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
          |    / (CAST(n AS DOUBLE) - 1.0))
          |  / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) END
          | AS scale_theta""".stripMargin)
      .orderBy(col("event_type"))

  /** Poisson rate-ratio test: purchases vs signups. */
  private def qAggRatetest(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("purchase", "signup"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c1"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("c2"),
        ((max(col("us")) - min(col("us")))
          .cast("double") / lit(86400000000.0)).as("span_days"))
      .selectExpr("c1", "c2", "ROUND(span_days, 6) AS span_days",
        """CASE WHEN c2 > 0 THEN
          |  ROUND(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) END
          |  AS rate_ratio""".stripMargin,
        """CASE WHEN c1 > 0 AND c2 > 0 THEN
          |  ROUND(exp(ln(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE))
          |    - 1.96 * sqrt(1.0 / CAST(c1 AS DOUBLE)
          |      + 1.0 / CAST(c2 AS DOUBLE))), 6) END AS rr_ci_lo"""
          .stripMargin,
        """CASE WHEN c1 > 0 AND c2 > 0 THEN
          |  ROUND(exp(ln(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE))
          |    + 1.96 * sqrt(1.0 / CAST(c1 AS DOUBLE)
          |      + 1.0 / CAST(c2 AS DOUBLE))), 6) END AS rr_ci_hi"""
          .stripMargin,
        """CASE WHEN c1 + c2 > 0 THEN
          |  ROUND((CAST(c1 AS DOUBLE)
          |    - CAST(c1 + c2 AS DOUBLE) / 2.0)
          |    / sqrt(CAST(c1 + c2 AS DOUBLE) / 4.0), 6) END
          |  AS cond_z""".stripMargin)

  /** Neyman vs proportional allocation of 1000 samples by nation. */
  private def qSampleNeyman(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "customer")
      .select(col("c_nationkey").as("nat"),
        col("c_acctbal").cast("decimal(18,6)").as("x"))
      .groupBy(col("nat"))
      .agg(count(lit(1)).as("nh"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sxx"))
      .select(col("nat"), col("nh"),
        expr("""CASE WHEN nh > 1 AND (CAST(sxx AS DOUBLE)
               |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               |    / CAST(nh AS DOUBLE)) >= 0 THEN
               |sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
               |    * CAST(sx AS DOUBLE) / CAST(nh AS DOUBLE))
               |  / (CAST(nh AS DOUBLE) - 1.0)) ELSE 0.0 END"""
          .stripMargin).as("sigma"))
      .select(col("nat"), col("nh"), col("sigma"),
        expr("CAST(ROUND(CAST(nh AS DOUBLE) * sigma, 9)" +
          " AS DECIMAL(28,9))").as("term"))
    val tot = g.agg(sum(col("term")).as("tt"), sum(col("nh")).as("nn"))
    g.crossJoin(broadcast(tot))
      .select(col("nat").as("nationkey"), col("nh").as("stratum_size"),
        round(col("sigma"), 4).as("sigma"),
        when(dbl(col("tt")) > 0, expr(
          "CAST(ROUND(1000.0 * CAST(term AS DOUBLE)" +
            " / CAST(tt AS DOUBLE), 0) AS BIGINT)")).as("neyman_n"),
        when(col("nn") > 0, expr(
          "CAST(ROUND(1000.0 * CAST(nh AS DOUBLE)" +
            " / CAST(nn AS DOUBLE), 0) AS BIGINT)"))
          .as("proportional_n"))
      .orderBy(col("nationkey"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_gammafit" -> (qAggGammafit _),
    "q_agg_ratetest" -> (qAggRatetest _),
    "q_sample_neyman" -> (qSampleNeyman _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_gammafit" ->
      """WITH b AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(x * x) AS sxx
        |  FROM (SELECT event_type, CAST(value AS DECIMAL(18,4)) AS x
        |        FROM events)
        |  GROUP BY event_type)
        |SELECT event_type, n,
        |  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  CASE WHEN n > 1 THEN ROUND((CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0), 6)
        |    END AS variance,
        |  CASE WHEN n > 1 AND CAST(sx AS DOUBLE) > 0
        |    AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0 THEN
        |  ROUND(pow(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 2)
        |    / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0)), 6) END AS shape_k,
        |  CASE WHEN n > 1 AND CAST(sx AS DOUBLE) > 0
        |    AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) > 0 THEN
        |  ROUND(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |      * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |    / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) END
        |    AS scale_theta
        |FROM b ORDER BY event_type""".stripMargin,
    "q_agg_ratetest" ->
      """WITH b AS (
        |  SELECT
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
        |      END) AS BIGINT) AS c2,
        |    CAST(max(epoch_us(CAST(ts AS TIMESTAMP)))
        |      - min(epoch_us(CAST(ts AS TIMESTAMP))) AS DOUBLE)
        |      / 86400000000.0 AS span_days
        |  FROM events WHERE event_type IN ('purchase', 'signup'))
        |SELECT c1, c2, ROUND(span_days, 6) AS span_days,
        |  CASE WHEN c2 > 0 THEN
        |    ROUND(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) END
        |    AS rate_ratio,
        |  CASE WHEN c1 > 0 AND c2 > 0 THEN
        |    ROUND(exp(ln(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE))
        |      - 1.96 * sqrt(1.0 / CAST(c1 AS DOUBLE)
        |        + 1.0 / CAST(c2 AS DOUBLE))), 6) END AS rr_ci_lo,
        |  CASE WHEN c1 > 0 AND c2 > 0 THEN
        |    ROUND(exp(ln(CAST(c1 AS DOUBLE) / CAST(c2 AS DOUBLE))
        |      + 1.96 * sqrt(1.0 / CAST(c1 AS DOUBLE)
        |        + 1.0 / CAST(c2 AS DOUBLE))), 6) END AS rr_ci_hi,
        |  CASE WHEN c1 + c2 > 0 THEN
        |    ROUND((CAST(c1 AS DOUBLE)
        |      - CAST(c1 + c2 AS DOUBLE) / 2.0)
        |      / sqrt(CAST(c1 + c2 AS DOUBLE) / 4.0), 6) END AS cond_z
        |FROM b""".stripMargin,
    "q_sample_neyman" ->
      """WITH g AS (
        |  SELECT c_nationkey AS nat, CAST(count(*) AS BIGINT) AS nh,
        |    sum(x) AS sx, sum(x * x) AS sxx
        |  FROM (SELECT c_nationkey,
        |          CAST(c_acctbal AS DECIMAL(19,6)) AS x FROM customer)
        |  GROUP BY c_nationkey),
        |sg AS (
        |  SELECT nat, nh,
        |    CASE WHEN nh > 1 AND (CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(nh AS DOUBLE)) >= 0 THEN
        |    sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(nh AS DOUBLE))
        |      / (CAST(nh AS DOUBLE) - 1.0)) ELSE 0.0 END AS sigma
        |  FROM g),
        |tm AS (
        |  SELECT nat, nh, sigma,
        |    CAST(ROUND(CAST(nh AS DOUBLE) * sigma, 9) AS DECIMAL(28,9))
        |      AS term
        |  FROM sg),
        |tot AS (SELECT sum(term) AS tt, CAST(sum(nh) AS BIGINT) AS nn
        |        FROM tm)
        |SELECT nat AS nationkey, nh AS stratum_size,
        |  ROUND(sigma, 4) AS sigma,
        |  CASE WHEN CAST(tt AS DOUBLE) > 0 THEN
        |    CAST(ROUND(1000.0 * CAST(term AS DOUBLE)
        |      / CAST(tt AS DOUBLE), 0) AS BIGINT) END AS neyman_n,
        |  CASE WHEN nn > 0 THEN
        |    CAST(ROUND(1000.0 * CAST(nh AS DOUBLE)
        |      / CAST(nn AS DOUBLE), 0) AS BIGINT) END
        |    AS proportional_n
        |FROM tm, tot ORDER BY nationkey""".stripMargin,
  )
}
