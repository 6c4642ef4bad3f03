package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 forty-first wave: TOST equivalence testing (the A/B
  * question q_agg_ttest cannot answer — "are these arms the SAME
  * within a margin", the gate behind no-regression launches) and
  * seasonal-strength decomposition (how much of each event series'
  * variance the hour-of-day profile explains — the STL strength
  * statistic that decides whether a forecaster needs a seasonal term).
  *
  * Scale notes:
  *  - TOST: one scan collapses to per-arm exact DECIMAL moments (the
  *    q_agg_ttest discipline); the two one-sided z statistics are a
  *    fixed double tree over the exact sums, degenerate arms gate to
  *    NULL identically on both engines.
  *  - Seasonal strength: the stream collapses once to the bounded
  *    (type, hour) count table; the 24-slot profile and per-type mean
  *    are tiny broadcast re-aggregations, and both variance sums run
  *    as round-9dp DECIMAL terms over the bounded hourly table —
  *    summation-order-free. */
object Analytics41 {

  /** TOST equivalence of click value between arms (user_id % 2) at
    * margin δ = 2.0, α = 0.05 (z ≈ 1.645): equivalent iff
    * (diff + δ)/se > 1.645 AND (diff − δ)/se < −1.645. */
  private def qAggTost(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type") === "click")
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "a").otherwise("b"))
      .withColumn("v", col("value").cast("decimal(18,6)"))
      // global agg, NOT groupBy(lit(1)): a zero-click corpus must still
      // emit the one (na=0, nb=0, NULL-stats) row the oracle's global
      // aggregate produces (ADVICE r8 — the DegenerateInput3 class)
      .agg(
        expr("count_if(arm = 'a')").as("na"),
        expr("count_if(arm = 'b')").as("nb"),
        sum(when(col("arm") === "a", col("v"))).as("sa"),
        sum(when(col("arm") === "b", col("v"))).as("sb"),
        sum(when(col("arm") === "a", col("v") * col("v"))).as("qa"),
        sum(when(col("arm") === "b", col("v") * col("v"))).as("qb"))
      .selectExpr("na", "nb",
        "CASE WHEN na > 0 THEN CAST(sa AS DOUBLE) / na END AS ma",
        "CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / nb END AS mb",
        "CASE WHEN na > 1 THEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)" +
          " * CAST(sa AS DOUBLE) / na) / (na - 1) END AS va",
        "CASE WHEN nb > 1 THEN (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)" +
          " * CAST(sb AS DOUBLE) / nb) / (nb - 1) END AS vb")
      .selectExpr("na", "nb",
        "ROUND(ma, 6) AS mean_a", "ROUND(mb, 6) AS mean_b",
        "ROUND(ma - mb, 6) AS diff",
        "CASE WHEN va / na + vb / nb > 0 THEN " +
          "ROUND(sqrt(va / na + vb / nb), 6) END AS se",
        "CASE WHEN va / na + vb / nb > 0 THEN " +
          "ROUND((ma - mb + 2.0) / sqrt(va / na + vb / nb), 6) " +
          "END AS t_lower",
        "CASE WHEN va / na + vb / nb > 0 THEN " +
          "ROUND((ma - mb - 2.0) / sqrt(va / na + vb / nb), 6) " +
          "END AS t_upper",
        "CASE WHEN va / na + vb / nb > 0 THEN " +
          "(ma - mb + 2.0) / sqrt(va / na + vb / nb) > 1.645 AND " +
          "(ma - mb - 2.0) / sqrt(va / na + vb / nb) < -1.645 " +
          "END AS equivalent")

  /** Seasonal strength of the hour-of-day profile per event type:
    * Fs = max(0, 1 − Var(c − s_hod) / Var(c − mean)) over the bounded
    * hourly count table. */
  private def qTimeSeasonStrength(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type").as("et"), expr("us div 3600000000").as("hr"))
      .groupBy(col("et"), col("hr")).agg(count(lit(1)).as("c"))
      .withColumn("hod", col("hr") % 24)
    val prof = hourly.groupBy(col("et"), col("hod"))
      .agg((sum(col("c")).cast("double") / count(lit(1))).as("s_hod"))
    val means = hourly.groupBy(col("et"))
      .agg((sum(col("c")).cast("double") / count(lit(1))).as("m"),
        count(lit(1)).as("n_hours"))
    hourly
      .join(broadcast(prof), Seq("et", "hod"))
      .join(broadcast(means), Seq("et"))
      .withColumn("tr", expr(
        "CAST(ROUND((c - s_hod) * (c - s_hod), 9) AS DECIMAL(28,9))"))
      .withColumn("td", expr(
        "CAST(ROUND((c - m) * (c - m), 9) AS DECIMAL(28,9))"))
      .groupBy(col("et"), col("n_hours"))
      .agg(sum(col("tr")).as("sr"), sum(col("td")).as("sd"))
      .select(col("et").as("event_type"), col("n_hours"),
        round(dbl(col("sr")) / col("n_hours"), 6).as("var_remainder"),
        round(dbl(col("sd")) / col("n_hours"), 6).as("var_detrended"),
        when(dbl(col("sd")) > 0,
          round(greatest(lit(0.0),
            lit(1.0) - dbl(col("sr")) / dbl(col("sd"))), 6))
          .as("seasonal_strength"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_tost" -> (qAggTost _),
    "q_time_season_strength" -> (qTimeSeasonStrength _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_tost" ->
      """WITH base AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE arm = 'a') AS BIGINT) AS na,
        |    CAST(count(*) FILTER (WHERE arm = 'b') AS BIGINT) AS nb,
        |    CAST(sum(v) FILTER (WHERE arm = 'a') AS DECIMAL(38,6)) AS sa,
        |    CAST(sum(v) FILTER (WHERE arm = 'b') AS DECIMAL(38,6)) AS sb,
        |    CAST(sum(v * v) FILTER (WHERE arm = 'a') AS DECIMAL(38,12)) AS qa,
        |    CAST(sum(v * v) FILTER (WHERE arm = 'b') AS DECIMAL(38,12)) AS qb
        |  FROM base),
        |stats AS (
        |  SELECT na, nb,
        |    CASE WHEN na > 0 THEN CAST(sa AS DOUBLE) / na END AS ma,
        |    CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / nb END AS mb,
        |    CASE WHEN na > 1 THEN (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE)
        |      * CAST(sa AS DOUBLE) / na) / (na - 1) END AS va,
        |    CASE WHEN nb > 1 THEN (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE)
        |      * CAST(sb AS DOUBLE) / nb) / (nb - 1) END AS vb
        |  FROM m)
        |SELECT na, nb, ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        |  ROUND(ma - mb, 6) AS diff,
        |  CASE WHEN va / na + vb / nb > 0 THEN
        |    ROUND(sqrt(va / na + vb / nb), 6) END AS se,
        |  CASE WHEN va / na + vb / nb > 0 THEN
        |    ROUND((ma - mb + 2.0) / sqrt(va / na + vb / nb), 6)
        |  END AS t_lower,
        |  CASE WHEN va / na + vb / nb > 0 THEN
        |    ROUND((ma - mb - 2.0) / sqrt(va / na + vb / nb), 6)
        |  END AS t_upper,
        |  CASE WHEN va / na + vb / nb > 0 THEN
        |    (ma - mb + 2.0) / sqrt(va / na + vb / nb) > 1.645 AND
        |    (ma - mb - 2.0) / sqrt(va / na + vb / nb) < -1.645
        |  END AS equivalent
        |FROM stats""".stripMargin,
    "q_time_season_strength" ->
      """WITH hourly AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |h2 AS (SELECT et, hr, c, hr % 24 AS hod FROM hourly),
        |prof AS (SELECT et, hod,
        |           CAST(sum(c) AS DOUBLE) / count(*) AS s_hod
        |         FROM h2 GROUP BY et, hod),
        |means AS (SELECT et, CAST(sum(c) AS DOUBLE) / count(*) AS m,
        |            CAST(count(*) AS BIGINT) AS n_hours
        |          FROM h2 GROUP BY et),
        |terms AS (
        |  SELECT h2.et, n_hours,
        |    CAST(ROUND((c - s_hod) * (c - s_hod), 9) AS DECIMAL(28,9))
        |      AS tr,
        |    CAST(ROUND((c - m) * (c - m), 9) AS DECIMAL(28,9)) AS td
        |  FROM h2 JOIN prof ON h2.et = prof.et AND h2.hod = prof.hod
        |    JOIN means ON h2.et = means.et),
        |agg AS (
        |  SELECT et, n_hours,
        |    CAST(sum(tr) AS DECIMAL(38,9)) AS sr,
        |    CAST(sum(td) AS DECIMAL(38,9)) AS sd
        |  FROM terms GROUP BY et, n_hours)
        |SELECT et AS event_type, n_hours,
        |  round(CAST(sr AS DOUBLE) / n_hours, 6) AS var_remainder,
        |  round(CAST(sd AS DOUBLE) / n_hours, 6) AS var_detrended,
        |  CASE WHEN CAST(sd AS DOUBLE) > 0 THEN
        |    round(greatest(0.0, 1.0 - CAST(sr AS DOUBLE)
        |      / CAST(sd AS DOUBLE)), 6)
        |  END AS seasonal_strength
        |FROM agg ORDER BY event_type""".stripMargin,
  )
}
