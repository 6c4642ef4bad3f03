package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 ninth wave: autocorrelation-structure diagnostics per
  * event type — the model-identification companions to
  * q_time_autocorr (two fixed lags) and q_time_periodogram (dominant
  * lag):
  *
  *  - q_time_pacf: partial autocorrelations at lags 1..3 of the daily
  *    count series via the Durbin–Levinson recursion unrolled in
  *    closed form (φ11 = r1, φ22 = (r2−r1²)/(1−r1²), φ33 from the
  *    level-2 coefficients) — the AR-order fingerprint;
  *  - q_time_spectral: normalized spectral entropy of the positive
  *    part of the hourly-count ACF over lags 1..24 — how concentrated
  *    the correlation structure is (0 = single dominant cycle,
  *    1 = white).
  *
  * Determinism: every r_k comes from pure BIGINT lagged-pair moments
  * of integer counts (the periodogram discipline) — the only doubles
  * are single IEEE expressions of exact integers, identical in both
  * engines; the Durbin–Levinson tree is fixed; the entropy summations
  * are floor-scaled to BIGINT lattices before aggregation so order
  * cannot perturb them.
  *
  * Scale notes: the fact table collapses once to the calendar-bounded
  * daily/hourly grids; the lag sweep is one co-keyed self-join against
  * a ≤24-row literal lag relation; everything after is per-type
  * bounded algebra. */
object Analytics71 {

  /** Lagged-pair Pearson r per (type, lag) from integer count
    * moments; grid = counts keyed (et, t). */
  private def acf(grid: DataFrame, maxLag: Int,
      s: SparkSession): DataFrame = {
    val lags = s.range(1, maxLag + 1).select(col("id").as("lag"))
    val pairs = grid.crossJoin(broadcast(lags))
      .withColumn("t2", col("t") + col("lag"))
      .join(grid.select(col("et"), col("t").as("t2"),
        col("c").as("c2")), Seq("et", "t2"))
    pairs.groupBy(col("et"), col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(col("c2")).as("sy"), sum(col("c") * col("c2")).as("sxy"),
        sum(col("c") * col("c")).as("sxx"),
        sum(col("c2") * col("c2")).as("syy"))
      .withColumn("dxx", dbl(col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("dyy", dbl(col("n") * col("syy") - col("sy") * col("sy")))
      .withColumn("r", when(col("dxx") > 0 && col("dyy") > 0,
        dbl(col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt(col("dxx") * col("dyy"))))
  }

  /** PACF at lags 1..3 of daily counts (Durbin–Levinson closed
    * forms). */
  private def qTimePacf(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("t"))
      .groupBy(col("et"), col("t")).agg(count(lit(1)).as("c"))
    val rw = acf(daily, 3, s)
      .groupBy(col("et"))
      .agg(max(when(col("lag") === 1, col("r"))).as("r1"),
        max(when(col("lag") === 2, col("r"))).as("r2"),
        max(when(col("lag") === 3, col("r"))).as("r3"))
      .withColumn("p22", when(
        col("r1").isNotNull && col("r2").isNotNull &&
          lit(1.0) - col("r1") * col("r1") > 0,
        (col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1"))))
      .withColumn("p21", col("r1") * (lit(1.0) - col("p22")))
      .withColumn("den3",
        lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2"))
      .withColumn("p33", when(
        col("r3").isNotNull && col("den3").isNotNull &&
          abs(col("den3")) > 0,
        (col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
          col("den3")))
    rw.select(col("et").as("event_type"),
      round(col("r1"), 6).as("r1"), round(col("r2"), 6).as("r2"),
      round(col("r3"), 6).as("r3"),
      round(col("r1"), 6).as("pacf1"), round(col("p22"), 6).as("pacf2"),
      round(col("p33"), 6).as("pacf3"))
      .orderBy(col("event_type"))
  }

  /** Normalized spectral entropy of the positive hourly ACF, lags
    * 1..24. */
  private def qTimeSpectral(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 3600000000").as("t"))
      .groupBy(col("et"), col("t")).agg(count(lit(1)).as("c"))
    val pos = acf(hourly, 24, s)
      .withColumn("p6", when(col("r") > 0,
        expr("CAST(round(r * 1000000.0, 0) AS BIGINT)")).otherwise(0L))
      .filter(col("p6") > 0)
    val tot = pos.groupBy(col("et"))
      .agg(sum(col("p6")).as("ptot"), count(lit(1)).as("n_pos"))
    pos.join(broadcast(tot), Seq("et"))
      .withColumn("q", dbl(col("p6")) / dbl(col("ptot")))
      .withColumn("term_s",
        expr("CAST(floor(-q * ln(q) * 1000000000000.0) AS BIGINT)"))
      .groupBy(col("et"), col("n_pos"))
      .agg(sum(col("term_s")).as("hsum"))
      .select(col("et").as("event_type"), col("n_pos"),
        round(dbl(col("hsum")) / 1e12, 6).as("entropy"),
        when(col("n_pos") > 1,
          round(dbl(col("hsum")) / 1e12 / log(dbl(col("n_pos"))), 6))
          .as("norm_entropy"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_pacf" -> (qTimePacf _),
    "q_time_spectral" -> (qTimeSpectral _),
  )

  private def acfSql(bucketUs: Long, maxLag: Int): String =
    s"""WITH grid AS (
      |  SELECT event_type AS et,
      |    (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
      |      // $bucketUs) AS t,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT g.et, l.lag, g.c, g2.c AS c2
      |  FROM grid g
      |  CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) AS lag) l
      |  JOIN grid g2 ON g2.et = g.et AND g2.t = g.t + l.lag),
      |m AS (
      |  SELECT et, lag, CAST(count(*) AS BIGINT) AS n,
      |    sum(c) AS sx, sum(c2) AS sy, sum(c * c2) AS sxy,
      |    sum(c * c) AS sxx, sum(c2 * c2) AS syy
      |  FROM pairs GROUP BY 1, 2),
      |r AS (
      |  SELECT et, lag,
      |    CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
      |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |           * CAST(n * syy - sy * sy AS DOUBLE))
      |    END AS r
      |  FROM m)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_pacf" -> (acfSql(86400000000L, 3) +
      """,
        |w AS (
        |  SELECT et,
        |    max(CASE WHEN lag = 1 THEN r END) AS r1,
        |    max(CASE WHEN lag = 2 THEN r END) AS r2,
        |    max(CASE WHEN lag = 3 THEN r END) AS r3
        |  FROM r GROUP BY et),
        |p2 AS (
        |  SELECT et, r1, r2, r3,
        |    CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL
        |      AND 1.0 - r1 * r1 > 0
        |    THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS p22
        |  FROM w),
        |p3 AS (
        |  SELECT et, r1, r2, r3, p22, r1 * (1.0 - p22) AS p21,
        |    1.0 - r1 * (1.0 - p22) * r1 - p22 * r2 AS den3
        |  FROM p2)
        |SELECT et AS event_type,
        |  round(r1, 6) AS r1, round(r2, 6) AS r2, round(r3, 6) AS r3,
        |  round(r1, 6) AS pacf1, round(p22, 6) AS pacf2,
        |  round(CASE WHEN r3 IS NOT NULL AND den3 IS NOT NULL
        |      AND abs(den3) > 0
        |    THEN (r3 - p21 * r2 - p22 * r1) / den3 END, 6) AS pacf3
        |FROM p3 ORDER BY event_type""".stripMargin),
    "q_time_spectral" -> (acfSql(3600000000L, 24) +
      """,
        |pos AS (
        |  SELECT et,
        |    CAST(round(r * 1000000.0, 0) AS BIGINT) AS p6
        |  FROM r WHERE r > 0
        |    AND CAST(round(r * 1000000.0, 0) AS BIGINT) > 0),
        |tot AS (
        |  SELECT et, sum(p6) AS ptot, CAST(count(*) AS BIGINT) AS n_pos
        |  FROM pos GROUP BY et),
        |terms AS (
        |  SELECT pos.et, tot.n_pos,
        |    CAST(floor(-(CAST(p6 AS DOUBLE) / CAST(ptot AS DOUBLE))
        |      * ln(CAST(p6 AS DOUBLE) / CAST(ptot AS DOUBLE))
        |      * 1000000000000.0) AS BIGINT) AS term_s
        |  FROM pos JOIN tot ON pos.et = tot.et)
        |SELECT et AS event_type, n_pos,
        |  round(CAST(sum(term_s) AS DOUBLE) / 1e12, 6) AS entropy,
        |  CASE WHEN n_pos > 1 THEN
        |    round(CAST(sum(term_s) AS DOUBLE) / 1e12
        |      / ln(CAST(n_pos AS DOUBLE)), 6)
        |  END AS norm_entropy
        |FROM terms GROUP BY et, n_pos ORDER BY event_type""".stripMargin),
  )
}
