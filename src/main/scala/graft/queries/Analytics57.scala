package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 fourteenth wave: Granger-causality screening between the
  * daily click and purchase series (1 lag, both directions) — the
  * lead-lag INFERENCE step after q_time_lag_corr's descriptive
  * cross-correlation: does yesterday's activity IMPROVE the prediction
  * of today's conversions beyond conversions' own history?
  *
  * Scale notes: the stream collapses ONCE to the calendar-bounded
  * daily (clicks, purchases) table; the lag join is a self-equi-join
  * over those ~tens of rows; and because both series are integer
  * counts, EVERY regression moment (Σx, Σx², Σxy, …) is an exact
  * BIGINT — the restricted/unrestricted OLS solves (Cramer, the
  * q_agg_ols2 discipline) and the F statistic are pure expression
  * trees over exact integers with only the final divisions in
  * doubles. Degenerate inputs (constant series → singular normal
  * equations, n ≤ 3) gate to NULL identically in both engines. */
object Analytics57 {

  private def D(c: String) = s"CAST($c AS DOUBLE)"

  /** Unrestricted two-regressor solve + RSS + F against the
    * own-lag-only restricted model, as one SQL projection over the
    * exact moment row. */
  private def grangerSelect: Seq[String] = {
    val detM =
      s"""(${D("n")} * (${D("s11")} * ${D("s22")} - ${D("s12")} * ${D("s12")})
         | - ${D("s1")} * (${D("s1")} * ${D("s22")} - ${D("s12")} * ${D("s2")})
         | + ${D("s2")} * (${D("s1")} * ${D("s12")} - ${D("s11")} * ${D("s2")}))""".stripMargin
    val det0 =
      s"""(${D("sy")} * (${D("s11")} * ${D("s22")} - ${D("s12")} * ${D("s12")})
         | - ${D("s1")} * (${D("s1y")} * ${D("s22")} - ${D("s12")} * ${D("s2y")})
         | + ${D("s2")} * (${D("s1y")} * ${D("s12")} - ${D("s11")} * ${D("s2y")}))""".stripMargin
    val det1 =
      s"""(${D("n")} * (${D("s1y")} * ${D("s22")} - ${D("s12")} * ${D("s2y")})
         | - ${D("sy")} * (${D("s1")} * ${D("s22")} - ${D("s12")} * ${D("s2")})
         | + ${D("s2")} * (${D("s1")} * ${D("s2y")} - ${D("s1y")} * ${D("s2")}))""".stripMargin
    val det2 =
      s"""(${D("n")} * (${D("s11")} * ${D("s2y")} - ${D("s1y")} * ${D("s12")})
         | - ${D("s1")} * (${D("s1")} * ${D("s2y")} - ${D("s1y")} * ${D("s2")})
         | + ${D("sy")} * (${D("s1")} * ${D("s12")} - ${D("s11")} * ${D("s2")}))""".stripMargin
    // restricted: y ~ a0 + a1·x1 (own lag only)
    val detR = s"(${D("n")} * ${D("s11")} - ${D("s1")} * ${D("s1")})"
    val a1 = s"((${D("n")} * ${D("s1y")} - ${D("s1")} * ${D("sy")}) / $detR)"
    val a0 = s"((${D("sy")} - $a1 * ${D("s1")}) / ${D("n")})"
    val rssR = s"(${D("syy")} - ($a0 * ${D("sy")} + $a1 * ${D("s1y")}))"
    val b0 = s"($det0 / $detM)"
    val b1 = s"($det1 / $detM)"
    val b2 = s"($det2 / $detM)"
    val rssU =
      s"(${D("syy")} - ($b0 * ${D("sy")} + $b1 * ${D("s1y")} + $b2 * ${D("s2y")}))"
    Seq("direction", "n",
      s"CASE WHEN $detM <> 0 THEN ROUND($b1, 6) END AS b_own",
      s"CASE WHEN $detM <> 0 THEN ROUND($b2, 6) END AS b_cross",
      s"CASE WHEN $detM <> 0 AND $detR <> 0 THEN ROUND($rssR, 6) END " +
        "AS rss_r",
      s"CASE WHEN $detM <> 0 THEN ROUND($rssU, 6) END AS rss_u",
      s"CASE WHEN $detM <> 0 AND $detR <> 0 AND n > 3 AND $rssU > 0 " +
        s"THEN ROUND(($rssR - $rssU) / ($rssU / (${D("n")} - 3.0)), 6) " +
        "END AS f_stat")
  }

  /** Both Granger directions over the daily (clicks, purchases)
    * series. */
  private def qTimeGranger(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(expr("us div 86400000000").as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(expr("count_if(event_type = 'click')").as("c"),
        expr("count_if(event_type = 'purchase')").as("p"))
    val lagged = daily.alias("t")
      .join(daily.select((col("day") + 1).as("day"),
          col("c").as("lc"), col("p").as("lp")).alias("l"), Seq("day"))
    def moments(dir: String, y: String, x1: String, x2: String) =
      lagged.agg(count(lit(1)).as("n"),
          sum(col(x1)).as("s1"), sum(col(x2)).as("s2"),
          sum(col(y)).as("sy"),
          sum(col(x1) * col(x1)).as("s11"),
          sum(col(x2) * col(x2)).as("s22"),
          sum(col(x1) * col(x2)).as("s12"),
          sum(col(x1) * col(y)).as("s1y"),
          sum(col(x2) * col(y)).as("s2y"),
          sum(col(y) * col(y)).as("syy"))
        .withColumn("direction", lit(dir))
    // c_to_p: does yesterday's CLICK series predict today's purchases
    // beyond purchases' own lag?
    val cp = moments("c_to_p", "p", "lp", "lc")
    val pc = moments("p_to_c", "c", "lc", "lp")
    cp.union(pc).selectExpr(grangerSelect: _*).orderBy(col("direction"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_granger" -> (qTimeGranger _),
  )

  val sql: Map[String, String] = Map(
    "q_time_granger" -> {
      val sel = grangerSelect.mkString(",\n")
      s"""WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p
        |  FROM events GROUP BY 1),
        |lagged AS (
        |  SELECT t.day, t.c, t.p, l.lc, l.lp FROM daily t
        |  JOIN (SELECT day + 1 AS day, c AS lc, p AS lp FROM daily) l
        |  USING (day)),
        |mom AS (
        |  SELECT 'c_to_p' AS direction, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(lp) AS BIGINT) AS s1, CAST(sum(lc) AS BIGINT) AS s2,
        |    CAST(sum(p) AS BIGINT) AS sy,
        |    CAST(sum(lp * lp) AS BIGINT) AS s11,
        |    CAST(sum(lc * lc) AS BIGINT) AS s22,
        |    CAST(sum(lp * lc) AS BIGINT) AS s12,
        |    CAST(sum(lp * p) AS BIGINT) AS s1y,
        |    CAST(sum(lc * p) AS BIGINT) AS s2y,
        |    CAST(sum(p * p) AS BIGINT) AS syy
        |  FROM lagged
        |  UNION ALL
        |  SELECT 'p_to_c' AS direction, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(lc) AS BIGINT) AS s1, CAST(sum(lp) AS BIGINT) AS s2,
        |    CAST(sum(c) AS BIGINT) AS sy,
        |    CAST(sum(lc * lc) AS BIGINT) AS s11,
        |    CAST(sum(lp * lp) AS BIGINT) AS s22,
        |    CAST(sum(lc * lp) AS BIGINT) AS s12,
        |    CAST(sum(lc * c) AS BIGINT) AS s1y,
        |    CAST(sum(lp * c) AS BIGINT) AS s2y,
        |    CAST(sum(c * c) AS BIGINT) AS syy
        |  FROM lagged)
        |SELECT $sel
        |FROM mom ORDER BY direction""".stripMargin
    },
  )
}
