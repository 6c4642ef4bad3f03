package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 second stats/series wave: Bartlett's test (the parametric
  * variance-homogeneity sibling of q_agg_levene — fast and exact under
  * normality, which is why both ship), the Poisson overdispersion
  * index (variance-to-mean of daily arrivals — the "is this a Poisson
  * process or bursty" gate before any rate-based alert threshold),
  * local-peak detection with rise/fall prominence (the ops-review
  * "what were the spikes" report), and EWMA mean/variance (the
  * RiskMetrics-style volatility tracker next to q_time_ema's level).
  *
  * Scale notes: Bartlett collapses to per-group exact DECIMAL moments
  * (one shuffle bounded by group count); the series ops all ride the
  * calendar-bounded daily table; the EWMA fold is the engine's
  * sorted-fold discipline with a fixed [m, v, n] DOUBLE state and an
  * identical update tree in both engines. */
object Analytics63 {

  /** Bartlett's test of equal variances of l_quantity across return
    * flags: per-group exact moments → ln-variance terms (9-dp DECIMAL
    * sums), corrected statistic T ~ χ²(k−1). */
  private def qAggBartlett(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("g"), dec(col("l_quantity")).as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
        sum(col("x") * col("x")).as("ssg"))
      .filter(col("ng") > 1)
      .withColumn("v", expr(
        "(CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) " +
          "/ CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0)"))
      .filter(col("v") > 0)
      .select(col("g"), col("ng"), col("v"),
        expr("CAST(ROUND((CAST(ng AS DOUBLE) - 1.0) * ln(v), 9) " +
          "AS DECIMAL(28,9))").as("lnterm"),
        expr("CAST(ROUND((CAST(ng AS DOUBLE) - 1.0) * v, 9) " +
          "AS DECIMAL(28,9))").as("wv"),
        expr("CAST(ROUND(1.0 / (CAST(ng AS DOUBLE) - 1.0), 9) " +
          "AS DECIMAL(28,9))").as("inv"))
    g.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("lnterm")).as("sl"), sum(col("wv")).as("swv"),
        sum(col("inv")).as("sinv"))
      .select(col("k"), col("n"),
        round(dbl(col("swv")) / (dbl(col("n")) - dbl(col("k"))), 6)
          .as("pooled_var"),
        // k = 1 or no positive-variance groups ⇒ undefined → NULL
        when(col("k") > 1 && col("n") > col("k") &&
            dbl(col("swv")) > 0,
          round(((dbl(col("n")) - dbl(col("k"))) *
            log(dbl(col("swv")) / (dbl(col("n")) - dbl(col("k"))))
            - dbl(col("sl"))) /
            (lit(1.0) + (dbl(col("sinv")) -
              lit(1.0) / (dbl(col("n")) - dbl(col("k")))) /
              (lit(3.0) * (dbl(col("k")) - 1.0))), 6)).as("t_stat"))
  }

  /** Poisson overdispersion of daily arrivals per event type:
    * variance-to-mean ratio + the (n−1)·VMR dispersion χ². */
  private def qTimeDispersion(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"),
        round(dbl(col("s1")) / dbl(col("n_days")), 6).as("mean"),
        round((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1"))
          / dbl(col("n_days"))) / (dbl(col("n_days")) - 1.0), 6)
          .as("var"),
        when(col("s1") > 0,
          round(((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1"))
            / dbl(col("n_days"))) / (dbl(col("n_days")) - 1.0)) /
            (dbl(col("s1")) / dbl(col("n_days"))), 6)).as("vmr"),
        when(col("s1") > 0,
          round((dbl(col("n_days")) - 1.0) *
            ((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1"))
              / dbl(col("n_days"))) / (dbl(col("n_days")) - 1.0)) /
            (dbl(col("s1")) / dbl(col("n_days"))), 6)).as("chi2"))
      .orderBy(col("event_type"))
  }

  /** Local peaks in each event type's daily series: strict local maxima
    * with rise/fall prominence, top 3 per type by (count, day). */
  private def qTimePeaks(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val peaks = daily
      .withColumn("pc", lag(col("c"), 1).over(w))
      .withColumn("nc", lead(col("c"), 1).over(w))
      .filter(col("pc").isNotNull && col("nc").isNotNull &&
        col("c") > col("pc") && col("c") > col("nc"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(desc("c"), col("day"))
    peaks.withColumn("rk", row_number().over(wr))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk").cast("long").as("rk"),
        col("day"), col("c"),
        (col("c") - col("pc")).as("rise"),
        (col("c") - col("nc")).as("fall"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** EWMA mean + variance (α = 1/2) of each event type's daily counts:
    * West-style incremental update [m, v] — final level, variance, and
    * volatility. Sorted fold, identical tree in both engines. */
  private def qTimeEwvar(s: SparkSession, d: String): DataFrame = {
    val upd =
      "CASE WHEN element_at(acc, 3) = 0.0D THEN " +
        "array(element_at(x, 1), 0.0D, 1.0D) " +
      "ELSE array(" +
        "element_at(acc, 1) " +
          "+ 0.5D * (element_at(x, 1) - element_at(acc, 1)), " +
        "0.5D * (element_at(acc, 2) " +
          "+ 0.5D * (element_at(x, 1) - element_at(acc, 1)) " +
          "* (element_at(x, 1) - element_at(acc, 1))), " +
        "element_at(acc, 3) + 1.0D) END"
    events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("c"))))
        .as("arr"))
      .withColumn("st", expr(
        "aggregate(transform(arr, e -> array(CAST(e.c AS DOUBLE))), " +
          "array(0.0D, 0.0D, 0.0D), (acc, x) -> " + upd + ")"))
      .select(col("event_type"),
        size(col("arr")).cast("long").as("n_days"),
        round(expr("element_at(st, 1)"), 6).as("ew_mean"),
        round(expr("element_at(st, 2)"), 6).as("ew_var"),
        round(sqrt(expr("element_at(st, 2)")), 6).as("ew_vol"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_bartlett" -> (qAggBartlett _),
    "q_time_dispersion" -> (qTimeDispersion _),
    "q_time_peaks" -> (qTimePeaks _),
    "q_time_ewvar" -> (qTimeEwvar _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_bartlett" ->
      """WITH g AS (
        |  SELECT l_returnflag AS g, CAST(count(*) AS BIGINT) AS ng,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))) AS sg,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))
        |      * CAST(l_quantity AS DECIMAL(18,4))) AS ssg
        |  FROM lineitem GROUP BY 1 HAVING count(*) > 1),
        |v AS (
        |  SELECT g, ng,
        |    (CAST(ssg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0) AS v
        |  FROM g),
        |terms AS (
        |  SELECT g, ng, v,
        |    CAST(ROUND((CAST(ng AS DOUBLE) - 1.0) * ln(v), 9)
        |      AS DECIMAL(28,9)) AS lnterm,
        |    CAST(ROUND((CAST(ng AS DOUBLE) - 1.0) * v, 9)
        |      AS DECIMAL(28,9)) AS wv,
        |    CAST(ROUND(1.0 / (CAST(ng AS DOUBLE) - 1.0), 9)
        |      AS DECIMAL(28,9)) AS inv
        |  FROM v WHERE v > 0),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(lnterm) AS sl,
        |    sum(wv) AS swv, sum(inv) AS sinv
        |  FROM terms)
        |SELECT k, n,
        |  ROUND(CAST(swv AS DOUBLE)
        |    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)), 6) AS pooled_var,
        |  CASE WHEN k > 1 AND n > k AND CAST(swv AS DOUBLE) > 0
        |    THEN ROUND(((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
        |      * ln(CAST(swv AS DOUBLE)
        |        / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |      - CAST(sl AS DOUBLE))
        |      / (1.0 + (CAST(sinv AS DOUBLE)
        |        - 1.0 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |        / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) END AS t_stat
        |FROM agg""".stripMargin,
    "q_time_dispersion" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM daily GROUP BY event_type HAVING count(*) > 1)
        |SELECT event_type, n_days,
        |  ROUND(CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean,
        |  ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |    * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(n_days AS DOUBLE) - 1.0), 6) AS var,
        |  CASE WHEN s1 > 0 THEN ROUND(((CAST(s2 AS DOUBLE)
        |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1.0))
        |    / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)), 6) END
        |    AS vmr,
        |  CASE WHEN s1 > 0 THEN ROUND((CAST(n_days AS DOUBLE) - 1.0)
        |    * ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
        |      * CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      / (CAST(n_days AS DOUBLE) - 1.0))
        |    / (CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE)), 6) END
        |    AS chi2
        |FROM m ORDER BY event_type""".stripMargin,
    "q_time_peaks" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |n AS (
        |  SELECT event_type, day, c,
        |    lag(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS pc,
        |    lead(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS nc
        |  FROM daily),
        |peaks AS (
        |  SELECT event_type, day, c, pc, nc
        |  FROM n WHERE pc IS NOT NULL AND nc IS NOT NULL
        |    AND c > pc AND c > nc),
        |ranked AS (
        |  SELECT event_type, day, c, pc, nc,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY c DESC, day) AS rk
        |  FROM peaks)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, day, c,
        |  c - pc AS rise, c - nc AS fall
        |FROM ranked WHERE rk <= 3
        |ORDER BY event_type, rk""".stripMargin,
    "q_time_ewvar" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type,
        |        list_sort(list({'day': day, 'c': c})) AS arr
        |      FROM daily GROUP BY event_type),
        |f AS (SELECT event_type, len(arr) AS n,
        |  list_reduce(list_prepend(
        |    [CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
        |     CAST(0.0 AS DOUBLE)],
        |    list_transform(arr,
        |      e -> [CAST(e.c AS DOUBLE), CAST(0.0 AS DOUBLE),
        |            CAST(0.0 AS DOUBLE)])),
        |    (acc, x) -> CASE WHEN acc[3] = 0.0 THEN
        |        [x[1], CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)]
        |      ELSE
        |        [acc[1] + CAST(0.5 AS DOUBLE) * (x[1] - acc[1]),
        |         CAST(0.5 AS DOUBLE) * (acc[2]
        |           + CAST(0.5 AS DOUBLE) * (x[1] - acc[1])
        |           * (x[1] - acc[1])),
        |         acc[3] + 1.0] END) AS st
        |  FROM g)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  ROUND(st[1], 6) AS ew_mean, ROUND(st[2], 6) AS ew_var,
        |  ROUND(sqrt(st[2]), 6) AS ew_vol
        |FROM f ORDER BY event_type""".stripMargin,
  )
}
