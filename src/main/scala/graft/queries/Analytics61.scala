package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 series-characterization wave: the long-memory /
  * complexity / intermittency diagnostics that sit next to the
  * existing forecasters (Holt, Holt–Winters, Kalman) — Hurst exponent
  * (aggregated-variance method: is the series trending, mean-reverting
  * or random-walk), permutation entropy (ordinal-pattern complexity —
  * the "is this metric structured or noise" screen), and Croston's
  * method (the standard forecaster for INTERMITTENT demand, where
  * EMA-family smoothers systematically under-forecast).
  *
  * Scale notes: all three ride the calendar-bounded daily table (one
  * map-side-combined aggregate over the fact table; everything after
  * is bounded by the day span). Hurst's block sums are plain
  * sub-aggregations of that table; permutation entropy is two leads
  * over per-type partitions of it; Croston is the engine's established
  * sorted-fold (collect_list → aggregate() with a fixed-width DOUBLE
  * array state — the q_time_holt discipline, identical expression tree
  * in both engines so the emitted doubles are bit-equal). */
object Analytics61 {

  /** Hurst exponent per event type via the aggregated-variance method:
    * Var(block sum over w days) ~ w^(2H); complete blocks only for
    * w ∈ {7, 14, 28}, ln-ln least squares over the ≤3 points. */
  private def qTimeHurst(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("g"),
        expr("us div 86400000000").as("day"))
      .groupBy(col("g"), col("day")).agg(count(lit(1)).as("c"))
    val d0 = daily.groupBy(col("g")).agg(min(col("day")).as("d0"))
    val based = daily.join(broadcast(d0), Seq("g"))
      .select(col("g"), (col("day") - col("d0")).as("k"), col("c"))
    val ws = Seq(7, 14, 28)
    val blocks = ws.map { w =>
      based.select(col("g"), expr(s"k div $w").as("blk"), col("c"))
        .groupBy(col("g"), col("blk"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("sb"))
        .filter(col("nd") === w)
        .select(col("g"), lit(w.toLong).as("w"), col("sb"))
    }.reduce(_ unionAll _)
    // per (g, w): exact variance of the block sums (decimal moments)
    val vars = blocks.groupBy(col("g"), col("w"))
      .agg(count(lit(1)).as("nb"),
        sum(col("sb")).as("s1"),
        sum(col("sb") * col("sb")).as("s2"))
      .filter(col("nb") >= 2)
      .select(col("g"), col("w"), col("nb"),
        round((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1"))
          / dbl(col("nb"))) / (dbl(col("nb")) - 1.0), 9).as("v"))
      .filter(col("v") > 0)
    // ln-ln regression, ≤3 points per series: 9-dp decimal term sums
    val pts = vars.select(col("g"),
      round(log(dbl(col("w"))), 9).as("x"),
      round(log(col("v")), 9).as("y"),
      col("w"), col("v"))
    pts.groupBy(col("g")).agg(
        count(lit(1)).as("n_pts"),
        sum(expr("CAST(x AS DECIMAL(28,9))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(28,9))")).as("sy"),
        sum(expr("CAST(ROUND(x * y, 9) AS DECIMAL(28,9))")).as("sxy"),
        sum(expr("CAST(ROUND(x * x, 9) AS DECIMAL(28,9))")).as("sxx"),
        max(when(col("w") === 7, col("v"))).as("var7"),
        max(when(col("w") === 14, col("v"))).as("var14"),
        max(when(col("w") === 28, col("v"))).as("var28"))
      .select(col("g").as("event_type"), col("n_pts"),
        round(col("var7"), 6).as("var7"),
        round(col("var14"), 6).as("var14"),
        round(col("var28"), 6).as("var28"),
        // <2 usable points or zero x-spread ⇒ slope undefined → NULL
        when(col("n_pts") >= 2 &&
            dbl(col("n_pts")) * dbl(col("sxx"))
              - dbl(col("sx")) * dbl(col("sx")) > 0,
          round((dbl(col("n_pts")) * dbl(col("sxy"))
            - dbl(col("sx")) * dbl(col("sy"))) /
            (dbl(col("n_pts")) * dbl(col("sxx"))
              - dbl(col("sx")) * dbl(col("sx"))) / lit(2.0), 6))
          .as("hurst"))
      .orderBy(col("event_type"))
  }

  /** Permutation entropy (order 3) of each event type's daily count
    * sequence: ordinal pattern of each consecutive observation triple
    * (ties broken toward the earlier position — the standard PE
    * convention), Shannon entropy over the 6-pattern distribution,
    * normalized by ln 6. */
  private def qTimePermentropy(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("g"),
        expr("us div 86400000000").as("day"))
      .groupBy(col("g"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
    val tri = daily
      .withColumn("c2", lead(col("c"), 1).over(w))
      .withColumn("c3", lead(col("c"), 2).over(w))
      .filter(col("c3").isNotNull)
      .withColumn("pat",
        when(col("c") <= col("c2") && col("c2") <= col("c3"), "123")
          .when(col("c") <= col("c3") && col("c3") < col("c2"), "132")
          .when(col("c2") < col("c") && col("c") <= col("c3"), "213")
          .when(col("c2") <= col("c3") && col("c3") < col("c"), "231")
          .when(col("c3") < col("c") && col("c") <= col("c2"), "312")
          .otherwise("321"))
    val cnt = tri.groupBy(col("g"), col("pat")).agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("g")).agg(sum(col("n")).as("nt"),
      count(lit(1)).as("n_patterns"))
    cnt.join(broadcast(tot), Seq("g"))
      .withColumn("hc", expr(
        "CAST(ROUND(-(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)) " +
          "* ln(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE)), 9) " +
          "AS DECIMAL(18,9))"))
      .groupBy(col("g"))
      .agg(max(col("nt")).as("n_triples"),
        max(col("n_patterns")).as("n_patterns"),
        sum(col("hc")).as("h"))
      .select(col("g").as("event_type"), col("n_triples"),
        col("n_patterns"),
        round(dbl(col("h")), 6).as("h"),
        round(dbl(col("h")) / lit(math.log(6.0)), 6).as("h_norm"))
      .orderBy(col("event_type"))
  }

  /** Croston's method (α = 1/2) per event type over its demand-day
    * sequence (days with ≥1 event; gaps are the inter-demand
    * intervals): smoothed demand size z, smoothed interval p, forecast
    * z/p per day. Sorted fold with a fixed [z, p, lastday, n] DOUBLE
    * state — the identical update tree runs in both engines. */
  private def qTimeCroston(s: SparkSession, d: String): DataFrame = {
    val upd =
      "CASE WHEN element_at(acc, 4) = 0.0D THEN " +
        "array(element_at(x, 2), 0.0D, element_at(x, 1), 1.0D) " +
      "WHEN element_at(acc, 4) = 1.0D THEN array(" +
        "0.5D * element_at(x, 2) + 0.5D * element_at(acc, 1), " +
        "element_at(x, 1) - element_at(acc, 3), " +
        "element_at(x, 1), 2.0D) " +
      "ELSE array(" +
        "0.5D * element_at(x, 2) + 0.5D * element_at(acc, 1), " +
        "0.5D * (element_at(x, 1) - element_at(acc, 3)) " +
          "+ 0.5D * element_at(acc, 2), " +
        "element_at(x, 1), element_at(acc, 4) + 1.0D) END"
    events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("c"))))
        .as("arr"))
      .withColumn("st", expr(
        "aggregate(transform(arr, " +
          "e -> array(CAST(e.day AS DOUBLE), CAST(e.c AS DOUBLE))), " +
          "array(0.0D, 0.0D, 0.0D, 0.0D), (acc, x) -> " + upd + ")"))
      .select(col("event_type"),
        size(col("arr")).cast("long").as("n_demand"),
        round(expr("element_at(st, 1)"), 6).as("z"),
        round(expr("element_at(st, 2)"), 6).as("p"),
        // a single demand day has no interval ⇒ no forecast → NULL
        when(expr("element_at(st, 2)") > 0,
          round(expr("element_at(st, 1) / element_at(st, 2)"), 6))
          .as("forecast"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_hurst" -> (qTimeHurst _),
    "q_time_permentropy" -> (qTimePermentropy _),
    "q_time_croston" -> (qTimeCroston _),
  )

  val sql: Map[String, String] = Map(
    "q_time_hurst" ->
      """WITH daily AS (
        |  SELECT event_type AS g,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |based AS (
        |  SELECT g, day - min(day) OVER (PARTITION BY g) AS k, c
        |  FROM daily),
        |blocks AS (
        |  SELECT g, w, CAST(sum(c) AS BIGINT) AS sb
        |  FROM based CROSS JOIN (VALUES (7), (14), (28)) AS ws(w)
        |  GROUP BY g, w, k // w HAVING count(*) = w),
        |vars AS (
        |  SELECT g, w, CAST(count(*) AS BIGINT) AS nb,
        |    ROUND((CAST(sum(sb * sb) AS DOUBLE)
        |      - CAST(sum(sb) AS DOUBLE) * CAST(sum(sb) AS DOUBLE)
        |        / CAST(count(*) AS DOUBLE))
        |      / (CAST(count(*) AS DOUBLE) - 1.0), 9) AS v
        |  FROM blocks GROUP BY g, w HAVING count(*) >= 2),
        |pts AS (
        |  SELECT g, ROUND(ln(CAST(w AS DOUBLE)), 9) AS x,
        |    ROUND(ln(v), 9) AS y, w, v
        |  FROM vars WHERE v > 0),
        |agg AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_pts,
        |    sum(CAST(x AS DECIMAL(28,9))) AS sx,
        |    sum(CAST(y AS DECIMAL(28,9))) AS sy,
        |    sum(CAST(ROUND(x * y, 9) AS DECIMAL(28,9))) AS sxy,
        |    sum(CAST(ROUND(x * x, 9) AS DECIMAL(28,9))) AS sxx,
        |    max(CASE WHEN w = 7 THEN v END) AS var7,
        |    max(CASE WHEN w = 14 THEN v END) AS var14,
        |    max(CASE WHEN w = 28 THEN v END) AS var28
        |  FROM pts GROUP BY g)
        |SELECT g AS event_type, n_pts,
        |  ROUND(var7, 6) AS var7, ROUND(var14, 6) AS var14,
        |  ROUND(var28, 6) AS var28,
        |  CASE WHEN n_pts >= 2 AND CAST(n_pts AS DOUBLE)
        |      * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    THEN ROUND((CAST(n_pts AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n_pts AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 2.0, 6)
        |    END AS hurst
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_time_permentropy" ->
      """WITH daily AS (
        |  SELECT event_type AS g,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |tri AS (
        |  SELECT g, c,
        |    lead(c, 1) OVER (PARTITION BY g ORDER BY day) AS c2,
        |    lead(c, 2) OVER (PARTITION BY g ORDER BY day) AS c3
        |  FROM daily),
        |pat AS (
        |  SELECT g,
        |    CASE WHEN c <= c2 AND c2 <= c3 THEN '123'
        |         WHEN c <= c3 AND c3 < c2 THEN '132'
        |         WHEN c2 < c AND c <= c3 THEN '213'
        |         WHEN c2 <= c3 AND c3 < c THEN '231'
        |         WHEN c3 < c AND c <= c2 THEN '312'
        |         ELSE '321' END AS pat
        |  FROM tri WHERE c3 IS NOT NULL),
        |cnt AS (SELECT g, pat, CAST(count(*) AS BIGINT) AS n
        |        FROM pat GROUP BY 1, 2),
        |tot AS (SELECT g, CAST(sum(n) AS BIGINT) AS nt,
        |          CAST(count(*) AS BIGINT) AS n_patterns
        |        FROM cnt GROUP BY g),
        |h AS (
        |  SELECT c.g, max(t.nt) AS nt, max(t.n_patterns) AS n_patterns,
        |    sum(CAST(ROUND(-(CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
        |      * ln(CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE)), 9)
        |      AS DECIMAL(18,9))) AS h
        |  FROM cnt c JOIN tot t ON c.g = t.g GROUP BY c.g)
        |SELECT g AS event_type, CAST(nt AS BIGINT) AS n_triples,
        |  CAST(n_patterns AS BIGINT) AS n_patterns,
        |  ROUND(CAST(h AS DOUBLE), 6) AS h,
        |  ROUND(CAST(h AS DOUBLE) / ln(6.0), 6) AS h_norm
        |FROM h ORDER BY event_type""".stripMargin,
    "q_time_croston" ->
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
        |     CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
        |    list_transform(arr,
        |      e -> [CAST(e.day AS DOUBLE), CAST(e.c AS DOUBLE),
        |            CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])),
        |    (acc, x) -> CASE WHEN acc[4] = 0.0 THEN
        |        [x[2], CAST(0.0 AS DOUBLE), x[1], CAST(1.0 AS DOUBLE)]
        |      WHEN acc[4] = 1.0 THEN
        |        [CAST(0.5 AS DOUBLE) * x[2]
        |           + CAST(0.5 AS DOUBLE) * acc[1],
        |         x[1] - acc[3], x[1], CAST(2.0 AS DOUBLE)]
        |      ELSE
        |        [CAST(0.5 AS DOUBLE) * x[2]
        |           + CAST(0.5 AS DOUBLE) * acc[1],
        |         CAST(0.5 AS DOUBLE) * (x[1] - acc[3])
        |           + CAST(0.5 AS DOUBLE) * acc[2],
        |         x[1], acc[4] + 1.0] END) AS st
        |  FROM g)
        |SELECT event_type, CAST(n AS BIGINT) AS n_demand,
        |  ROUND(st[1], 6) AS z, ROUND(st[2], 6) AS p,
        |  CASE WHEN st[2] > 0 THEN ROUND(st[1] / st[2], 6) END
        |    AS forecast
        |FROM f ORDER BY event_type""".stripMargin,
  )
}
