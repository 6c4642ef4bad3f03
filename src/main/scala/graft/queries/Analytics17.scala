package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 seventeenth wave: Kendall tau-b rank correlation on a
  * bounded contingency grid (completing the correlation suite:
  * Pearson = q_agg_corr, Spearman = q_agg_spearman, Kendall = here),
  * Wilson-score confidence intervals for per-type success rates (the
  * binomial CI that behaves at small n and extreme p, unlike the
  * normal approximation), and a 7-slot rolling median over the daily
  * series (the robust denoiser a mean-based EMA can't be).
  *
  * Scale notes:
  *  - Kendall's O(n²) pair statistic NEVER touches row pairs: the
  *    stream collapses to a (group, qty-value, price-bucket) exact
  *    count grid in one shuffle (≤50×21 cells per group), and the
  *    concordant/discordant sums are a grid×grid theta self-join —
  *    bounded by the GRID squared, independent of row count. Tie
  *    terms come from the grid's marginals. The n0·n1 products
  *    overflow BIGINT at scale, so the denominator is
  *    sqrt(a)·sqrt(b) in doubles over exact integers.
  *  - Wilson: one count-shuffle to (n, k) per type; the interval is
  *    a fixed closed-form double tree over two exact integers.
  *  - Rolling median: the daily count table is bounded (days×types);
  *    the median is the LOWER median of an explicitly sorted frame
  *    list — both engines sort the same ≤7 integers, no percentile
  *    interpolation ambiguity. */
object Analytics17 {

  /** Kendall tau-b between quantity and price bucket per return flag,
    * exact from the bounded contingency grid. */
  private def qAggKendall(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("int").as("x"),
        floor(col("l_extendedprice") / 5000.0).cast("int").as("y"))
      .groupBy(col("g"), col("x"), col("y")).agg(count(lit(1)).as("n"))
    val c2 = cells.select(col("g"), col("x").as("x2"), col("y").as("y2"),
      col("n").as("n2"))
    val pairs = cells.join(c2, Seq("g"))
      .filter(col("x") < col("x2"))
    val cd = pairs.groupBy(col("g")).agg(
      sum(when(col("y") < col("y2"), col("n") * col("n2"))
        .otherwise(lit(0L))).as("conc"),
      sum(when(col("y") > col("y2"), col("n") * col("n2"))
        .otherwise(lit(0L))).as("disc"))
    val tot = cells.groupBy(col("g")).agg(sum(col("n")).as("nn"))
    val tx = cells.groupBy(col("g"), col("x"))
      .agg(sum(col("n")).as("t"))
      .groupBy(col("g"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n1"))
    val ty = cells.groupBy(col("g"), col("y"))
      .agg(sum(col("n")).as("t"))
      .groupBy(col("g"))
      .agg(sum(expr("t * (t - 1) div 2")).as("n2t"))
    cd.join(tot, Seq("g")).join(tx, Seq("g")).join(ty, Seq("g"))
      .withColumn("n0", expr("nn * (nn - 1) div 2"))
      .select(col("g").as("l_returnflag"), col("nn").as("n"),
        col("conc"), col("disc"),
        // all-tied on either dimension ⇒ tau undefined → NULL, not an
        // ANSI divide-by-zero
        when(col("n0") > col("n1") && col("n0") > col("n2t"),
          round((dbl(col("conc")) - dbl(col("disc"))) /
            (sqrt(dbl(col("n0") - col("n1"))) *
              sqrt(dbl(col("n0") - col("n2t")))), 6)).as("tau_b"))
      .orderBy(col("l_returnflag"))
  }

  /** Wilson 95% score interval for the per-type rate of value ≥ 50. */
  private def qAggWilson(s: SparkSession, d: String): DataFrame = {
    val z = 1.96
    val agg = events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("k"))
    val nD = dbl(col("n")); val kD = dbl(col("k"))
    val p = kD / nD
    val denom = lit(1.0) + lit(z * z) / nD
    val center = p + lit(z * z) / (lit(2.0) * nD)
    val spread = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      lit(z * z) / (lit(4.0) * nD * nD))
    agg.select(col("event_type"), col("n"), col("k"),
      round(p, 6).as("rate"),
      round((center - spread) / denom, 6).as("wilson_lo"),
      round((center + spread) / denom, 6).as("wilson_hi"))
      .orderBy(col("event_type"))
  }

  /** 7-day centered rolling LOWER median of daily event counts per
    * type (explicit frame sort — no interpolation ambiguity). */
  private def qWinRollmedian(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("et"), expr("us div 86400000000").as("day"))
      .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("win", array_sort(collect_list(col("c")).over(w)))
      .select(col("et").as("event_type"), col("day"), col("c"),
        expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))")
          .as("roll_median"))
      .orderBy(col("event_type"), col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_kendall" -> (qAggKendall _),
    "q_agg_wilson" -> (qAggWilson _),
    "q_win_rollmedian" -> (qWinRollmedian _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_kendall" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS INT) AS x,
        |    CAST(floor(l_extendedprice / 5000.0) AS INT) AS y,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.g,
        |    CAST(sum(CASE WHEN a.y < b.y THEN a.n * b.n ELSE 0 END)
        |      AS BIGINT) AS conc,
        |    CAST(sum(CASE WHEN a.y > b.y THEN a.n * b.n ELSE 0 END)
        |      AS BIGINT) AS disc
        |  FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x
        |  GROUP BY a.g),
        |tot AS (SELECT g, CAST(sum(n) AS BIGINT) AS nn
        |        FROM cells GROUP BY g),
        |tx AS (SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1
        |       FROM (SELECT g, x, sum(n) AS t FROM cells GROUP BY g, x)
        |       GROUP BY g),
        |ty AS (SELECT g, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2t
        |       FROM (SELECT g, y, sum(n) AS t FROM cells GROUP BY g, y)
        |       GROUP BY g)
        |SELECT cd.g AS l_returnflag, nn AS n, conc, disc,
        |  round((CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
        |    / (sqrt(CAST(nn * (nn - 1) // 2 - n1 AS DOUBLE))
        |     * sqrt(CAST(nn * (nn - 1) // 2 - n2t AS DOUBLE))), 6) AS tau_b
        |FROM cd JOIN tot ON cd.g = tot.g JOIN tx ON cd.g = tx.g
        |     JOIN ty ON cd.g = ty.g
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_wilson" ->
      """WITH agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, k,
        |  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |  round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
        |    - 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |      + 1.96 * 1.96
        |        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6) AS wilson_lo,
        |  round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE)))
        |    + 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |        / CAST(n AS DOUBLE)
        |      + 1.96 * 1.96
        |        / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6) AS wilson_hi
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_win_rollmedian" ->
      """WITH daily AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |fr AS (
        |  SELECT et, day, c,
        |    list_sort(list(c) OVER (PARTITION BY et ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS win
        |  FROM daily)
        |SELECT et AS event_type, day, c,
        |  win[CAST((len(win) + 1) // 2 AS INT)] AS roll_median
        |FROM fr ORDER BY event_type, day""".stripMargin,
  )
}
