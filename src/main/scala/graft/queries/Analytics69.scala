package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 seventh wave: two-sample empirical-distribution-function
  * tests between the click and view daily-mean series — the
  * whole-distribution companions to q_agg_kstest (max deviation):
  *
  *  - q_agg_cvm2: two-sample Cramér–von Mises T via the rank formula
  *    U = n·Σ(r_i−i)² + m·Σ(s_j−j)², T = U/(nmN) − (4nm−1)/(6N) —
  *    integrated squared EDF distance (every point counts, not just
  *    the max);
  *  - q_agg_ad2: two-sample Anderson–Darling A² =
  *    (1/nm) Σ_{i<N} (M_i·N − n·i)²/(i(N−i)) — the tail-weighted
  *    version (Pettitt's computational form).
  *
  * Determinism: both samples first collapse to the calendar-bounded
  * daily grid (mean = exact DECIMAL sum / count, rounded to 9 dp — the
  * identical double in both engines), the pooled order is made total
  * by the (value, sample, day) tiebreak, and both statistics are pure
  * integer lattices until the final division — except AD's per-i term,
  * one IEEE division of exact integers, which is floor-scaled to a
  * BIGINT (×1e9) before summation so engine aggregation order cannot
  * perturb A².
  *
  * Scale notes: the fact table reduces to ≤ 2·#days rows in one
  * map-side-combined aggregate; the rank windows ride that bounded
  * grid, never raw events. 100 TB moves the daily means, not the row
  * count under the sort. */
object Analytics69 {

  /** Pooled ranked daily-mean grid: a=1 for click, 0 for view, with
    * pooled rank r and within-sample rank i over the same total
    * order. */
  private def rankedDaily(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select(when(col("event_type") === "click", 1L).otherwise(0L)
        .as("a"), expr("us div 86400000000").as("day"),
        dec(col("value")).as("v"))
      .groupBy(col("a"), col("day"))
      .agg(round(dbl(sum(col("v"))) / dbl(count(lit(1))), 9).as("x"))
    val pooled = Window.orderBy(col("x"), col("a"), col("day"))
    val within = Window.partitionBy(col("a"))
      .orderBy(col("x"), col("a"), col("day"))
    daily
      .withColumn("r", row_number().over(pooled).cast("long"))
      .withColumn("i", row_number().over(within).cast("long"))
  }

  /** Cramér–von Mises two-sample T (rank computational form). */
  private def qAggCvm2(s: SparkSession, d: String): DataFrame = {
    rankedDaily(s, d)
      .agg(sum(col("a")).as("n"), sum(lit(1L) - col("a")).as("m"),
        sum((col("r") - col("i")) * (col("r") - col("i")) *
          when(col("a") === 1L, 1L).otherwise(0L)).as("u1"),
        sum((col("r") - col("i")) * (col("r") - col("i")) *
          when(col("a") === 0L, 1L).otherwise(0L)).as("u0"))
      .select(col("n"), col("m"),
        (col("n") * col("u1") + col("m") * col("u0")).as("u"))
      .select(col("n"), col("m"), col("u"),
        when(col("n") > 0 && col("m") > 0,
          round(dbl(col("u")) /
            dbl(col("n") * col("m") * (col("n") + col("m"))) -
            dbl(col("n") * col("m") * 4 - 1) /
              dbl((col("n") + col("m")) * 6), 6)).as("t"))
  }

  /** Anderson–Darling two-sample A² (Pettitt), floor-scaled lattice
    * summation. */
  private def qAggAd2(s: SparkSession, d: String): DataFrame = {
    val rk = rankedDaily(s, d)
    val dims = rk.agg(sum(col("a")).as("n"),
      sum(lit(1L) - col("a")).as("m"))
    val cum = Window.orderBy(col("r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rk.withColumn("mi", sum(col("a")).over(cum))
      .crossJoin(broadcast(dims))
      .withColumn("nn", col("n") + col("m"))
      .filter(col("r") < col("nn"))
      .withColumn("num",
        (col("mi") * col("nn") - col("n") * col("r")) *
          (col("mi") * col("nn") - col("n") * col("r")))
      .withColumn("term_s", expr(
        """CAST(floor(CAST(num AS DOUBLE)
          |  / CAST(r * (nn - r) AS DOUBLE) * 1000000000.0) AS BIGINT)"""
          .stripMargin))
      .groupBy(col("n"), col("m"))
      .agg(sum(col("term_s")).as("ssum"))
      .select(col("n"), col("m"),
        when(col("n") > 0 && col("m") > 0,
          round(dbl(col("ssum")) / 1e9 / dbl(col("n") * col("m")), 6))
          .as("a2"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_cvm2" -> (qAggCvm2 _),
    "q_agg_ad2" -> (qAggAd2 _),
  )

  private val rankedSql =
    """WITH daily AS (
      |  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
      |    (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
      |      // 86400000000) AS day,
      |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE), 9) AS x
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT CAST(a AS BIGINT) AS a, day, x,
      |    CAST(row_number() OVER (ORDER BY x, a, day) AS BIGINT) AS r,
      |    CAST(row_number() OVER (PARTITION BY a ORDER BY x, a, day)
      |      AS BIGINT) AS i
      |  FROM daily)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_cvm2" -> (rankedSql +
      """,
        |agg AS (
        |  SELECT sum(a) AS n, sum(1 - a) AS m,
        |    sum((r - i) * (r - i) * a) AS u1,
        |    sum((r - i) * (r - i) * (1 - a)) AS u0
        |  FROM rk)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |  CAST(n * u1 + m * u0 AS BIGINT) AS u,
        |  CASE WHEN n > 0 AND m > 0 THEN
        |    round(CAST(n * u1 + m * u0 AS DOUBLE)
        |        / CAST(n * m * (n + m) AS DOUBLE)
        |      - CAST(n * m * 4 - 1 AS DOUBLE)
        |        / CAST((n + m) * 6 AS DOUBLE), 6)
        |  END AS t
        |FROM agg""".stripMargin),
    "q_agg_ad2" -> (rankedSql +
      """,
        |dims AS (SELECT sum(a) AS n, sum(1 - a) AS m FROM rk),
        |cum AS (
        |  SELECT r, sum(a) OVER (ORDER BY r
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mi
        |  FROM rk),
        |terms AS (
        |  SELECT n, m,
        |    CAST(floor(CAST((mi * (n + m) - n * r)
        |                  * (mi * (n + m) - n * r) AS DOUBLE)
        |      / CAST(r * ((n + m) - r) AS DOUBLE)
        |      * 1000000000.0) AS BIGINT) AS term_s
        |  FROM cum CROSS JOIN dims
        |  WHERE r < n + m)
        |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
        |  CASE WHEN n > 0 AND m > 0 THEN
        |    round(CAST(sum(term_s) AS DOUBLE) / 1e9
        |      / CAST(max(n) * max(m) AS DOUBLE), 6)
        |  END AS a2
        |FROM terms GROUP BY n, m""".stripMargin),
  )
}
