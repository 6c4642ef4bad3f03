package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirty-fourth wave: CUPED variance reduction (the modern
  * A/B-testing standard — use each user's pre-period behavior as a
  * control variate and report how much metric variance it removes)
  * and the user-lifespan distribution (first-to-last-activity days —
  * the engagement-duration report feeding LTV and churn models).
  *
  * Scale notes:
  *  - CUPED: two user-keyed conditional sums off ONE scan (pre/post
  *    split by a broadcast midpoint), then exact decimal moments over
  *    the per-user table and a fixed double θ/variance finish;
  *    degenerate variances gate to NULL (ANSI).
  *  - Lifespan: one user-keyed min/max aggregate; the percentile
  *    picks run over the BOUNDED lifespan-day count table (the
  *    q_agg_mannwhitney discipline). */
object Analytics34 {

  /** CUPED: θ = cov(pre, post)/var(pre) over per-user click value,
    * and the share of post-period variance the adjustment removes. */
  private def qAggCuped(s: SparkSession, d: String): DataFrame = {
    val clicks = events(s, d).filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), dec(col("value")).as("v"))
    // Integer division (div), not double / + cast: Spark's cast("long")
    // truncates while DuckDB CAST rounds, so an odd min+max would put the
    // two engines' midpoints 1 us apart and flip boundary events.
    val mid = clicks.agg(
      expr("(min(us) + max(us)) div 2").cast("long").as("mid"))
    val perUser = clicks.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("us") < col("mid"), col("v"))
        .otherwise(lit(0).cast("decimal(18,4)"))).as("x"),
        sum(when(col("us") >= col("mid"), col("v"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("y"))
    val m = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nD = dbl(col("n"))
    val varX = dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")) / nD
    val varY = dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")) / nD
    val covXY = dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")) / nD
    m.select(col("n").as("n_users"),
      when(col("n") > 1 && varX > 0, round(covXY / varX, 6)).as("theta"),
      when(col("n") > 1 && varX > 0 && varY > 0,
        round(covXY * covXY / (varX * varY), 6)).as("var_reduction"))
  }

  /** User-lifespan distribution: mean / discrete median / p90 of
    * days between a user's first and last event. */
  private def qWinLifespan(s: SparkSession, d: String): DataFrame = {
    val spans = events(s, d)
      .groupBy(col("user_id"))
      .agg(expr("(max(us) - min(us)) div 86400000000").as("days"))
    val b = spans.groupBy(col("days")).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.orderBy(col("days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("days"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b.select(col("days"), col("cnt"),
      sum(col("cnt")).over(wOrd).as("cum"),
      sum(col("cnt")).over(wAll).as("nn"),
      sum(col("days") * col("cnt")).over(wAll).as("sd"))
      .agg(max(col("nn")).as("n_users"),
        round(dbl(max(col("sd"))) / dbl(max(col("nn"))), 6)
          .as("mean_days"),
        min(when(expr("cum >= (nn + 1) div 2"), col("days")))
          .as("median_days"),
        min(when(expr("cum >= (9 * nn + 9) div 10"), col("days")))
          .as("p90_days"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_cuped" -> (qAggCuped _),
    "q_win_lifespan" -> (qWinLifespan _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_cuped" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events WHERE event_type = 'click'),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid
        |        FROM clicks),
        |peruser AS (
        |  SELECT user_id,
        |    sum(CASE WHEN us < mid THEN v
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS x,
        |    sum(CASE WHEN us >= mid THEN v
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS y
        |  FROM clicks, mid GROUP BY user_id),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DECIMAL(38,4)) AS sx,
        |    CAST(sum(y) AS DECIMAL(38,4)) AS sy,
        |    CAST(sum(x * y) AS DECIMAL(38,8)) AS sxy,
        |    CAST(sum(x * x) AS DECIMAL(38,8)) AS sxx,
        |    CAST(sum(y * y) AS DECIMAL(38,8)) AS syy
        |  FROM peruser)
        |SELECT n AS n_users,
        |  CASE WHEN n > 1 AND CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      > 0 THEN
        |    round((CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |          / CAST(n AS DOUBLE)), 6)
        |  END AS theta,
        |  CASE WHEN n > 1 AND CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      > 0 AND CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |      > 0 THEN
        |    round((CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / ((CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |            / CAST(n AS DOUBLE))), 6)
        |  END AS var_reduction
        |FROM m""".stripMargin,
    "q_win_lifespan" ->
      """WITH spans AS (
        |  SELECT user_id,
        |    (max(epoch_us(CAST(ts AS TIMESTAMP)))
        |      - min(epoch_us(CAST(ts AS TIMESTAMP)))) // 86400000000
        |      AS days
        |  FROM events GROUP BY user_id),
        |b AS (SELECT days, CAST(count(*) AS BIGINT) AS cnt
        |      FROM spans GROUP BY days),
        |c AS (
        |  SELECT days, cnt,
        |    sum(cnt) OVER (ORDER BY days
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS nn,
        |    sum(days * cnt) OVER () AS sd
        |  FROM b)
        |SELECT CAST(max(nn) AS BIGINT) AS n_users,
        |  round(CAST(max(sd) AS DOUBLE) / CAST(max(nn) AS DOUBLE), 6)
        |    AS mean_days,
        |  CAST(min(CASE WHEN cum >= (nn + 1) // 2 THEN days END)
        |    AS BIGINT) AS median_days,
        |  CAST(min(CASE WHEN cum >= (9 * nn + 9) // 10 THEN days END)
        |    AS BIGINT) AS p90_days
        |FROM c""".stripMargin,
  )
}
