package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirty-fifth wave: the repeat-purchase report — share of
  * first-time purchasers who buy again, and how long the second
  * purchase takes (the retention-commerce headline next to churn and
  * LTV).
  *
  * Scale note: one user-keyed sort ranks each user's purchases; the
  * first two timestamps per user come from conditional min-aggs over
  * that rank (never a purchases×purchases join), and the
  * days-to-second percentile runs over the BOUNDED gap-day count
  * table (q_agg_mannwhitney discipline). */
object Analytics35 {

  /** Repeat-purchase rate + discrete median days from first to second
    * purchase. */
  private def qWinReorder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val ranked = events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
    val perUser = ranked.groupBy(col("user_id"))
      .agg(min(when(col("rk") === 1, col("us"))).as("t1"),
        min(when(col("rk") === 2, col("us"))).as("t2"))
    val gaps = perUser.filter(col("t2").isNotNull)
      .select(expr("(t2 - t1) div 86400000000").as("g"))
    val b = gaps.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val med = b.select(col("g"), sum(col("cnt")).over(wOrd).as("cum"),
      sum(col("cnt")).over(wAll).as("nr"))
      .agg(min(when(expr("cum >= (nr + 1) div 2"), col("g")))
        .as("median_days_to_second"))
    val tot = perUser.agg(count(lit(1)).as("n_purchasers"),
      sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_repeat"))
    tot.crossJoin(med)
      .select(col("n_purchasers"), col("n_repeat"),
        round(dbl(col("n_repeat")) / dbl(col("n_purchasers")), 6)
          .as("repeat_rate"),
        col("median_days_to_second"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_reorder" -> (qWinReorder _),
  )

  val sql: Map[String, String] = Map(
    "q_win_reorder" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |ranked AS (
        |  SELECT user_id, us,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS rk
        |  FROM p),
        |peruser AS (
        |  SELECT user_id,
        |    min(CASE WHEN rk = 1 THEN us END) AS t1,
        |    min(CASE WHEN rk = 2 THEN us END) AS t2
        |  FROM ranked WHERE rk <= 2 GROUP BY user_id),
        |gaps AS (
        |  SELECT (t2 - t1) // 86400000000 AS g
        |  FROM peruser WHERE t2 IS NOT NULL),
        |b AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
        |      FROM gaps GROUP BY g),
        |med AS (
        |  SELECT CAST(min(CASE WHEN cum >= (nr + 1) // 2 THEN g END)
        |    AS BIGINT) AS median_days_to_second
        |  FROM (SELECT g,
        |          sum(cnt) OVER (ORDER BY g
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS cum,
        |          sum(cnt) OVER () AS nr
        |        FROM b)),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_purchasers,
        |    CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_repeat
        |  FROM peruser)
        |SELECT n_purchasers, n_repeat,
        |  round(CAST(n_repeat AS DOUBLE) / CAST(n_purchasers AS DOUBLE), 6)
        |    AS repeat_rate,
        |  median_days_to_second
        |FROM tot, med""".stripMargin,
  )
}
