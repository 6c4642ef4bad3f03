package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 ninth wave: Holt–Winters additive seasonal smoothing
  * (period 7) over each event type's daily count series — the
  * seasonality-aware upgrade of q_time_holt (level+trend) and
  * q_time_ema (level only), i.e. the standard short-term forecaster
  * for weekly-patterned operational metrics, reporting the final
  * level/trend state and 1-day / 7-day-ahead forecasts.
  *
  * Scale notes:
  *  - The recursion is inherently sequential per series, so it runs as
  *    the engine's sorted-fold discipline (q_time_holt): the fact
  *    table collapses to the calendar-bounded daily table in one
  *    map-side-combined aggregate, and the fold walks ≤ a few hundred
  *    elements per event type with a fixed 10-double state
  *    [l, b, s₀..s₆, pos].
  *  - α = β = γ = 1/2 keeps every smoothing product dyadic; the init
  *    (first-week mean level, week-over-week slope, first-cycle
  *    seasonals) divides exact integer sums. Both engines walk the
  *    IDENTICAL inlined update tree (one shared template rendered for
  *    each engine's element-access syntax), so the emitted doubles are
  *    bit-equal. The state is a flat DOUBLE array, never a struct
  *    (DuckDB v1.0 list_reduce mis-folds struct accumulators). */
object Analytics52 {

  /** Holt–Winters (additive, period 7, α=β=γ=1/2) over daily counts
    * per event type: final level, trend, and 1/7-day forecasts. */
  private def qTimeHoltwinters(s: SparkSession, d: String): DataFrame = {
    // Spark rendering of the update: element_at is 1-based like the
    // DuckDB subscript, so both engines index the state identically.
    val slot = "(CAST(element_at(acc, 10) AS INT) % 7)"
    val sOld = s"element_at(acc, 3 + $slot)"
    val yv = "element_at(x, 1)"
    val lNew = s"(0.5 * (($yv) - ($sOld)) " +
      "+ 0.5 * ((element_at(acc, 1)) + (element_at(acc, 2))))"
    val bNew = s"(0.5 * (($lNew) - (element_at(acc, 1))) " +
      "+ 0.5 * (element_at(acc, 2)))"
    val sNew = s"(0.5 * (($yv) - ($lNew)) + 0.5 * ($sOld))"
    val update = s"concat(array($lNew, $bNew), " +
      s"transform(sequence(0, 6), j -> CASE WHEN j = $slot THEN $sNew " +
      "ELSE element_at(acc, 3 + j) END), " +
      "array(element_at(acc, 10) + 1.0D))"
    events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("arr"))
      .filter(size(col("arr")) >= 14)
      .withColumn("w1", expr(
        """aggregate(transform(slice(arr, 1, 7),
          |  e -> CAST(e.c AS DOUBLE)), 0D, (a, p) -> a + p)"""
          .stripMargin))
      .withColumn("w2", expr(
        """aggregate(transform(slice(arr, 8, 7),
          |  e -> CAST(e.c AS DOUBLE)), 0D, (a, p) -> a + p)"""
          .stripMargin))
      .withColumn("l0", expr("w1 / 7.0"))
      .withColumn("b0", expr("(w2 - w1) / 49.0"))
      .withColumn("st", expr(
        s"""aggregate(
           |  transform(slice(arr, 8, size(arr) - 7),
           |    e -> array(CAST(e.c AS DOUBLE), 0D, 0D, 0D, 0D,
           |               0D, 0D, 0D, 0D, 0D)),
           |  concat(array(l0, b0),
           |    transform(sequence(1, 7),
           |      j -> CAST(element_at(arr, j).c AS DOUBLE) - l0),
           |    array(7.0D)),
           |  (acc, x) -> $update)""".stripMargin))
      .select(col("event_type"),
        size(col("arr")).cast("long").as("n_days"),
        round(expr("element_at(st, 1)"), 6).as("level"),
        round(expr("element_at(st, 2)"), 6).as("trend"),
        round(expr("element_at(st, 1) + element_at(st, 2) + " +
          "element_at(st, 3 + (CAST(element_at(st, 10) AS INT) % 7))"), 6)
          .as("fcst_1"),
        round(expr("element_at(st, 1) + 7.0 * element_at(st, 2) + " +
          "element_at(st, 3 + ((CAST(element_at(st, 10) AS INT) + 6) % 7))"
          ), 6).as("fcst_7"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_holtwinters" -> (qTimeHoltwinters _),
  )

  val sql: Map[String, String] = Map(
    "q_time_holtwinters" -> {
      // DuckDB rendering of the SAME update tree (1-based subscripts)
      val slot = "(CAST(acc[10] AS INT) % 7)"
      val sOld = s"acc[3 + $slot]"
      val yv = "x[1]"
      val lNew = s"(0.5 * (($yv) - ($sOld)) + 0.5 * ((acc[1]) + (acc[2])))"
      val bNew = s"(0.5 * (($lNew) - (acc[1])) + 0.5 * (acc[2]))"
      val sNew = s"(0.5 * (($yv) - ($lNew)) + 0.5 * ($sOld))"
      val update = s"list_concat(list_concat([$lNew, $bNew], " +
        s"list_transform(generate_series(0, 6), " +
        s"j -> CASE WHEN j = $slot THEN $sNew ELSE acc[3 + j] END)), " +
        "[acc[10] + 1.0])"
      s"""WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, list_sort(list({'day': day, 'c': c})) AS arr
        |  FROM daily GROUP BY 1 HAVING count(*) >= 14),
        |ini AS (
        |  SELECT event_type, arr, len(arr) AS nd,
        |    list_reduce(list_transform(arr[1:7],
        |      e -> CAST(e.c AS DOUBLE)), (a, b) -> a + b) / 7.0 AS l0,
        |    (list_reduce(list_transform(arr[8:14],
        |       e -> CAST(e.c AS DOUBLE)), (a, b) -> a + b)
        |     - list_reduce(list_transform(arr[1:7],
        |       e -> CAST(e.c AS DOUBLE)), (a, b) -> a + b)) / 49.0 AS b0
        |  FROM g),
        |f AS (
        |  SELECT event_type, nd,
        |    list_reduce(list_prepend(
        |      list_concat(list_concat([l0, b0],
        |        list_transform(generate_series(1, 7),
        |          j -> CAST(arr[j].c AS DOUBLE) - l0)), [7.0]),
        |      list_transform(arr[8:],
        |        e -> [CAST(e.c AS DOUBLE), 0.0, 0.0, 0.0, 0.0,
        |              0.0, 0.0, 0.0, 0.0, 0.0])),
        |      (acc, x) -> $update) AS st
        |  FROM ini)
        |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
        |  ROUND(st[1], 6) AS level, ROUND(st[2], 6) AS trend,
        |  ROUND(st[1] + st[2]
        |    + st[3 + (CAST(st[10] AS INT) % 7)], 6) AS fcst_1,
        |  ROUND(st[1] + 7.0 * st[2]
        |    + st[3 + ((CAST(st[10] AS INT) + 6) % 7)], 6) AS fcst_7
        |FROM f ORDER BY event_type""".stripMargin
    },
  )
}
