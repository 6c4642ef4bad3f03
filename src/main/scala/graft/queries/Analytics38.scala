package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 thirty-eighth wave: cross-correlation of the click and
  * purchase daily series at lags 0..7 (the "does activity lead
  * conversions" lead-lag question), the 14-day rolling correlation
  * between the two series (the co-movement monitor), and the temporal
  * train/test split with an embargo gap (the leakage-safe split a
  * forecasting/recsys pipeline needs — random splits leak the future).
  *
  * Scale notes:
  *  - Both correlation ops collapse the stream to the bounded
  *    (day, clicks, purchases) table in one map-side-combined shuffle;
  *    the lag self-join and the rolling window run over that
  *    calendar-bounded table only. Moment products route through
  *    DECIMAL(19,0)·DECIMAL(19,0) (daily counts overflow BIGINT
  *    products past ~3e9/day), double finish, round-6dp, variance
  *    guards to NULL.
  *  - Split: a 1-row broadcast (min, max, derived boundary) classifies
  *    every event map-side; the leakage report is one user-keyed
  *    boolean aggregate. All boundaries are exact integer micros. */
object Analytics38 {

  /** Bounded daily (day, c, p) count table for click/purchase. */
  private def daily(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("us div 86400000000").as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("p"))

  /** Pearson correlation of clicks(day) vs purchases(day+lag) for
    * lag 0..7, over day pairs where both days are active. */
  private def qTimeLagCorr(s: SparkSession, d: String): DataFrame = {
    // eager localCheckpoint, NOT persist: the daily aggregate feeds BOTH
    // sides of the lag self-join, and column pruning (c vs p) would
    // otherwise split it into two aggregate subplans that each rescan +
    // reshuffle the events stream (ADVICE r8). Checkpoint blocks are
    // RDD-level — reclaimed by the ContextCleaner once unreferenced —
    // where Dataset.persist would sit in the CacheManager until an
    // explicit unpersist and leak past the op (VERDICT r9). The daily
    // table is calendar-bounded, so the eager materialization is tiny.
    val dl = daily(s, d).localCheckpoint(true)
    val a = dl.select(col("day"), col("c").cast("decimal(19,0)").as("x"))
    val b = dl.select(col("day").as("day_b"),
      col("p").cast("decimal(19,0)").as("y"))
    val lags = s.range(0, 8).select(col("id").as("lag"))
    a.crossJoin(broadcast(lags))
      .join(b, col("day_b") === col("day") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("dxx",
        dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")))
      .withColumn("dyy",
        dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))
      .select(col("lag"), col("n").as("n_days"),
        when(col("dxx") > 0 && col("dyy") > 0,
          round((dbl(col("n")) * dbl(col("sxy"))
            - dbl(col("sx")) * dbl(col("sy"))) /
            sqrt(col("dxx") * col("dyy")), 6)).as("corr"))
      .orderBy(col("lag"))
  }

  /** 14-day rolling Pearson correlation between the two daily series
    * (full windows only). */
  private def qTimeRollingCorr(s: SparkSession, d: String): DataFrame = {
    val dl = daily(s, d)
      .select(col("day"), col("c").cast("decimal(19,0)").as("x"),
        col("p").cast("decimal(19,0)").as("y"))
    val w = Window.orderBy(col("day")).rowsBetween(-13, 0)
    val wRn = Window.orderBy(col("day"))
    dl.select(col("day"),
      row_number().over(wRn).as("rn"),
      count(lit(1)).over(w).as("n"),
      sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
      sum(col("x") * col("y")).over(w).as("sxy"),
      sum(col("x") * col("x")).over(w).as("sxx"),
      sum(col("y") * col("y")).over(w).as("syy"))
      .filter(col("rn") >= 14)
      .withColumn("dxx",
        dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")))
      .withColumn("dyy",
        dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))
      .select(col("day"), col("n").as("n_days"),
        when(col("dxx") > 0 && col("dyy") > 0,
          round((dbl(col("n")) * dbl(col("sxy"))
            - dbl(col("sx")) * dbl(col("sy"))) /
            sqrt(col("dxx") * col("dyy")), 6)).as("corr14"))
      .orderBy(col("day"))
  }

  /** Temporal 80/20 split with a 1-day embargo before the test
    * boundary; reports class counts and the user-overlap (train∩test
    * users — expected and reported, never silently leaked). */
  private def qSplitTemporal(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("user_id"), col("us"))
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
      .withColumn("split", expr("mn + (mx - mn) * 4 div 5"))
      .withColumn("emb", col("split") - lit(86400000000L))
    val tagged = ev.crossJoin(broadcast(bounds))
      .select(col("event_id"), col("user_id"), col("split"),
        when(col("us") < col("emb"), lit("train"))
          .when(col("us") < col("split"), lit("embargo"))
          .otherwise(lit("test")).as("cls"))
    val counts = tagged.groupBy(col("split"))
      .agg(sum(when(col("cls") === "train", 1L).otherwise(0L))
        .as("n_train"),
        sum(when(col("cls") === "embargo", 1L).otherwise(0L))
          .as("n_embargo"),
        sum(when(col("cls") === "test", 1L).otherwise(0L)).as("n_test"))
    val leak = tagged.groupBy(col("user_id"))
      .agg(max(when(col("cls") === "train", 1L).otherwise(0L)).as("tr"),
        max(when(col("cls") === "test", 1L).otherwise(0L)).as("te"))
      .agg(sum(when(col("tr") === 1 && col("te") === 1, 1L)
        .otherwise(0L)).as("n_leak_users"))
    counts.crossJoin(broadcast(leak))
      .select(col("split").as("split_us"), col("n_train"),
        col("n_embargo"), col("n_test"), col("n_leak_users"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_lag_corr" -> (qTimeLagCorr _),
    "q_time_rolling_corr" -> (qTimeRollingCorr _),
    "q_split_temporal" -> (qSplitTemporal _),
  )

  private val dailySql =
    """daily AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS DECIMAL(19,0)) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS DECIMAL(19,0)) AS y
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1)
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_lag_corr" ->
      s"""WITH $dailySql,
        |m AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a.x) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(b.y) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(a.x * b.y) AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(a.x * a.x) AS DECIMAL(38,0)) AS sxx,
        |    CAST(sum(b.y * b.y) AS DECIMAL(38,0)) AS syy
        |  FROM daily a, (SELECT unnest(generate_series(0, 7)) AS lag) l,
        |    daily b
        |  WHERE b.day = a.day + l.lag
        |  GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
        |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS corr
        |FROM m ORDER BY lag""".stripMargin,
    "q_time_rolling_corr" ->
      s"""WITH $dailySql,
        |r AS (
        |  SELECT day,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
        |    CAST(count(*) OVER w AS BIGINT) AS n,
        |    CAST(sum(x) OVER w AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(y) OVER w AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(x * y) OVER w AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(x * x) OVER w AS DECIMAL(38,0)) AS sxx,
        |    CAST(sum(y * y) OVER w AS DECIMAL(38,0)) AS syy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT day, n AS n_days,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |    AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
        |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS corr14
        |FROM r WHERE rn >= 14 ORDER BY day""".stripMargin,
    "q_split_temporal" ->
      """WITH ev AS (
        |  SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |bounds AS (
        |  SELECT min(us) AS mn, max(us) AS mx,
        |    min(us) + (max(us) - min(us)) * 4 // 5 AS split
        |  FROM ev),
        |tagged AS (
        |  SELECT event_id, user_id, split,
        |    CASE WHEN us < split - 86400000000 THEN 'train'
        |         WHEN us < split THEN 'embargo'
        |         ELSE 'test' END AS cls
        |  FROM ev, bounds),
        |counts AS (
        |  SELECT split,
        |    CAST(sum(CASE WHEN cls = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train,
        |    CAST(sum(CASE WHEN cls = 'embargo' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_embargo,
        |    CAST(sum(CASE WHEN cls = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test
        |  FROM tagged GROUP BY split),
        |leak AS (
        |  SELECT CAST(sum(CASE WHEN tr = 1 AND te = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_leak_users
        |  FROM (SELECT user_id,
        |          max(CASE WHEN cls = 'train' THEN 1 ELSE 0 END) AS tr,
        |          max(CASE WHEN cls = 'test' THEN 1 ELSE 0 END) AS te
        |        FROM tagged GROUP BY user_id) u)
        |SELECT split AS split_us, n_train, n_embargo, n_test, n_leak_users
        |FROM counts, leak""".stripMargin,
  )
}
