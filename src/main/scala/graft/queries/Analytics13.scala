package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirteenth wave: the weekly cohort-retention matrix (the
  * product-analytics staple), funnel step-latency percentiles (how LONG
  * conversions take, the companion to q_win_funnel's how MANY), and
  * deterministic contrastive negative sampling over embeddings (the
  * training-pair generator).
  *
  * Scale notes:
  *  - Cohort: one distinct on (user, week), one user-keyed min, one
  *    co-partitioned join back (no second shuffle — same key), one
  *    (cohort, offset) count; cohort sizes broadcast. Retention ratios
  *    are exact-integer cross-divisions.
  *  - Latency percentiles run on SECOND-bucketed latency count tables
  *    (time-range-bounded), never a global sort of raw latencies — the
  *    q_agg_mannwhitney discipline: the stream shuffles once to
  *    user-keyed mins, once to the bounded bucket table; the
  *    median/p90 picks are exact integer threshold scans.
  *  - Negatives: the probe set broadcasts against the corpus (the
  *    cosine-top-k funnel shape); ranking is md5-uniform so both
  *    engines draw the same "random" negatives with zero shared state. */
object Analytics13 {

  /** Weekly cohort retention: users bucketed by first-activity week,
    * (cohort_week, weeks-since) active-user counts + retention share. */
  private def qWinCohort(s: SparkSession, d: String): DataFrame = {
    val uw = events(s, d)
      .select(col("user_id"), expr("us div 604800000000").as("wk"))
      .distinct()
    val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    val sizes = cohort.groupBy(col("cw")).agg(count(lit(1)).as("sz"))
    uw.join(cohort, Seq("user_id")) // co-partitioned on user_id
      .groupBy(col("cw").as("cohort_week"),
        (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes.withColumnRenamed("cw", "cohort_week")),
        Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        round(dbl(col("n_active")) / dbl(col("sz")), 6).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Funnel step latency: per-user signup→click and click→purchase
    * first-passage times, reported as discrete median / p90 seconds
    * from the bounded second-bucket count table. */
  private def qTimeFunnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"), col("us"))
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
    val c1 = ev.filter(col("event_type") === "click")
      .join(s0, Seq("user_id")).filter(col("us") >= col("t0"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("t1"), min(col("t0")).as("t0"))
    val p2 = ev.filter(col("event_type") === "purchase")
      .join(c1, Seq("user_id")).filter(col("us") >= col("t1"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("t2"), min(col("t1")).as("t1"))
    val lat = c1.select(lit("1_signup_to_click").as("step"),
      expr("(t1 - t0) div 1000000").as("sec"))
      .union(p2.select(lit("2_click_to_purchase").as("step"),
        expr("(t2 - t1) div 1000000").as("sec")))
    val b = lat.groupBy(col("step"), col("sec")).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.partitionBy(col("step")).orderBy(col("sec"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("step"))
    b.withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .groupBy(col("step"))
      .agg(max(col("n")).as("n_users"),
        min(when(expr("cum >= (n + 1) div 2"), col("sec")))
          .as("median_sec"),
        min(when(expr("cum >= (9 * n + 9) div 10"), col("sec")))
          .as("p90_sec"))
      .orderBy(col("step"))
  }

  /** Deterministic contrastive negatives: for each probe (vec_id < 20),
    * the 4 md5-uniform-ranked corpus vectors with a DIFFERENT label —
    * the in-batch-random negative generator, engine-portable. */
  private def qSampleNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings").select(col("vec_id"), col("label"))
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("p"), col("label").as("plabel"))
    val win = Window.partitionBy(col("p")).orderBy(col("r"), col("c"))
    emb.select(col("vec_id").as("c"), col("label").as("clabel"))
      .crossJoin(broadcast(probes))
      .filter(col("clabel") =!= col("plabel"))
      .withColumn("r", md5(concat(col("p").cast("string"), lit("_"),
        col("c").cast("string"))))
      .withColumn("rk", row_number().over(win))
      .filter(col("rk") <= 4)
      .select(col("p").as("vec_id"), col("c").as("neg_id"), col("rk"))
      .orderBy(col("vec_id"), col("rk"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_cohort" -> (qWinCohort _),
    "q_time_funnel_latency" -> (qTimeFunnelLatency _),
    "q_sample_negatives" -> (qSampleNegatives _),
  )

  val sql: Map[String, String] = Map(
    "q_win_cohort" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, CAST(min(wk) AS BIGINT) AS cw
        |           FROM uw GROUP BY user_id),
        |sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS sz
        |          FROM cohort GROUP BY cw),
        |act AS (
        |  SELECT cohort.cw AS cohort_week, uw.wk - cohort.cw AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM uw JOIN cohort ON uw.user_id = cohort.user_id
        |  GROUP BY 1, 2)
        |SELECT act.cohort_week, act.week_offset, act.n_active,
        |  round(CAST(n_active AS DOUBLE) / CAST(sz AS DOUBLE), 6)
        |    AS retention
        |FROM act JOIN sizes ON act.cohort_week = sizes.cw
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_time_funnel_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
        |  FROM events),
        |s0 AS (SELECT user_id, CAST(min(us) AS BIGINT) AS t0
        |       FROM ev WHERE event_type = 'signup' GROUP BY user_id),
        |c1 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t1,
        |         CAST(min(s0.t0) AS BIGINT) AS t0
        |       FROM ev JOIN s0 ON ev.user_id = s0.user_id
        |       WHERE ev.event_type = 'click' AND ev.us >= s0.t0
        |       GROUP BY ev.user_id),
        |p2 AS (SELECT ev.user_id, CAST(min(ev.us) AS BIGINT) AS t2,
        |         CAST(min(c1.t1) AS BIGINT) AS t1
        |       FROM ev JOIN c1 ON ev.user_id = c1.user_id
        |       WHERE ev.event_type = 'purchase' AND ev.us >= c1.t1
        |       GROUP BY ev.user_id),
        |lat AS (
        |  SELECT '1_signup_to_click' AS step, (t1 - t0) // 1000000 AS sec
        |  FROM c1
        |  UNION ALL
        |  SELECT '2_click_to_purchase', (t2 - t1) // 1000000 FROM p2),
        |b AS (SELECT step, sec, CAST(count(*) AS BIGINT) AS cnt
        |      FROM lat GROUP BY step, sec),
        |cum AS (
        |  SELECT step, sec,
        |    CAST(sum(cnt) OVER (PARTITION BY step ORDER BY sec
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY step) AS BIGINT) AS n
        |  FROM b)
        |SELECT step, max(n) AS n_users,
        |  CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN sec END)
        |    AS BIGINT) AS median_sec,
        |  CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN sec END)
        |    AS BIGINT) AS p90_sec
        |FROM cum GROUP BY step ORDER BY step""".stripMargin,
    "q_sample_negatives" ->
      """WITH probes AS (
        |  SELECT vec_id AS p, label AS plabel FROM embeddings
        |  WHERE vec_id < 20),
        |ranked AS (
        |  SELECT probes.p, e.vec_id AS c,
        |    ROW_NUMBER() OVER (PARTITION BY probes.p
        |      ORDER BY md5(probes.p || '_' || e.vec_id), e.vec_id)
        |      AS rk
        |  FROM embeddings e CROSS JOIN probes
        |  WHERE e.label <> probes.plabel)
        |SELECT p AS vec_id, c AS neg_id, CAST(rk AS INT) AS rk
        |FROM ranked WHERE rk <= 4
        |ORDER BY vec_id, rk""".stripMargin,
  )
}
