package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-third wave: difference-in-differences (the quasi-
  * experimental estimator for "did the signup cohort's engagement
  * change MORE than the baseline's"), the day-of-week × hour-of-day
  * calendar grid (the ops-dashboard heatmap), and the ANN recall
  * report (the index that ships with its own quality evaluation).
  *
  * Scale notes:
  *  - DiD: the treatment roster is a user-keyed semi-style flag join
  *    (shuffle_hash — user counts scale with the corpus), the time
  *    split is a 1-row broadcast midpoint, and the estimator is a
  *    fixed double tree over four exact decimal cell means.
  *  - Calendar: one shuffle to the bounded 168-cell grid; shares are
  *    exact-count ratios against a broadcast total.
  *  - Recall: composes the PRODUCTION operators (exact cosine top-k
  *    and the IVF index) and joins their k-row-per-probe outputs —
  *    the evaluation costs two index queries, not a new corpus scan.
  *    Approximate input → no SQL oracle; the spec pins the exact
  *    recall value on the deterministic synthetic corpus. */
object Analytics23 {

  /** DiD of click value: signup users (treated) vs never-signed-up,
    * pre/post the corpus time midpoint. */
  private def qAggDid(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val treat = ev.filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().withColumn("treated", lit(1L))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), dec(col("value")).as("x"))
    // div (integer floor), matching DuckDB's //: double / + cast("long")
    // truncates on Spark but rounds on DuckDB for odd min+max sums.
    val mid = clicks.agg(
      expr("(min(us) + max(us)) div 2").cast("long").as("mid"))
    val cells = clicks
      .join(treat.hint("shuffle_hash"), Seq("user_id"), "left")
      .crossJoin(broadcast(mid))
      .select(coalesce(col("treated"), lit(0L)).as("tr"),
        when(col("us") >= col("mid"), lit(1L)).otherwise(lit(0L)).as("post"),
        col("x"))
      .groupBy(col("tr"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val m = cells.agg(
      sum(when(col("tr") === 1 && col("post") === 0, col("n"))).as("n_t_pre"),
      sum(when(col("tr") === 1 && col("post") === 1, col("n"))).as("n_t_post"),
      sum(when(col("tr") === 0 && col("post") === 0, col("n"))).as("n_c_pre"),
      sum(when(col("tr") === 0 && col("post") === 1, col("n"))).as("n_c_post"),
      sum(when(col("tr") === 1 && col("post") === 0, col("sx"))).as("s_t_pre"),
      sum(when(col("tr") === 1 && col("post") === 1, col("sx"))).as("s_t_post"),
      sum(when(col("tr") === 0 && col("post") === 0, col("sx"))).as("s_c_pre"),
      sum(when(col("tr") === 0 && col("post") === 1, col("sx"))).as("s_c_post"))
    m.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
      round((dbl(col("s_t_post")) / dbl(col("n_t_post"))
        - dbl(col("s_t_pre")) / dbl(col("n_t_pre")))
        - (dbl(col("s_c_post")) / dbl(col("n_c_post"))
          - dbl(col("s_c_pre")) / dbl(col("n_c_pre"))), 6).as("did"))
  }

  /** Day-of-week (Mon=0) × hour-of-day activity grid with share of
    * total — the ops heatmap. */
  private def qTimeCalendar(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d)
      .select(expr("CAST((us div 86400000000 + 3) % 7 AS INT)").as("dow"),
        expr("CAST((us div 3600000000) % 24 AS INT)").as("hod"))
      .groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n"))
    val tot = g.agg(sum(col("n")).as("nn"))
    g.crossJoin(broadcast(tot))
      .select(col("dow"), col("hod"), col("n"),
        round(dbl(col("n")) / dbl(col("nn")), 6).as("share"))
      .orderBy(col("dow"), col("hod"))
  }

  /** Recall@3 of the IVF index against the exact cosine baseline,
    * per probe label — the index's built-in quality report. */
  private def qSimRecall(s: SparkSession, d: String): DataFrame = {
    val exact = LlmSim.defs("q_sim_cosine_topk")(s, d)
      .filter(col("rn") <= 3)
      .select(col("label"), col("vec_id"))
    val approx = LlmSim.defs("q_sim_ann_ivf")(s, d)
      .select(col("label").as("a_label"), col("vec_id").as("a_vec"))
    exact
      .join(approx, col("label") === col("a_label") &&
        col("vec_id") === col("a_vec"), "left_semi")
      .groupBy(col("label")).agg(count(lit(1)).as("n_hit"))
      .select(col("label"), lit(3L).as("k"), col("n_hit"),
        round(dbl(col("n_hit")) / 3.0, 6).as("recall"))
      .orderBy(col("label"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_did" -> (qAggDid _),
    "q_time_calendar" -> (qTimeCalendar _),
    "q_sim_recall" -> (qSimRecall _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_did" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        |  FROM events),
        |treat AS (SELECT DISTINCT user_id FROM ev
        |          WHERE event_type = 'signup'),
        |clicks AS (
        |  SELECT ev.user_id, us,
        |    CAST(value AS DECIMAL(18,4)) AS x,
        |    CASE WHEN treat.user_id IS NOT NULL THEN 1 ELSE 0 END AS tr
        |  FROM ev LEFT JOIN treat ON ev.user_id = treat.user_id
        |  WHERE event_type = 'click'),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid
        |        FROM clicks),
        |cells AS (
        |  SELECT tr, CASE WHEN us >= mid THEN 1 ELSE 0 END AS post,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DECIMAL(38,4)) AS sx
        |  FROM clicks, mid GROUP BY 1, 2)
        |SELECT
        |  CAST(sum(CASE WHEN tr=1 AND post=0 THEN n END) AS BIGINT)
        |    AS n_t_pre,
        |  CAST(sum(CASE WHEN tr=1 AND post=1 THEN n END) AS BIGINT)
        |    AS n_t_post,
        |  CAST(sum(CASE WHEN tr=0 AND post=0 THEN n END) AS BIGINT)
        |    AS n_c_pre,
        |  CAST(sum(CASE WHEN tr=0 AND post=1 THEN n END) AS BIGINT)
        |    AS n_c_post,
        |  round((CAST(sum(CASE WHEN tr=1 AND post=1 THEN sx END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN tr=1 AND post=1 THEN n END) AS DOUBLE)
        |     - CAST(sum(CASE WHEN tr=1 AND post=0 THEN sx END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN tr=1 AND post=0 THEN n END) AS DOUBLE))
        |    - (CAST(sum(CASE WHEN tr=0 AND post=1 THEN sx END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN tr=0 AND post=1 THEN n END) AS DOUBLE)
        |     - CAST(sum(CASE WHEN tr=0 AND post=0 THEN sx END) AS DOUBLE)
        |       / CAST(sum(CASE WHEN tr=0 AND post=0 THEN n END) AS DOUBLE)),
        |    6) AS did
        |FROM cells""".stripMargin,
    "q_time_calendar" ->
      """WITH g AS (
        |  SELECT CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 3)
        |      % 7 AS INT) AS dow,
        |    CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
        |      % 24 AS INT) AS hod,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g)
        |SELECT dow, hod, n,
        |  round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS share
        |FROM g, tot ORDER BY dow, hod""".stripMargin,
    // q_sim_recall: approximate input (IVF) → no SQL oracle; pinned by
    // Analytics23Spec on the deterministic synthetic corpus.
  )
}
