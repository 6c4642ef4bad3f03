package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 eighth wave: survival summary statistics, the ordered
  * trend test, and the error-safe function family —
  *
  *  - q_agg_survmedian: the KM curve (q_agg_survival's exact
  *    construction) reduced to the numbers a dashboard quotes —
  *    quartile crossing times (first day S ≤ .75/.5/.25, NULL if the
  *    curve never reaches) and the restricted mean survival time
  *    (∫S dt to the last event day, the step-function integral);
  *  - q_agg_trendtest: Cochran–Armitage test for a linear trend in
  *    purchase share across ordered value deciles — the dose-response
  *    z the unordered chi-square (q_agg_chisq) cannot see;
  *  - q_fn_try: the error-safe function family — try_divide /
  *    try_cast with NULL-on-failure semantics aggregated per order
  *    priority, the ANSI-mode-safe idiom for dirty columns.
  *
  * Scale: survmedian runs entirely on the day-bounded KM curve;
  * trendtest is one 10-bin grid pass; try is map-only expressions
  * into one aggregate. */
object Analytics82 {

  /** (t, dd, cc) + KM survival per event day — q_agg_survival's exact
    * discipline (shared derivation, same determinism). */
  private def kmCurve(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val s0 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
    val p1 = ev.filter(col("event_type") === "purchase")
      .join(s0.hint("shuffle_hash"), Seq("user_id"))
      .filter(col("us") >= col("t0"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val maxUs = ev.agg(max(col("us")).as("mx"))
    val durations = s0.join(p1, Seq("user_id"), "left")
      .crossJoin(broadcast(maxUs))
      .select(
        when(col("t1").isNotNull, expr("(t1 - t0) div 86400000000"))
          .otherwise(expr("(mx - t0) div 86400000000")).as("t"),
        when(col("t1").isNotNull, 1L).otherwise(0L).as("event"))
    val byT = durations.groupBy(col("t"))
      .agg(sum(col("event")).as("dd"), sum(lit(1L) - col("event")).as("cc"))
    val wOrd = Window.orderBy(col("t")).rowsBetween(
      Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("t")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t")).rowsBetween(
      Window.unboundedPreceding, 0)
    byT
      .withColumn("nn", sum(col("dd") + col("cc")).over(wAll))
      .withColumn("gone", coalesce(sum(col("dd") + col("cc")).over(wOrd),
        lit(0L)))
      .withColumn("n_risk", col("nn") - col("gone"))
      .withColumn("term", when(col("dd") > 0 && col("dd") < col("n_risk"),
        expr("CAST(ROUND(ln(1.0 - CAST(dd AS DOUBLE) " +
          "/ CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(28,9))"))
        .otherwise(lit(0.0).cast("decimal(28,9)")))
      .withColumn("absorbed",
        sum(when(col("dd") === col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("lsum", sum(col("term")).over(wCum))
      .filter(col("dd") > 0)
      .select(col("t"), col("nn"),
        when(col("absorbed") >= 1, 0.0)
          .otherwise(expr("round(exp(CAST(lsum AS DOUBLE)), 6)"))
          .as("surv"))
  }

  /** KM quartile crossings + restricted mean survival time. */
  private def qAggSurvmedian(s: SparkSession, d: String): DataFrame = {
    val wNext = Window.orderBy(col("t"))
    // step integral: the first segment [0, t_first) rides S = 1, each
    // event day's S carries to the next event day, the last to horizon.
    // The windows run BEFORE the checkpoint so they sit above the KM
    // aggregate (the WindowAuditSpec bounded-input witness); the
    // checkpointed SEGMENT table then feeds its three consumers.
    val seg = kmCurve(s, d)
      .withColumn("tn", coalesce(lead(col("t"), 1).over(wNext),
        max(col("t")).over(Window.orderBy(col("t")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing))))
      .withColumn("piece", expr(
        "CAST(ROUND(surv * CAST(tn - t AS DOUBLE), 6) AS DECIMAL(28,6))"))
      .localCheckpoint(true)
    val horizon = seg.agg(max(col("t")).as("h"))
    val first = seg.agg(min(col("t")).as("tf"))
    seg.agg(
        max(col("nn")).as("n_users"),
        min(when(col("surv") <= 0.75, col("t"))).as("t25"),
        min(when(col("surv") <= 0.5, col("t"))).as("median"),
        min(when(col("surv") <= 0.25, col("t"))).as("t75"),
        sum(col("piece")).as("tail6"))
      .crossJoin(broadcast(first)).crossJoin(broadcast(horizon))
      .select(col("n_users"), col("t25"), col("median"), col("t75"),
        expr("ROUND(CAST(tf AS DOUBLE) + CAST(tail6 AS DOUBLE), 6)")
          .as("rmst_days"),
        col("h").as("horizon_days"))
  }

  /** Cochran–Armitage linear trend in purchase share across deciles. */
  private def qAggTrendtest(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(least(floor(least(value, 100.0) / 10.0), 9.0) " +
        "AS BIGINT)").as("si"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("si"))
      .agg(count(lit(1)).as("ni"), sum(col("y")).as("ki"))
    g.agg(sum(col("ni")).as("n"), sum(col("ki")).as("k"),
        sum(col("ki") * col("si")).as("sks"),
        sum(col("ni") * col("si")).as("sns"),
        sum(col("ni") * col("si") * col("si")).as("snss"))
      .withColumn("pbar", expr("CAST(k AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("tt", expr(
        "CAST(sks AS DOUBLE) - pbar * CAST(sns AS DOUBLE)"))
      .withColumn("vv", expr(
        "pbar * (1.0 - pbar) * (CAST(snss AS DOUBLE) " +
          "- CAST(sns AS DOUBLE) * CAST(sns AS DOUBLE) / CAST(n AS DOUBLE))"))
      .select(col("n"), col("k"), expr("ROUND(pbar, 6)").as("p_overall"),
        expr("ROUND(tt, 6)").as("t_stat"),
        expr("CASE WHEN vv > 0 THEN ROUND(tt / sqrt(vv), 4) END").as("z"))
  }

  /** Error-safe functions per order priority. */
  private def qFnTry(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_orderpriority"),
        expr("try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE))")
          .as("dv"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("c1"),
        expr("try_cast(o_orderpriority AS INT)").as("cfull"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dv").isNull, 1L).otherwise(0L)).as("n_div_null"),
        sum(expr("CAST(ROUND(coalesce(dv, 0.0), 4) AS DECIMAL(38,4))"))
          .as("sdv6"),
        max(col("c1")).as("prio_digit"),
        sum(when(col("cfull").isNull, 1L).otherwise(0L)).as("n_cast_null"))
      .select(col("o_orderpriority"), col("n"), col("n_div_null"),
        expr("ROUND(CAST(sdv6 AS DOUBLE), 4)").as("sum_div"),
        col("prio_digit"), col("n_cast_null"))
      .orderBy(col("o_orderpriority"))

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_survmedian" -> (qAggSurvmedian _),
    "q_agg_trendtest" -> (qAggTrendtest _),
    "q_fn_try" -> (qFnTry _),
  )

  private val kmSql =
    """ev AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |s0 AS (SELECT user_id, min(us) AS t0 FROM ev
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |p1 AS (SELECT ev.user_id, min(us) AS t1
      |       FROM ev JOIN s0 USING (user_id)
      |       WHERE event_type = 'purchase' AND us >= t0
      |       GROUP BY ev.user_id),
      |mx AS (SELECT max(us) AS mx FROM ev),
      |durations AS (
      |  SELECT CASE WHEN t1 IS NOT NULL THEN (t1 - t0) // 86400000000
      |              ELSE (mx - t0) // 86400000000 END AS t,
      |    CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS event
      |  FROM s0 LEFT JOIN p1 USING (user_id), mx),
      |byt AS (SELECT t, CAST(sum(event) AS BIGINT) AS dd,
      |          CAST(sum(1 - event) AS BIGINT) AS cc
      |        FROM durations GROUP BY t),
      |km AS (
      |  SELECT t, dd, cc,
      |    sum(dd + cc) OVER () AS nn,
      |    COALESCE(sum(dd + cc) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS gone
      |  FROM byt),
      |terms AS (
      |  SELECT t, dd, cc, nn, CAST(nn - gone AS BIGINT) AS n_risk,
      |    CASE WHEN dd > 0 AND dd < nn - gone THEN
      |      CAST(ROUND(ln(1.0 - CAST(dd AS DOUBLE)
      |        / CAST(nn - gone AS DOUBLE)), 9) AS DECIMAL(28,9))
      |    ELSE CAST(0.0 AS DECIMAL(28,9)) END AS term
      |  FROM km),
      |curve AS (
      |  SELECT t, CAST(nn AS BIGINT) AS nn,
      |    CASE WHEN sum(CASE WHEN dd = n_risk THEN 1 ELSE 0 END)
      |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |          AND CURRENT ROW) >= 1 THEN 0.0
      |      ELSE round(exp(CAST(CAST(sum(term) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |        AS DECIMAL(38,9)) AS DOUBLE)), 6) END AS surv,
      |    dd
      |  FROM terms)
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_survmedian" ->
      s"""WITH $kmSql,
        |ec AS (SELECT t, nn, surv FROM curve WHERE dd > 0),
        |seg AS (
        |  SELECT t, nn, surv,
        |    COALESCE(lead(t) OVER (ORDER BY t), max(t) OVER ()) AS tn
        |  FROM ec),
        |agg AS (
        |  SELECT CAST(max(nn) AS BIGINT) AS n_users,
        |    min(CASE WHEN surv <= 0.75 THEN t END) AS t25,
        |    min(CASE WHEN surv <= 0.5 THEN t END) AS median,
        |    min(CASE WHEN surv <= 0.25 THEN t END) AS t75,
        |    sum(CAST(ROUND(surv * CAST(tn - t AS DOUBLE), 6)
        |      AS DECIMAL(28,6))) AS tail6
        |  FROM seg),
        |f AS (SELECT min(t) AS tf FROM ec),
        |h AS (SELECT max(t) AS h FROM ec)
        |SELECT n_users, t25, median, t75,
        |  ROUND(CAST(tf AS DOUBLE) + CAST(tail6 AS DOUBLE), 6)
        |    AS rmst_days,
        |  h AS horizon_days
        |FROM agg CROSS JOIN f CROSS JOIN h""".stripMargin,
    "q_agg_trendtest" ->
      """WITH g AS (
        |  SELECT CAST(least(floor(least(value, 100.0) / 10.0), 9.0)
        |      AS BIGINT) AS si,
        |    CAST(count(*) AS BIGINT) AS ni,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ki
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |m AS (
        |  SELECT sum(ni) AS n, sum(ki) AS k,
        |    sum(ki * si) AS sks, sum(ni * si) AS sns,
        |    sum(ni * si * si) AS snss
        |  FROM g),
        |f AS (
        |  SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS pbar,
        |    CAST(sks AS DOUBLE) - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |      * CAST(sns AS DOUBLE) AS tt,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(snss AS DOUBLE)
        |         - CAST(sns AS DOUBLE) * CAST(sns AS DOUBLE)
        |           / CAST(n AS DOUBLE)) AS vv
        |  FROM m)
        |SELECT n, k, ROUND(pbar, 6) AS p_overall, ROUND(tt, 6) AS t_stat,
        |  CASE WHEN vv > 0 THEN ROUND(tt / sqrt(vv), 4) END AS z
        |FROM f""".stripMargin,
    "q_fn_try" ->
      """WITH x AS (
        |  SELECT o_orderpriority,
        |    CASE WHEN o_custkey % 3 = 0 THEN NULL
        |      ELSE o_totalprice / CAST(o_custkey % 3 AS DOUBLE) END AS dv,
        |    TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS c1,
        |    TRY_CAST(o_orderpriority AS INT) AS cfull
        |  FROM orders)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN dv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_div_null,
        |  ROUND(CAST(sum(CAST(ROUND(coalesce(dv, 0.0), 4)
        |    AS DECIMAL(38,4))) AS DOUBLE), 4) AS sum_div,
        |  max(c1) AS prio_digit,
        |  CAST(sum(CASE WHEN cfull IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_cast_null
        |FROM x GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
