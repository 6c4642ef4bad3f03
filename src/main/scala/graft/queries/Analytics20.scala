package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twentieth wave: Kaplan–Meier survival of time-to-purchase
  * (the right-censoring-aware conversion curve — naive conversion
  * rates understate late converters), per-document n-gram novelty
  * (the memorization/freshness signal: how much of a doc is first-seen
  * content), and Cohen's d effect size (the magnitude report that
  * belongs next to q_agg_ttest's significance verdict).
  *
  * Scale notes:
  *  - KM: per-user first-passage times come from two user-keyed min
  *    aggregations (the q_win_funnel shape); censoring uses a 1-row
  *    broadcast max. The estimator itself runs on the BOUNDED distinct
  *    -duration table (≤ observation days), where partition-less
  *    cumulative windows are free (the q_agg_mannwhitney discipline).
  *    The product Π(1−d/n) is exp of a cumulative sum of round-9dp
  *    log terms — order-free and engine-portable.
  *  - Novelty: one gram-hash shuffle to per-gram first-owner, one
  *    shuffle join back (both sides gram-keyed — co-partitioned), one
  *    doc-keyed count. No broadcast assumption: the gram table scales
  *    with the corpus.
  *  - Cohen's d: two exact decimal moment rows, one fixed double
  *    tree. */
object Analytics20 {

  /** Kaplan–Meier estimator of days-to-first-purchase after first
    * signup, right-censored at the corpus's last event. */
  private def qAggSurvival(s: SparkSession, d: String): DataFrame = {
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
      .agg(sum(col("event")).as("dd"),
        sum(lit(1L) - col("event")).as("cc"))
    // bounded table (≤ observation days): partition-less windows are fine
    val wOrd = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("nn", sum(col("dd") + col("cc")).over(wAll))
      .withColumn("gone", coalesce(sum(col("dd") + col("cc")).over(wOrd),
        lit(0L)))
      .withColumn("n_risk", col("nn") - col("gone"))
      // a step where EVERYONE at risk converts sends S to exactly 0
      // (ln would blow up) — carry it as an absorbed flag instead
      .withColumn("term", when(col("dd") > 0 && col("dd") < col("n_risk"),
        expr("CAST(ROUND(ln(1.0 - CAST(dd AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9) " +
          "AS DECIMAL(28,9))")).otherwise(lit(0.0).cast("decimal(28,9)")))
      .withColumn("absorbed",
        sum(when(col("dd") === col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("lsum", sum(col("term")).over(wCum))
      .filter(col("dd") > 0)
      .select(col("t").as("t_days"), col("n_risk"), col("dd").as("d"),
        col("cc").as("c"),
        when(col("absorbed") >= 1, lit(0.0))
          .otherwise(round(exp(dbl(col("lsum"))), 6)).as("survival"))
      .orderBy(col("t_days"))
  }

  /** Per-doc 8-gram novelty: the fraction of a doc's gram positions
    * whose gram first appears in THIS doc (lowest doc_id owner). */
  private def qTextNovelty(s: SparkSession, d: String): DataFrame = {
    val grams = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 8), " +
          "i -> array_join(slice(ws, i + 1, 8), ' '))")).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("h"))
    val owner = grams.groupBy(col("h")).agg(min(col("doc_id")).as("own"))
    grams.join(owner.hint("shuffle_hash"), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("own") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(dbl(col("n_novel")) / dbl(col("n_grams")), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** Cohen's d effect size between click and view event values
    * (pooled-SD standardized mean difference). */
  private def qAggCohend(s: SparkSession, d: String): DataFrame = {
    val m = events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type").as("g"), dec(col("value")).as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("ssx"))
    val a = m.filter(col("g") === "click")
      .select(col("n").as("n1"), col("sx").as("s1"), col("ssx").as("q1"))
    val b = m.filter(col("g") === "view")
      .select(col("n").as("n2"), col("sx").as("s2"), col("ssx").as("q2"))
    val pooledSS =
      (dbl(col("q1")) - dbl(col("s1")) * dbl(col("s1")) / dbl(col("n1"))) +
        (dbl(col("q2")) - dbl(col("s2")) * dbl(col("s2")) / dbl(col("n2")))
    // one row per side or zero pooled variance ⇒ d undefined → NULL,
    // not an ANSI divide-by-zero
    a.crossJoin(b).select(col("n1"), col("n2"),
      when(col("n1") + col("n2") > 2 && pooledSS > 0,
        round((dbl(col("s1")) / dbl(col("n1"))
          - dbl(col("s2")) / dbl(col("n2"))) /
          sqrt(pooledSS / (dbl(col("n1")) + dbl(col("n2")) - 2.0)), 6))
        .as("cohen_d"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_survival" -> (qAggSurvival _),
    "q_text_novelty" -> (qTextNovelty _),
    "q_agg_cohend" -> (qAggCohend _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_survival" ->
      """WITH ev AS (
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
        |  SELECT t, dd, cc, CAST(nn - gone AS BIGINT) AS n_risk,
        |    CASE WHEN dd > 0 AND dd < nn - gone THEN
        |      CAST(ROUND(ln(1.0 - CAST(dd AS DOUBLE)
        |        / CAST(nn - gone AS DOUBLE)), 9) AS DECIMAL(28,9))
        |    ELSE CAST(0.0 AS DECIMAL(28,9)) END AS term
        |  FROM km),
        |curve AS (
        |  SELECT t, dd, cc, n_risk,
        |    CAST(sum(term) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(38,9)) AS lsum,
        |    sum(CASE WHEN dd = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS absorbed
        |  FROM terms)
        |SELECT t AS t_days, n_risk, dd AS d, cc AS c,
        |  CASE WHEN absorbed >= 1 THEN 0.0
        |       ELSE round(exp(CAST(lsum AS DOUBLE)), 6) END AS survival
        |FROM curve WHERE dd > 0 ORDER BY t_days""".stripMargin,
    "q_text_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        md5(array_to_string(
        |          ws[CAST(i AS INT)+1 : CAST(i AS INT)+8], ' ')) AS h
        |      FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 7)) AS i
        |            FROM w WHERE len(ws) >= 8)),
        |owner AS (SELECT h, min(doc_id) AS own FROM g GROUP BY h)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN own = doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  round(CAST(sum(CASE WHEN own = doc_id THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty
        |FROM g JOIN owner USING (h)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_agg_cohend" ->
      """WITH m AS (
        |  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))
        |      * CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS ssx
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY event_type),
        |a AS (SELECT n AS n1, sx AS s1, ssx AS q1 FROM m WHERE g = 'click'),
        |b AS (SELECT n AS n2, sx AS s2, ssx AS q2 FROM m WHERE g = 'view')
        |SELECT n1, n2,
        |  round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |    / sqrt(((CAST(q1 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      + (CAST(q2 AS DOUBLE)
        |        - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
        |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6)
        |    AS cohen_d
        |FROM a, b""".stripMargin,
  )
}
