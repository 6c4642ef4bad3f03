package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-ninth wave: the language-ID confusion matrix (the
  * classifier that ships with its own evaluation — the q_sim_recall
  * pattern applied to q_text_langid), the cohort LTV curve (cumulative
  * revenue per user by cohort age — THE growth-analytics chart), and
  * the basket-size distribution (items per order — the order-shape
  * report behind picking and pricing).
  *
  * Scale notes:
  *  - Confusion composes the PRODUCTION langid operator and reduces
  *    its per-doc output to the bounded lang×pred grid — evaluation
  *    costs one classifier run plus a grid count.
  *  - LTV: one (user, week) revenue shuffle joined co-partitioned to
  *    the user's cohort week, then a cumulative window over the
  *    bounded (cohort, age) grid; sums stay exact DECIMAL until the
  *    final per-user division.
  *  - Basket size: one order-keyed count, one bounded histogram
  *    shuffle. */
object Analytics29 {

  /** Confusion matrix + per-language recall of the trigram/stopword
    * language-ID heuristic against the labeled corpus. */
  private def qTextLangidConfusion(s: SparkSession, d: String): DataFrame = {
    val scored = LlmText.defs("q_text_langid")(s, d)
      .select(col("lang"), col("pred"))
    val grid = scored.groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang"))
    grid
      .withColumn("lang_total", sum(col("n")).over(w))
      .select(col("lang"), col("pred"), col("n"),
        round(dbl(col("n")) / dbl(col("lang_total")), 6).as("share"))
      .orderBy(col("lang"), col("pred"))
  }

  /** Cohort LTV: cumulative purchase revenue per user by weeks since
    * the cohort's first activity. */
  private def qTimeLtv(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val cohort = ev.groupBy(col("user_id"))
      .agg(expr("min(us div 604800000000)").as("cw"))
    val sizes = cohort.groupBy(col("cw")).agg(count(lit(1)).as("sz"))
    val weekRev = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("us div 604800000000").as("wk"),
        dec(col("value")).as("v"))
      .groupBy(col("user_id"), col("wk")).agg(sum(col("v")).as("rev"))
    val aged = weekRev.join(cohort, Seq("user_id")) // co-partitioned
      .groupBy(col("cw"), (col("wk") - col("cw")).as("age"))
      .agg(sum(col("rev")).as("rev"))
    val wCum = Window.partitionBy(col("cw")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, 0)
    aged
      .withColumn("cum_rev", sum(col("rev")).over(wCum))
      .join(broadcast(sizes), Seq("cw"))
      .select(col("cw").as("cohort_week"), col("age").as("age_weeks"),
        col("sz").as("cohort_users"),
        round(dbl(col("cum_rev")) / dbl(col("sz")), 6).as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("age_weeks"))
  }

  /** Basket-size distribution: orders per item-count bucket plus the
    * overall average basket. */
  private def qWinBasket(s: SparkSession, d: String): DataFrame = {
    val sizes = t(s, d, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    val hist = sizes.groupBy(col("n_items")).agg(count(lit(1)).as("n_orders"))
    val tot = sizes.agg(count(lit(1)).as("no"), sum(col("n_items")).as("ni"))
    hist.crossJoin(broadcast(tot))
      .select(col("n_items"), col("n_orders"),
        round(dbl(col("n_orders")) / dbl(col("no")), 6).as("share"),
        round(dbl(col("ni")) / dbl(col("no")), 6).as("avg_basket"))
      .orderBy(col("n_items"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_langid_confusion" -> (qTextLangidConfusion _),
    "q_time_ltv" -> (qTimeLtv _),
    "q_win_basket" -> (qWinBasket _),
  )

  val sql: Map[String, String] = Map(
    // q_text_langid_confusion mirrors q_text_langid's stopword-count
    // argmax (en/es/de profiles, ties broken en < es < de by the
    // greatest() chain), then reduces to the lang×pred grid.
    "q_text_langid_confusion" ->
      """WITH hits AS (
        |  SELECT lang,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('the','of','and','a','to','in','is'))) AS en_n,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('el','la','de','que','y','los','un'))) AS es_n,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('der','die','und','das','ist','ein','zu'))) AS de_n
        |  FROM documents),
        |scored AS (
        |  SELECT lang,
        |    CASE WHEN en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred
        |  FROM hits),
        |grid AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
        |         FROM scored GROUP BY lang, pred)
        |SELECT lang, pred, n,
        |  round(CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
        |FROM grid ORDER BY lang, pred""".stripMargin,
    "q_time_ltv" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, CAST(min(wk) AS BIGINT) AS cw
        |           FROM ev GROUP BY user_id),
        |sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS sz
        |          FROM cohort GROUP BY cw),
        |weekrev AS (
        |  SELECT user_id, wk, sum(CAST(value AS DECIMAL(18,4))) AS rev
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, wk),
        |aged AS (
        |  SELECT cohort.cw, weekrev.wk - cohort.cw AS age,
        |    CAST(sum(rev) AS DECIMAL(38,4)) AS rev
        |  FROM weekrev JOIN cohort USING (user_id)
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT cw, age,
        |    CAST(sum(rev) OVER (PARTITION BY cw ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(38,4)) AS cum_rev
        |  FROM aged)
        |SELECT cw AS cohort_week, age AS age_weeks,
        |  sz AS cohort_users,
        |  round(CAST(cum_rev AS DOUBLE) / CAST(sz AS DOUBLE), 6)
        |    AS ltv_per_user
        |FROM cum JOIN sizes USING (cw)
        |ORDER BY cohort_week, age_weeks""".stripMargin,
    "q_win_basket" ->
      """WITH sizes AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
        |  FROM lineitem GROUP BY l_orderkey),
        |hist AS (SELECT n_items, CAST(count(*) AS BIGINT) AS n_orders
        |         FROM sizes GROUP BY n_items),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS no,
        |          CAST(sum(n_items) AS BIGINT) AS ni
        |        FROM sizes)
        |SELECT n_items, n_orders,
        |  round(CAST(n_orders AS DOUBLE) / CAST(no AS DOUBLE), 6) AS share,
        |  round(CAST(ni AS DOUBLE) / CAST(no AS DOUBLE), 6) AS avg_basket
        |FROM hist, tot ORDER BY n_items""".stripMargin,
  )
}
