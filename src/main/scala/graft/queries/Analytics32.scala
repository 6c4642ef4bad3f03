package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirty-second wave: the new-vs-returning weekly
  * decomposition (every growth dashboard's first split — is the
  * business acquiring or retaining) and the out-of-vocabulary rate
  * against a frozen top-K vocabulary (the tokenizer-OOV report that
  * decides whether a vocab budget fits a corpus — per language,
  * because OOV concentrates in the tail languages).
  *
  * Scale notes:
  *  - New/returning: one (user, week) distinct, a user-keyed min for
  *    the first week, a co-partitioned join back, one bounded weekly
  *    count — the q_win_cohort shuffle plan, reduced to the
  *    two-class split.
  *  - OOV: the frozen vocab is a top-K TakeOrdered cut of the
  *    bounded word-count table, broadcast back over the token
  *    stream; the report is one (lang) aggregate of exact counts. */
object Analytics32 {

  /** Weekly new-vs-returning active users with the new-share ratio. */
  private def qAggNewreturning(s: SparkSession, d: String): DataFrame = {
    val uw = events(s, d)
      .select(col("user_id"), expr("us div 604800000000").as("wk"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("fw"))
    uw.join(first, Seq("user_id")) // co-partitioned on user_id
      .groupBy(col("wk").as("week"))
      .agg(sum(when(col("wk") === col("fw"), 1L).otherwise(0L))
        .as("n_new"),
        sum(when(col("wk") =!= col("fw"), 1L).otherwise(0L))
          .as("n_returning"))
      .select(col("week"), col("n_new"), col("n_returning"),
        round(dbl(col("n_new")) /
          dbl(col("n_new") + col("n_returning")), 6).as("new_share"))
      .orderBy(col("week"))
  }

  /** OOV rate per language against the frozen top-20 corpus
    * vocabulary. */
  private def qTextOov(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("wd"))
      .filter(col("wd") =!= "")
    val vocab = toks.groupBy(col("wd")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("wd")).limit(20)
      .select(col("wd"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("wd"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        round(dbl(col("n_oov")) / dbl(col("n_tokens")), 6).as("oov_rate"))
      .orderBy(col("lang"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_newreturning" -> (qAggNewreturning _),
    "q_text_oov" -> (qTextOov _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_newreturning" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS fw FROM uw GROUP BY user_id)
        |SELECT wk AS week,
        |  CAST(sum(CASE WHEN wk = fw THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(CASE WHEN wk <> fw THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning,
        |  round(CAST(sum(CASE WHEN wk = fw THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS new_share
        |FROM uw JOIN f USING (user_id)
        |GROUP BY wk ORDER BY week""".stripMargin,
    "q_text_oov" ->
      """WITH toks AS (
        |  SELECT lang, wd FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS wd
        |    FROM documents) WHERE wd <> ''),
        |vocab AS (
        |  SELECT wd FROM (SELECT wd, count(*) AS c FROM toks GROUP BY wd)
        |  ORDER BY c DESC, wd LIMIT 20)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN vocab.wd IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN vocab.wd IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM toks LEFT JOIN vocab ON toks.wd = vocab.wd
        |GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
