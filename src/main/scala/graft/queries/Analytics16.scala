package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 sixteenth wave: per-document lexical diversity (the
  * vocabulary-richness quality signal that catches template/boilerplate
  * text TTR-style), deterministic k-fold assignment (the CV upgrade of
  * q_split_holdout's single split), and linear marketing attribution
  * (purchases credited across their preceding-7-day click touches) via
  * a RANGE-framed window — join-free.
  *
  * Scale notes:
  *  - Lexical diversity is strictly map-only: every statistic
  *    (types, hapax count, TTR, Herdan's C) folds over the in-row
  *    split array — per-doc quadratic in doc length but shuffle-FREE,
  *    the right trade for bounded documents (a (doc, word) explode
  *    would shuffle the whole corpus to compute per-doc counts).
  *  - K-fold: content-keyed md5 fold assignment is map-only and
  *    engine-portable (no RNG state, no global row numbering — a
  *    row_number split would need a total order over the corpus);
  *    one aggregation shuffle for the per-(fold, lang) report.
  *  - Attribution: the naive shape joins purchases×clicks per user
  *    and re-aggregates; this keeps ONE user-keyed sort and reads
  *    each purchase's touch set from a RANGE frame (7 days back,
  *    1 µs before conversion) — linear in events, and the frame
  *    never materializes the touch list. */
object Analytics16 {

  /** Per-doc lexical diversity: token/type/hapax counts, type-token
    * ratio, Herdan's C = ln(types)/ln(tokens). */
  private def qTextLexdiv(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("n_types", size(array_distinct(col("ws"))).cast("long"))
      .withColumn("n_hapax", expr(
        "CAST(size(filter(transform(array_distinct(ws), " +
          "w -> size(filter(ws, x -> x = w))), c -> c = 1)) AS BIGINT)"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(dbl(col("n_types")) / dbl(col("n_tokens")), 6).as("ttr"),
        round(log(dbl(col("n_types"))) / log(dbl(col("n_tokens"))), 6)
          .as("herdan_c"))
      .orderBy(col("doc_id"))

  /** Deterministic 5-fold CV assignment keyed on normalized content
    * md5 (duplicate texts always land in the same fold — no
    * train/test leakage through near-copies of the same string). */
  private def qSplitKfold(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ck", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("fold",
        expr("CAST(conv(substring(ck, 1, 6), 16, 10) AS BIGINT) % 5"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("ck")).as("n_groups"),
        sum(col("n_chars")).as("chars"))
      .orderBy(col("fold"), col("lang"))

  /** Linear attribution: each purchase credited equally across the
    * same user's clicks in the preceding 7 days (exclusive of the
    * purchase instant), read from a RANGE window frame — no
    * purchase×click join. */
  private def qWinAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
    val frame = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-7L * 86400L * 1000000L, -1L)
    val c = when(col("event_type") === "click", col("us"))
    val cs = when(col("event_type") === "click",
      struct(col("us"), col("event_id")))
    // one projection → one Window node (the withColumn chain would
    // leave 3 un-collapsed Window passes over the same frame)
    ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        count(c).over(frame).as("n_touches"),
        min(cs).over(frame).as("first_t"),
        max(cs).over(frame).as("last_t"))
      .filter(col("event_type") === "purchase" && col("n_touches") >= 1)
      .select(col("user_id"), col("event_id"),
        col("n_touches"),
        col("first_t.event_id").as("first_click_id"),
        col("last_t.event_id").as("last_click_id"),
        round(lit(1.0) / dbl(col("n_touches")), 6).as("credit"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_lexdiv" -> (qTextLexdiv _),
    "q_split_kfold" -> (qSplitKfold _),
    "q_win_attribution" -> (qWinAttribution _),
  )

  val sql: Map[String, String] = Map(
    "q_text_lexdiv" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
        |  CAST(len(list_filter(list_transform(list_distinct(ws),
        |    w -> len(list_filter(ws, x -> x = w))), c -> c = 1)) AS BIGINT)
        |    AS n_hapax,
        |  round(CAST(len(list_distinct(ws)) AS DOUBLE)
        |    / CAST(len(ws) AS DOUBLE), 6) AS ttr,
        |  round(ln(CAST(len(list_distinct(ws)) AS DOUBLE))
        |    / ln(CAST(len(ws) AS DOUBLE)), 6) AS herdan_c
        |FROM w WHERE len(ws) >= 2 ORDER BY doc_id""".stripMargin,
    "q_split_kfold" ->
      """WITH k AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ck
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang, n_chars, ck,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(ck, 1, 6), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 5 AS fold
        |  FROM k)
        |SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT ck) AS BIGINT) AS n_groups,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM f GROUP BY fold, lang ORDER BY fold, lang""".stripMargin,
    "q_win_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |fr AS (
        |  SELECT user_id, event_id, event_type,
        |    count(CASE WHEN event_type = 'click' THEN us END) OVER w
        |      AS n_touches,
        |    min(CASE WHEN event_type = 'click'
        |             THEN struct_pack(us := us, eid := event_id)
        |        END) OVER w AS first_t,
        |    max(CASE WHEN event_type = 'click'
        |             THEN struct_pack(us := us, eid := event_id)
        |        END) OVER w AS last_t
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, n_touches,
        |  (first_t).eid AS first_click_id,
        |  (last_t).eid AS last_click_id,
        |  round(1.0 / CAST(n_touches AS DOUBLE), 6) AS credit
        |FROM fr
        |WHERE event_type = 'purchase' AND n_touches >= 1
        |ORDER BY user_id, event_id""".stripMargin,
  )
}
