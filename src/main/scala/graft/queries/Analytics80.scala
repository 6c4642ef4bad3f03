package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 sixth wave: the quality-filter FUNNEL report — what the
  * per-doc scores (q_text_quality, q_text_gibberish) don't show: for
  * an ordered rule chain, how many docs each rule rejects ALONE, how
  * many are gone cumulatively after it, and how many survive — the
  * "which filter is eating my corpus" attribution every pretraining
  * pipeline reads before tightening a threshold.
  *
  * Rules (ordered): length in [100, 5000] chars → digit ratio ≤ 0.2 →
  * mean word length ≤ 12 → whitespace ratio ≤ 0.3.
  *
  * Scale: ONE corpus scan computes every rule's boolean in map-only
  * expressions; the funnel is a single 8-sum aggregate stacked into
  * the 4-row report — adding a rule adds two sums to the same scan,
  * never a second pass. */
object Analytics80 {

  private def qQualityFunnel(s: SparkSession, d: String): DataFrame = {
    val flags = t(s, d, "documents")
      .withColumn("nw", size(split(col("text"), " ")).cast("long"))
      .withColumn("ndig", length(col("text")) -
        length(regexp_replace(col("text"), "[0-9]", "")))
      .withColumn("nsp", length(col("text")) -
        length(regexp_replace(col("text"), " ", "")))
      .withColumn("f1", !col("n_chars").between(100L, 5000L))
      .withColumn("f2", expr(
        "CAST(ndig AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.2"))
      .withColumn("f3", expr(
        "CAST(n_chars - nsp AS DOUBLE) / CAST(nw AS DOUBLE) > 12.0"))
      .withColumn("f4", expr(
        "CAST(nsp AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.3"))
    val m = flags.agg(count(lit(1)).as("n"),
      sum(when(col("f1"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("f2"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("f3"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("f4"), 1L).otherwise(0L)).as("s4"),
      sum(when(col("f1"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("f1") || col("f2"), 1L).otherwise(0L)).as("c2"),
      sum(when(col("f1") || col("f2") || col("f3"), 1L).otherwise(0L))
        .as("c3"),
      sum(when(col("f1") || col("f2") || col("f3") || col("f4"), 1L)
        .otherwise(0L)).as("c4"))
    val rules = Seq(("1_length", "s1", "c1"), ("2_digit_ratio", "s2", "c2"),
      ("3_word_length", "s3", "c3"), ("4_whitespace", "s4", "c4"))
    rules.map { case (name, sc, cc) =>
      m.select(lit(name).as("rule"), col(sc).as("n_fail_solo"),
        col(cc).as("n_fail_cum"), (col("n") - col(cc)).as("n_surviving"),
        col("n").as("n_docs"))
    }.reduce(_ unionAll _).orderBy(col("rule"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_quality_funnel" -> (qQualityFunnel _),
  )

  val sql: Map[String, String] = Map(
    "q_quality_funnel" ->
      """WITH flags AS (
        |  SELECT
        |    NOT (n_chars BETWEEN 100 AND 5000) AS f1,
        |    CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
        |        AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.2 AS f2,
        |    CAST(n_chars - (len(text)
        |        - len(regexp_replace(text, ' ', '', 'g')))
        |        AS DOUBLE)
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE) > 12.0 AS f3,
        |    CAST(len(text) - len(regexp_replace(text, ' ', '', 'g'))
        |        AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.3 AS f4
        |  FROM documents),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        |    CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
        |    CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN f1 OR f2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN f1 OR f2 OR f3 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c3,
        |    CAST(sum(CASE WHEN f1 OR f2 OR f3 OR f4 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c4
        |  FROM flags)
        |SELECT '1_length' AS rule, s1 AS n_fail_solo, c1 AS n_fail_cum,
        |  n - c1 AS n_surviving, n AS n_docs FROM m
        |UNION ALL SELECT '2_digit_ratio', s2, c2, n - c2, n FROM m
        |UNION ALL SELECT '3_word_length', s3, c3, n - c3, n FROM m
        |UNION ALL SELECT '4_whitespace', s4, c4, n - c4, n FROM m
        |ORDER BY rule""".stripMargin,
  )
}
