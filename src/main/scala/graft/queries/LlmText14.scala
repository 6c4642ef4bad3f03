package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 text wave: lexicon sentiment profiling — the classic
  * dictionary scorer (pos/neg token counts → polarity in [−1, 1]) run
  * as a corpus-level per-language report. A data-curation team uses
  * this shape to spot tonal skew between corpus slices before
  * training; the lexicon is an inline bounded literal (broadcast by
  * construction), so the scan is one tokenize pass with map-side
  * aggregation — nothing scales past the token stream. */
object LlmText14 {

  private val pos = Seq("good", "great", "excellent", "best", "happy",
    "love", "win", "success", "improve", "nice")
  private val neg = Seq("bad", "poor", "terrible", "worst", "sad",
    "hate", "fail", "loss", "decline", "wrong")

  /** Per-language sentiment profile: doc counts by polarity label and
    * the mean document polarity score (pos−neg)/(pos+neg). */
  private def qTextSentiment(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), " ").as("ws"))
      .select(col("doc_id"), col("lang"),
        size(expr("filter(ws, w -> array_contains(" +
          s"array(${pos.map("'" + _ + "'").mkString(",")}), w))"))
          .cast("long").as("np"),
        size(expr("filter(ws, w -> array_contains(" +
          s"array(${neg.map("'" + _ + "'").mkString(",")}), w))"))
          .cast("long").as("nn"))
      .withColumn("score",
        when(col("np") + col("nn") > 0,
          expr("CAST(ROUND((CAST(np AS DOUBLE) - CAST(nn AS DOUBLE)) " +
            "/ (CAST(np AS DOUBLE) + CAST(nn AS DOUBLE)), 9) " +
            "AS DECIMAL(18,9))")))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("score") < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("score") === 0, 1L).otherwise(0L)).as("n_neutral"),
        sum(when(col("score").isNull, 1L).otherwise(0L)).as("n_unscored"),
        sum(col("np")).as("pos_tokens"), sum(col("nn")).as("neg_tokens"),
        avg(dbl(col("score"))).as("m"))
      .select(col("lang"), col("n_docs"), col("n_pos"), col("n_neg"),
        col("n_neutral"), col("n_unscored"), col("pos_tokens"),
        col("neg_tokens"), round(col("m"), 6).as("mean_score"))
      .orderBy(col("lang"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_sentiment" -> (qTextSentiment _),
  )

  val sql: Map[String, String] = Map(
    "q_text_sentiment" -> {
      val posSql = pos.map("'" + _ + "'").mkString(", ")
      val negSql = neg.map("'" + _ + "'").mkString(", ")
      s"""WITH docs AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> list_contains([$posSql], w))) AS np,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> list_contains([$negSql], w))) AS nn
        |  FROM documents),
        |scored AS (
        |  SELECT lang, CAST(np AS BIGINT) AS np, CAST(nn AS BIGINT) AS nn,
        |    CASE WHEN np + nn > 0 THEN
        |      CAST(ROUND((CAST(np AS DOUBLE) - CAST(nn AS DOUBLE))
        |        / (CAST(np AS DOUBLE) + CAST(nn AS DOUBLE)), 9)
        |        AS DECIMAL(18,9)) END AS score
        |  FROM docs)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pos,
        |  CAST(sum(CASE WHEN score < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_neg,
        |  CAST(sum(CASE WHEN score = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_neutral,
        |  CAST(sum(CASE WHEN score IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unscored,
        |  CAST(sum(np) AS BIGINT) AS pos_tokens,
        |  CAST(sum(nn) AS BIGINT) AS neg_tokens,
        |  ROUND(avg(CAST(score AS DOUBLE)), 6) AS mean_score
        |FROM scored GROUP BY lang ORDER BY lang""".stripMargin
    },
  )
}
