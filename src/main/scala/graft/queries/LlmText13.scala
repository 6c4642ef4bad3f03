package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 text wave: RAKE keyword extraction (Rapid Automatic
  * Keyword Extraction) — the stopword-delimited phrase scorer that
  * surfaces a corpus's characteristic multi-word terms without any
  * trained model; the classic lightweight companion to TF-IDF when
  * the unit of interest is the phrase, not the token.
  *
  * Scale notes:
  *  - One tokenize-explode pass (linear, codegen'd); phrase runs come
  *    from the gaps-and-islands trick (pos − row_number over non-stop
  *    tokens), so phrase assembly never rescans the text.
  *  - The word-score join keys on the token — the same
  *    unbounded-vocabulary shuffle_hash discipline as
  *    q_text_unigram_lm (a vocab broadcast has no safe size at
  *    web scale); AQE skew-splits hot words.
  *  - Per-word scores are 9-dp DECIMAL terms, so phrase scores are
  *    exact order-free sums; the top-20 is a TakeOrdered (never a full
  *    sort materialization of the distinct-phrase table). */
object LlmText13 {

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "on", "for", "with", "at", "by")

  /** Corpus-wide top-20 RAKE phrases: candidate phrases are maximal
    * stopword-free token runs; word score = degree/frequency (degree =
    * Σ length of phrases containing the word); phrase score = Σ word
    * scores. Identical phrase texts score identically by construction
    * (corpus-level word stats), so the report groups by phrase text
    * with an occurrence count. */
  private def qTextRake(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "" && !col("w").isInCollection(stopwords))
    val pw = tok
      .withColumn("run", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .withColumn("plen", count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("run"))))
    val ws = pw.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"), expr(
        "CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 9) " +
          "AS DECIMAL(18,9))").as("wscore"))
    val ph = pw.join(ws.hint("shuffle_hash"), Seq("w"))
      .groupBy(col("doc_id"), col("run"))
      .agg(array_join(expr("transform(sort_array(collect_list(" +
          "struct(pos, w))), p -> p.w)"), " ").as("phrase"),
        sum(col("wscore")).as("ps"), count(lit(1)).as("plen"))
    ph.groupBy(col("phrase"))
      .agg(min(col("plen")).as("n_words"), count(lit(1)).as("n_occ"),
        min(col("ps")).as("ps"))
      .select(col("phrase"), col("n_words"), col("n_occ"),
        round(dbl(col("ps")), 6).as("score"))
      .orderBy(desc("score"), col("phrase")).limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_rake" -> (qTextRake _),
  )

  val sql: Map[String, String] = Map(
    // generate_subscripts is 1-based vs posexplode's 0-based — both
    // cancel inside pos − row_number, and pos never reaches the output.
    "q_text_rake" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS w,
        |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |ns AS (SELECT doc_id, pos, w FROM tok WHERE w <> ''
        |  AND w NOT IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in',
        |    'is', 'on', 'for', 'with', 'at', 'by')),
        |runs AS (SELECT doc_id, pos, w,
        |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS run
        |  FROM ns),
        |pw AS (SELECT doc_id, run, pos, w,
        |    CAST(count(*) OVER (PARTITION BY doc_id, run) AS BIGINT)
        |      AS plen
        |  FROM runs),
        |ws AS (SELECT w,
        |    CAST(round(CAST(sum(plen) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 9) AS DECIMAL(18,9)) AS wscore
        |  FROM pw GROUP BY w),
        |ph AS (SELECT doc_id, run,
        |    string_agg(pw.w, ' ' ORDER BY pos) AS phrase,
        |    CAST(sum(wscore) AS DECIMAL(28,9)) AS ps,
        |    CAST(count(*) AS BIGINT) AS plen
        |  FROM pw JOIN ws ON pw.w = ws.w GROUP BY doc_id, run)
        |SELECT phrase, CAST(min(plen) AS BIGINT) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_occ,
        |  round(CAST(min(ps) AS DOUBLE), 6) AS score
        |FROM ph GROUP BY phrase ORDER BY score DESC, phrase
        |LIMIT 20""".stripMargin,
  )
}
