package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-sixth wave: the Markov-chain entropy rate (how
  * predictable the clickstream is — the information-theoretic summary
  * of q_agg_markov's matrix), per-term burstiness (variance-to-mean of
  * per-doc counts: bursty content words vs uniform function words —
  * the signal behind tf-idf's intuition), and Simpson diversity of
  * sources per language (the concentration-of-provenance check a
  * training-mix owner watches).
  *
  * Scale notes:
  *  - Entropy rate reduces the stream to the bounded 5×5 transition
  *    grid (one user-keyed sort + one count shuffle); the 25 per-cell
  *    (n/N)·ln(n/RT) terms ride the round-9dp DECIMAL-sum discipline.
  *  - Burstiness: one (word) count shuffle with per-doc pre-counts;
  *    the top-10 cut is a TakeOrdered; moments are exact BIGINTs
  *    (zero-count docs contribute algebraically — no dense doc×word
  *    matrix is ever materialized).
  *  - Simpson: exact integer pair-counting per (lang, source) —
  *    Σn(n−1)/N(N−1) never touches doubles until the final division,
  *    and N=1 languages gate to NULL (ANSI). */
object Analytics26 {

  /** Entropy rate (nats) + perplexity of the event-type Markov chain,
    * from exact transition counts. */
  private def qAggEntropyRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val trans = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("i"), col("event_type").as("j"))
      .agg(count(lit(1)).as("n"))
    val rowT = Window.partitionBy(col("i"))
    val allT = Window.partitionBy(lit(1))
    trans
      .select(col("n"), sum(col("n")).over(rowT).as("rt"),
        sum(col("n")).over(allT).as("nn"))
      .withColumn("term", expr(
        "CAST(ROUND((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)) " +
          "* ln(CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)), 9) " +
          "AS DECIMAL(28,9))"))
      .agg(max(col("nn")).as("n_transitions"), sum(col("term")).as("st"))
      .select(col("n_transitions"),
        round(-dbl(col("st")), 6).as("entropy_rate_nats"),
        round(exp(-dbl(col("st"))), 6).as("perplexity"))
  }

  /** Top-10 corpus words by count with their burstiness (variance-to-
    * mean ratio of per-doc counts, zeros included algebraically). */
  private def qTextBurstiness(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    // 1-row broadcast corpus size, not a driver-side docs.count(): the
    // whole query stays ONE job (VERDICT r7 residual nit).
    val nd = docs.agg(count(lit(1)).as("nd"))
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("wd"))
      .filter(col("wd") =!= "")
      .groupBy(col("doc_id"), col("wd")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("wd"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("n_docs"),
        sum(col("c") * col("c")).as("sc2"))
      .crossJoin(broadcast(nd))
      .withColumn("mean", dbl(col("total")) / dbl(col("nd")))
      .select(col("wd").as("word"), col("total"), col("n_docs"),
        round((dbl(col("sc2")) / dbl(col("nd"))
          - col("mean") * col("mean")) / col("mean"), 6).as("vmr"))
      .orderBy(col("total").desc, col("word"))
      .limit(10)
  }

  /** Simpson diversity 1 − Σn(n−1)/N(N−1) of document sources within
    * each language, plus source richness. */
  private def qAggSimpson(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    cells.groupBy(col("lang"))
      .agg(sum(col("n")).as("nn"),
        count(lit(1)).as("n_sources"),
        sum(col("n") * (col("n") - 1)).as("pairs"))
      .select(col("lang"), col("nn").as("n_docs"), col("n_sources"),
        // a single-doc language has no pairs → diversity undefined
        when(col("nn") > 1,
          round(lit(1.0) - dbl(col("pairs")) /
            dbl(col("nn") * (col("nn") - 1)), 6)).as("simpson_d"))
      .orderBy(col("lang"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_entropy_rate" -> (qAggEntropyRate _),
    "q_text_burstiness" -> (qTextBurstiness _),
    "q_agg_simpson" -> (qAggSimpson _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_entropy_rate" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |trans AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) AS i,
        |    event_type AS j
        |  FROM ev),
        |cnt AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n
        |        FROM trans WHERE i IS NOT NULL GROUP BY 1, 2),
        |terms AS (
        |  SELECT n, sum(n) OVER (PARTITION BY i) AS rt,
        |    sum(n) OVER () AS nn
        |  FROM cnt),
        |agg AS (
        |  SELECT CAST(max(nn) AS BIGINT) AS n_transitions,
        |    CAST(sum(CAST(ROUND(
        |      (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
        |      * ln(CAST(n AS DOUBLE) / CAST(rt AS DOUBLE)), 9)
        |      AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS st
        |  FROM terms)
        |SELECT n_transitions,
        |  round(-CAST(st AS DOUBLE), 6) AS entropy_rate_nats,
        |  round(exp(-CAST(st AS DOUBLE)), 6) AS perplexity
        |FROM agg""".stripMargin,
    "q_text_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS DOUBLE) AS ndocs
        |            FROM documents),
        |perdoc AS (
        |  SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |        FROM documents)
        |  WHERE wd <> '' GROUP BY doc_id, wd),
        |agg AS (
        |  SELECT wd AS word, CAST(sum(c) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(c * c) AS BIGINT) AS sc2
        |  FROM perdoc GROUP BY wd)
        |SELECT word, total, n_docs,
        |  round((CAST(sc2 AS DOUBLE) / ndocs
        |    - (CAST(total AS DOUBLE) / ndocs)
        |      * (CAST(total AS DOUBLE) / ndocs))
        |    / (CAST(total AS DOUBLE) / ndocs), 6) AS vmr
        |FROM agg, nd
        |ORDER BY total DESC, word LIMIT 10""".stripMargin,
    "q_agg_simpson" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang, source),
        |agg AS (
        |  SELECT lang, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS n_sources,
        |    CAST(sum(n * (n - 1)) AS BIGINT) AS pairs
        |  FROM cells GROUP BY lang)
        |SELECT lang, nn AS n_docs, n_sources,
        |  CASE WHEN nn > 1 THEN
        |    round(1.0 - CAST(pairs AS DOUBLE)
        |      / CAST(nn * (nn - 1) AS DOUBLE), 6)
        |  END AS simpson_d
        |FROM agg ORDER BY lang""".stripMargin,
  )
}
