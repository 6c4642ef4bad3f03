package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 corpus-filtering wave: PERPLEXITY FILTERING — the CCNet /
  * Gopher-style quality gate q_text_unigram_lm (in-corpus scoring)
  * stops short of: train the LM on a held-in split, score EVERY doc
  * against that reference model (OOV tokens get the unseen smoothed
  * mass), set the cut at the held-in P90, and report per-source flag
  * rates. A source whose docs systematically exceed the reference P90
  * is distribution-shifted or junk — exactly what this filter removes
  * before pretraining.
  *
  * Scale: LM training is one vocab aggregate over the held-in split;
  * scoring is the tokenize pass left-joined against the vocab (hash-
  * shuffled on token, AQE-skew-safe) + one per-doc reduce; the P90
  * threshold comes off the bounded (rounded-score, count) GRID via one
  * cumulative pass — never a global sort of per-doc scores (the
  * q_agg_ntile rank-lattice discipline). Token log-probs round to 9 dp
  * and sum in DECIMAL. */
object LlmText16 {

  /** Per-source perplexity-filter report: train sources = src0..src9. */
  private def qTextPplFilter(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("is_train", expr("CAST(substring(source, 4) AS INT) < 10"))
    val tok = docs.select(col("doc_id"), col("source"), col("is_train"),
      explode(split(col("text"), " ")).as("w"))
    val vocab = tok.filter(col("is_train"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = tok.filter(col("is_train"))
      .agg(count(lit(1)).cast("double").as("T"))
      .crossJoin(vocab.agg(count(lit(1)).cast("double").as("V")))
    val scored = tok.join(vocab.hint("shuffle_hash"), Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lp", expr(
        "CAST(ROUND(ln((coalesce(c, 0L) + 1.0) / (T + V)), 9) " +
          "AS DECIMAL(18,9))"))
      .groupBy(col("doc_id"), col("source"), col("is_train"))
      .agg(sum(col("lp")).as("slp"), count(lit(1)).as("n_toks"))
      .withColumn("nll", expr(
        "ROUND(-CAST(slp AS DOUBLE) / CAST(n_toks AS DOUBLE), 6)"))
    // P90 of held-in scores off the bounded (nll, cnt) grid — one
    // cumulative pass, never a per-doc global sort
    val grid = scored.filter(col("is_train"))
      .groupBy(col("nll")).agg(count(lit(1)).as("cnt"))
    val thr = grid
      .withColumn("ccum", sum(col("cnt")).over(Window.orderBy(col("nll"))))
      .crossJoin(broadcast(grid.agg(sum(col("cnt")).as("n_train"))))
      .filter(expr("ccum >= CAST(ceil(0.9 * n_train) AS BIGINT)"))
      .agg(min(col("nll")).as("thr"))
    scored.crossJoin(broadcast(thr))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(nll AS DECIMAL(18,6))")).as("snll"),
        sum(when(col("nll") > col("thr"), 1L).otherwise(0L)).as("n_flagged"),
        max(col("thr")).as("threshold"))
      .select(col("source"), col("n_docs"),
        expr("ROUND(CAST(snll AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)")
          .as("mean_nll"),
        col("n_flagged"), col("threshold"))
      .orderBy(col("source"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_ppl_filter" -> (qTextPplFilter _),
  )

  val sql: Map[String, String] = Map(
    "q_text_ppl_filter" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CAST(substr(source, 4) AS INT) < 10 AS is_train, text
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, source, is_train,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM docs),
        |vocab AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
        |  WHERE is_train GROUP BY w),
        |totals AS (
        |  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM tok
        |          WHERE is_train) AS T,
        |    (SELECT CAST(count(*) AS DOUBLE) FROM vocab) AS V),
        |scored AS (
        |  SELECT doc_id, source, is_train,
        |    ROUND(-CAST(sum(CAST(ROUND(ln((coalesce(c, 0) + 1.0)
        |        / (T + V)), 9) AS DECIMAL(18,9))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS nll
        |  FROM tok LEFT JOIN vocab USING (w) CROSS JOIN totals
        |  GROUP BY doc_id, source, is_train),
        |grid AS (
        |  SELECT nll, CAST(count(*) AS BIGINT) AS cnt
        |  FROM scored WHERE is_train GROUP BY nll),
        |thr AS (
        |  SELECT min(nll) AS thr FROM (
        |    SELECT nll,
        |      sum(cnt) OVER (ORDER BY nll) AS ccum,
        |      (SELECT sum(cnt) FROM grid) AS n_train
        |    FROM grid) z
        |  WHERE ccum >= CAST(ceil(0.9 * n_train) AS BIGINT))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  ROUND(CAST(sum(CAST(nll AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS mean_nll,
        |  CAST(sum(CASE WHEN nll > thr THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  max(thr) AS threshold
        |FROM scored CROSS JOIN thr
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
