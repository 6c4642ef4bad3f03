package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 thirteenth wave: coverage estimation — how much of the
  * population/vocabulary has the pipeline actually seen?
  *
  *  - q_agg_capture: Chapman capture–recapture estimate of the true
  *    user population from two independent observation windows (the
  *    stream's halves): N̂ = (n₁+1)(n₂+1)/(m+1) − 1, with the
  *    observed-coverage ratio — the "how many users exist that we
  *    never see" estimator used for reach and completeness audits.
  *  - q_text_goodturing: Good–Turing frequency-of-frequencies
  *    analysis over the shingle vocabulary: unseen-mass estimate
  *    P₀ = N₁/N and the smoothed r* = (r+1)·N_{r+1}/N_r adjusted
  *    counts for r ≤ 5 — the coverage side of the Heaps growth fit
  *    (how much probability the NEXT crawl's unseen shingles carry).
  *
  * Scale notes:
  *  - capture: two count_if aggregates over ONE user-keyed collapse of
  *    the stream; everything else is scalar arithmetic on exact
  *    BIGINTs (the +1s make the estimator well-defined even with zero
  *    overlap — no division gate needed).
  *  - goodturing: the frequency spectrum is two nested bounded
  *    aggregates (shingle counts → count-of-counts); the spectrum
  *    table is at most max-frequency rows and the report is r ≤ 5. */
object Analytics56 {

  /** Chapman capture–recapture over the event stream's two halves. */
  private def qAggCapture(s: SparkSession, d: String): DataFrame = {
    val marks = events(s, d)
      .select(col("user_id"),
        (expr("us div 86400000000") < lit(19738L)).as("h1"))
      .groupBy(col("user_id"))
      .agg(max(when(col("h1"), 1L).otherwise(0L)).as("in1"),
        max(when(!col("h1"), 1L).otherwise(0L)).as("in2"))
    marks.agg(
        sum(col("in1")).as("n1"),
        sum(col("in2")).as("n2"),
        sum(col("in1") * col("in2")).as("m"),
        count(lit(1)).as("observed"))
      .selectExpr("n1", "n2", "m", "observed",
        // Chapman: exact integer numerator, one final division
        "ROUND(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) " +
          "/ CAST(m + 1 AS DOUBLE) - 1.0, 6) AS n_hat",
        "ROUND(CAST(observed AS DOUBLE) / (CAST((n1 + 1) * (n2 + 1) " +
          "AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0), 6) AS coverage")
  }

  /** Good–Turing spectrum over 3-word shingles: P₀ and smoothed r*. */
  private def qTextGoodturing(s: SparkSession, d: String): DataFrame = {
    val freq = t(s, d, "documents")
      .select(split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 2),
          |  i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))"""
          .stripMargin)).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("r"))
    val spectrum = freq.groupBy(col("r")).agg(count(lit(1)).as("nr"))
    val tot = freq.agg(sum(col("r")).as("nn"), count(lit(1)).as("types"))
    val nxt = spectrum.select((col("r") - 1).as("r"),
      col("nr").as("nr_next"))
    val n1 = spectrum.filter(col("r") === 1)
      .agg(sum(col("nr")).as("n1rows"))
    spectrum.filter(col("r") <= 5)
      .join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(n1))
      .select(col("r"), col("nr"),
        col("nn").as("n_tokens"), col("types").as("n_types"),
        // smoothed count r* = (r+1)·N_{r+1}/N_r (NULL when the next
        // spectrum bucket is empty — the standard raw-GT caveat)
        when(col("nr_next").isNotNull, round(expr(
          "CAST((r + 1) * nr_next AS DOUBLE) / CAST(nr AS DOUBLE)"), 6))
          .as("r_star"),
        round(expr(
          "CAST(COALESCE(n1rows, 0) AS DOUBLE) / CAST(nn AS DOUBLE)"), 6)
          .as("p_unseen"))
      .orderBy(col("r"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_capture" -> (qAggCapture _),
    "q_text_goodturing" -> (qTextGoodturing _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_capture" ->
      """WITH marks AS (
        |  SELECT user_id,
        |    max(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |        < 19738 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
        |        END) AS in1,
        |    max(CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |        >= 19738 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
        |        END) AS in2
        |  FROM events GROUP BY 1)
        |SELECT CAST(sum(in1) AS BIGINT) AS n1,
        |  CAST(sum(in2) AS BIGINT) AS n2,
        |  CAST(sum(in1 * in2) AS BIGINT) AS m,
        |  CAST(count(*) AS BIGINT) AS observed,
        |  ROUND(CAST((sum(in1) + 1) * (sum(in2) + 1) AS DOUBLE)
        |    / CAST(sum(in1 * in2) + 1 AS DOUBLE) - 1.0, 6) AS n_hat,
        |  ROUND(CAST(count(*) AS DOUBLE)
        |    / (CAST((sum(in1) + 1) * (sum(in2) + 1) AS DOUBLE)
        |       / CAST(sum(in1 * in2) + 1 AS DOUBLE) - 1.0), 6)
        |    AS coverage
        |FROM marks""".stripMargin,
    "q_text_goodturing" ->
      """WITH freq AS (
        |  SELECT sh, CAST(count(*) AS BIGINT) AS r FROM (
        |    SELECT unnest(list_transform(
        |      generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
        |    FROM (SELECT string_split(lower(text), ' ') AS ws
        |          FROM documents
        |          WHERE len(string_split(lower(text), ' ')) >= 3) y) z
        |  GROUP BY sh),
        |spectrum AS (SELECT r, CAST(count(*) AS BIGINT) AS nr
        |             FROM freq GROUP BY 1),
        |tot AS (SELECT CAST(sum(r) AS BIGINT) AS nn,
        |  CAST(count(*) AS BIGINT) AS types FROM freq),
        |n1t AS (SELECT nr AS n1rows FROM spectrum WHERE r = 1)
        |SELECT s.r, s.nr, nn AS n_tokens, types AS n_types,
        |  CASE WHEN nxt.nr_next IS NOT NULL THEN
        |    ROUND(CAST((s.r + 1) * nxt.nr_next AS DOUBLE)
        |      / CAST(s.nr AS DOUBLE), 6) END AS r_star,
        |  ROUND(CAST(COALESCE((SELECT n1rows FROM n1t), 0) AS DOUBLE)
        |    / CAST(nn AS DOUBLE), 6) AS p_unseen
        |FROM spectrum s
        |LEFT JOIN (SELECT r - 1 AS r, nr AS nr_next FROM spectrum) nxt
        |  USING (r)
        |CROSS JOIN tot
        |WHERE s.r <= 5 ORDER BY s.r""".stripMargin,
  )
}
