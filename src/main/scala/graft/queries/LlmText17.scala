package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 ninth wave: corpus-level vocabulary-richness constants off
  * the token frequency SPECTRUM — one oracled operator:
  *
  *  - q_text_yulek: Yule's characteristic K = 10⁴(Σm²Vₘ − N)/N²,
  *    Simpson's repeat-rate D = Σm(m−1)Vₘ/(N(N−1)), Sichel's S =
  *    V₂/V, the hapax share V₁/V, and Honoré's R = 100·ln N/(1−V₁/V)
  *    — the length-robust repetitiveness constants a curation review
  *    reads beside q_text_lexdiv's per-doc TTR (which IS
  *    length-biased; K and S are the standard corrections) and
  *    q_text_heaps' growth law. Vₘ = number of token types occurring
  *    exactly m times; everything derives from one (m, Vₘ) spectrum.
  *
  * Determinism: the spectrum is exact BIGINT; every statistic is a
  * single double tree over ≤5 exact moments, 6dp-rounded. Scale: one
  * token-keyed groupBy (the tfidf shuffle shape), then the spectrum
  * collapse — Vₘ is bounded by the max token frequency, and the
  * final algebra runs on that tiny grid. */
object LlmText17 {

  private def qTextYulek(s: SparkSession, d: String): DataFrame = {
    val spectrum = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("vm"))
    spectrum.agg(
        sum(col("m") * col("vm")).as("n"),
        sum(col("vm")).as("v"),
        sum(col("m") * col("m") * col("vm")).as("m2v"),
        sum(col("m") * (col("m") - 1) * col("vm")).as("mm1v"),
        sum(when(col("m") === 1, col("vm")).otherwise(0L)).as("v1"),
        sum(when(col("m") === 2, col("vm")).otherwise(0L)).as("v2"))
      .select(col("n").as("n_tokens"), col("v").as("n_types"),
        col("v1"), col("v2"),
        when(col("n") > 0,
          round(lit(10000.0) * (dbl(col("m2v")) - dbl(col("n")))
            / (dbl(col("n")) * dbl(col("n"))), 6)).as("yule_k"),
        when(col("n") > 1,
          round(dbl(col("mm1v"))
            / (dbl(col("n")) * (dbl(col("n")) - 1.0)), 9)).as("simpson_d"),
        when(col("v") > 0,
          round(dbl(col("v2")) / dbl(col("v")), 6)).as("sichel_s"),
        when(col("v") > 0 && col("v1") < col("v"),
          round(lit(100.0) * log(dbl(col("n")))
            / (lit(1.0) - dbl(col("v1")) / dbl(col("v"))), 6))
          .as("honore_r"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_yulek" -> (qTextYulek _),
  )

  val sql: Map[String, String] = Map(
    "q_text_yulek" ->
      """WITH tok AS (
        |  SELECT u.w FROM documents,
        |    unnest(string_split(text, ' ')) AS u(w)
        |  WHERE u.w <> ''),
        |cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS m
        |        FROM tok GROUP BY w),
        |spec AS (SELECT m, CAST(count(*) AS BIGINT) AS vm
        |         FROM cnt GROUP BY m),
        |agg AS (
        |  SELECT CAST(sum(m * vm) AS BIGINT) AS n,
        |    CAST(sum(vm) AS BIGINT) AS v,
        |    CAST(sum(m * m * vm) AS BIGINT) AS m2v,
        |    CAST(sum(m * (m - 1) * vm) AS BIGINT) AS mm1v,
        |    CAST(sum(CASE WHEN m = 1 THEN vm ELSE 0 END) AS BIGINT)
        |      AS v1,
        |    CAST(sum(CASE WHEN m = 2 THEN vm ELSE 0 END) AS BIGINT)
        |      AS v2
        |  FROM spec)
        |SELECT n AS n_tokens, v AS n_types, v1, v2,
        |  CASE WHEN n > 0 THEN
        |    ROUND(10000.0 * (CAST(m2v AS DOUBLE) - CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) END
        |    AS yule_k,
        |  CASE WHEN n > 1 THEN
        |    ROUND(CAST(mm1v AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9) END
        |    AS simpson_d,
        |  CASE WHEN v > 0 THEN
        |    ROUND(CAST(v2 AS DOUBLE) / CAST(v AS DOUBLE), 6) END
        |    AS sichel_s,
        |  CASE WHEN v > 0 AND v1 < v THEN
        |    ROUND(100.0 * ln(CAST(n AS DOUBLE))
        |      / (1.0 - CAST(v1 AS DOUBLE) / CAST(v AS DOUBLE)), 6) END
        |    AS honore_r
        |FROM agg""".stripMargin,
  )
}
