package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 fourth wave: robust/higher-moment statistics (winsorized
  * mean, skewness + excess kurtosis), a readability-style per-document
  * quality score, and per-user event-SEQUENCE pattern detection (the
  * MATCH_RECOGNIZE shape expressed as ordered-aggregate + regex).
  *
  * Scale notes:
  *  - Winsorize is the classic two-pass robust aggregate: a per-group
  *    percentile table (group-count-sized → broadcast) joins back over
  *    the stream for the clamp; both passes are map-side-combining
  *    aggregates.
  *  - Skew/kurtosis ride the same ONE-pass exact-moment discipline as
  *    corr/OLS — Σx..Σx⁴ as DECIMALs sized so the 4th power stays
  *    inside precision 38, double finish mirrored textually and 6-dp
  *    rounded: s4's integer magnitude tops 2^53, and decimal->double
  *    casts of such values round differently per engine (1-ulp).
  *  - Readability is map-only per-row arithmetic on regexp counts; NO
  *    rounding anywhere — every output double is produced by the same
  *    IEEE op sequence from exactly-represented integers, so both
  *    engines emit bit-identical values (ROUND near ties is the thing
  *    that diverges, see q_time_interpolate).
  *  - Pattern detection groups each user's events ONCE; per-user state
  *    is the initials string (bounded by user activity), and the regex
  *    runs per user, not per event. */
object Analytics5 {

  /** Winsorized mean (5%/95%, percentile_disc) of lineitem quantity per
    * return flag, next to the plain mean — the robust-location estimate
    * that survives heavy tails. */
  private def qAggWinsorize(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("x"))
    val q = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY x)").as("p5"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY x)").as("p95"))
    li.join(broadcast(q), Seq("l_returnflag"))
      .withColumn("xw", least(greatest(col("x"), col("p5")), col("p95")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        min(col("p5")).as("p5"), min(col("p95")).as("p95"),
        sum(col("x").cast("decimal(18,4)")).as("sx"),
        sum(col("xw").cast("decimal(18,4)")).as("sxw"))
      .selectExpr("l_returnflag", "n", "p5", "p95",
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean",
        "CAST(sxw AS DOUBLE) / CAST(n AS DOUBLE) AS winsorized_mean")
      .orderBy(col("l_returnflag"))
  }

  /** Sample skewness g1 and excess kurtosis g2 of quantity per return
    * flag from ONE pass of exact raw moments (population form:
    * g1 = m3/m2^1.5, g2 = m4/m2² − 3 with central moments mk derived
    * from Σxᵏ in a textually-mirrored double finish). */
  private def qAggSkewkurt(s: SparkSession, d: String): DataFrame = {
    // quantity ≤ 99999.99 fits DECIMAL(7,2); x⁴ is then (31,8) in
    // Spark (p1+p2+1 per step) and (36,8) in DuckDB (p1+p2) — BOTH
    // under 38, so no engine truncates a product digit. (9,2) would
    // push Spark's x⁴ to 39 → capped (38,7) → a lost 8th decimal.
    val m2 = """(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
               |  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               |    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))""".stripMargin
    val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val m3 = s"""(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - 3.0 * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                |  + 2.0 * $mu * $mu * $mu)""".stripMargin
    val m4 = s"""(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - 4.0 * $mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                |  + 6.0 * $mu * $mu
                |    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                |  - 3.0 * $mu * $mu * $mu * $mu)""".stripMargin
    t(s, d, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(7,2)").as("x"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("x * x")).as("s2"),
        sum(expr("(x * x) * x")).as("s3"),
        sum(expr("((x * x) * x) * x")).as("s4"))
      .selectExpr("l_returnflag", "n",
        s"ROUND($m3 / ($m2 * sqrt($m2)), 6) AS skewness",
        s"ROUND($m4 / ($m2 * $m2) - 3.0, 6) AS excess_kurtosis")
      .orderBy(col("l_returnflag"))
  }

  /** Readability-style score per document (a Flesch–Kincaid-shaped
    * proxy for the punctuation-free word-soup corpus): syllables ≈
    * vowel runs, sentences ≈ ⌈words/15⌉ chunks; grade =
    * 0.39·(w/sent) + 11.8·(syl/w) − 15.59. Pure per-row integer
    * arithmetic → raw IEEE doubles, no rounding. */
  private def qTextReadability(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> w != ''))").as("w"),
        expr("CAST(regexp_count(text, '[aeiouAEIOU]+') AS BIGINT)")
          .as("syl"))
      .filter(col("w") > 0)
      .withColumn("sent", expr("CAST((w + 14) div 15 AS BIGINT)"))
      .selectExpr("doc_id", "w AS n_words", "syl AS n_syllables",
        "sent AS n_sentences",
        """0.39 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE))
          |  + 11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
          |  - 15.59 AS fk_grade""".stripMargin)
      .orderBy(col("doc_id"))

  /** Event-sequence pattern detection per user (the MATCH_RECOGNIZE
    * shape): users whose ordered event-type initials match
    * view →* click →* purchase with NO error in between
    * (`v[^e]*c[^e]*p`). One ordered aggregate builds the per-user
    * initials string; the regex runs once per user. */
  private def qWinPattern(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), col("us"), col("event_id"),
        expr("substring(event_type, 1, 1)").as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        expr("""concat_ws('', transform(
               |  array_sort(collect_list(struct(us, event_id, c))),
               |  x -> x.c))""".stripMargin).as("seq"))
      .filter(expr("seq RLIKE 'v[^e]*c[^e]*p'"))
      .select(col("user_id"), col("n_events"),
        length(col("seq")).as("seq_len"))
      .orderBy(col("user_id"))

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_winsorize" -> (qAggWinsorize _),
    "q_agg_skewkurt" -> (qAggSkewkurt _),
    "q_text_readability" -> (qTextReadability _),
    "q_win_pattern" -> (qWinPattern _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_winsorize" ->
      """WITH li AS (SELECT l_returnflag,
        |              CAST(l_quantity AS DOUBLE) AS x FROM lineitem),
        |q AS (SELECT l_returnflag,
        |        quantile_disc(x, 0.05) AS p5,
        |        quantile_disc(x, 0.95) AS p95
        |      FROM li GROUP BY l_returnflag),
        |m AS (
        |  SELECT li.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    min(q.p5) AS p5, min(q.p95) AS p95,
        |    sum(CAST(li.x AS DECIMAL(18,4))) AS sx,
        |    sum(CAST(least(greatest(li.x, q.p5), q.p95)
        |        AS DECIMAL(18,4))) AS sxw
        |  FROM li JOIN q ON li.l_returnflag = q.l_returnflag
        |  GROUP BY li.l_returnflag)
        |SELECT l_returnflag, n, p5, p95,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |  CAST(sxw AS DOUBLE) / CAST(n AS DOUBLE) AS winsorized_mean
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_agg_skewkurt" ->
      """WITH m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS s1, sum(x * x) AS s2,
        |    sum((x * x) * x) AS s3, sum(((x * x) * x) * x) AS s4
        |  FROM (SELECT l_returnflag,
        |          CAST(l_quantity AS DECIMAL(7,2)) AS x FROM lineitem) z
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  ROUND((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |    + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |  / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |     * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
        |    AS skewness,
        |  ROUND((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        |    + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |  / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |     * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))) - 3.0, 6)
        |    AS excess_kurtosis
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_text_readability" ->
      """SELECT doc_id,
        |  w AS n_words, syl AS n_syllables,
        |  CAST((w + 14) // 15 AS BIGINT) AS n_sentences,
        |  0.39 * (CAST(w AS DOUBLE) / CAST((w + 14) // 15 AS DOUBLE))
        |    + 11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
        |    - 15.59 AS fk_grade
        |FROM (SELECT doc_id,
        |        CAST(len(list_filter(string_split(text, ' '),
        |          x -> x <> '')) AS INT) AS w,
        |        CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
        |          AS BIGINT) AS syl
        |      FROM documents) z
        |WHERE w > 0 ORDER BY doc_id""".stripMargin,
    "q_win_pattern" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    substr(event_type, 1, 1) AS c
        |  FROM events),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    string_agg(c, '' ORDER BY us, event_id) AS seq
        |  FROM e GROUP BY user_id)
        |SELECT user_id, n_events, CAST(length(seq) AS INT) AS seq_len
        |FROM agg WHERE regexp_matches(seq, 'v[^e]*c[^e]*p')
        |ORDER BY user_id""".stripMargin,
  )
}
