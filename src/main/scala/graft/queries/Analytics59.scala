package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 rank/categorical test wave — the nonparametric and paired
  * siblings the battery still lacked (ANOVA/Mann–Whitney/χ² shipped
  * r4-r7): Kruskal–Wallis (k-group rank ANOVA), Brown–Forsythe
  * (median-centered Levene variance homogeneity — the robust
  * prerequisite check for the ANOVA already in the battery), McNemar
  * (paired before/after conversion), and Cochran's Q (k correlated
  * binary treatments).
  *
  * Scale notes (shared discipline):
  *  - Rank algebra runs over BOUNDED bucket tables (0.1-value buckets,
  *    the q_agg_mannwhitney pattern) — the raw stream shuffles once
  *    into per-bucket counts and never sees a single-partition window;
  *    2×rank stays in exact integer space.
  *  - Per-group rational terms are rounded to 9 dp and summed in
  *    DECIMAL (order-free across partitions — the q_agg_anova
  *    discipline).
  *  - Every ratio whose denominator can degenerate (one group, zero
  *    variance, no discordant pairs) gates to NULL identically in both
  *    engines (Spark 4 ANSI would otherwise throw DIVIDE_BY_ZERO).
  *  - Paired/user-level tests collapse the fact table with ONE
  *    map-side-combined per-user aggregate; the test statistic is
  *    assembled from a handful of 1-row broadcast aggregates. */
object Analytics59 {

  /** Kruskal–Wallis H across ALL event types (value, 0.1 buckets):
    * tie-averaged ranks from one cumulative pass over the bounded
    * bucket table, tie-corrected H. */
  private def qAggKruskal(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("b"))
    val cells = ev.groupBy(col("b"), col("g")).agg(count(lit(1)).as("c"))
    val bt = cells.groupBy(col("b")).agg(sum(col("c")).as("tb"))
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // 2×tie-averaged rank of every value in bucket b (exact integers)
    val ranks = bt
      .withColumn("cum", coalesce(sum(col("tb")).over(w), lit(0L)))
      .select(col("b"), (lit(2L) * col("cum") + col("tb") + 1).as("r2"),
        col("tb"))
    val grp = cells.join(ranks.select(col("b"), col("r2")), Seq("b"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("ng"), sum(col("c") * col("r2")).as("r2g"))
      // R_g²/n_g with R_g = r2g/2 — 9-dp DECIMAL so the k-term sum is
      // order-free; CAST to DOUBLE before squaring (BIGINT² overflows
      // past ~3e9 total rank mass)
      .withColumn("term", expr(
        "CAST(ROUND(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE) " +
          "/ (4.0 * CAST(ng AS DOUBLE)), 9) AS DECIMAL(28,9))"))
    val ties = bt.agg(
      sum(col("tb") * col("tb") * col("tb") - col("tb")).as("tsum"))
    grp.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("term")).as("st"))
      .crossJoin(broadcast(ties))
      .select(col("k"), col("n"),
        round(lit(12.0) / (dbl(col("n")) * dbl(col("n") + 1)) * dbl(col("st"))
          - lit(3.0) * dbl(col("n") + 1), 6).as("h"),
        round(lit(1.0) - dbl(col("tsum")) /
          (dbl(col("n")) * dbl(col("n")) * dbl(col("n")) - dbl(col("n"))),
          9).as("tie_c"),
        // all-tied data (C = 0) or a single group ⇒ H undefined
        when(col("k") > 1 &&
            lit(1.0) - dbl(col("tsum")) /
              (dbl(col("n")) * dbl(col("n")) * dbl(col("n")) - dbl(col("n")))
              > 0,
          round((lit(12.0) / (dbl(col("n")) * dbl(col("n") + 1))
            * dbl(col("st")) - lit(3.0) * dbl(col("n") + 1)) /
            (lit(1.0) - dbl(col("tsum")) /
              (dbl(col("n")) * dbl(col("n")) * dbl(col("n")) - dbl(col("n")))),
            6)).as("h_adj"))
  }

  /** Brown–Forsythe (Levene with median centers) of event value across
    * event types at 0.1-bucket precision: per-group bucket-exact lower
    * median, |b − med| spreads, one-way F on the spreads. */
  private def qAggLevene(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("b"))
    val cells = ev.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ng = cells.groupBy(col("g")).agg(sum(col("c")).as("ng"))
    // lower median: first bucket whose inclusive cumulative count
    // reaches ceil(ng/2) = (ng+1) div 2 (exact integer pick)
    val med = cells.join(broadcast(ng), Seq("g"))
      .withColumn("cumi", sum(col("c")).over(wg))
      .filter(col("cumi") >= expr("(ng + 1) div 2") &&
        col("cumi") - col("c") < expr("(ng + 1) div 2"))
      .select(col("g"), col("b").as("med"))
    val z = cells.join(broadcast(med), Seq("g"))
      .select(col("g"), col("c"),
        dbl(abs(col("b") - col("med"))).as("z"))
    // weighted one-way ANOVA on the spreads (the q_agg_anova shape)
    val grp = z.groupBy(col("g")).agg(
        sum(col("c")).as("ngr"),
        sum(expr("CAST(ROUND(c * z, 9) AS DECIMAL(28,9))")).as("sg"),
        sum(expr("CAST(ROUND(c * z * z, 9) AS DECIMAL(28,9))")).as("ssg"))
      .withColumn("tg", expr(
        "CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) " +
          "/ CAST(ngr AS DOUBLE), 9) AS DECIMAL(28,9))"))
    grp.agg(count(lit(1)).as("k"), sum(col("ngr")).as("n"),
        sum(col("sg")).as("sz"), sum(col("ssg")).as("ssz"),
        sum(col("tg")).as("st"))
      .select(col("k"), col("n"),
        round(dbl(col("st")) - dbl(col("sz")) * dbl(col("sz")) / dbl(col("n")),
          6).as("ssb"),
        round(dbl(col("ssz")) - dbl(col("st")), 6).as("ssw"),
        when(col("k") > 1 && col("n") > col("k") &&
            dbl(col("ssz")) - dbl(col("st")) > 0,
          round(((dbl(col("st")) - dbl(col("sz")) * dbl(col("sz"))
              / dbl(col("n"))) / (dbl(col("k")) - 1.0)) /
            ((dbl(col("ssz")) - dbl(col("st"))) /
              (dbl(col("n")) - dbl(col("k")))), 6)).as("f_bf"))
  }

  /** McNemar's test on paired per-user conversion before/after the
    * calendar midpoint: discordant-pair counts + continuity-corrected
    * χ² (1 df) — the paired A/B "did the change move users" check. */
  private def qAggMcnemar(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("us div 86400000000").as("day"))
    val span = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val flags = ev.crossJoin(broadcast(span))
      .withColumn("mid", expr("(lo + hi + 1) div 2"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase" &&
          col("day") < col("mid"), 1L).otherwise(0L)).as("x1"),
        max(when(col("event_type") === "purchase" &&
          col("day") >= col("mid"), 1L).otherwise(0L)).as("x2"))
    flags.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("x1") === 0 && col("x2") === 0, 1L).otherwise(0L))
          .as("n00"),
        sum(when(col("x1") === 0 && col("x2") === 1, 1L).otherwise(0L))
          .as("n01"),
        sum(when(col("x1") === 1 && col("x2") === 0, 1L).otherwise(0L))
          .as("n10"),
        sum(when(col("x1") === 1 && col("x2") === 1, 1L).otherwise(0L))
          .as("n11"))
      .select(col("n_users"), col("n00"), col("n01"), col("n10"),
        col("n11"),
        // no discordant pairs ⇒ the test is undefined → NULL
        when(col("n01") + col("n10") > 0,
          round((abs(dbl(col("n01")) - dbl(col("n10"))) - 1.0) *
            (abs(dbl(col("n01")) - dbl(col("n10"))) - 1.0) /
            (dbl(col("n01")) + dbl(col("n10"))), 6)).as("chi2_cc"))
  }

  /** Cochran's Q over k=3 calendar thirds: per-user binary purchase
    * outcome per third (complete blocks by construction), Q from exact
    * integer row/column totals — the k-treatment extension of McNemar. */
  private def qAggCochranq(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("us div 86400000000").as("day"))
    val span = ev.agg(min(col("day")).as("lo"),
      (max(col("day")) + 1).as("hi"))
    val flags = ev.crossJoin(broadcast(span))
      .withColumn("third", least(lit(2L),
        expr("(day - lo) * 3 div (hi - lo)")))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase" && col("third") === 0,
          1L).otherwise(0L)).as("x0"),
        max(when(col("event_type") === "purchase" && col("third") === 1,
          1L).otherwise(0L)).as("x1"),
        max(when(col("event_type") === "purchase" && col("third") === 2,
          1L).otherwise(0L)).as("x2"))
    flags.agg(
        count(lit(1)).as("n_users"),
        sum(col("x0")).as("c0"), sum(col("x1")).as("c1"),
        sum(col("x2")).as("c2"),
        sum(col("x0") + col("x1") + col("x2")).as("t"),
        sum((col("x0") + col("x1") + col("x2")) *
          (col("x0") + col("x1") + col("x2"))).as("r2"))
      .select(col("n_users"), col("c0"), col("c1"), col("c2"),
        // all-zero or all-k rows only ⇒ denominator 0 → NULL
        when(lit(3L) * col("t") - col("r2") > 0,
          round(lit(2.0) *
            (lit(3.0) * (dbl(col("c0")) * dbl(col("c0"))
              + dbl(col("c1")) * dbl(col("c1"))
              + dbl(col("c2")) * dbl(col("c2")))
              - dbl(col("t")) * dbl(col("t"))) /
            (lit(3.0) * dbl(col("t")) - dbl(col("r2"))), 6)).as("q"))
  }

  /** Friedman rank test: blocks = calendar weeks, treatments = event
    * types, value = the type's weekly count (0-filled grid). Within-
    * block tie-averaged ranks in exact 2× integer space; tie-corrected
    * χ²_F. The "did any event type systematically outrank the others
    * week over week" seasonality-robust check. */
  private def qAggFriedman(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type").as("g"),
        expr("us div 604800000000").as("wk"))
    val counts = ev.groupBy(col("wk"), col("g")).agg(count(lit(1)).as("c"))
    // 0-filled complete grid: every (week, type) cell exists
    val grid = counts.select(col("wk")).distinct()
      .crossJoin(counts.select(col("g")).distinct())
      .join(counts, Seq("wk", "g"), "left")
      .select(col("wk"), col("g"), coalesce(col("c"), lit(0L)).as("c"))
    // within-block 2×tie-averaged rank: cumLess over the block's
    // per-value tally (bounded: k values per block)
    val vals = grid.groupBy(col("wk"), col("c")).agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy(col("wk")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = vals
      .withColumn("cum", coalesce(sum(col("t")).over(wv), lit(0L)))
      .select(col("wk"), col("c"),
        (lit(2L) * col("cum") + col("t") + 1).as("r2"), col("t"))
    val perType = grid.join(ranked.select(col("wk"), col("c"), col("r2")),
        Seq("wk", "c"))
      .groupBy(col("g")).agg(sum(col("r2")).as("r2g"),
        count(lit(1)).as("nblk"))
      .withColumn("term", expr(
        "CAST(ROUND(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE) / 4.0, 9) " +
          "AS DECIMAL(28,9))"))
    val ties = ranked.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    perType.agg(count(lit(1)).as("k"), max(col("nblk")).as("n"),
        sum(col("term")).as("sr2"))
      .crossJoin(broadcast(ties))
      .select(col("k"), col("n"),
        round(lit(1.0) - dbl(col("tsum")) /
          (dbl(col("n")) * dbl(col("k")) *
            (dbl(col("k")) * dbl(col("k")) - 1.0)), 9).as("tie_c"),
        // k=1, n=0, or fully-tied blocks (C=0) ⇒ undefined → NULL
        when(col("k") > 1 && col("n") > 0 &&
            lit(1.0) - dbl(col("tsum")) /
              (dbl(col("n")) * dbl(col("k")) *
                (dbl(col("k")) * dbl(col("k")) - 1.0)) > 0,
          round((lit(12.0) / (dbl(col("n")) * dbl(col("k"))
              * (dbl(col("k")) + 1.0)) * dbl(col("sr2"))
            - lit(3.0) * dbl(col("n")) * (dbl(col("k")) + 1.0)) /
            (lit(1.0) - dbl(col("tsum")) /
              (dbl(col("n")) * dbl(col("k")) *
                (dbl(col("k")) * dbl(col("k")) - 1.0))), 6))
          .as("chi2_f"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_kruskal" -> (qAggKruskal _),
    "q_agg_levene" -> (qAggLevene _),
    "q_agg_mcnemar" -> (qAggMcnemar _),
    "q_agg_cochranq" -> (qAggCochranq _),
    "q_agg_friedman" -> (qAggFriedman _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_kruskal" ->
      """WITH ev AS (
        |  SELECT event_type AS g,
        |    CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS b
        |  FROM events),
        |cells AS (SELECT b, g, CAST(count(*) AS BIGINT) AS c
        |          FROM ev GROUP BY 1, 2),
        |bt AS (SELECT b, CAST(sum(c) AS BIGINT) AS tb
        |       FROM cells GROUP BY b),
        |ranks AS (
        |  SELECT b, 2 * COALESCE(sum(tb) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + tb + 1 AS r2
        |  FROM bt),
        |grp AS (
        |  SELECT g, CAST(sum(c) AS BIGINT) AS ng,
        |    CAST(sum(c * r2) AS BIGINT) AS r2g
        |  FROM cells JOIN ranks USING (b) GROUP BY g),
        |terms AS (
        |  SELECT g, ng, CAST(ROUND(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
        |      / (4.0 * CAST(ng AS DOUBLE)), 9) AS DECIMAL(28,9)) AS term
        |  FROM grp),
        |ties AS (SELECT CAST(sum(tb * tb * tb - tb) AS BIGINT) AS tsum
        |         FROM bt),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n, sum(term) AS st
        |  FROM terms)
        |SELECT k, n,
        |  ROUND(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
        |    * CAST(st AS DOUBLE) - 3.0 * CAST(n + 1 AS DOUBLE), 6) AS h,
        |  ROUND(1.0 - CAST(tsum AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |       - CAST(n AS DOUBLE)), 9) AS tie_c,
        |  CASE WHEN k > 1 AND 1.0 - CAST(tsum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |         - CAST(n AS DOUBLE)) > 0
        |    THEN ROUND((12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
        |      * CAST(st AS DOUBLE) - 3.0 * CAST(n + 1 AS DOUBLE))
        |      / (1.0 - CAST(tsum AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |            - CAST(n AS DOUBLE))), 6) END AS h_adj
        |FROM agg CROSS JOIN ties""".stripMargin,
    "q_agg_levene" ->
      """WITH ev AS (
        |  SELECT event_type AS g,
        |    CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS b
        |  FROM events),
        |cells AS (SELECT g, b, CAST(count(*) AS BIGINT) AS c
        |          FROM ev GROUP BY 1, 2),
        |ng AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng
        |       FROM cells GROUP BY g),
        |med AS (
        |  SELECT g, b AS med FROM (
        |    SELECT c.g, c.b, c.c, ng.ng,
        |      sum(c.c) OVER (PARTITION BY c.g ORDER BY c.b
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumi
        |    FROM cells c JOIN ng ON c.g = ng.g) a
        |  WHERE cumi >= (ng + 1) // 2 AND cumi - c < (ng + 1) // 2),
        |z AS (
        |  SELECT c.g, c.c, CAST(abs(c.b - m.med) AS DOUBLE) AS z
        |  FROM cells c JOIN med m ON c.g = m.g),
        |grp AS (
        |  SELECT g, CAST(sum(c) AS BIGINT) AS ngr,
        |    sum(CAST(ROUND(c * z, 9) AS DECIMAL(28,9))) AS sg,
        |    sum(CAST(ROUND(c * z * z, 9) AS DECIMAL(28,9))) AS ssg
        |  FROM z GROUP BY g),
        |terms AS (
        |  SELECT g, ngr, sg, ssg,
        |    CAST(ROUND(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |      / CAST(ngr AS DOUBLE), 9) AS DECIMAL(28,9)) AS tg
        |  FROM grp),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ngr) AS BIGINT) AS n, sum(sg) AS sz,
        |    sum(ssg) AS ssz, sum(tg) AS st
        |  FROM terms)
        |SELECT k, n,
        |  ROUND(CAST(st AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |    / CAST(n AS DOUBLE), 6) AS ssb,
        |  ROUND(CAST(ssz AS DOUBLE) - CAST(st AS DOUBLE), 6) AS ssw,
        |  CASE WHEN k > 1 AND n > k
        |      AND CAST(ssz AS DOUBLE) - CAST(st AS DOUBLE) > 0
        |    THEN ROUND(((CAST(st AS DOUBLE) - CAST(sz AS DOUBLE)
        |        * CAST(sz AS DOUBLE) / CAST(n AS DOUBLE))
        |        / (CAST(k AS DOUBLE) - 1.0))
        |      / ((CAST(ssz AS DOUBLE) - CAST(st AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) END AS f_bf
        |FROM agg""".stripMargin,
    "q_agg_mcnemar" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
        |flags AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND day < (lo + hi + 1) // 2 THEN 1 ELSE 0 END) AS x1,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND day >= (lo + hi + 1) // 2 THEN 1 ELSE 0 END) AS x2
        |  FROM ev CROSS JOIN span GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN x1 = 0 AND x2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n00,
        |  CAST(sum(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n01,
        |  CAST(sum(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n10,
        |  CAST(sum(CASE WHEN x1 = 1 AND x2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n11,
        |  CASE WHEN sum(CASE WHEN x1 <> x2 THEN 1 ELSE 0 END) > 0
        |    THEN ROUND(
        |      (abs(CAST(sum(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END)
        |            AS DOUBLE)
        |          - CAST(sum(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END)
        |            AS DOUBLE)) - 1.0)
        |      * (abs(CAST(sum(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END)
        |            AS DOUBLE)
        |          - CAST(sum(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END)
        |            AS DOUBLE)) - 1.0)
        |      / (CAST(sum(CASE WHEN x1 = 0 AND x2 = 1 THEN 1 ELSE 0 END)
        |            AS DOUBLE)
        |         + CAST(sum(CASE WHEN x1 = 1 AND x2 = 0 THEN 1 ELSE 0 END)
        |            AS DOUBLE)), 6) END AS chi2_cc
        |FROM flags""".stripMargin,
    "q_agg_cochranq" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |span AS (SELECT min(day) AS lo, max(day) + 1 AS hi FROM ev),
        |flags AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND LEAST(2, (day - lo) * 3 // (hi - lo)) = 0
        |        THEN 1 ELSE 0 END) AS x0,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND LEAST(2, (day - lo) * 3 // (hi - lo)) = 1
        |        THEN 1 ELSE 0 END) AS x1,
        |    max(CASE WHEN event_type = 'purchase'
        |        AND LEAST(2, (day - lo) * 3 // (hi - lo)) = 2
        |        THEN 1 ELSE 0 END) AS x2
        |  FROM ev CROSS JOIN span GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(x0) AS BIGINT) AS c0, CAST(sum(x1) AS BIGINT) AS c1,
        |  CAST(sum(x2) AS BIGINT) AS c2,
        |  CASE WHEN 3 * sum(x0 + x1 + x2)
        |      - sum((x0 + x1 + x2) * (x0 + x1 + x2)) > 0
        |    THEN ROUND(2.0 * (3.0 * (CAST(sum(x0) AS DOUBLE)
        |          * CAST(sum(x0) AS DOUBLE)
        |        + CAST(sum(x1) AS DOUBLE) * CAST(sum(x1) AS DOUBLE)
        |        + CAST(sum(x2) AS DOUBLE) * CAST(sum(x2) AS DOUBLE))
        |        - CAST(sum(x0 + x1 + x2) AS DOUBLE)
        |          * CAST(sum(x0 + x1 + x2) AS DOUBLE))
        |      / (3.0 * CAST(sum(x0 + x1 + x2) AS DOUBLE)
        |         - CAST(sum((x0 + x1 + x2) * (x0 + x1 + x2)) AS DOUBLE)),
        |      6) END AS q
        |FROM flags""".stripMargin,
    "q_agg_friedman" ->
      """WITH ev AS (
        |  SELECT event_type AS g,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
        |  FROM events),
        |counts AS (SELECT wk, g, CAST(count(*) AS BIGINT) AS c
        |           FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT w.wk, t.g, COALESCE(c.c, 0) AS c
        |  FROM (SELECT DISTINCT wk FROM counts) w
        |  CROSS JOIN (SELECT DISTINCT g FROM counts) t
        |  LEFT JOIN counts c ON c.wk = w.wk AND c.g = t.g),
        |vals AS (SELECT wk, c, CAST(count(*) AS BIGINT) AS t
        |         FROM grid GROUP BY 1, 2),
        |ranked AS (
        |  SELECT wk, c,
        |    2 * COALESCE(sum(t) OVER (PARTITION BY wk ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r2,
        |    t
        |  FROM vals),
        |pertype AS (
        |  SELECT g, CAST(sum(r2) AS BIGINT) AS r2g,
        |    CAST(count(*) AS BIGINT) AS nblk
        |  FROM grid JOIN ranked USING (wk, c) GROUP BY g),
        |terms AS (
        |  SELECT g, nblk, CAST(ROUND(CAST(r2g AS DOUBLE)
        |    * CAST(r2g AS DOUBLE) / 4.0, 9) AS DECIMAL(28,9)) AS term
        |  FROM pertype),
        |ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum
        |         FROM ranked),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(max(nblk) AS BIGINT) AS n, sum(term) AS sr2
        |  FROM terms)
        |SELECT k, n,
        |  ROUND(1.0 - CAST(tsum AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |       * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)), 9)
        |    AS tie_c,
        |  CASE WHEN k > 1 AND n > 0 AND 1.0 - CAST(tsum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |         * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)) > 0
        |    THEN ROUND((12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |        * (CAST(k AS DOUBLE) + 1.0)) * CAST(sr2 AS DOUBLE)
        |      - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
        |      / (1.0 - CAST(tsum AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |           * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))), 6)
        |    END AS chi2_f
        |FROM agg CROSS JOIN ties""".stripMargin,
  )
}
