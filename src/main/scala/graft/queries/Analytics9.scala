package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 eighth wave: the classical-inference trio a data-quality /
  * experimentation platform runs over event telemetry — chi-square
  * independence (categorical drift), Mann–Whitney rank-sum (distribution
  * shift without normality assumptions; the nonparametric sibling of
  * q_agg_ttest), and mutual information (feature relevance / leakage
  * screening).
  *
  * Scale notes:
  *  - All three collapse the raw stream to a BOUNDED exact-count table in
  *    one shuffle (25-cell contingency grid, ~¢-granular value buckets,
  *    5×24 type×hour grid); every downstream marginal/cumulative step
  *    runs over that bounded table, never the stream.
  *  - Determinism: counts stay exact BIGINTs; each per-cell double term
  *    (the only engine-order-sensitive step) is computed with an
  *    identical expression tree on both engines, rounded to 9 dp, summed
  *    as DECIMAL(18,9) (exact, order-free), and finished with one cast.
  *  - The rank statistic deliberately runs on BUCKETED values: telemetry
  *    rank tests bucket first in production too (a total order over raw
  *    doubles needs a global sort; a bounded bucket table needs one
  *    hash shuffle + a 1k-row cumulative window), and the tie-corrected
  *    variance makes the bucketing statistically honest. */
object Analytics9 {

  /** Chi-square test of independence: order priority × customer market
    * segment (5×5 grid). Expected counts from exact marginals; per-cell
    * (o−e)²/e decimal-routed; Cramér's V from the rounded statistic. */
  private def qAggChisq(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "orders")
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority").as("pri"),
        col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("c"))
    val rowt = cells.groupBy(col("pri")).agg(sum(col("c")).as("rt"))
    val colt = cells.groupBy(col("seg")).agg(sum(col("c")).as("ct"))
    val tot = cells.agg(sum(col("c")).as("n"))
    cells
      .join(broadcast(rowt), Seq("pri"))
      .join(broadcast(colt), Seq("seg"))
      .crossJoin(broadcast(tot))
      .withColumn("contrib", expr(
        """CAST(ROUND(
          |  (CAST(c AS DOUBLE)
          |     - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
          |       / CAST(n AS DOUBLE))
          |  * (CAST(c AS DOUBLE)
          |     - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
          |       / CAST(n AS DOUBLE))
          |  / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
          |     / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9))""".stripMargin))
      .agg(
        max(col("n")).as("n"),
        ((countDistinct(col("pri")) - 1)
          * (countDistinct(col("seg")) - 1)).as("dof"),
        (countDistinct(col("pri")) - 1).as("rm1"),
        (countDistinct(col("seg")) - 1).as("cm1"),
        sum(col("contrib")).as("s"))
      .select(col("n"), col("dof"),
        round(dbl(col("s")), 6).as("chi2"),
        round(sqrt(round(dbl(col("s")), 6)
          / (dbl(col("n")) * dbl(least(col("rm1"), col("cm1"))))), 6)
          .as("cramers_v"))
  }

  /** Mann–Whitney U (click vs view event values, 0.1-wide buckets):
    * tie-averaged ranks from one cumulative pass over the bounded bucket
    * count table, tie-corrected normal approximation z. All rank algebra
    * stays in doubled-integer space (2·rank is exact). */
  private def qAggMannWhitney(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("b"))
    val buckets = ev.groupBy(col("b")).agg(
      sum(when(col("g") === "click", 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === "view", 1L).otherwise(0L)).as("cb"))
    // Cumulative tie-group sizes over the BOUNDED bucket table (the raw
    // stream never sees this single-partition window).
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    buckets
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .agg(
        sum(col("ca")).as("n1"),
        sum(col("cb")).as("n2"),
        // 2·R1 = Σ ca·(2·cum + t + 1) — twice the tie-averaged rank sum
        sum(col("ca") * (lit(2L) * col("cum") + col("t") + 1)).as("r1x2"),
        // tie correction Σ (t³ − t), exact
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
      .select(col("n1"), col("n2"),
        // 2·U1 = 2·R1 − n1(n1+1); U values are exact .5-multiples
        ((col("r1x2") - col("n1") * (col("n1") + 1)) / lit(2.0)).as("u1"),
        (dbl(col("n1") * col("n2"))
          - (col("r1x2") - col("n1") * (col("n1") + 1)) / lit(2.0))
          .as("u2"),
        round(
          ((col("r1x2") - col("n1") * (col("n1") + 1)) / lit(2.0)
            - dbl(col("n1") * col("n2")) / lit(2.0))
          / sqrt(dbl(col("n1") * col("n2")) / lit(12.0)
            * (dbl(col("n1") + col("n2") + 1)
              - dbl(col("ties"))
                / (dbl(col("n1") + col("n2"))
                  * dbl(col("n1") + col("n2") - 1)))), 6).as("z"))
  }

  /** Mutual information (nats) between event type and hour-of-day, plus
    * marginal entropies and normalized MI — the feature-relevance /
    * leakage screen. 120-cell exact grid; decimal-routed ln terms. */
  private def qAggMutualInfo(s: SparkSession, d: String): DataFrame = {
    val cells = events(s, d)
      .select(col("event_type").as("x"),
        (expr("us div 3600000000") % 24).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
    val rowt = cells.groupBy(col("x")).agg(sum(col("c")).as("rt"))
    val colt = cells.groupBy(col("y")).agg(sum(col("c")).as("ct"))
    val tot = cells.agg(sum(col("c")).as("n"))
    val mi = cells
      .join(broadcast(rowt), Seq("x"))
      .join(broadcast(colt), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("contrib", expr(
        """CAST(ROUND(
          |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
          |  * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
          |       / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))), 9)
          |  AS DECIMAL(18,9))""".stripMargin))
      .agg(max(col("n")).as("n"), sum(col("contrib")).as("mi_s"))
    def entropy(marg: DataFrame, cnt: String): DataFrame = marg
      .crossJoin(broadcast(tot))
      .withColumn("hc", expr(
        s"""CAST(ROUND(
           |  -(CAST($cnt AS DOUBLE) / CAST(n AS DOUBLE))
           |  * ln(CAST($cnt AS DOUBLE) / CAST(n AS DOUBLE)), 9)
           |  AS DECIMAL(18,9))""".stripMargin))
      .agg(sum(col("hc")).as(s"h_$cnt"))
    mi.crossJoin(broadcast(entropy(rowt, "rt")))
      .crossJoin(broadcast(entropy(colt, "ct")))
      .select(col("n"),
        round(dbl(col("mi_s")), 6).as("mi_nats"),
        round(dbl(col("h_rt")), 6).as("h_type"),
        round(dbl(col("h_ct")), 6).as("h_hour"),
        round(round(dbl(col("mi_s")), 6)
          / sqrt(round(dbl(col("h_rt")), 6) * round(dbl(col("h_ct")), 6)),
          6).as("nmi"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_chisq" -> (qAggChisq _),
    "q_agg_mannwhitney" -> (qAggMannWhitney _),
    "q_agg_mutualinfo" -> (qAggMutualInfo _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_chisq" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS pri, c_mktsegment AS seg,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rowt AS (SELECT pri, CAST(sum(c) AS BIGINT) AS rt
        |         FROM cells GROUP BY pri),
        |colt AS (SELECT seg, CAST(sum(c) AS BIGINT) AS ct
        |         FROM cells GROUP BY seg),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |contrib AS (
        |  SELECT n,
        |    CAST(ROUND(
        |      (CAST(c AS DOUBLE)
        |         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |      * (CAST(c AS DOUBLE)
        |         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |         / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS contrib,
        |    pri, seg
        |  FROM cells
        |  JOIN rowt USING (pri) JOIN colt USING (seg) CROSS JOIN tot),
        |agg AS (
        |  SELECT max(n) AS n,
        |    CAST((count(DISTINCT pri) - 1) * (count(DISTINCT seg) - 1)
        |      AS BIGINT) AS dof,
        |    CAST(count(DISTINCT pri) - 1 AS BIGINT) AS rm1,
        |    CAST(count(DISTINCT seg) - 1 AS BIGINT) AS cm1,
        |    sum(contrib) AS s
        |  FROM contrib)
        |SELECT n, dof,
        |  round(CAST(s AS DOUBLE), 6) AS chi2,
        |  round(sqrt(round(CAST(s AS DOUBLE), 6)
        |    / (CAST(n AS DOUBLE)
        |       * CAST(least(rm1, cm1) AS DOUBLE))), 6) AS cramers_v
        |FROM agg""".stripMargin,
    "q_agg_mannwhitney" ->
      """WITH ev AS (
        |  SELECT event_type AS g,
        |    CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS b
        |  FROM events WHERE event_type IN ('click', 'view')),
        |buckets AS (
        |  SELECT b,
        |    CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM ev GROUP BY b),
        |cum AS (
        |  SELECT ca, cb, ca + cb AS t,
        |    COALESCE(CAST(sum(ca + cb) OVER (ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum
        |  FROM buckets),
        |agg AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS n1,
        |    CAST(sum(cb) AS BIGINT) AS n2,
        |    CAST(sum(ca * (2 * cum + t + 1)) AS BIGINT) AS r1x2,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS ties
        |  FROM cum)
        |SELECT n1, n2,
        |  (CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)) / 2.0 AS u1,
        |  CAST(n1 * n2 AS DOUBLE)
        |    - (CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)) / 2.0 AS u2,
        |  round(
        |    ((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)) / 2.0
        |      - CAST(n1 * n2 AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
        |      * (CAST(n1 + n2 + 1 AS DOUBLE)
        |        - CAST(ties AS DOUBLE)
        |          / (CAST(n1 + n2 AS DOUBLE)
        |            * CAST(n1 + n2 - 1 AS DOUBLE)))), 6) AS z
        |FROM agg""".stripMargin,
    "q_agg_mutualinfo" ->
      """WITH cells AS (
        |  SELECT event_type AS x,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |rowt AS (SELECT x, CAST(sum(c) AS BIGINT) AS rt
        |         FROM cells GROUP BY x),
        |colt AS (SELECT y, CAST(sum(c) AS BIGINT) AS ct
        |         FROM cells GROUP BY y),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |mi AS (
        |  SELECT max(n) AS n, sum(contrib) AS mi_s FROM (
        |    SELECT n, CAST(ROUND(
        |        CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |        * ln(CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
        |             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))), 9)
        |      AS DECIMAL(18,9)) AS contrib
        |    FROM cells
        |    JOIN rowt USING (x) JOIN colt USING (y) CROSS JOIN tot) z),
        |hx AS (
        |  SELECT sum(CAST(ROUND(
        |      -(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(rt AS DOUBLE) / CAST(n AS DOUBLE)), 9)
        |    AS DECIMAL(18,9))) AS h_rt FROM rowt CROSS JOIN tot),
        |hy AS (
        |  SELECT sum(CAST(ROUND(
        |      -(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 9)
        |    AS DECIMAL(18,9))) AS h_ct FROM colt CROSS JOIN tot)
        |SELECT n,
        |  round(CAST(mi_s AS DOUBLE), 6) AS mi_nats,
        |  round(CAST(h_rt AS DOUBLE), 6) AS h_type,
        |  round(CAST(h_ct AS DOUBLE), 6) AS h_hour,
        |  round(round(CAST(mi_s AS DOUBLE), 6)
        |    / sqrt(round(CAST(h_rt AS DOUBLE), 6)
        |           * round(CAST(h_ct AS DOUBLE), 6)), 6) AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,
  )
}
