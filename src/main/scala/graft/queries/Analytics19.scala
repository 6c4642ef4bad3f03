package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 nineteenth wave: Benford first-digit analysis (the audit /
  * fraud-screening staple), 30-day-period user churn (the complement
  * of q_win_retention/q_win_cohort: who LEFT), and equal-frequency
  * decile binning (the QuantileDiscretizer fit step of a feature
  * pipeline, as a reportable edge table).
  *
  * Scale notes:
  *  - Benford collapses the scan to 9 digit-count rows in one
  *    shuffle; shares and χ² contributions are fixed double trees
  *    over exact integers. The first digit comes from the same
  *    log10/floor expression tree on both engines (no string
  *    formatting, which engines disagree on).
  *  - Churn: one (user, period) distinct, one user-keyed lead window
  *    (a user's own next active period — no month×month self-join),
  *    one bounded per-period count; the final period is excluded
  *    (its churn is right-censored), via a 1-row broadcast max.
  *  - Binning never sorts the fact stream: prices sit on an exact
  *    decimal lattice, so the scan collapses to the bounded
  *    (flag, price) count grid and ntile's position-based bin
  *    boundaries are re-derived exactly by overlapping each value's
  *    contiguous position range with the 10 broadcast bin ranges —
  *    identical output to the windowed ntile, at lattice cost. */
object Analytics19 {

  /** Benford first-significant-digit distribution of order totals,
    * with expected log10(1+1/d) shares and per-digit χ² contribution. */
  private def qAggBenford(s: SparkSession, d: String): DataFrame = {
    val digits = t(s, d, "orders")
      .filter(col("o_totalprice") > 0.0)
      .withColumn("dig", expr(
        "CAST(floor(o_totalprice / power(10.0, floor(log10(o_totalprice)))) AS INT)"))
      .groupBy(col("dig")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("nn"))
    digits.crossJoin(broadcast(tot))
      .withColumn("obs", dbl(col("n")) / dbl(col("nn")))
      .withColumn("exp", expr("log10(1.0 + 1.0 / CAST(dig AS DOUBLE))"))
      .select(col("dig").as("digit"), col("n"),
        round(col("obs"), 6).as("obs_share"),
        round(col("exp"), 6).as("exp_share"),
        round((col("obs") - col("exp")) * (col("obs") - col("exp"))
          / col("exp") * dbl(col("nn")), 6).as("chi2_contrib"))
      .orderBy(col("digit"))
  }

  /** 30-day-period churn: per period, active users and the share of
    * them with NO activity in the immediately following period (the
    * final, right-censored period is excluded). */
  private def qWinChurn(s: SparkSession, d: String): DataFrame = {
    val up = events(s, d)
      .select(col("user_id"), expr("us div 2592000000000").as("p"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("p"))
    val flagged = up.withColumn("next_p", lead(col("p"), 1).over(w))
      .withColumn("churned",
        when(col("next_p").isNull || col("next_p") > col("p") + 1, 1L)
          .otherwise(0L))
    val maxp = up.agg(max(col("p")).as("maxp"))
    flagged.crossJoin(broadcast(maxp))
      .filter(col("p") < col("maxp"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n_active"), sum(col("churned")).as("n_churned"))
      .select(col("p").as("period"), col("n_active"), col("n_churned"),
        round(dbl(col("n_churned")) / dbl(col("n_active")), 6)
          .as("churn_rate"))
      .orderBy(col("period"))
  }

  /** Equal-frequency decile bins of extendedprice per return flag,
    * reduced to per-bin count and [lo, hi] edges — ntile semantics
    * reproduced EXACTLY from the bounded (flag, price) lattice count
    * table (the q_agg_mannwhitney discipline).
    *
    * ntile(10) over a price-ordered total order assigns positions
    * 1..n to bins whose boundaries depend only on n (first n%10 bins
    * get ⌈n/10⌉ rows). Rows sharing a price occupy a CONTIGUOUS
    * position range [cumless+1, cumless+cnt], and the output
    * aggregates (count, min/max price per bin) are position-functions
    * only — tie-break key order among equal prices cannot change
    * them. So: collapse the scan to the lattice grid (one map-side-
    * combined shuffle), overlap each value's position range with the
    * 10 broadcast bin ranges, and aggregate. The former formulation
    * sorted the full fact stream at parallelism = |flags| = 3. */
  private def qAggNtile(s: SparkSession, d: String): DataFrame = {
    val b = t(s, d, "lineitem")
      .groupBy(col("l_returnflag").as("g"),
        col("l_extendedprice").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pos = b
      .withColumn("spos", coalesce(sum(col("cnt")).over(wCum), lit(0L)) + 1)
      .withColumn("epos", col("spos") + col("cnt") - 1)
    // 10 bin position-ranges per group: q=n div 10, r=n%10, bin k covers
    // [(k−1)·q + min(k−1, r) + 1, that + q + (k≤r) − 1]
    val bins = b.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
      .select(col("g"), col("n"),
        explode(sequence(lit(1), lit(10))).as("bin"))
      .withColumn("lo_p", expr(
        "(bin - 1) * (n div 10) + least(CAST(bin - 1 AS BIGINT), n % 10) + 1"))
      .withColumn("hi_p", expr(
        "lo_p + (n div 10) + (CASE WHEN bin <= n % 10 THEN 1 ELSE 0 END) - 1"))
      .filter(col("hi_p") >= col("lo_p")) // n<10 ⇒ trailing bins empty
    pos.join(broadcast(bins), Seq("g"))
      .filter(col("epos") >= col("lo_p") && col("spos") <= col("hi_p"))
      .groupBy(col("g"), col("bin"))
      .agg(sum(least(col("epos"), col("hi_p"))
        - greatest(col("spos"), col("lo_p")) + 1).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .select(col("g").as("l_returnflag"), col("bin"), col("n"),
        col("lo"), col("hi"))
      .orderBy(col("l_returnflag"), col("bin"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_benford" -> (qAggBenford _),
    "q_win_churn" -> (qWinChurn _),
    "q_agg_ntile" -> (qAggNtile _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_benford" ->
      """WITH digits AS (
        |  SELECT CAST(floor(o_totalprice
        |      / power(10.0, floor(log10(o_totalprice)))) AS INT) AS dig,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders WHERE o_totalprice > 0.0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM digits)
        |SELECT dig AS digit, n,
        |  round(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS obs_share,
        |  round(log10(1.0 + 1.0 / CAST(dig AS DOUBLE)), 6) AS exp_share,
        |  round((CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
        |      - log10(1.0 + 1.0 / CAST(dig AS DOUBLE)))
        |    * (CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
        |      - log10(1.0 + 1.0 / CAST(dig AS DOUBLE)))
        |    / log10(1.0 + 1.0 / CAST(dig AS DOUBLE))
        |    * CAST(nn AS DOUBLE), 6) AS chi2_contrib
        |FROM digits, tot ORDER BY digit""".stripMargin,
    "q_win_churn" ->
      """WITH up AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 2592000000000 AS p
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, p,
        |    lead(p, 1) OVER (PARTITION BY user_id ORDER BY p) AS next_p
        |  FROM up),
        |mx AS (SELECT max(p) AS maxp FROM up)
        |SELECT p AS period, CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN next_p IS NULL OR next_p > p + 1
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
        |  round(CAST(sum(CASE WHEN next_p IS NULL OR next_p > p + 1
        |                      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS churn_rate
        |FROM flagged, mx WHERE p < maxp
        |GROUP BY p ORDER BY period""".stripMargin,
    "q_agg_ntile" ->
      """WITH b AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ntile(10) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber,
        |        l_partkey, l_suppkey, l_quantity) AS bin
        |  FROM lineitem)
        |SELECT l_returnflag, bin, CAST(count(*) AS BIGINT) AS n,
        |  min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM b GROUP BY l_returnflag, bin
        |ORDER BY l_returnflag, bin""".stripMargin,
  )
}
