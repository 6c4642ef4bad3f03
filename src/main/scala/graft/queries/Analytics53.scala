package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 tenth wave: small-segment rate stabilization and uplift
  * evaluation —
  *
  *  - q_agg_ebayes: empirical-Bayes (beta-binomial, method-of-moments)
  *    shrinkage of per-nation positive-balance rates — the standard
  *    fix for ranking segments by a rate when small segments produce
  *    extreme raw values (a 2/3 segment must not outrank a 400/1000
  *    one). The prior is fit FROM the data (no tuning), and the
  *    report shows raw vs shrunk side by side.
  *  - q_win_uplift: uplift (incrementality) evaluation of a targeting
  *    score: users ranked by score into deciles, per-decile treated/
  *    control conversion uplift and the cumulative Qini value — the
  *    model-evaluation report every incrementality program publishes
  *    (random targeting ⇒ Qini ≈ 0 at every depth).
  *
  * Scale notes:
  *  - ebayes: ONE scan collapses to the 25-row nation table; the prior
  *    moments are a second bounded aggregate over those 25 rows; all
  *    inputs to the final doubles are exact BIGINTs.
  *  - uplift: ONE user-keyed aggregate builds (user, arm, score,
  *    converted); the decile assignment is a rank window with a full
  *    (score, user_id) tie-break (ntile over ties would be
  *    nondeterministic across engines); everything after runs on the
  *    10-row decile grid. Degenerate deciles (empty control) gate to
  *    NULL identically. */
object Analytics53 {

  /** Beta-binomial EB shrinkage of per-nation positive-balance rates:
    * raw rate, shrunk rate, and the fitted prior. */
  private def qAggEbayes(s: SparkSession, d: String): DataFrame = {
    val nat = t(s, d, "customer")
      .groupBy(col("c_nationkey").as("nat"))
      .agg(count(lit(1)).as("n"),
        expr("count_if(c_acctbal > 0)").as("x"))
      .withColumn("r", expr("CAST(x AS DOUBLE) / CAST(n AS DOUBLE)"))
    // method-of-moments prior from the 25 group rates: K = m(1-m)/v - 1
    val prior = nat.agg(count(lit(1)).as("g"),
        sum(expr("CAST(ROUND(r, 9) AS DECIMAL(28,9))")).as("sr"),
        sum(expr("CAST(ROUND(r * r, 9) AS DECIMAL(38,9))")).as("sr2"))
      .selectExpr(
        "CAST(sr AS DOUBLE) / CAST(g AS DOUBLE) AS m",
        "CAST(sr2 AS DOUBLE) / CAST(g AS DOUBLE) " +
          "- (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) " +
          "* (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) AS v")
      .selectExpr("m",
        // degenerate spread (identical rates) → no shrinkage defined:
        // gate K to NULL, downstream falls back to the raw rate
        "CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0 " +
          "THEN m * (1.0 - m) / v - 1.0 END AS k")
    nat.crossJoin(broadcast(prior))
      .select(col("nat"), col("n"), col("x"),
        round(col("r"), 6).as("raw_rate"),
        round(when(col("k").isNotNull,
          expr("(CAST(x AS DOUBLE) + m * k) / (CAST(n AS DOUBLE) + k)"))
          .otherwise(col("r")), 6).as("shrunk_rate"),
        round(col("m"), 6).as("prior_mean"),
        round(col("k"), 6).as("prior_strength"))
      .orderBy(col("nat"))
  }

  /** Qini/uplift decile report: users ranked by click count (the
    * targeting score), per-decile and cumulative treated-vs-control
    * conversion uplift. */
  private def qWinUplift(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d)
      .groupBy(col("user_id"))
      .agg(expr("count_if(event_type = 'click')").as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "t").otherwise("c"))
    // distributed global rank: the click-count score domain is BOUNDED,
    // so rank = (#users with a higher score, from the broadcast
    // score-histogram) + row_number within the score group — a window
    // PARTITIONED by score, never a whole-corpus single-partition sort
    val wScore = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = users.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", sum(col("cnt")).over(wScore) - col("cnt"))
      .withColumn("nu", sum(col("cnt")).over(Window.partitionBy()))
      .select(col("score"), col("off"), col("nu"))
    val wIn = Window.partitionBy(col("score")).orderBy(col("user_id"))
    val decile = users.join(broadcast(offsets), Seq("score"))
      .withColumn("rn", col("off") + row_number().over(wIn))
      // decile = ceil(10·rn / nu) in exact integer arithmetic
      .withColumn("dec", expr("CAST((10 * rn + nu - 1) div nu AS BIGINT)"))
      .groupBy(col("dec"))
      .agg(expr("count_if(arm = 't')").as("nt"),
        expr("count_if(arm = 'c')").as("nc"),
        sum(when(col("arm") === "t", col("y")).otherwise(0L)).as("yt"),
        sum(when(col("arm") === "c", col("y")).otherwise(0L)).as("yc"))
    val wCum = Window.orderBy(col("dec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    decile
      .select(col("dec"), col("nt"), col("nc"),
        sum(col("nt")).over(wCum).as("cnt"),
        sum(col("nc")).over(wCum).as("cnc"),
        sum(col("yt")).over(wCum).as("cyt"),
        sum(col("yc")).over(wCum).as("cyc"),
        col("yt"), col("yc"))
      .selectExpr("dec AS decile", "nt", "nc",
        "CASE WHEN nt > 0 AND nc > 0 THEN " +
          "ROUND(CAST(yt AS DOUBLE) / nt - CAST(yc AS DOUBLE) / nc, 6) " +
          "END AS uplift",
        "CASE WHEN cnc > 0 THEN " +
          "ROUND(CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE) " +
          "* CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6) END AS qini")
      .orderBy(col("decile"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_ebayes" -> (qAggEbayes _),
    "q_win_uplift" -> (qWinUplift _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_ebayes" ->
      """WITH nat AS (
        |  SELECT c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM customer GROUP BY 1),
        |rates AS (
        |  SELECT nat, n, x,
        |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS r FROM nat),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS g,
        |    sum(CAST(ROUND(r, 9) AS DECIMAL(28,9))) AS sr,
        |    sum(CAST(ROUND(r * r, 9) AS DECIMAL(38,9))) AS sr2
        |  FROM rates),
        |prior AS (
        |  SELECT m, CASE WHEN v > 0 AND m * (1.0 - m) / v - 1.0 > 0
        |    THEN m * (1.0 - m) / v - 1.0 END AS k
        |  FROM (
        |    SELECT CAST(sr AS DOUBLE) / CAST(g AS DOUBLE) AS m,
        |      CAST(sr2 AS DOUBLE) / CAST(g AS DOUBLE)
        |        - (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))
        |        * (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) AS v
        |    FROM mom) a)
        |SELECT nat, n, x, ROUND(r, 6) AS raw_rate,
        |  ROUND(CASE WHEN k IS NOT NULL
        |    THEN (CAST(x AS DOUBLE) + m * k) / (CAST(n AS DOUBLE) + k)
        |    ELSE r END, 6) AS shrunk_rate,
        |  ROUND(m, 6) AS prior_mean, ROUND(k, 6) AS prior_strength
        |FROM rates CROSS JOIN prior ORDER BY nat""".stripMargin,
    "q_win_uplift" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    max(CASE WHEN event_type = 'purchase'
        |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 't' ELSE 'c' END AS arm
        |  FROM events GROUP BY 1),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, user_id)
        |      AS rn,
        |    CAST(count(*) OVER () AS BIGINT) AS nu
        |  FROM users),
        |dec AS (
        |  SELECT CAST((10 * rn + nu - 1) // nu AS BIGINT) AS dec,
        |    CAST(sum(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nt,
        |    CAST(sum(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nc,
        |    CAST(sum(CASE WHEN arm = 't' THEN y ELSE 0 END) AS BIGINT)
        |      AS yt,
        |    CAST(sum(CASE WHEN arm = 'c' THEN y ELSE 0 END) AS BIGINT)
        |      AS yc
        |  FROM ranked GROUP BY 1),
        |cum AS (
        |  SELECT dec, nt, nc, yt, yc,
        |    CAST(sum(nt) OVER w AS BIGINT) AS cnt,
        |    CAST(sum(nc) OVER w AS BIGINT) AS cnc,
        |    CAST(sum(yt) OVER w AS BIGINT) AS cyt,
        |    CAST(sum(yc) OVER w AS BIGINT) AS cyc
        |  FROM dec
        |  WINDOW w AS (ORDER BY dec
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT dec AS decile, nt, nc,
        |  CASE WHEN nt > 0 AND nc > 0 THEN
        |    ROUND(CAST(yt AS DOUBLE) / nt - CAST(yc AS DOUBLE) / nc, 6)
        |    END AS uplift,
        |  CASE WHEN cnc > 0 THEN
        |    ROUND(CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
        |      * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6) END AS qini
        |FROM cum ORDER BY decile""".stripMargin,
  )
}
