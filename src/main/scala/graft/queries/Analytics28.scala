package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-eighth wave: ROC AUC as a rank statistic (the model
  * metric, computed exactly from bucket counts — AUC IS Mann–Whitney U
  * normalized), the odds ratio with its log-scale CI (the 2×2 effect
  * measure clinical and conversion analyses share), and the one-row
  * graph summary (nodes/edges/density/degree extremes — the first
  * question about any graph).
  *
  * Scale notes:
  *  - AUC never sorts raw scores: values bucket to the exact decimal
  *    lattice (the q_agg_mannwhitney discipline), one cumulative pass
  *    over the bounded bucket table computes the DOUBLED tie-corrected
  *    numerator as exact BIGINTs, and one division finishes.
  *  - Odds ratio: one map-side-combined aggregate collapses the
  *    stream to four integers; zero cells gate to NULL (ANSI).
  *  - Graph summary: degree table → four aggregates; density's
  *    N(N−1) runs in BIGINT. */
object Analytics28 {

  /** Exact tie-corrected ROC AUC of `value` separating purchases
    * (positive) from views (negative). */
  private def qAggAuc(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("sc"))
      .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
    val wOrd = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = b
      .withColumn("cumneg", coalesce(sum(col("nn")).over(wOrd), lit(0L)))
      // doubled numerator stays integral under ties:
      // 2·Σ np·(neg_below + nn/2) = Σ np·(2·neg_below + nn).
      // Σ num2 ≈ 2·n_pos·n_neg, which overflows BIGINT past ~2e9 rows
      // per class — accumulate in DECIMAL(38,0) (same on the DuckDB
      // side) and divide in doubles at the end.
      .withColumn("num2", col("np").cast("decimal(19,0)") *
        (lit(2L) * col("cumneg") + col("nn")).cast("decimal(19,0)"))
    scored.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
      sum(col("num2")).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(dbl(col("num2")) /
            (lit(2.0) * dbl(col("n_pos")) * dbl(col("n_neg"))), 6))
          .as("auc"))
  }

  /** Odds ratio of a click being high-value (≥ 50) given it happened
    * in the afternoon (hour ≥ 12), with the 95% log-scale CI — the
    * 2×2 effect measure. (A user-level signup×purchase table is
    * degenerate on this corpus: every user does both.) */
  private def qAggOddsratio(s: SparkSession, d: String): DataFrame = {
    val wide = events(s, d)
      .filter(col("event_type") === "click")
      .select(when(col("value") >= 50.0, 1L).otherwise(0L).as("s"),
        when(expr("(us div 3600000000) % 24") >= 12, 1L).otherwise(0L)
          .as("p"))
      .agg(
        sum(when(col("s") === 1 && col("p") === 1, 1L).otherwise(0L))
          .as("a"),
        sum(when(col("s") === 1 && col("p") === 0, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("s") === 0 && col("p") === 1, 1L).otherwise(0L))
          .as("c"),
        sum(when(col("s") === 0 && col("p") === 0, 1L).otherwise(0L))
          .as("d"))
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    val or = (dbl(col("a")) * dbl(col("d"))) / (dbl(col("b")) * dbl(col("c")))
    val se = sqrt(lit(1.0) / dbl(col("a")) + lit(1.0) / dbl(col("b")) +
      lit(1.0) / dbl(col("c")) + lit(1.0) / dbl(col("d")))
    wide.select(col("a"), col("b"), col("c"), col("d"),
      when(ok, round(or, 6)).as("odds_ratio"),
      when(ok, round(exp(log(or) - lit(1.96) * se), 6)).as("ci_lo"),
      when(ok, round(exp(log(or) + lit(1.96) * se), 6)).as("ci_hi"))
  }

  /** One-row structural summary of the support-≥2 co-purchase graph. */
  private def qGraphSummary(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    val deg = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // 1-row broadcast edge count, not a driver-side .count(): one job,
    // no scalar round trip (the Analytics26 qTextBurstiness convention)
    val ne = e.agg(count(lit(1)).as("n_edges"))
    deg.agg(count(lit(1)).as("n_nodes"), max(col("deg")).as("max_deg"),
      sum(col("deg")).as("sum_deg"))
      .crossJoin(broadcast(ne))
      .select(col("n_nodes"), col("n_edges"), col("max_deg"),
        round(dbl(col("sum_deg")) / dbl(col("n_nodes")), 6).as("avg_deg"),
        when(col("n_nodes") > 1,
          round(lit(2.0) * dbl(col("n_edges")) /
            dbl(col("n_nodes") * (col("n_nodes") - 1)), 6)).as("density"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_auc" -> (qAggAuc _),
    "q_agg_oddsratio" -> (qAggOddsratio _),
    "q_graph_summary" -> (qGraphSummary _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_auc" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS sc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |c AS (
        |  SELECT np, nn,
        |    COALESCE(sum(nn) OVER (ORDER BY sc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cumneg
        |  FROM b),
        |agg AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |    CAST(sum(nn) AS BIGINT) AS n_neg,
        |    CAST(sum(CAST(np AS DECIMAL(19,0))
        |      * CAST(2 * cumneg + nn AS DECIMAL(19,0))) AS DECIMAL(38,0))
        |      AS num2
        |  FROM c)
        |SELECT n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        |    round(CAST(num2 AS DOUBLE)
        |      / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
        |  END AS auc
        |FROM agg""".stripMargin,
    "q_agg_oddsratio" ->
      """WITH cells AS (
        |  SELECT CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS s,
        |    CASE WHEN (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
        |           >= 12 THEN 1 ELSE 0 END AS p
        |  FROM events WHERE event_type = 'click'),
        |wide AS (
        |  SELECT
        |    CAST(sum(CASE WHEN s=1 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN s=1 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN s=0 AND p=1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN s=0 AND p=0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM cells)
        |SELECT a, b, c, d,
        |  CASE WHEN a>0 AND b>0 AND c>0 AND d>0 THEN
        |    round((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) END AS odds_ratio,
        |  CASE WHEN a>0 AND b>0 AND c>0 AND d>0 THEN
        |    round(exp(ln((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
        |        / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        |      - 1.96 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)
        |        + 1.0/CAST(c AS DOUBLE) + 1.0/CAST(d AS DOUBLE))), 6)
        |  END AS ci_lo,
        |  CASE WHEN a>0 AND b>0 AND c>0 AND d>0 THEN
        |    round(exp(ln((CAST(a AS DOUBLE) * CAST(d AS DOUBLE))
        |        / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
        |      + 1.96 * sqrt(1.0/CAST(a AS DOUBLE) + 1.0/CAST(b AS DOUBLE)
        |        + 1.0/CAST(c AS DOUBLE) + 1.0/CAST(d AS DOUBLE))), 6)
        |  END AS ci_hi
        |FROM wide""".stripMargin,
    "q_graph_summary" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        |SELECT CAST(count(*) AS BIGINT) AS n_nodes, n_edges,
        |  CAST(max(deg) AS BIGINT) AS max_deg,
        |  round(CAST(sum(deg) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS avg_deg,
        |  CASE WHEN count(*) > 1 THEN
        |    round(2.0 * CAST(n_edges AS DOUBLE)
        |      / CAST(count(*) * (count(*) - 1) AS DOUBLE), 6)
        |  END AS density
        |FROM deg, ne GROUP BY n_edges""".stripMargin,
  )
}
