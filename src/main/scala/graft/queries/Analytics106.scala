package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 fourth wave: the modern two-sample location test beside
  * Mann–Whitney, the ordered-alternative blocked test beside
  * Friedman/Quade, and the unequal-variance ANOVA beside the classic —
  * three oracled operators:
  *
  *  - q_agg_brunnermunzel: the Brunner–Munzel test on q_agg_mannwhitney's
  *    (click vs view, 0.1-bucket) setup — the replacement scipy/R now
  *    recommend when the two samples' variances (and tie structures)
  *    differ, where Mann–Whitney's permutation variance is wrong:
  *    studentizes p̂ = P(X<Y)+½P(X=Y) with PER-GROUP rank variances and
  *    Welch–Satterthwaite df. Every rank quantity is constant within a
  *    (group, bucket) cell, so the whole statistic reduces to ≤grid
  *    moments in exact 2×/4× integer rank space.
  *  - q_agg_pagetrend: Page's L test for a MONOTONE ordered alternative
  *    across blocked treatments — blocks = ISO weeks, treatments = the
  *    four ordered dayparts (0-5/6-11/12-17/18-23 h): "does activity
  *    shift later in the day, consistently week over week" — the
  *    ordered question Friedman (any difference) and Quade (weighted
  *    any-difference) cannot pose. Classical moments (ties noted
  *    uncorrected; within-block ranks still tie-averaged).
  *  - q_agg_welchanova: Welch's heteroscedastic one-way ANOVA across
  *    the five order priorities (totalprice cents) — the k-group
  *    extension of q_agg_welch, valid when q_agg_anova's equal-variance
  *    assumption fails; F* = A/(1+B) with Welch–Satterthwaite df2.
  *
  * Determinism: rank algebra in exact 2× integer space with
  * DECIMAL(19,0)² cell products; the final statistics are identical
  * double trees over exact moments, 6dp-rounded. Scale: all three
  * collapse the fact stream to bounded grids (value buckets,
  * weeks×4 dayparts, 5 priority groups) before any test algebra. */
object Analytics106 {

  private def qAggBrunnermunzel(s: SparkSession, d: String): DataFrame = {
    val buckets = t(s, d, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("b"))
      .groupBy(col("b")).agg(
        sum(when(col("g") === "click", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "view", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("b")) // bounded bucket table
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = buckets
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("cumx", coalesce(sum(col("ca")).over(w), lit(0L)))
      .withColumn("cumy", coalesce(sum(col("cb")).over(w), lit(0L)))
      // combined / within-group 2×tie-averaged midranks per bucket
      .select(col("ca"), col("cb"),
        (lit(2L) * col("cum") + col("t") + 1).as("r2"),
        (lit(2L) * col("cumx") + col("ca") + 1).as("rx2"),
        (lit(2L) * col("cumy") + col("cb") + 1).as("ry2"))
    // d = (combined − within) rank in 2× space; all moments are cell
    // counts × small integers (DECIMAL(19,0)² — the kruskal bound)
    val m = ranked.agg(
      sum(col("ca")).as("n1"), sum(col("cb")).as("n2"),
      sum(expr("CAST(ca AS DECIMAL(19,0)) * r2")).as("sr1"),
      sum(expr("CAST(cb AS DECIMAL(19,0)) * r2")).as("sr2"),
      sum(expr("CAST(ca AS DECIMAL(19,0)) * (r2 - rx2)")).as("sdx"),
      sum(expr("CAST(ca AS DECIMAL(19,0)) * (r2 - rx2) * (r2 - rx2)"))
        .as("sdx2"),
      sum(expr("CAST(cb AS DECIMAL(19,0)) * (r2 - ry2)")).as("sdy"),
      sum(expr("CAST(cb AS DECIMAL(19,0)) * (r2 - ry2) * (r2 - ry2)"))
        .as("sdy2"))
    m.select(col("n1"), col("n2"),
        // every ratio below gates on both samples being non-degenerate
        // (one-sided corpora would hit ANSI double DIVIDE_BY_ZERO)
        expr("""CASE WHEN n1 > 0 THEN
               |  CAST(sr1 AS DOUBLE) / 2.0 / CAST(n1 AS DOUBLE) END"""
          .stripMargin).as("rbx"),
        expr("""CASE WHEN n2 > 0 THEN
               |  CAST(sr2 AS DOUBLE) / 2.0 / CAST(n2 AS DOUBLE) END"""
          .stripMargin).as("rby"),
        // per-group variance of (combined − within)/2 ranks, ddof 1
        expr("""CASE WHEN n1 > 1 THEN
               | (CAST(sdx2 AS DOUBLE) / 4.0
               | - (CAST(sdx AS DOUBLE) / 2.0) * (CAST(sdx AS DOUBLE) / 2.0)
               |   / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) END"""
          .stripMargin).as("s1"),
        expr("""CASE WHEN n2 > 1 THEN
               | (CAST(sdy2 AS DOUBLE) / 4.0
               | - (CAST(sdy AS DOUBLE) / 2.0) * (CAST(sdy AS DOUBLE) / 2.0)
               |   / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) END"""
          .stripMargin).as("s2"))
      .select(col("n1"), col("n2"),
        when(col("n1") > 0 && col("n2") > 0,
          round((col("rby") - (dbl(col("n2")) + 1.0) / 2.0)
            / dbl(col("n1")), 6)).as("p_hat"),
        when(col("n1") > 1 && col("n2") > 1 &&
            dbl(col("n1")) * col("s1") + dbl(col("n2")) * col("s2") > 0,
          round(dbl(col("n1")) * dbl(col("n2")) * (col("rby") - col("rbx"))
            / (dbl(col("n1")) + dbl(col("n2")))
            / sqrt(dbl(col("n1")) * col("s1")
              + dbl(col("n2")) * col("s2")), 6)).as("w_stat"),
        when(col("n1") > 1 && col("n2") > 1 &&
            dbl(col("n1")) * col("s1") + dbl(col("n2")) * col("s2") > 0,
          round((dbl(col("n1")) * col("s1") + dbl(col("n2")) * col("s2"))
            * (dbl(col("n1")) * col("s1") + dbl(col("n2")) * col("s2"))
            / ((dbl(col("n1")) * col("s1")) * (dbl(col("n1")) * col("s1"))
                / (dbl(col("n1")) - 1.0)
              + (dbl(col("n2")) * col("s2")) * (dbl(col("n2")) * col("s2"))
                / (dbl(col("n2")) - 1.0)), 4)).as("df"))
  }

  private def qAggPagetrend(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(expr("us div 604800000000").as("wk"),
        expr("(us div 3600000000) % 24 div 6").as("pt"))
    val counts = ev.groupBy(col("wk"), col("pt")).agg(count(lit(1)).as("c"))
    val grid = counts.select(col("wk")).distinct()
      .crossJoin(s.range(4).select(col("id").as("pt")))
      .join(counts, Seq("wk", "pt"), "left")
      .select(col("wk"), col("pt"), coalesce(col("c"), lit(0L)).as("c"))
    val vals = grid.groupBy(col("wk"), col("c")).agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy(col("wk")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = vals
      .withColumn("cum", coalesce(sum(col("t")).over(wv), lit(0L)))
      .select(col("wk"), col("c"),
        (lit(2L) * col("cum") + col("t") + 1).as("r2"))
    val nb = grid.agg(countDistinct(col("wk")).as("n"))
    grid.join(r2, Seq("wk", "c"))
      .agg(sum((col("pt") + 1) * col("r2")).as("l2"))
      .crossJoin(broadcast(nb))
      .select(col("n").as("n_blocks"), lit(4L).as("k"),
        round(dbl(col("l2")) / 2.0, 1).as("l_stat"),
        // classical no-tie moments, k = 4: E[L] = n·k(k+1)²/4,
        // Var[L] = n·k²(k+1)(k²−1)/144 (ties tie-averaged in ranks,
        // variance uncorrected — stated, the jonckheere convention)
        round(dbl(col("n")) * 25.0, 1).as("e_l"),
        when(col("n") > 0,
          round((dbl(col("l2")) / 2.0 - dbl(col("n")) * 25.0)
            / sqrt(dbl(col("n")) * 16.0 * 5.0 * 15.0 / 144.0), 6))
          .as("z"))
  }

  private def qAggWelchanova(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "orders")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
        .as("g"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sy2"))
      .select(col("g"), col("n"),
        expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("m"),
        expr("""(CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)
               |  * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               | / (CAST(n AS DOUBLE) - 1.0)""".stripMargin).as("v"))
      .filter(col("n") > 1 && col("v") > 0)
      .select(col("g"), col("n"), col("m"),
        (dbl(col("n")) / col("v")).as("w"))
      .localCheckpoint(true) // ≤5-row group table
    val tot = g.agg(count(lit(1)).as("k"), sum(col("n")).as("n_total"),
      sum(col("w")).as("ww"),
      sum(col("w") * col("m")).as("swm"))
    g.crossJoin(broadcast(tot))
      .select(col("k"), col("n_total"), col("ww"),
        (col("w") * (col("m") - col("swm") / col("ww"))
          * (col("m") - col("swm") / col("ww"))).as("aterm"),
        ((lit(1.0) - col("w") / col("ww"))
          * (lit(1.0) - col("w") / col("ww"))
          / (dbl(col("n")) - 1.0)).as("hterm"))
      .groupBy(col("k"), col("n_total"))
      .agg(sum(col("aterm")).as("a"), sum(col("hterm")).as("h"))
      .select(col("k"), col("n_total"),
        when(col("k") > 1 && col("h") > 0,
          round((col("a") / (dbl(col("k")) - 1.0))
            / (lit(1.0) + lit(2.0) * (dbl(col("k")) - 2.0)
              / (dbl(col("k")) * dbl(col("k")) - 1.0) * col("h")), 6))
          .as("f_welch"),
        (col("k") - 1).as("df1"),
        when(col("k") > 1 && col("h") > 0,
          round((dbl(col("k")) * dbl(col("k")) - 1.0)
            / (lit(3.0) * col("h")), 4)).as("df2"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_brunnermunzel" -> (qAggBrunnermunzel _),
    "q_agg_pagetrend" -> (qAggPagetrend _),
    "q_agg_welchanova" -> (qAggWelchanova _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_brunnermunzel" ->
      """WITH buckets AS (
        |  SELECT CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS b,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT ca, cb,
        |    2 * coalesce(sum(ca + cb) OVER w, 0) + ca + cb + 1 AS r2,
        |    2 * coalesce(sum(ca) OVER w, 0) + ca + 1 AS rx2,
        |    2 * coalesce(sum(cb) OVER w, 0) + cb + 1 AS ry2
        |  FROM buckets
        |  WINDOW w AS (ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT sum(ca) AS n1, sum(cb) AS n2,
        |    sum(CAST(ca AS HUGEINT) * r2) AS sr1,
        |    sum(CAST(cb AS HUGEINT) * r2) AS sr2,
        |    sum(CAST(ca AS HUGEINT) * (r2 - rx2)) AS sdx,
        |    sum(CAST(ca AS HUGEINT) * (r2 - rx2) * (r2 - rx2)) AS sdx2,
        |    sum(CAST(cb AS HUGEINT) * (r2 - ry2)) AS sdy,
        |    sum(CAST(cb AS HUGEINT) * (r2 - ry2) * (r2 - ry2)) AS sdy2
        |  FROM ranked),
        |c AS (
        |  SELECT CAST(coalesce(n1, 0) AS BIGINT) AS n1,
        |    CAST(coalesce(n2, 0) AS BIGINT) AS n2,
        |    CASE WHEN n1 > 0 THEN
        |      CAST(sr1 AS DOUBLE) / 2.0 / CAST(n1 AS DOUBLE) END AS rbx,
        |    CASE WHEN n2 > 0 THEN
        |      CAST(sr2 AS DOUBLE) / 2.0 / CAST(n2 AS DOUBLE) END AS rby,
        |    CASE WHEN n1 > 1 THEN
        |     (CAST(sdx2 AS DOUBLE) / 4.0
        |      - (CAST(sdx AS DOUBLE) / 2.0) * (CAST(sdx AS DOUBLE) / 2.0)
        |        / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0) END
        |      AS s1,
        |    CASE WHEN n2 > 1 THEN
        |     (CAST(sdy2 AS DOUBLE) / 4.0
        |      - (CAST(sdy AS DOUBLE) / 2.0) * (CAST(sdy AS DOUBLE) / 2.0)
        |        / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0) END
        |      AS s2
        |  FROM m)
        |SELECT n1, n2,
        |  CASE WHEN n1 > 0 AND n2 > 0 THEN
        |    ROUND((rby - (CAST(n2 AS DOUBLE) + 1.0) / 2.0)
        |      / CAST(n1 AS DOUBLE), 6) END AS p_hat,
        |  CASE WHEN n1 > 1 AND n2 > 1
        |      AND CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2 > 0
        |    THEN ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |      * (rby - rbx) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |      / sqrt(CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2),
        |      6) END AS w_stat,
        |  CASE WHEN n1 > 1 AND n2 > 1
        |      AND CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2 > 0
        |    THEN ROUND((CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2)
        |      * (CAST(n1 AS DOUBLE) * s1 + CAST(n2 AS DOUBLE) * s2)
        |      / ((CAST(n1 AS DOUBLE) * s1) * (CAST(n1 AS DOUBLE) * s1)
        |          / (CAST(n1 AS DOUBLE) - 1.0)
        |        + (CAST(n2 AS DOUBLE) * s2) * (CAST(n2 AS DOUBLE) * s2)
        |          / (CAST(n2 AS DOUBLE) - 1.0)), 4) END AS df
        |FROM c""".stripMargin,
    "q_agg_pagetrend" ->
      """WITH ev AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 // 6
        |      AS pt
        |  FROM events),
        |counts AS (
        |  SELECT wk, pt, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT w.wk, p.pt, coalesce(c.c, 0) AS c
        |  FROM (SELECT DISTINCT wk FROM counts) w
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS pt) p
        |  LEFT JOIN counts c ON c.wk = w.wk AND c.pt = p.pt),
        |vals AS (
        |  SELECT wk, c, CAST(count(*) AS BIGINT) AS t
        |  FROM grid GROUP BY 1, 2),
        |r2 AS (
        |  SELECT wk, c, 2 * coalesce(sum(t) OVER (PARTITION BY wk
        |      ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM vals),
        |nb AS (SELECT CAST(count(DISTINCT wk) AS BIGINT) AS n FROM grid),
        |l AS (
        |  SELECT sum((grid.pt + 1) * r2.r2) AS l2
        |  FROM grid JOIN r2 ON r2.wk = grid.wk AND r2.c = grid.c)
        |SELECT n AS n_blocks, CAST(4 AS BIGINT) AS k,
        |  ROUND(CAST(l2 AS DOUBLE) / 2.0, 1) AS l_stat,
        |  ROUND(CAST(n AS DOUBLE) * 25.0, 1) AS e_l,
        |  CASE WHEN n > 0 THEN
        |    ROUND((CAST(l2 AS DOUBLE) / 2.0 - CAST(n AS DOUBLE) * 25.0)
        |      / sqrt(CAST(n AS DOUBLE) * 16.0 * 5.0 * 15.0 / 144.0), 6)
        |  END AS z
        |FROM l CROSS JOIN nb""".stripMargin,
    "q_agg_welchanova" ->
      """WITH g AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(y) AS sy, sum(CAST(y AS HUGEINT) * y) AS sy2
        |  FROM (SELECT o_orderpriority,
        |          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |            AS BIGINT) AS y
        |        FROM orders) z
        |  GROUP BY 1),
        |gm AS (
        |  SELECT g, n, CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    (CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS v
        |  FROM g WHERE n > 1),
        |gw AS (
        |  SELECT g, n, m, CAST(n AS DOUBLE) / v AS w
        |  FROM gm WHERE v > 0),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k, sum(n) AS n_total,
        |    sum(w) AS ww, sum(w * m) AS swm
        |  FROM gw),
        |terms AS (
        |  SELECT k, n_total, ww,
        |    w * (m - swm / ww) * (m - swm / ww) AS aterm,
        |    (1.0 - w / ww) * (1.0 - w / ww)
        |      / (CAST(n AS DOUBLE) - 1.0) AS hterm
        |  FROM gw CROSS JOIN tot),
        |agg AS (
        |  SELECT k, CAST(n_total AS BIGINT) AS n_total,
        |    sum(aterm) AS a, sum(hterm) AS h
        |  FROM terms GROUP BY k, n_total)
        |SELECT k, n_total,
        |  CASE WHEN k > 1 AND h > 0 THEN
        |    ROUND((a / (CAST(k AS DOUBLE) - 1.0))
        |      / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
        |        / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * h), 6)
        |  END AS f_welch,
        |  k - 1 AS df1,
        |  CASE WHEN k > 1 AND h > 0 THEN
        |    ROUND((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
        |      / (3.0 * h), 4) END AS df2
        |FROM agg""".stripMargin,
  )
}
