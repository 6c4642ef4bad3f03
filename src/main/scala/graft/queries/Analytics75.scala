package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 second wave: parametric DISTRIBUTION FITTING — the layer
  * that turns the existing tail/shape diagnostics (q_agg_hill,
  * q_agg_skewkurt) into named-distribution parameter estimates:
  *
  *  - q_agg_negbin: per-event-type negative-binomial fit (method of
  *    moments) of per-user event counts — the overdispersed count
  *    model behind user-activity simulation (r = m²/(v−m), p = m/v);
  *  - q_agg_weibull: Weibull shape/scale by median-rank regression of
  *    inter-order gaps — the lifetime model behind reorder-latency
  *    SLAs, fitted ENTIRELY on the bounded (gap-days, count) grid;
  *  - q_agg_gumbel: Gumbel (EV-I) location/scale by moments over
  *    monthly block maxima of daily revenue — the classic extreme-
  *    value capacity-planning fit;
  *  - q_agg_boxcox: Box–Cox λ profile over a fixed 5-point grid with
  *    the profile log-likelihood per λ and the argmax — "how should I
  *    transform this skewed metric before modeling".
  *
  * Scale: negbin is two chained bounded aggregates (user-collapse →
  * type-collapse); weibull's regression runs on the calendar-bounded
  * distinct-gap grid (never per-row ranks); gumbel's maxima table is
  * month-bounded; boxcox is one map-only pass per λ over a 5-row
  * broadcast grid with round-then-DECIMAL-sum moments. */
object Analytics75 {

  /** NB method-of-moments per event type over per-user counts. */
  private def qAggNegbin(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("k"))
    perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("k")).as("sk"),
        sum(col("k") * col("k")).as("skk"))
      .withColumn("m", expr("CAST(sk AS DOUBLE) / CAST(n_users AS DOUBLE)"))
      .withColumn("v", expr(
        "(CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE) " +
          "/ CAST(n_users AS DOUBLE)) / (CAST(n_users AS DOUBLE) - 1.0)"))
      .select(col("event_type"), col("n_users"),
        expr("ROUND(m, 6)").as("mean"), expr("ROUND(v, 6)").as("var"),
        expr("CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END").as("r"),
        expr("CASE WHEN v > m THEN ROUND(m / v, 6) END").as("p"),
        expr("ROUND(v / m, 6)").as("vmr"))
      .orderBy(col("event_type"))
  }

  /** Weibull median-rank regression on inter-order gap days, fitted on
    * the bounded (gap, cnt) grid: for each distinct gap value the
    * average rank r̄ = c_prev + (cnt+1)/2 gives the median-rank plotting
    * position F = (r̄ − 0.3)/(n + 0.4); weighted OLS of
    * ln(−ln(1−F)) on ln(gap) with weight cnt yields shape k and
    * scale λ = exp(−intercept/k). */
  private def qAggWeibull(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"))
    val gaps = t(s, d, "orders")
      .select(col("o_custkey"),
        expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000 AS BIGINT)").as("od"))
      .withColumn("prev", lag(col("od"), 1).over(w))
      .filter(col("prev").isNotNull && col("od") > col("prev"))
      .select((col("od") - col("prev")).as("gap"))
    val grid = gaps.groupBy(col("gap")).agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy(col("gap")) // bounded: distinct gap days
    val ranked = grid
      .withColumn("ccum", sum(col("cnt")).over(wc))
      .crossJoin(broadcast(grid.agg(sum(col("cnt")).as("n"))))
      .withColumn("rbar", expr(
        "CAST(ccum - cnt AS DOUBLE) + (CAST(cnt AS DOUBLE) + 1.0) / 2.0"))
      .withColumn("ff", expr(
        "(rbar - 0.3) / (CAST(n AS DOUBLE) + 0.4)"))
      .withColumn("lx", expr("ln(CAST(gap AS DOUBLE))"))
      .withColumn("ly", expr("ln(-ln(1.0 - ff))"))
    val m = ranked.agg(sum(col("cnt")).as("sw"),
      sum(expr("CAST(ROUND(cnt * lx, 6) AS DECIMAL(38,6))")).as("swx"),
      sum(expr("CAST(ROUND(cnt * ly, 6) AS DECIMAL(38,6))")).as("swy"),
      sum(expr("CAST(ROUND(cnt * lx * ly, 6) AS DECIMAL(38,6))")).as("swxy"),
      sum(expr("CAST(ROUND(cnt * lx * lx, 6) AS DECIMAL(38,6))")).as("swxx"))
    m.withColumn("k", expr(
        "(CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE) " +
          "- CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE)) " +
          "/ (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE) " +
          "- CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE))"))
      .withColumn("icpt", expr(
        "(CAST(swy AS DOUBLE) - k * CAST(swx AS DOUBLE)) " +
          "/ CAST(sw AS DOUBLE)"))
      .select(col("sw").as("n_gaps"),
        expr("ROUND(k, 6)").as("shape"),
        expr("ROUND(exp(-icpt / k), 6)").as("scale_days"))
  }

  /** Gumbel moments fit over monthly maxima of daily revenue:
    * β = s·√6/π, μ = m − γ·β (γ = Euler–Mascheroni). */
  private def qAggGumbel(s: SparkSession, d: String): DataFrame = {
    val dailyRev = events(s, d)
      .select(expr("us div 86400000000").as("day"),
        dec(col("value")).as("vv"))
      .groupBy(col("day")).agg(sum(col("vv")).as("v"))
    val maxima = dailyRev
      .withColumn("mth", expr("day div 30"))
      .groupBy(col("mth")).agg(max(col("v")).as("mx"))
    maxima.agg(count(lit(1)).as("n_blocks"),
        sum(col("mx")).as("sm"), sum(col("mx") * col("mx")).as("smm"))
      .withColumn("mean", expr("CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)"))
      .withColumn("sd", expr(
        "sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) " +
          "/ CAST(n_blocks AS DOUBLE)) / (CAST(n_blocks AS DOUBLE) - 1.0))"))
      .select(col("n_blocks"), expr("ROUND(mean, 6)").as("block_mean"),
        expr("ROUND(sd, 6)").as("block_sd"),
        expr("ROUND(sd * sqrt(6.0) / pi(), 6)").as("beta"),
        expr("ROUND(mean - 0.5772156649015329 * sd * sqrt(6.0) / pi(), 6)")
          .as("mu"))
  }

  /** Box–Cox λ profile log-likelihood over λ ∈ {−1, −0.5, 0, 0.5, 1}
    * for o_totalprice: LL(λ) = −n/2·ln(σ̂²_λ) + (λ−1)·Σ ln x.
    *
    * ONE scan: every λ's moment pair is a column of a single map-side-
    * combined aggregate (the first cut crossJoined the fact table
    * against the 5-row λ grid — a 5× row explode that benched 3.4 s;
    * this shape is 15 decimal sums over one pass). The λ rows
    * materialize AFTER aggregation by stacking the 1-row moment
    * vector. Term values are bit-identical to the exploded form, so
    * the DuckDB oracle (which keeps the readable grid form) still
    * matches exactly. */
  private def qAggBoxcox(s: SparkSession, d: String): DataFrame = {
    val lams = Seq(-1.0, -0.5, 0.0, 0.5, 1.0)
    val x = t(s, d, "orders")
      .select(dbl(col("o_totalprice")).as("x")).filter(col("x") > 0)
    def yExpr(l: Double): String =
      if (l == 0.0) "ln(x)" else s"(pow(x, $l) - 1.0) / $l"
    val aggCols =
      count(lit(1)).as("n") +:
      sum(expr("CAST(ROUND(ln(x), 9) AS DECIMAL(38,9))")).as("slx") +:
      lams.zipWithIndex.flatMap { case (l, i) =>
        Seq(sum(expr(s"CAST(ROUND(${yExpr(l)}, 9) AS DECIMAL(38,9))"))
            .as(s"sy_$i"),
          sum(expr(s"CAST(ROUND((${yExpr(l)}) * (${yExpr(l)}), 6) " +
            "AS DECIMAL(38,6))")).as(s"syy_$i"))
      }
    val m = x.agg(aggCols.head, aggCols.tail: _*)
    val rows = lams.zipWithIndex.map { case (l, i) =>
      m.select(lit(l).as("lam"), col("n"),
        col(s"sy_$i").as("sy"), col(s"syy_$i").as("syy"), col("slx"))
    }.reduce(_ unionAll _)
    val terms = rows
      .withColumn("varl", expr(
        "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) " +
          "/ CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)"))
      .withColumn("ll", expr(
        "ROUND(-CAST(n AS DOUBLE) / 2.0 * ln(varl) " +
          "+ (lam - 1.0) * CAST(slx AS DOUBLE), 4)"))
    val best = terms.orderBy(desc("ll"), col("lam")).limit(1)
      .select(col("lam").as("best_lam"))
    terms.crossJoin(broadcast(best))
      .select(col("lam"), col("n"), col("ll"),
        (col("lam") === col("best_lam")).as("is_best"))
      .orderBy(col("lam"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_negbin" -> (qAggNegbin _),
    "q_agg_weibull" -> (qAggWeibull _),
    "q_agg_gumbel" -> (qAggGumbel _),
    "q_agg_boxcox" -> (qAggBoxcox _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_negbin" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS k
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |    sum(k) AS sk, sum(k * k) AS skk
        |  FROM pu GROUP BY 1),
        |mv AS (
        |  SELECT event_type, n_users,
        |    CAST(sk AS DOUBLE) / CAST(n_users AS DOUBLE) AS m,
        |    (CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)
        |      / CAST(n_users AS DOUBLE))
        |     / (CAST(n_users AS DOUBLE) - 1.0) AS v
        |  FROM m)
        |SELECT event_type, n_users, ROUND(m, 6) AS mean, ROUND(v, 6) AS var,
        |  CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END AS r,
        |  CASE WHEN v > m THEN ROUND(m / v, 6) END AS p,
        |  ROUND(v / m, 6) AS vmr
        |FROM mv ORDER BY event_type""".stripMargin,
    "q_agg_weibull" ->
      """WITH od AS (
        |  SELECT o_custkey,
        |    CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000
        |      AS BIGINT) AS od
        |  FROM orders),
        |gaps AS (
        |  SELECT od - prev AS gap FROM (
        |    SELECT od, lag(od) OVER (PARTITION BY o_custkey ORDER BY od)
        |      AS prev FROM od) z
        |  WHERE prev IS NOT NULL AND od > prev),
        |grid AS (
        |  SELECT gap, CAST(count(*) AS BIGINT) AS cnt
        |  FROM gaps GROUP BY gap),
        |ranked AS (
        |  SELECT gap, cnt,
        |    sum(cnt) OVER (ORDER BY gap) AS ccum,
        |    (SELECT sum(cnt) FROM grid) AS n
        |  FROM grid),
        |pts AS (
        |  SELECT gap, cnt,
        |    ln(CAST(gap AS DOUBLE)) AS lx,
        |    ln(-ln(1.0 - ((CAST(ccum - cnt AS DOUBLE)
        |      + (CAST(cnt AS DOUBLE) + 1.0) / 2.0) - 0.3)
        |      / (CAST(n AS DOUBLE) + 0.4))) AS ly
        |  FROM ranked),
        |m AS (
        |  SELECT sum(cnt) AS sw,
        |    sum(CAST(ROUND(cnt * lx, 6) AS DECIMAL(38,6))) AS swx,
        |    sum(CAST(ROUND(cnt * ly, 6) AS DECIMAL(38,6))) AS swy,
        |    sum(CAST(ROUND(cnt * lx * ly, 6) AS DECIMAL(38,6))) AS swxy,
        |    sum(CAST(ROUND(cnt * lx * lx, 6) AS DECIMAL(38,6))) AS swxx
        |  FROM pts),
        |k AS (
        |  SELECT sw,
        |    (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
        |      - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
        |     / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
        |      - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS k,
        |    swx, swy FROM m)
        |SELECT CAST(sw AS BIGINT) AS n_gaps, ROUND(k, 6) AS shape,
        |  ROUND(exp(-((CAST(swy AS DOUBLE) - k * CAST(swx AS DOUBLE))
        |    / CAST(sw AS DOUBLE)) / k), 6) AS scale_days
        |FROM k""".stripMargin,
    "q_agg_gumbel" ->
      """WITH dr AS (
        |  SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      AS BIGINT) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1),
        |mx AS (
        |  SELECT day // 30 AS mth, max(v) AS mx FROM dr GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_blocks, sum(mx) AS sm,
        |    sum(mx * mx) AS smm
        |  FROM mx),
        |s AS (
        |  SELECT n_blocks,
        |    CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean,
        |    sqrt((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE)
        |        * CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) - 1.0)) AS sd
        |  FROM m)
        |SELECT n_blocks, ROUND(mean, 6) AS block_mean,
        |  ROUND(sd, 6) AS block_sd,
        |  ROUND(sd * sqrt(6.0) / pi(), 6) AS beta,
        |  ROUND(mean - 0.5772156649015329 * sd * sqrt(6.0) / pi(), 6) AS mu
        |FROM s""".stripMargin,
    "q_agg_boxcox" ->
      """WITH lams AS (
        |  SELECT unnest([-1.0, -0.5, 0.0, 0.5, 1.0]) AS lam),
        |terms AS (
        |  SELECT lam, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(y, 9) AS DECIMAL(38,9))) AS sy,
        |    sum(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS syy,
        |    sum(CAST(ROUND(ln(x), 9) AS DECIMAL(38,9))) AS slx
        |  FROM (
        |    SELECT lam,
        |      CASE WHEN lam = 0.0 THEN ln(x)
        |        ELSE (pow(x, lam) - 1.0) / lam END AS y, x
        |    FROM (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders
        |          WHERE o_totalprice > 0) o
        |    CROSS JOIN lams) z
        |  GROUP BY lam),
        |ll AS (
        |  SELECT lam, n,
        |    ROUND(-CAST(n AS DOUBLE) / 2.0
        |        * ln((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |            * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |          / CAST(n AS DOUBLE))
        |      + (lam - 1.0) * CAST(slx AS DOUBLE), 4) AS ll
        |  FROM terms),
        |best AS (
        |  SELECT lam AS best_lam FROM ll ORDER BY ll DESC, lam LIMIT 1)
        |SELECT lam, n, ll, lam = best_lam AS is_best
        |FROM ll CROSS JOIN best ORDER BY lam""".stripMargin,
  )
}
