package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 fifth wave: the spectral-collapse diagnostic the embedding
  * family lacked, the seasonality-robust trend test beside
  * Mann–Kendall, and the tail-risk report beside the percentile
  * family — three oracled operators:
  *
  *  - q_embed_effrank: effective rank (participation ratio) of the
  *    embedding covariance — tr(C)²/tr(C²), computable WITHOUT any
  *    eigendecomposition because tr(C²) = Σᵢⱼ Cᵢⱼ² — the one-number
  *    answer to "how many directions does this representation really
  *    use" (RankMe-style feature-collapse monitor); rides
  *    q_embed_covariance's one-scan 64×64 moment grid.
  *  - q_time_seasonalmk: seasonal Mann–Kendall (Hirsch–Slack) per
  *    event type with weekday seasons — pairs compare SAME-weekday
  *    days only, so a weekly cycle can't masquerade as (or mask) a
  *    trend: S = Σ_w S_w, Var = Σ_w Var_w with per-season tie
  *    corrections, continuity-corrected z. The day² pair join of
  *    q_agg_mannkendall becomes 7 smaller (day/7)² joins — CHEAPER
  *    than the unseasonal test at any scale.
  *  - q_agg_cvar: Value-at-Risk and Conditional VaR (expected
  *    shortfall) of order totals at 95% — VaR = percentile_disc on
  *    the exact cents lattice, ES = exact integer mean of the tail at
  *    or above it; the loss-tail report a robustness/risk review
  *    reads next to q_agg_iqr's spread.
  *
  * Determinism: effrank squares the 6dp-rounded covariance cells and
  * sums in DECIMAL (both engines square identical cells); seasonal MK
  * is a pure BIGINT sign/tie lattice (the mannkendall discipline);
  * cvar is exact lattice arithmetic to one final division. Scale:
  * effrank is one corpus scan to the 2,080-cell grid; seasonal MK's
  * pair joins are calendar-bounded per season; cvar is one agg +
  * a broadcast threshold. */
object Analytics107 {

  private def qEmbedEffrank(s: SparkSession, d: String): DataFrame = {
    val cells = Analytics2.qEmbedCovariance(s, d) // (i, j≥i, n, cov @6dp)
    // tr(C²) = Σ_all cov² + Σ_offdiag cov² (the 2× multiplier applied
    // by SUMMING TWICE, not by a LONG×DECIMAL product — that product
    // exceeds precision 38 and Spark's allowPrecisionLoss trims scale
    // where DuckDB keeps it, caught by the sf0.01 oracle)
    cells.agg(max(col("n")).as("n_vecs"),
        sum(when(col("i") === col("j"),
          expr("CAST(cov AS DECIMAL(18,6))"))).as("trc"),
        sum(expr("CAST(cov AS DECIMAL(18,6)) * CAST(cov AS DECIMAL(18,6))"))
          .as("sqAll"),
        sum(when(col("i") =!= col("j"),
          expr("CAST(cov AS DECIMAL(18,6)) * CAST(cov AS DECIMAL(18,6))")))
          .as("sqOff"))
      .select(col("n_vecs"), col("trc"),
        (dbl(col("sqAll")) + coalesce(dbl(col("sqOff")), lit(0.0)))
          .as("trc2"))
      .select(col("n_vecs"), lit(64L).as("dim"),
        round(dbl(col("trc")), 6).as("tr_c"),
        round(col("trc2"), 6).as("tr_c2"),
        when(col("trc2") > 0,
          round(dbl(col("trc")) * dbl(col("trc")) / col("trc2"), 6))
          .as("eff_rank"),
        when(col("trc2") > 0,
          round(dbl(col("trc")) * dbl(col("trc")) / col("trc2")
            / 64.0, 6)).as("rank_share"))
  }

  /** (et, weekday season, day ordinal, exact daily value). */
  private def dailySeasonal(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("et"), col("day"))
      .agg(sum(col("vv")).as("v"))
      .withColumn("wd", expr("day % 7"))

  private def qTimeSeasonalmk(s: SparkSession, d: String): DataFrame = {
    val g = dailySeasonal(s, d).localCheckpoint(true)
    val pairs = g.select(col("et"), col("wd"), col("day").as("di"),
        col("v").as("vi"))
      .join(g.select(col("et"), col("wd"), col("day").as("dj"),
        col("v").as("vj")), Seq("et", "wd"))
      .filter(col("di") < col("dj"))
    val sAgg = pairs.groupBy(col("et"))
      .agg(sum(when(col("vj") > col("vi"), 1L)
        .when(col("vj") < col("vi"), -1L).otherwise(0L)).as("s"))
    // per-season n and tie groups → Var18 = Σ_w [n(n−1)(2n+5) − ties]
    val perW = g.groupBy(col("et"), col("wd")).agg(count(lit(1)).as("nw"))
    val tiesW = g.groupBy(col("et"), col("wd"), col("v"))
      .agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy(col("et"), col("wd"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie18"))
    val varAgg = perW.join(tiesW, Seq("et", "wd"), "left")
      .groupBy(col("et"))
      .agg(sum(col("nw")).as("n"),
        sum(col("nw") * (col("nw") - 1) * (col("nw") * 2 + 5)
          - coalesce(col("tie18"), lit(0L))).as("var18"))
    varAgg.join(sAgg, Seq("et"))
      .select(col("et").as("event_type"), col("n"), col("s"),
        col("var18"),
        when(col("var18") > 0,
          round(dbl(col("s") - signum(col("s")).cast("long")) /
            sqrt(dbl(col("var18")) / 18.0), 6)).as("z"))
      .orderBy(col("event_type"))
  }

  private def qAggCvar(s: SparkSession, d: String): DataFrame = {
    val y = t(s, d, "orders")
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)").as("cents"))
    y.createOrReplaceTempView("graft_cvar_y")
    val varq = s.sql("SELECT percentile_disc(0.95) WITHIN GROUP" +
      " (ORDER BY cents) AS v95 FROM graft_cvar_y")
    y.crossJoin(broadcast(varq))
      .agg(count(lit(1)).as("n"), max(col("v95")).as("v95"),
        sum(when(col("cents") >= col("v95"), 1L).otherwise(0L))
          .as("tail_n"),
        sum(when(col("cents") >= col("v95"), col("cents"))).as("tail_sum"))
      .select(col("n"),
        round(dbl(col("v95")) / 100.0, 2).as("var95"),
        col("tail_n"),
        when(col("tail_n") > 0,
          round(dbl(col("tail_sum")) / dbl(col("tail_n")) / 100.0, 6))
          .as("es95"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_effrank" -> (qEmbedEffrank _),
    "q_time_seasonalmk" -> (qTimeSeasonalmk _),
    "q_agg_cvar" -> (qAggCvar _),
  )

  val sql: Map[String, String] = Map(
    // cell CTEs mirror q_embed_covariance's oracle verbatim
    "q_embed_effrank" ->
      """WITH idx AS (
        |  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j
        |  FROM generate_series(1, 64) g1(i)
        |       CROSS JOIN generate_series(1, 64) g2(j)
        |  WHERE j >= i),
        |p AS (SELECT i, j,
        |    CAST(e.embedding[i] AS DOUBLE)
        |    * CAST(e.embedding[j] AS DOUBLE) AS p
        |  FROM embeddings e CROSS JOIN idx),
        |s AS (SELECT i, j, sum(p) AS sp, CAST(count(*) AS BIGINT) AS n
        |      FROM p GROUP BY i, j),
        |m AS (SELECT CAST(i AS INT) AS i,
        |        avg(CAST(e.embedding[i] AS DOUBLE)) AS m
        |      FROM embeddings e CROSS JOIN generate_series(1, 64) g(i)
        |      GROUP BY 1),
        |cells AS (
        |  SELECT s.i, s.j, s.n,
        |    ROUND(s.sp / s.n - mi.m * mj.m, 6) + 0.0 AS cov
        |  FROM s JOIN m mi ON s.i = mi.i JOIN m mj ON s.j = mj.i),
        |agg AS (
        |  SELECT max(n) AS n_vecs,
        |    sum(CASE WHEN i = j THEN CAST(cov AS DECIMAL(18,6)) END)
        |      AS trc,
        |    CAST(sum(CAST(cov AS DECIMAL(18,6))
        |        * CAST(cov AS DECIMAL(18,6))) AS DOUBLE)
        |      + coalesce(CAST(sum(CASE WHEN i <> j THEN
        |          CAST(cov AS DECIMAL(18,6)) * CAST(cov AS DECIMAL(18,6))
        |        END) AS DOUBLE), 0.0) AS trc2
        |  FROM cells)
        |SELECT n_vecs, CAST(64 AS BIGINT) AS dim,
        |  ROUND(CAST(trc AS DOUBLE), 6) AS tr_c,
        |  ROUND(trc2, 6) AS tr_c2,
        |  CASE WHEN trc2 > 0 THEN
        |    ROUND(CAST(trc AS DOUBLE) * CAST(trc AS DOUBLE)
        |      / trc2, 6) END AS eff_rank,
        |  CASE WHEN trc2 > 0 THEN
        |    ROUND(CAST(trc AS DOUBLE) * CAST(trc AS DOUBLE)
        |      / trc2 / 64.0, 6) END AS rank_share
        |FROM agg""".stripMargin,
    "q_time_seasonalmk" ->
      """WITH g AS MATERIALIZED (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7 AS wd,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1, 2, 3),
        |sagg AS (
        |  SELECT a.et,
        |    CAST(sum(CASE WHEN b.v > a.v THEN 1
        |      WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM g a JOIN g b ON a.et = b.et AND a.wd = b.wd
        |    AND a.day < b.day
        |  GROUP BY 1),
        |perw AS (
        |  SELECT et, wd, CAST(count(*) AS BIGINT) AS nw
        |  FROM g GROUP BY 1, 2),
        |tiesw AS (
        |  SELECT et, wd,
        |    CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie18
        |  FROM (SELECT et, wd, v, CAST(count(*) AS BIGINT) AS t
        |        FROM g GROUP BY 1, 2, 3) z
        |  WHERE t > 1 GROUP BY 1, 2),
        |varagg AS (
        |  SELECT perw.et, CAST(sum(nw) AS BIGINT) AS n,
        |    CAST(sum(nw * (nw - 1) * (nw * 2 + 5)
        |      - coalesce(tie18, 0)) AS BIGINT) AS var18
        |  FROM perw LEFT JOIN tiesw
        |    ON tiesw.et = perw.et AND tiesw.wd = perw.wd
        |  GROUP BY 1)
        |SELECT varagg.et AS event_type, n, s, var18,
        |  CASE WHEN var18 > 0 THEN
        |    ROUND(CAST(s - CASE WHEN s > 0 THEN 1
        |        WHEN s < 0 THEN -1 ELSE 0 END AS DOUBLE)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) END AS z
        |FROM varagg JOIN sagg ON sagg.et = varagg.et
        |ORDER BY event_type""".stripMargin,
    "q_agg_cvar" ->
      """WITH y AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS cents
        |  FROM orders),
        |v AS (SELECT quantile_disc(cents, 0.95) AS v95 FROM y)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  ROUND(CAST(max(v95) AS DOUBLE) / 100.0, 2) AS var95,
        |  CAST(sum(CASE WHEN cents >= v95 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS tail_n,
        |  CASE WHEN sum(CASE WHEN cents >= v95 THEN 1 ELSE 0 END) > 0
        |    THEN ROUND(CAST(sum(CASE WHEN cents >= v95 THEN cents END)
        |        AS DOUBLE)
        |      / CAST(sum(CASE WHEN cents >= v95 THEN 1 ELSE 0 END)
        |        AS DOUBLE) / 100.0, 6) END AS es95
        |FROM y CROSS JOIN v""".stripMargin,
  )
}
