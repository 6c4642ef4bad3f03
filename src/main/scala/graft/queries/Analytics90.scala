package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 eighth wave: multivariate diagnostics + the sequential
  * test —
  *
  *  - q_agg_corrmatrix: the pairwise Pearson matrix over lineitem's
  *    four numeric measures — the feature-selection first look,
  *    computed from ONE scan of exact DECIMAL cross-moments (six
  *    pairs from one aggregate row, no per-pair rescans);
  *  - q_agg_vif: variance inflation factors of (quantity, discount,
  *    tax) via the closed-form 3×3 correlation inverse
  *    (VIFᵢ = (1 − r_jk²)/det R) — the multicollinearity screen
  *    before any regression coefficients are trusted;
  *  - q_agg_mahalanobis: top-20 bivariate Mahalanobis outliers of
  *    (quantity, price) — d² = (z_q² + z_p² − 2ρ z_q z_p)/(1 − ρ²),
  *    the correlation-aware outlier score Grubbs/z-scores miss;
  *  - q_agg_sprt: Wald's sequential probability ratio test on the
  *    daily purchase-vs-view conversion rate (H₀ p=0.2 vs H₁ p=0.25,
  *    α=β=0.05 → ±ln 19 boundaries) — the always-valid sequential
  *    monitor next to q_agg_gst's group-sequential design.
  *
  * Determinism: all moments are exact DECIMAL sums from one pass;
  * per-row z-scores/d² are identical double trees of those exact
  * inputs; SPRT log-likelihood increments are exact integer counts
  * times fixed ln-constant expressions. Scale: corrmatrix/vif/
  * mahalanobis stats are one map-side-combined aggregate (the top-20
  * is a TakeOrdered, never a full sort); SPRT rides the
  * calendar-bounded daily grid. */
object Analytics90 {

  /** One-row exact cross-moments of the four lineitem measures. */
  private def moments(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_quantity").cast("decimal(18,6)").as("q"),
        col("l_extendedprice").cast("decimal(18,6)").as("p"),
        col("l_discount").cast("decimal(18,6)").as("dd"),
        col("l_tax").cast("decimal(18,6)").as("tt"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("p")).as("sp"),
        sum(col("dd")).as("sd"), sum(col("tt")).as("st"),
        sum(expr("q * q")).as("sqq"), sum(expr("p * p")).as("spp"),
        sum(expr("dd * dd")).as("sdd"), sum(expr("tt * tt")).as("stt"),
        sum(expr("q * p")).as("sqp"), sum(expr("q * dd")).as("sqd"),
        sum(expr("q * tt")).as("sqt"), sum(expr("p * dd")).as("spd"),
        sum(expr("p * tt")).as("spt"), sum(expr("dd * tt")).as("sdt"))

  private def covT(sxy: String, sx: String, sy: String) =
    s"""(CAST($sxy AS DOUBLE) / CAST(n AS DOUBLE)
       | - (CAST($sx AS DOUBLE) / CAST(n AS DOUBLE))
       |   * (CAST($sy AS DOUBLE) / CAST(n AS DOUBLE)))""".stripMargin
  private def corrT(sxy: String, sx: String, sy: String,
      sxx: String, syy: String) =
    s"""(${covT(sxy, sx, sy)}
       | / sqrt(${covT(sxx, sx, sx)} * ${covT(syy, sy, sy)}))"""
      .stripMargin

  /** 6-pair Pearson matrix (upper triangle) from one moment row. */
  private def qAggCorrmatrix(s: SparkSession, d: String): DataFrame = {
    val pairs = Seq(
      ("quantity", "price", "sqp", "sq", "sp", "sqq", "spp"),
      ("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"),
      ("quantity", "tax", "sqt", "sq", "st", "sqq", "stt"),
      ("price", "discount", "spd", "sp", "sd", "spp", "sdd"),
      ("price", "tax", "spt", "sp", "st", "spp", "stt"),
      ("discount", "tax", "sdt", "sd", "st", "sdd", "stt"))
    val cols = pairs.map { case (a, b, sxy, sx, sy, sxx, syy) =>
      s"""'$a', '$b', CASE WHEN ${covT(sxx, sx, sx)} > 0
         | AND ${covT(syy, sy, sy)} > 0
         | THEN ROUND(${corrT(sxy, sx, sy, sxx, syy)}, 6) END"""
        .stripMargin
    }.mkString(", ")
    moments(s, d)
      .selectExpr("n", s"stack(6, $cols) AS (var_x, var_y, pearson_r)")
      .select(col("var_x"), col("var_y"), col("pearson_r"), col("n"))
      .orderBy(col("var_x"), col("var_y"))
  }

  /** VIFs of (quantity, discount, tax) via the 3×3 closed form. */
  private def qAggVif(s: SparkSession, d: String): DataFrame = {
    val r12 = corrT("sqd", "sq", "sd", "sqq", "sdd") // q-d
    val r13 = corrT("sqt", "sq", "st", "sqq", "stt") // q-t
    val r23 = corrT("sdt", "sd", "st", "sdd", "stt") // d-t
    val det = s"""(1.0 + 2.0 * $r12 * $r13 * $r23
                 | - $r12 * $r12 - $r13 * $r13 - $r23 * $r23)"""
      .stripMargin
    val vguard = s"""(${covT("sqq", "sq", "sq")} > 0
                    | AND ${covT("sdd", "sd", "sd")} > 0
                    | AND ${covT("stt", "st", "st")} > 0)""".stripMargin
    moments(s, d)
      .selectExpr("n", s"""stack(3,
        |'quantity', CASE WHEN $vguard THEN
        |  CASE WHEN abs($det) > 0 THEN
        |    ROUND((1.0 - $r23 * $r23) / $det, 6) END END,
        |'discount', CASE WHEN $vguard THEN
        |  CASE WHEN abs($det) > 0 THEN
        |    ROUND((1.0 - $r13 * $r13) / $det, 6) END END,
        |'tax', CASE WHEN $vguard THEN
        |  CASE WHEN abs($det) > 0 THEN
        |    ROUND((1.0 - $r12 * $r12) / $det, 6) END END)
        | AS (variable, vif)""".stripMargin)
      .select(col("variable"), col("vif"), col("n"))
      .orderBy(col("variable"))
  }

  /** Top-20 bivariate Mahalanobis outliers of (quantity, price).
    * The five scalars (means, variances, ρ) are FINISHED inside the
    * broadcast 1-row table — the per-row expression then references
    * them as plain columns instead of re-expanding the moment algebra
    * ~10×, which bloated codegen and cost 3.7 s in the r13 bench. */
  private def qAggMahalanobis(s: SparkSession, d: String): DataFrame = {
    val m = moments(s, d).select(col("n"), col("sq"), col("sp"),
      col("sqq"), col("spp"), col("sqp"))
      .selectExpr(
        "CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mq",
        "CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mp",
        s"${covT("sqq", "sq", "sq")} AS vq",
        s"${covT("spp", "sp", "sp")} AS vp",
        s"""CASE WHEN ${covT("sqq", "sq", "sq")} > 0
           | AND ${covT("spp", "sp", "sp")} > 0 THEN
           | ${corrT("sqp", "sq", "sp", "sqq", "spp")} END"""
          .stripMargin + " AS rho")
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"))
    li.crossJoin(broadcast(m))
      .selectExpr("l_orderkey", "l_linenumber", "q", "p",
        """CASE WHEN vq > 0 AND vp > 0 AND rho IS NOT NULL THEN
          | CASE WHEN abs(1.0 - rho * rho) > 0 THEN
          | ROUND(
          |  ((q - mq) / sqrt(vq) * ((q - mq) / sqrt(vq))
          | + (p - mp) / sqrt(vp) * ((p - mp) / sqrt(vp))
          | - 2.0 * rho * ((q - mq) / sqrt(vq))
          |   * ((p - mp) / sqrt(vp)))
          | / (1.0 - rho * rho), 6)
          | END END AS d2""".stripMargin)
      .select(col("l_orderkey"), col("l_linenumber"), col("q"), col("p"),
        col("d2"))
      .orderBy(desc("d2"), col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** Wald SPRT on daily purchase-share (H₀ 0.2 vs H₁ 0.25). */
  private def qAggSprt(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("us div 86400000000").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("conv"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("cc", sum(col("c")).over(wCum))
      .select(col("day"), col("cn").as("cum_trials"),
        col("cc").as("cum_conversions"),
        expr("""ROUND(CAST(cc AS DOUBLE) * ln(0.25 / 0.2)
               | + CAST(cn - cc AS DOUBLE) * ln(0.75 / 0.8), 6)"""
          .stripMargin).as("llr"),
        expr("""CASE
               | WHEN CAST(cc AS DOUBLE) * ln(0.25 / 0.2)
               |   + CAST(cn - cc AS DOUBLE) * ln(0.75 / 0.8) >= ln(19.0)
               |   THEN 'accept_h1'
               | WHEN CAST(cc AS DOUBLE) * ln(0.25 / 0.2)
               |   + CAST(cn - cc AS DOUBLE) * ln(0.75 / 0.8) <= -ln(19.0)
               |   THEN 'accept_h0'
               | ELSE 'continue' END""".stripMargin).as("decision"))
      .orderBy(col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_corrmatrix" -> (qAggCorrmatrix _),
    "q_agg_vif" -> (qAggVif _),
    "q_agg_mahalanobis" -> (qAggMahalanobis _),
    "q_agg_sprt" -> (qAggSprt _),
  )

  private val momentsSql =
    """WITH m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    sum(q) AS sq, sum(p) AS sp, sum(dd) AS sd, sum(tt) AS st,
      |    sum(q * q) AS sqq, sum(p * p) AS spp, sum(dd * dd) AS sdd,
      |    sum(tt * tt) AS stt, sum(q * p) AS sqp, sum(q * dd) AS sqd,
      |    sum(q * tt) AS sqt, sum(p * dd) AS spd, sum(p * tt) AS spt,
      |    sum(dd * tt) AS sdt
      |  FROM (SELECT CAST(l_quantity AS DECIMAL(19,6)) AS q,
      |          CAST(l_extendedprice AS DECIMAL(19,6)) AS p,
      |          CAST(l_discount AS DECIMAL(19,6)) AS dd,
      |          CAST(l_tax AS DECIMAL(19,6)) AS tt
      |        FROM lineitem))
      |""".stripMargin

  val sql: Map[String, String] = {
    def cov(sxy: String, sx: String, sy: String) =
      s"""(CAST($sxy AS DOUBLE) / CAST(n AS DOUBLE)
         | - (CAST($sx AS DOUBLE) / CAST(n AS DOUBLE))
         |   * (CAST($sy AS DOUBLE) / CAST(n AS DOUBLE)))""".stripMargin
    def cor(sxy: String, sx: String, sy: String,
        sxx: String, syy: String) =
      s"""(${cov(sxy, sx, sy)}
         | / sqrt(${cov(sxx, sx, sx)} * ${cov(syy, sy, sy)}))"""
        .stripMargin
    val r12 = cor("sqd", "sq", "sd", "sqq", "sdd")
    val r13 = cor("sqt", "sq", "st", "sqq", "stt")
    val r23 = cor("sdt", "sd", "st", "sdd", "stt")
    val det = s"""(1.0 + 2.0 * $r12 * $r13 * $r23
                 | - $r12 * $r12 - $r13 * $r13 - $r23 * $r23)"""
      .stripMargin
    val zq = s"""((q - CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
                | / sqrt(${cov("sqq", "sq", "sq")}))""".stripMargin
    val zp = s"""((p - CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
                | / sqrt(${cov("spp", "sp", "sp")}))""".stripMargin
    val rho = cor("sqp", "sq", "sp", "sqq", "spp")
    Map(
      "q_agg_corrmatrix" -> (momentsSql +
        Seq(
          ("quantity", "price", "sqp", "sq", "sp", "sqq", "spp"),
          ("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"),
          ("quantity", "tax", "sqt", "sq", "st", "sqq", "stt"),
          ("price", "discount", "spd", "sp", "sd", "spp", "sdd"),
          ("price", "tax", "spt", "sp", "st", "spp", "stt"),
          ("discount", "tax", "sdt", "sd", "st", "sdd", "stt"))
          .map { case (a, b, sxy, sx, sy, sxx, syy) =>
            s"""SELECT '$a' AS var_x, '$b' AS var_y,
               |  CASE WHEN ${cov(sxx, sx, sx)} > 0
               |    AND ${cov(syy, sy, sy)} > 0 THEN
               |    ROUND(${cor(sxy, sx, sy, sxx, syy)}, 6) END
               |    AS pearson_r,
               |  n FROM m""".stripMargin
          }.mkString("\n", "\nUNION ALL\n", "\nORDER BY var_x, var_y")),
      "q_agg_vif" -> {
        val vg = s"""(${cov("sqq", "sq", "sq")} > 0
                    | AND ${cov("sdd", "sd", "sd")} > 0
                    | AND ${cov("stt", "st", "st")} > 0)""".stripMargin
        momentsSql +
        s"""SELECT 'quantity' AS variable,
           |  CASE WHEN $vg THEN CASE WHEN abs($det) > 0 THEN
           |    ROUND((1.0 - $r23 * $r23) / $det, 6) END END AS vif,
           |  n FROM m
           |UNION ALL
           |SELECT 'discount',
           |  CASE WHEN $vg THEN CASE WHEN abs($det) > 0 THEN
           |    ROUND((1.0 - $r13 * $r13) / $det, 6) END END, n FROM m
           |UNION ALL
           |SELECT 'tax',
           |  CASE WHEN $vg THEN CASE WHEN abs($det) > 0 THEN
           |    ROUND((1.0 - $r12 * $r12) / $det, 6) END END, n FROM m
           |ORDER BY variable""".stripMargin
      },
      "q_agg_mahalanobis" -> (momentsSql +
        s"""SELECT l_orderkey, l_linenumber, q, p,
           |  CASE WHEN ${cov("sqq", "sq", "sq")} > 0
           |    AND ${cov("spp", "sp", "sp")} > 0 THEN
           |  CASE WHEN abs(1.0 - $rho * $rho) > 0 THEN
           |  ROUND(($zq * $zq + $zp * $zp - 2.0 * $rho * $zq * $zp)
           |    / (1.0 - $rho * $rho), 6) END END AS d2
           |FROM (SELECT l_orderkey, l_linenumber,
           |        CAST(l_quantity AS DOUBLE) AS q,
           |        CAST(l_extendedprice AS DOUBLE) AS p
           |      FROM lineitem), m
           |ORDER BY d2 DESC, l_orderkey, l_linenumber
           |LIMIT 20""".stripMargin),
      "q_agg_sprt" ->
        """WITH daily AS (
          |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
          |      AS day,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
          |      ELSE 0 END) AS BIGINT) AS c
          |  FROM events WHERE event_type IN ('purchase', 'view')
          |  GROUP BY 1),
          |cum AS (
          |  SELECT day,
          |    sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cn,
          |    sum(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cc
          |  FROM daily)
          |SELECT day, CAST(cn AS BIGINT) AS cum_trials,
          |  CAST(cc AS BIGINT) AS cum_conversions,
          |  ROUND(CAST(cc AS DOUBLE) * ln(0.25 / 0.2)
          |    + CAST(cn - cc AS DOUBLE) * ln(0.75 / 0.8), 6) AS llr,
          |  CASE
          |    WHEN CAST(cc AS DOUBLE) * ln(0.25 / 0.2)
          |      + CAST(cn - cc AS DOUBLE) * ln(0.75 / 0.8) >= ln(19.0)
          |      THEN 'accept_h1'
          |    WHEN CAST(cc AS DOUBLE) * ln(0.25 / 0.2)
          |      + CAST(cn - cc AS DOUBLE) * ln(0.75 / 0.8) <= -ln(19.0)
          |      THEN 'accept_h0'
          |    ELSE 'continue' END AS decision
          |FROM cum ORDER BY day""".stripMargin,
    )
  }
}
