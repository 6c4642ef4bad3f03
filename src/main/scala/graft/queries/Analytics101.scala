package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 ninth wave: the measurement-agreement family, completing
  * what icc/ccc/kappa started — three oracled operators over a
  * naturally PAIRED order measurement: the GROSS valuation
  * (Σ extendedprice) vs the CHARGED valuation (Σ price·(1−disc)·
  * (1+tax), the chargeExact lattice) of each order — two accounting
  * bases for the same quantity, ~0.999-correlated with genuine
  * per-line spread. (The stated o_totalprice is NOT usable as the
  * pair: the synthetic generator draws it independently of the
  * lineitems — corr ≈ −0.02, which is exactly the discrepancy
  * q_quality_crossfield exists to report.)
  *
  *  - q_agg_deming: Deming (orthogonal, λ=1) regression of the
  *    charged valuation on the gross valuation — the
  *    method-comparison slope when BOTH measures carry error (OLS
  *    attenuates toward zero under x-error; the OLS slope is
  *    reported alongside so the attenuation is visible). Closed form
  *    from one exact micro-dollar moment scan.
  *  - q_agg_blandaltman: Bland–Altman agreement — mean bias (the
  *    net discount-vs-tax effect), limits of agreement (bias ±
  *    1.96·sd of the differences), and the share of orders outside
  *    the limits. The plot clinical method comparison lives on, as
  *    a table.
  *  - q_agg_fleiss: Fleiss' κ over orders with exactly 4 lineitems —
  *    the lineitems act as 4 "raters" assigning the order a
  *    returnflag category; κ measures within-order flag agreement
  *    beyond chance. Completes cohen-κ (2 raters) → fleiss-κ
  *    (n raters).
  *
  * Determinism: both order totals ride exact integer micro-dollars
  * (the chargeExact DECIMAL(18,6) lattice × 1e6); every moment is an
  * exact (19,0)² product sum; doubles only in the final closed forms,
  * 6/9dp-rounded. Scale: deming/blandaltman are one co-keyed
  * order-total join + one moment scan (blandaltman adds one pass
  * against a 1-row broadcast for the outside-LoA share); fleiss is
  * one (order, flag) count scan over the 4-line orders. */
object Analytics101 {

  /** (ok, x, y): gross vs charged order valuations in exact
    * micro-dollars — ONE lineitem scan, no join. */
  private def pairedTotals(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"),
        col("l_extendedprice").cast("decimal(9,2)").as("gross"),
        (col("l_extendedprice").cast("decimal(9,2)")
          * (lit(1) - col("l_discount").cast("decimal(4,2)"))
          * (lit(1) + col("l_tax").cast("decimal(4,2)")))
          .cast("decimal(18,6)").as("charge"))
      .groupBy(col("ok"))
      .agg(expr("CAST(sum(gross) * 1000000 AS BIGINT)").as("x"),
        expr("CAST(sum(charge) * 1000000 AS BIGINT)").as("y"))

  /** Deming (λ=1) + OLS slope from one exact moment scan. */
  private def qAggDeming(s: SparkSession, d: String): DataFrame =
    pairedTotals(s, d)
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sxx"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sxy"),
        sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("syy"))
      .select(col("n"),
        expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
          + " / CAST(n AS DOUBLE)").as("cxx"),
        expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
          + " / CAST(n AS DOUBLE)").as("cxy"),
        expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
          + " / CAST(n AS DOUBLE)").as("cyy"),
        expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").as("mx"),
        expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("my"))
      .select(col("n"),
        when(abs(col("cxy")) > 0, round(
          (col("cyy") - col("cxx")
            + sqrt((col("cyy") - col("cxx")) * (col("cyy") - col("cxx"))
              + lit(4.0) * col("cxy") * col("cxy")))
            / (lit(2.0) * col("cxy")), 9)).as("slope_deming"),
        when(col("cxx") > 0, round(col("cxy") / col("cxx"), 9))
          .as("slope_ols"),
        when(abs(col("cxy")) > 0, round((col("my")
          - (col("cyy") - col("cxx")
            + sqrt((col("cyy") - col("cxx")) * (col("cyy") - col("cxx"))
              + lit(4.0) * col("cxy") * col("cxy")))
            / (lit(2.0) * col("cxy")) * col("mx")) / 1.0e6, 6))
          .as("intercept_dollars"),
        when(col("cxx") > 0 && col("cyy") > 0,
          round(col("cxy") / sqrt(col("cxx") * col("cyy")), 6))
          .as("pearson_r"))

  /** Bland–Altman bias / limits of agreement / outside share. */
  private def qAggBlandaltman(s: SparkSession, d: String): DataFrame = {
    val p = pairedTotals(s, d).select((col("y") - col("x")).as("dd"))
    val m = p.agg(count(lit(1)).as("n"), sum(col("dd")).as("sd1"),
        sum(expr("CAST(dd AS DECIMAL(19,0)) * CAST(dd AS DECIMAL(19,0))"))
          .as("sd2"))
      .select(col("n"),
        expr("CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE)").as("bias"),
        expr("""sqrt(greatest(0.0,
               |  (CAST(sd2 AS DOUBLE)
               |   - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE)
               |     / CAST(n AS DOUBLE))
               |  / (CAST(n AS DOUBLE) - 1.0)))""".stripMargin).as("sd"))
      .filter(col("n") > 1)
    p.crossJoin(broadcast(m))
      .select(col("n"), col("bias"), col("sd"),
        when(abs(col("dd").cast("double") - col("bias"))
          > lit(1.96) * col("sd"), 1L).otherwise(0L).as("out"))
      .groupBy(col("n"), col("bias"), col("sd"))
      .agg(sum(col("out")).as("n_outside"))
      .select(col("n"),
        round(col("bias") / 1.0e6, 6).as("bias_dollars"),
        round((col("bias") - lit(1.96) * col("sd")) / 1.0e6, 6)
          .as("loa_lo_dollars"),
        round((col("bias") + lit(1.96) * col("sd")) / 1.0e6, 6)
          .as("loa_hi_dollars"),
        col("n_outside"),
        round(col("n_outside").cast("double") / col("n").cast("double"),
          6).as("pct_outside"))
  }

  /** Fleiss' κ over 4-lineitem orders, categories = returnflag. */
  private def qAggFleiss(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_returnflag").as("f"))
    val sized = li.groupBy(col("ok")).agg(count(lit(1)).as("nl"))
      .filter(col("nl") === 4).select(col("ok"))
    val nij = li.join(sized, Seq("ok"))
      .groupBy(col("ok"), col("f")).agg(count(lit(1)).as("c"))
    val m = nij.agg(countDistinct(col("ok")).as("items"),
      sum(col("c")).as("ratings"),
      // Σ_i Σ_j n_ij² (exact BIGINT: c ≤ 4)
      sum(col("c") * col("c")).as("ss"))
    val pj = nij.groupBy(col("f")).agg(sum(col("c")).as("cj"))
      .crossJoin(broadcast(m))
      // p_j² on the 12dp lattice so the chance-agreement sum is
      // engine-order-free
      .select(expr("""CAST(ROUND(POW(CAST(cj AS DOUBLE)
             | / CAST(ratings AS DOUBLE), 2), 12)
             | AS DECIMAL(18,12))""".stripMargin).as("pj2"))
      .agg(sum(col("pj2")).as("pe"))
    m.crossJoin(broadcast(pj))
      .filter(col("items") > 0)
      .select(col("items").as("n_items"),
        // P̄ = mean_i (Σ n_ij² − n)/(n(n−1)), n = 4
        expr("""(CAST(ss AS DOUBLE) - 4.0 * CAST(items AS DOUBLE))
               | / (12.0 * CAST(items AS DOUBLE))""".stripMargin)
          .as("pbar"),
        dbl(col("pe")).as("pbar_e"))
      .select(col("n_items"), round(col("pbar"), 6).as("pbar"),
        round(col("pbar_e"), 6).as("pbar_e"),
        when(lit(1.0) - col("pbar_e") > 1e-12,
          round((col("pbar") - col("pbar_e"))
            / (lit(1.0) - col("pbar_e")), 6)).as("fleiss_kappa"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_deming" -> (qAggDeming _),
    "q_agg_blandaltman" -> (qAggBlandaltman _),
    "q_agg_fleiss" -> (qAggFleiss _),
  )

  private val paired =
    """WITH p AS (
      |  SELECT l_orderkey AS ok,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2))) * 1000000
      |      AS BIGINT) AS x,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(9,2))
      |      * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |      * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6)))
      |      * 1000000 AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_deming" -> (paired +
      """m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    sum(y) AS sy,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS sxx,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS sxy,
        |    sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS syy
        |  FROM p),
        |c AS (
        |  SELECT n,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxx,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxy,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cyy,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my
        |  FROM m)
        |SELECT n,
        |  CASE WHEN abs(cxy) > 0 THEN ROUND((cyy - cxx
        |      + sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy))
        |      / (2.0 * cxy), 9) END AS slope_deming,
        |  CASE WHEN cxx > 0 THEN ROUND(cxy / cxx, 9) END AS slope_ols,
        |  CASE WHEN abs(cxy) > 0 THEN ROUND((my - (cyy - cxx
        |      + sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy))
        |      / (2.0 * cxy) * mx) / 1e6, 6) END AS intercept_dollars,
        |  CASE WHEN cxx > 0 AND cyy > 0
        |    THEN ROUND(cxy / sqrt(cxx * cyy), 6) END AS pearson_r
        |FROM c""".stripMargin),
    "q_agg_blandaltman" -> (paired +
      """dd AS (SELECT y - x AS dd FROM p),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dd) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bias,
        |    sqrt(greatest(0.0,
        |      (CAST(sum(CAST(dd AS DECIMAL(19,0))
        |          * CAST(dd AS DECIMAL(19,0))) AS DOUBLE)
        |       - CAST(sum(dd) AS DOUBLE) * CAST(sum(dd) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE))
        |      / (CAST(count(*) AS DOUBLE) - 1.0))) AS sd
        |  FROM dd HAVING count(*) > 1),
        |o AS (
        |  SELECT m.n, m.bias, m.sd,
        |    CAST(sum(CASE WHEN abs(CAST(dd.dd AS DOUBLE) - m.bias)
        |      > 1.96 * m.sd THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
        |  FROM dd CROSS JOIN m GROUP BY 1, 2, 3)
        |SELECT n, ROUND(bias / 1e6, 6) AS bias_dollars,
        |  ROUND((bias - 1.96 * sd) / 1e6, 6) AS loa_lo_dollars,
        |  ROUND((bias + 1.96 * sd) / 1e6, 6) AS loa_hi_dollars,
        |  n_outside,
        |  ROUND(CAST(n_outside AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS pct_outside
        |FROM o""".stripMargin),
    "q_agg_fleiss" ->
      """WITH sized AS (
        |  SELECT l_orderkey AS ok FROM lineitem
        |  GROUP BY 1 HAVING count(*) = 4),
        |nij AS (
        |  SELECT li.l_orderkey AS ok, li.l_returnflag AS f,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem li JOIN sized ON sized.ok = li.l_orderkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS items,
        |    CAST(sum(c) AS BIGINT) AS ratings,
        |    CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM nij),
        |pj AS (
        |  SELECT sum(CAST(ROUND(POW(CAST(cj AS DOUBLE)
        |      / CAST(ratings AS DOUBLE), 2), 12) AS DECIMAL(18,12)))
        |    AS pe
        |  FROM (SELECT f, sum(c) AS cj FROM nij GROUP BY f)
        |  CROSS JOIN m),
        |k AS (
        |  SELECT items AS n_items,
        |    (CAST(ss AS DOUBLE) - 4.0 * CAST(items AS DOUBLE))
        |      / (12.0 * CAST(items AS DOUBLE)) AS pbar,
        |    CAST(pe AS DOUBLE) AS pbar_e
        |  FROM m CROSS JOIN pj WHERE items > 0)
        |SELECT n_items, ROUND(pbar, 6) AS pbar,
        |  ROUND(pbar_e, 6) AS pbar_e,
        |  CASE WHEN 1.0 - pbar_e > 1e-12
        |    THEN ROUND((pbar - pbar_e) / (1.0 - pbar_e), 6)
        |  END AS fleiss_kappa
        |FROM k""".stripMargin,
  )
}
