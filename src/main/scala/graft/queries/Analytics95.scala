package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 second wave: the regression-diagnostics hole next to the
  * existing OLS family (ols/ols2/durbinwatson/cooksd), a
  * sampling-design op, and a cross-field consistency audit — five
  * oracled operators:
  *
  *  - q_agg_breuschpagan: Breusch–Pagan heteroscedasticity LM test on
  *    the lineitem price~quantity OLS — "can I trust these standard
  *    errors". Aux regression of squared residuals on x; LM = n·R²,
  *    χ²(1) critical flag at 5%.
  *  - q_agg_chow: Chow structural-break F test at the 1998-01-01
  *    shipdate pivot — did the price~quantity relation change between
  *    eras (the regression companion to q_time_changepoint).
  *  - q_agg_welch: Welch's heteroscedastic one-way ANOVA across event
  *    types — the variant of q_agg_anova that doesn't assume equal
  *    variances (and the test to reach for after breuschpagan says
  *    the classic one lied).
  *  - q_sample_systematic: Madow systematic PPS sampling of customers
  *    by revenue size — 100 equally-spaced points over the exact
  *    cumulative-cents line; big customers can be hit multiple times
  *    (their multiplicity IS the design). Fully integer arithmetic,
  *    so exactly oracled, unlike RNG-based sampling.
  *  - q_quality_crossfield: per-order consistency of o_totalprice vs
  *    the recomputed lineitem charge total (the chargeExact lattice),
  *    bucketed by exact-DECIMAL relative error — the cross-FIELD
  *    sibling of q_quality_integrity's cross-TABLE checks.
  *
  * Determinism: every moment is an exact-DECIMAL sum (per-row values
  * rounded to an explicit lattice first where the source is double);
  * doubles appear only after aggregation, derived from identical
  * decimal→double conversions on both engines. Scale: breuschpagan is
  * two scans (moments, then residual moments against a 1-row
  * broadcast); chow/welch/crossfield are one grouped scan plus bounded
  * combines; systematic is one window pass over the customer-bounded
  * revenue table. */
object Analytics95 {

  /** Exact decimal moments of (x=quantity, y=extendedprice). */
  private[graft] def liMoments(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(dec(col("l_quantity")).as("x"),
        dec(col("l_extendedprice")).as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))

  /** Breusch–Pagan: aux-regress e² on x, LM = n·R²aux ~ χ²(1). */
  private def qAggBreuschpagan(s: SparkSession, d: String): DataFrame = {
    // ANSI gates (DegenerateInput discipline): constant x ⇒ zero
    // x-variance ⇒ the b and R² divisions would THROW under Spark 4
    // ANSI even in DOUBLE — NULL the statistic instead
    val ab = liMoments(s, d).select(col("n"),
      expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
             |(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             | - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END"""
        .stripMargin).as("b"),
      (dbl(col("sy")) / dbl(col("n"))).as("my"),
      (dbl(col("sx")) / dbl(col("n"))).as("mx"))
    val u = t(s, d, "lineitem")
      .select(dec(col("l_quantity")).as("xd"),
        dec(col("l_extendedprice")).as("yd"))
      .crossJoin(broadcast(ab))
      // residual via the centered form y−my−b(x−mx); u=e² rounded to
      // the 4dp lattice (u ≤ ~1e10, so DECIMAL(38,4) sums stay exact)
      .select(col("n"), col("xd"),
        expr("""CAST(ROUND(
               |  (CAST(yd AS DOUBLE) - my
               |   - b * (CAST(xd AS DOUBLE) - mx))
               |  * (CAST(yd AS DOUBLE) - my
               |     - b * (CAST(xd AS DOUBLE) - mx)), 4)
               | AS DECIMAL(38,4))""".stripMargin).as("u"))
    u.agg(max(col("n")).as("n"), sum(col("xd")).as("sx"),
        sum(col("u")).as("su"),
        sum(col("xd") * col("u")).as("sxu"),
        sum(col("xd") * col("xd")).as("sxx"),
        sum(col("u") * col("u")).as("suu"))
      .select(col("n"),
        expr("""CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |     * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
               |        - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) > 0
               | THEN ROUND(CAST(n AS DOUBLE) *
               |  POW(CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE), 2)
               |  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               |     * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
               |        - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6)
               | END""".stripMargin).as("lm"))
      .select(col("n"), col("lm"), lit(1L).as("df"),
        expr("CAST(CASE WHEN lm > 3.841459 THEN 1 ELSE 0 END AS BIGINT)")
          .as("heteroscedastic_5pct"))
  }

  /** Chow break test at the 1998-01-01 shipdate pivot (k = 2 params). */
  private def qAggChow(s: SparkSession, d: String): DataFrame = {
    // the q_agg_hhi cents idiom: values ride as exact BIGINT
    // hundredths and squares as DECIMAL(19,0)×DECIMAL(19,0) →
    // DECIMAL(38,0) on BOTH engines — a decimal×decimal at scale 4
    // either overflows DuckDB's int64 multiply path (≤(18,8)) or
    // trims Spark's scale at precision 39, so the integer lattice is
    // the only width that is exact and identical on both. The 1e4
    // area factor (cents² → dollars²) divides out of F and is folded
    // into the reported SSRs.
    val m = t(s, d, "lineitem")
      .select(
        expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("y"),
        when(col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
          0L).otherwise(1L).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sxy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sxx"),
        sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("syy"))
    // SSR from exact moments: Syy − Sxy²/Sxx (centered); the pooled
    // moments are the sums of the two groups' exact integers. The
    // /1e4 converts cents² to dollars².
    // the CASE gate NULLs a group whose x is constant (centered Sxx
    // = 0 — ANSI DOUBLE division throws; DegenerateInput discipline)
    def ssr(n: String, sx: String, sy: String, sxy: String,
        sxx: String, syy: String): String =
      s"""(CASE WHEN CAST($sxx AS DOUBLE)
         |     - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE)
         |       / CAST($n AS DOUBLE) > 0 THEN
         |((CAST($syy AS DOUBLE)
         | - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE)
         |   / CAST($n AS DOUBLE))
         |- POW(CAST($sxy AS DOUBLE)
         |      - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE)
         |        / CAST($n AS DOUBLE), 2)
         |  / (CAST($sxx AS DOUBLE)
         |     - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE)
         |       / CAST($n AS DOUBLE))) / 10000.0 END)""".stripMargin
    m.agg(sum(col("n")).as("n"), sum(col("sx")).as("psx"),
        sum(col("sy")).as("psy"), sum(col("sxy")).as("psxy"),
        sum(col("sxx")).as("psxx"), sum(col("syy")).as("psyy"),
        sum(when(col("g") === 0, col("n")).otherwise(0L)).as("n0"),
        min(when(col("g") === 0,
          expr(ssr("n", "sx", "sy", "sxy", "sxx", "syy")))).as("ssr0"),
        min(when(col("g") === 1,
          expr(ssr("n", "sx", "sy", "sxy", "sxx", "syy")))).as("ssr1"))
      .select(col("n"), col("n0"), (col("n") - col("n0")).as("n1"),
        expr(ssr("n", "psx", "psy", "psxy", "psxx", "psyy")).as("ssrp"),
        col("ssr0"), col("ssr1"))
      // SSRs reported in BILLIONS of dollars-squared: the raw sums sit
      // at ~5e14 where the two engines' (exact-)decimal->double
      // conversions legitimately differ by a few ulps (Spark's
      // BigDecimal conversion is correctly rounded, DuckDB's
      // int128 path is not) — the /1e9 gives a ~4.5e-10 relative
      // margin at the 6dp report lattice; F, a ratio, is insensitive
      .select(col("n"), col("n0"), col("n1"),
        round(col("ssrp") / 1.0e9, 6).as("ssr_pooled_bn"),
        round((col("ssr0") + col("ssr1")) / 1.0e9, 6).as("ssr_split_bn"),
        when(col("ssr0") + col("ssr1") > 0 && col("n") > 4,
          round(((col("ssrp") - col("ssr0") - col("ssr1")) / lit(2.0))
            / ((col("ssr0") + col("ssr1"))
              / (dbl(col("n")) - lit(4.0))), 6)).as("f_chow"))
  }

  /** Welch's heteroscedastic one-way ANOVA over event-type groups. */
  private def qAggWelch(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d)
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 9) AS DECIMAL(28,9))").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("sv2"))
      .filter(col("n") > 1)
      .select(col("g"), col("n"),
        (dbl(col("sv")) / dbl(col("n"))).as("m"),
        expr("""(CAST(sv2 AS DOUBLE)
               | - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
               |   / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)"""
          .stripMargin).as("s2"))
      .filter(col("s2") > 0)
      .select(col("g"), col("n"), col("m"),
        (dbl(col("n")) / col("s2")).as("w"))
    val tot = g.agg(count(lit(1)).as("k"), sum(col("w")).as("ww"),
      sum(col("w") * col("m")).as("wm"))
    g.crossJoin(broadcast(tot))
      .select(col("k"), col("ww"), col("n"), col("w"), col("m"),
        (col("wm") / col("ww")).as("mw"))
      .agg(max(col("k")).as("k"),
        sum(col("w") * (col("m") - col("mw"))
          * (col("m") - col("mw"))).as("sa"),
        sum(expr("""POW(1.0 - w / ww, 2) / (CAST(n AS DOUBLE) - 1.0)"""))
          .as("sb"))
      .select(col("k"),
        when(col("k") > 1, round(
          (col("sa") / (dbl(col("k")) - 1.0)) /
            (lit(1.0) + lit(2.0) * (dbl(col("k")) - 2.0)
              / (dbl(col("k")) * dbl(col("k")) - 1.0) * col("sb")), 6))
          .as("f_welch"),
        (col("k") - 1).as("df1"),
        when(col("sb") > 0, round(
          (dbl(col("k")) * dbl(col("k")) - 1.0)
            / (lit(3.0) * col("sb")), 2)).as("df2"))
  }

  /** Madow systematic PPS over customer revenue: 100 points at
    * ⌊i·T/100⌋ on the exact cumulative-cents line (customers in key
    * order); hits = ceil-index delta, all BIGINT. */
  private def qSampleSystematic(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "orders")
      .select(col("o_custkey").as("c"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .groupBy(col("c")).agg(sum(col("cents")).as("r"))
    val wOrd = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rev
      .withColumn("cb", coalesce(sum(col("r")).over(wOrd), lit(0L)))
      .crossJoin(broadcast(rev.agg(sum(col("r")).as("tt"))))
      // #points in [cb, cb+r): ceil(100·(cb+r)/T) − ceil(100·cb/T)
      // tt = 0 (all-zero revenue) would throw on the integer div
      // under ANSI — such a corpus has no PPS sample, return empty
      .filter(col("tt") > 0)
      .select(col("c"), col("r"),
        expr("""(100 * (cb + r) + tt - 1) div tt
               | - (100 * cb + tt - 1) div tt""".stripMargin).as("hits"))
      .filter(col("hits") >= 1)
      .select(col("c").as("custkey"), col("r").as("rev_cents"),
        col("hits"))
      .orderBy(col("custkey"))
  }

  /** Cross-field audit: o_totalprice vs Σ lineitem charge, exact
    * DECIMAL relative-error buckets (comparisons stay in decimals —
    * no double thresholds to straddle). */
  private def qQualityCrossfield(s: SparkSession, d: String): DataFrame = {
    val chg = t(s, d, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(9,2)")
          * (lit(1) - col("l_discount").cast("decimal(4,2)"))
          * (lit(1) + col("l_tax").cast("decimal(4,2)")))
          .cast("decimal(18,6)").as("charge"))
      .groupBy(col("l_orderkey")).agg(sum(col("charge")).as("chg"))
    t(s, d, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("tp"))
      .join(chg, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("tp"), col("chg"),
        when(col("chg").isNull, "no_lineitems")
          .when(abs(col("chg") - col("tp")) * 1000 <= col("tp"),
            "within_0.1pct")
          .when(abs(col("chg") - col("tp")) * 100 <= col("tp"),
            "within_1pct")
          .when(abs(col("chg") - col("tp")) * 10 <= col("tp"),
            "within_10pct")
          .otherwise("over_10pct").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("bucket"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_breuschpagan" -> (qAggBreuschpagan _),
    "q_agg_chow" -> (qAggChow _),
    "q_agg_welch" -> (qAggWelch _),
    "q_sample_systematic" -> (qSampleSystematic _),
    "q_quality_crossfield" -> (qQualityCrossfield _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_breuschpagan" ->
      """WITH li AS (SELECT CAST(l_quantity AS DECIMAL(18,4)) AS x,
        |  CAST(l_extendedprice AS DECIMAL(18,4)) AS y FROM lineitem),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM li),
        |ab AS (SELECT n,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
        |  FROM mom),
        |u AS (SELECT n, x AS xd,
        |    CAST(ROUND(
        |      (CAST(y AS DOUBLE) - my - b * (CAST(x AS DOUBLE) - mx))
        |      * (CAST(y AS DOUBLE) - my - b * (CAST(x AS DOUBLE) - mx)),
        |      4) AS DECIMAL(38,4)) AS u
        |  FROM li, ab),
        |m2 AS (SELECT CAST(max(n) AS BIGINT) AS n, sum(xd) AS sx,
        |    sum(u) AS su, sum(xd * u) AS sxu, sum(xd * xd) AS sxx,
        |    sum(u * u) AS suu
        |  FROM u),
        |lm AS (SELECT n,
        |    CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
        |            - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) > 0
        |    THEN ROUND(CAST(n AS DOUBLE) *
        |      POW(CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE), 2)
        |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
        |            - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6)
        |      END AS lm
        |  FROM m2)
        |SELECT n, lm, CAST(1 AS BIGINT) AS df,
        |  CAST(CASE WHEN lm > 3.841459 THEN 1 ELSE 0 END AS BIGINT)
        |    AS heteroscedastic_5pct
        |FROM lm""".stripMargin,
    "q_agg_chow" ->
      """WITH li AS (SELECT
        |  CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    AS y,
        |  CASE WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 0
        |    ELSE 1 END AS g
        |  FROM lineitem),
        |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS sxy,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS sxx,
        |    sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS syy
        |  FROM li GROUP BY g),
        |agg AS (SELECT CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(sx) AS BIGINT) AS psx,
        |    CAST(sum(sy) AS BIGINT) AS psy, sum(sxy) AS psxy,
        |    sum(sxx) AS psxx, sum(syy) AS psyy,
        |    CAST(sum(CASE WHEN g = 0 THEN n ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    min(CASE WHEN g = 0
        |      AND CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) > 0 THEN
        |      (((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      - POW(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 2)
        |        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |          * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |       / 10000.0) END)
        |      AS ssr0,
        |    min(CASE WHEN g = 1
        |      AND CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) > 0 THEN
        |      (((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      - POW(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |          * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 2)
        |        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |          * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |       / 10000.0) END)
        |      AS ssr1
        |  FROM m),
        |f AS (SELECT n, n0, n - n0 AS n1,
        |    (CASE WHEN CAST(psxx AS DOUBLE) - CAST(psx AS DOUBLE)
        |        * CAST(psx AS DOUBLE) / CAST(n AS DOUBLE) > 0 THEN
        |    ((CAST(psyy AS DOUBLE) - CAST(psy AS DOUBLE)
        |      * CAST(psy AS DOUBLE) / CAST(n AS DOUBLE))
        |    - POW(CAST(psxy AS DOUBLE) - CAST(psx AS DOUBLE)
        |        * CAST(psy AS DOUBLE) / CAST(n AS DOUBLE), 2)
        |      / (CAST(psxx AS DOUBLE) - CAST(psx AS DOUBLE)
        |        * CAST(psx AS DOUBLE) / CAST(n AS DOUBLE)))
        |     / 10000.0 END) AS ssrp,
        |    ssr0, ssr1
        |  FROM agg)
        |SELECT n, n0, n1,
        |  ROUND(ssrp / 1.0e9, 6) AS ssr_pooled_bn,
        |  ROUND((ssr0 + ssr1) / 1.0e9, 6) AS ssr_split_bn,
        |  CASE WHEN ssr0 + ssr1 > 0 AND n > 4 THEN
        |    ROUND(((ssrp - ssr0 - ssr1) / 2.0)
        |      / ((ssr0 + ssr1) / (CAST(n AS DOUBLE) - 4.0)), 6) END
        |    AS f_chow
        |FROM f""".stripMargin,
    "q_agg_welch" ->
      """WITH g AS (
        |  SELECT event_type AS g,
        |    CAST(ROUND(value, 9) AS DECIMAL(28,9)) AS v
        |  FROM events),
        |st AS (SELECT g, CAST(count(*) AS BIGINT) AS n, sum(v) AS sv,
        |    sum(v * v) AS sv2
        |  FROM g GROUP BY g HAVING count(*) > 1),
        |ms AS (SELECT g, n, CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS m,
        |    (CAST(sv2 AS DOUBLE) - CAST(sv AS DOUBLE)
        |      * CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS s2
        |  FROM st),
        |w AS (SELECT g, n, m, CAST(n AS DOUBLE) / s2 AS w
        |  FROM ms WHERE s2 > 0),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(w) AS ww,
        |    sum(w * m) AS wm FROM w),
        |terms AS (SELECT k, ww, n, w, m, wm / ww AS mw FROM w, tot),
        |a AS (SELECT CAST(max(k) AS BIGINT) AS k,
        |    sum(w * (m - mw) * (m - mw)) AS sa,
        |    sum(POW(1.0 - w / ww, 2) / (CAST(n AS DOUBLE) - 1.0))
        |      AS sb
        |  FROM terms)
        |SELECT k,
        |  CASE WHEN k > 1 THEN ROUND(
        |    (sa / (CAST(k AS DOUBLE) - 1.0))
        |    / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
        |       / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0) * sb),
        |    6) END AS f_welch,
        |  k - 1 AS df1,
        |  CASE WHEN sb > 0 THEN ROUND(
        |    (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
        |    / (3.0 * sb), 2) END AS df2
        |FROM a""".stripMargin,
    "q_sample_systematic" ->
      """WITH rev AS (
        |  SELECT o_custkey AS c,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS r
        |  FROM orders GROUP BY o_custkey),
        |cum AS (
        |  SELECT c, r,
        |    CAST(coalesce(sum(r) OVER (ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb,
        |    (SELECT CAST(sum(r) AS BIGINT) FROM rev) AS tt
        |  FROM rev)
        |SELECT c AS custkey, r AS rev_cents,
        |  CAST((100 * (cb + r) + tt - 1) // tt
        |    - (100 * cb + tt - 1) // tt AS BIGINT) AS hits
        |FROM cum
        |WHERE tt > 0
        |  AND (100 * (cb + r) + tt - 1) // tt
        |  - (100 * cb + tt - 1) // tt >= 1
        |ORDER BY custkey""".stripMargin,
    "q_quality_crossfield" ->
      """WITH chg AS (
        |  SELECT l_orderkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(9,2))
        |      * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |      * (1 + CAST(l_tax AS DECIMAL(4,2)))
        |      AS DECIMAL(18,6))) AS chg
        |  FROM lineitem GROUP BY l_orderkey),
        |b AS (
        |  SELECT CASE
        |    WHEN chg IS NULL THEN 'no_lineitems'
        |    WHEN abs(chg - tp) * 1000 <= tp THEN 'within_0.1pct'
        |    WHEN abs(chg - tp) * 100 <= tp THEN 'within_1pct'
        |    WHEN abs(chg - tp) * 10 <= tp THEN 'within_10pct'
        |    ELSE 'over_10pct' END AS bucket
        |  FROM (SELECT o_orderkey,
        |      CAST(o_totalprice AS DECIMAL(18,2)) AS tp FROM orders) o
        |  LEFT JOIN chg ON o.o_orderkey = chg.l_orderkey)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
  )
}
