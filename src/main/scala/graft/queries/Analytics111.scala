package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 tenth wave: the regression-diagnostics completions an
  * econometrics review runs AFTER q_agg_ols — three oracled operators:
  *
  *  - q_agg_white: White's heteroscedasticity test on the lineitem
  *    price~quantity fit — the no-functional-form generalization of
  *    q_agg_breuschpagan (aux-regress e² on BOTH x and x²; LM = n·R²
  *    ~ χ²(2)). Catches variance patterns BP's linear-in-x auxiliary
  *    misses.
  *  - q_agg_reset: Ramsey RESET — is the linear form itself wrong?
  *    Re-fit with the fitted value's SQUARE as an extra regressor and
  *    F-test the SSR drop. The specification check that tells you
  *    whether to trust every other coefficient-based diagnostic.
  *  - q_agg_neweywest: Newey–West HAC standard error for the daily
  *    revenue trend slope per event type — q_time_rollbeta's OLS
  *    slope is fine, but its NAIVE standard error lies under serial
  *    correlation; the Bartlett-kernel HAC se (same bandwidth rule as
  *    q_time_kpss) is the one a time-ordered regression must report.
  *    Emits both se's and their ratio — the "how wrong was naive"
  *    number.
  *
  * Determinism: every moment is an exact integer-lattice sum — x on
  * the ×10⁴ BIGINT lattice with xq² precomputed so the quartic
  * moments stay DECIMAL(19,0)² products; residual-derived quantities
  * (e², ŷ², u) round to explicit lattices FIRST (the breuschpagan
  * discipline); the Newey–West Bartlett numerator factors out (l+1)
  * so G stays one exact DECIMAL/HUGEINT value (the kpss discipline);
  * time-centering rides the integer 2t−n−1 doubling. The only
  * doubles are identical single-expression trees over exact moments.
  * Scale: white/reset are two lineitem scans (moments, then
  * residual moments against a 1-row broadcast); neweywest collapses
  * events to the calendar-bounded daily grid, then an l ≤ 10 lag
  * self-join. */
object Analytics111 {

  /** Quartic-lattice aux moments of (z1=xq, z2=xq², u) where u rides
    * a caller-chosen expression on the (xd, yd, n, b, my, mx) frame.
    * Returns one row of exact sums. */
  private def auxMoments(s: SparkSession, d: String,
      uExpr: String): DataFrame = {
    val ab = Analytics95.liMoments(s, d).select(col("n"),
      expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
             |(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             | - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END"""
        .stripMargin).as("b"),
      (dbl(col("sy")) / dbl(col("n"))).as("my"),
      (dbl(col("sx")) / dbl(col("n"))).as("mx"))
    t(s, d, "lineitem")
      .select(dec(col("l_quantity")).as("xd"),
        dec(col("l_extendedprice")).as("yd"))
      .crossJoin(broadcast(ab))
      .select(col("n"),
        expr("CAST(xd * 10000 AS BIGINT)").as("z1"),
        expr("CAST(xd * 10000 AS BIGINT)" +
          " * CAST(xd * 10000 AS BIGINT)").as("z2"),
        expr(uExpr).as("u"))
      .agg(max(col("n")).as("n"),
        sum(col("z1")).as("s1"),
        // z2/u sums overflow LongType past ~600k rows (z2 ≤ 10¹⁴) —
        // DECIMAL sums, like every product moment
        sum(expr("CAST(z2 AS DECIMAL(19,0))")).as("s2"),
        sum(expr("CAST(z1 AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0))"))
          .as("s12"),
        sum(expr("CAST(z2 AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0))"))
          .as("s22"),
        sum(expr("CAST(u AS DECIMAL(19,0))")).as("su"),
        sum(expr("CAST(z1 AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))"))
          .as("s1u"),
        sum(expr("CAST(z2 AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))"))
          .as("s2u"),
        sum(expr("CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))"))
          .as("suu"))
  }

  /** Centered normal-equation pieces (doubles over the exact sums):
    * A = n·Sᵢⱼ − SᵢSⱼ, B = n·Sᵢᵤ − SᵢSᵤ, Syy = n·Sᵤᵤ − Sᵤ²;
    * explained·n² = B'A⁻¹B via the closed 2×2 inverse. */
  private val r2Sql =
    """CASE WHEN (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |    * (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
      |      - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |    - (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |    * (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)) > 0
      |  AND CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
      |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) > 0 THEN
      |  ((CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
      |     - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))
      |   * ((CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
      |       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
      |         - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))
      |      - (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |         - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(s2u AS DOUBLE)
      |         - CAST(s2 AS DOUBLE) * CAST(su AS DOUBLE)))
      |   + (CAST(n AS DOUBLE) * CAST(s2u AS DOUBLE)
      |      - CAST(s2 AS DOUBLE) * CAST(su AS DOUBLE))
      |   * ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(s2u AS DOUBLE)
      |         - CAST(s2 AS DOUBLE) * CAST(su AS DOUBLE))
      |      - (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |         - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
      |         - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))))
      |  / (((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
      |       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
      |        - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      - (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
      |        - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)))
      |     * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
      |        - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)))
      |END""".stripMargin

  /** e² on the ×10⁴ BIGINT lattice (≤ ~10¹⁴ — exact). */
  private val e2Lattice =
    """CAST(ROUND(
      |  (CAST(yd AS DOUBLE) - my - b * (CAST(xd AS DOUBLE) - mx))
      |  * (CAST(yd AS DOUBLE) - my - b * (CAST(xd AS DOUBLE) - mx)),
      |  4) * 10000 AS BIGINT)""".stripMargin

  private def qAggWhite(s: SparkSession, d: String): DataFrame =
    auxMoments(s, d, e2Lattice)
      .select(col("n"), expr(s"ROUND($r2Sql, 9)").as("r2_aux"))
      .select(col("n"),
        when(col("r2_aux").isNotNull,
          round(dbl(col("n")) * col("r2_aux"), 6)).as("lm"),
        lit(2L).as("df"))
      .select(col("n"), col("lm"), col("df"),
        expr("CAST(CASE WHEN lm > 5.991465 THEN 1 ELSE 0 END AS BIGINT)")
          .as("heteroscedastic_5pct"))

  /** RESET: y (×10⁴ lattice) regressed on x and ŷ² (ŷ² on the ×10⁴
    * lattice too — ŷ ≤ ~10⁵ so ŷ²·10⁴ ≤ ~10¹⁴, exact). */
  private def qAggReset(s: SparkSession, d: String): DataFrame = {
    val yhat2 =
      """CAST(ROUND(
        |  (my + b * (CAST(xd AS DOUBLE) - mx))
        |  * (my + b * (CAST(xd AS DOUBLE) - mx)), 4)
        | * 10000 AS BIGINT)""".stripMargin
    // u here is the RESPONSE (yq), z2 the ŷ² regressor: swap roles in
    // the shared moment frame — s1u/s2u/suu become Sxy/Sŷ²y/Syy
    val m = t(s, d, "lineitem")
      .select(dec(col("l_quantity")).as("xd"),
        dec(col("l_extendedprice")).as("yd"))
      .crossJoin(broadcast(Analytics95.liMoments(s, d).select(col("n"),
        expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
               |(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               |/ (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END"""
          .stripMargin).as("b"),
        (dbl(col("sy")) / dbl(col("n"))).as("my"),
        (dbl(col("sx")) / dbl(col("n"))).as("mx"))))
      .select(col("n"),
        expr("CAST(xd * 10000 AS BIGINT)").as("z1"),
        expr(yhat2).as("z2"),
        expr("CAST(yd * 10000 AS BIGINT)").as("u"))
      .agg(max(col("n")).as("n"),
        sum(col("z1")).as("s1"),
        sum(expr("CAST(z2 AS DECIMAL(19,0))")).as("s2"),
        sum(expr("CAST(z1 AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0))"))
          .as("s12"),
        sum(expr("CAST(z2 AS DECIMAL(19,0)) * CAST(z2 AS DECIMAL(19,0))"))
          .as("s22"),
        sum(expr("CAST(u AS DECIMAL(19,0))")).as("su"),
        sum(expr("CAST(z1 AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))"))
          .as("s1u"),
        sum(expr("CAST(z2 AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))"))
          .as("s2u"),
        sum(expr("CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))"))
          .as("suu"))
    // SSR₀/n = (Syy − Sxy²/Sxx)/n², SSR₁/n = Syy(1−R²)/n²; the n²
    // denominators and the 10⁸ lattice area cancel in F; SSRs are
    // reported in dollars² (÷10⁸)
    m.select(col("n"), expr(s"ROUND($r2Sql, 12)").as("r2full"),
        expr("""CASE WHEN CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
               |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0 THEN
               |  (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
               |    - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
               |  - (CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
               |      - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))
               |    * (CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
               |      - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))
               |    / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
               |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) END"""
          .stripMargin).as("ssr0n2"),
        expr("""(CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
               | - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))"""
          .stripMargin).as("syyn2"))
      .select(col("n"),
        round(col("ssr0n2") / dbl(col("n")) / dbl(col("n")) / 1e8, 2)
          .as("ssr_linear"),
        round(col("syyn2") * (lit(1.0) - col("r2full"))
          / dbl(col("n")) / dbl(col("n")) / 1e8, 2).as("ssr_reset"),
        when(col("r2full").isNotNull && col("ssr0n2").isNotNull &&
            col("syyn2") * (lit(1.0) - col("r2full")) > 0 &&
            col("n") > 3,
          round((col("ssr0n2") - col("syyn2")
              * (lit(1.0) - col("r2full")))
            / (col("syyn2") * (lit(1.0) - col("r2full"))
              / (dbl(col("n")) - 3.0)), 6)).as("f_reset"),
        lit(1L).as("df1"), (col("n") - 3).as("df2"))
      .select(col("n"), col("ssr_linear"), col("ssr_reset"),
        col("f_reset"), col("df1"), col("df2"),
        expr("""CAST(CASE WHEN f_reset > 3.841459 THEN 1 ELSE 0 END
               | AS BIGINT)""".stripMargin).as("misspecified_5pct"))
  }

  /** Newey–West HAC se for the daily-revenue trend slope per type.
    * Lattice headroom (the kpss convention): v₂ = uq·(2t−n−1) ≲ 10¹³
    * at sf1, Γ̃ cells ≲ 10²⁸ on DECIMAL(30,0) — exact through sf≈3. */
  private def qAggNeweywest(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
    val daily = events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("et"), col("day"))
      .agg(expr("CAST(sum(vv) * 10000 AS BIGINT)").as("y"))
      .withColumn("idx", row_number().over(w).cast("long"))
    val byEt = Window.partitionBy(col("et"))
    val base = daily
      .withColumn("n", count(lit(1)).over(byEt))
      .withColumn("t2", lit(2L) * col("idx") - col("n") - 1)
      .withColumn("sy", sum(col("y")).over(byEt))
      .withColumn("numb", sum(col("y") * col("t2")).over(byEt))
      .withColumn("s22", sum(col("t2") * col("t2")).over(byEt))
      // b on the 2× t-scale: b = 2·numb/s22 (Σt̃ = 0 so y need not be
      // centered for the slope); residual vs the centered fit
      .withColumn("u", when(col("s22") > 0,
        dbl(col("y")) - dbl(col("sy")) / dbl(col("n"))
          - (lit(2.0) * dbl(col("numb")) / dbl(col("s22")))
            * (dbl(col("t2")) / 2.0)))
      .filter(col("u").isNotNull)
      .withColumn("uq", expr("CAST(ROUND(u, 0) AS BIGINT)"))
      .withColumn("v2", col("uq") * col("t2"))
      .localCheckpoint(true)
    val perEt = base.groupBy(col("et"))
      .agg(max(col("n")).as("n"), max(col("s22")).as("s22"),
        max(lit(2.0) * dbl(col("numb")) / dbl(col("s22"))).as("b2"),
        sum(expr("CAST(v2 AS DECIMAL(19,0)) * CAST(v2 AS DECIMAL(19,0))"))
          .as("g0"),
        sum(expr("CAST(uq AS DECIMAL(19,0)) * CAST(uq AS DECIMAL(19,0))"))
          .as("ssr"))
      .withColumn("l", expr(
        "CAST(floor(4.0 * pow(CAST(n AS DOUBLE) / 100.0, 0.25)) AS BIGINT)"))
    val lags = s.range(1, 11).select(col("id").as("j"))
    val gj = base.select(col("et"), col("idx"), col("v2"))
      .crossJoin(broadcast(lags))
      .withColumn("idx2", col("idx") + col("j"))
      .join(base.select(col("et"), col("idx").as("idx2"),
        col("v2").as("w2")), Seq("et", "idx2"))
      .groupBy(col("et"), col("j"))
      .agg(sum(expr("CAST(v2 AS DECIMAL(19,0)) * CAST(w2 AS DECIMAL(19,0))"))
        .as("gj"))
    val wsum = gj.join(perEt.select(col("et"), col("l")), Seq("et"))
      .filter(col("j") <= col("l"))
      .select(col("et"),
        (expr("CAST(gj AS DECIMAL(30,0))")
          * expr("CAST(2 * (l + 1 - j) AS DECIMAL(4,0))")).as("wterm"))
      .groupBy(col("et")).agg(sum(col("wterm")).as("ws"))
    perEt.join(wsum, Seq("et"), "left")
      .withColumn("gexact",
        expr("CAST(g0 AS DECIMAL(30,0)) * CAST(l + 1 AS DECIMAL(4,0))")
          + coalesce(col("ws"), lit(0).cast("decimal(35,0)")))
      .select(col("et").as("event_type"), col("n"), col("l").as("lag"),
        // slope back in value-units/day: b2 is in ×10⁴ units
        round(col("b2") / 1e4, 6).as("slope"),
        when(col("n") > 2 && col("s22") > 0,
          round(sqrt(dbl(col("ssr")) / (dbl(col("n")) - 2.0)
            / (dbl(col("s22")) / 4.0)) / 1e4, 6)).as("se_ols"),
        when(dbl(col("gexact")) > 0 && col("s22") > 0,
          round(sqrt(lit(4.0) * dbl(col("gexact"))
            / (dbl(col("l")) + 1.0)
            / (dbl(col("s22")) * dbl(col("s22")))) / 1e4, 6))
          .as("se_hac"),
        when(col("n") > 2 && col("s22") > 0 && dbl(col("gexact")) > 0 &&
            dbl(col("ssr")) > 0,
          round(sqrt(lit(4.0) * dbl(col("gexact"))
              / (dbl(col("l")) + 1.0)
              / (dbl(col("s22")) * dbl(col("s22"))))
            / sqrt(dbl(col("ssr")) / (dbl(col("n")) - 2.0)
              / (dbl(col("s22")) / 4.0)), 6)).as("hac_over_ols"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_white" -> (qAggWhite _),
    "q_agg_reset" -> (qAggReset _),
    "q_agg_neweywest" -> (qAggNeweywest _),
  )

  private val abSql =
    """ab AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CASE WHEN CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
      |        - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) > 0 THEN
      |      (CAST(count(*) AS DOUBLE) * CAST(sum(x * y) AS DOUBLE)
      |        - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
      |      / (CAST(count(*) AS DOUBLE) * CAST(sum(x * x) AS DOUBLE)
      |        - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)) END AS b,
      |    CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS my,
      |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mx
      |  FROM (SELECT CAST(l_quantity AS DECIMAL(18,4)) AS x,
      |          CAST(l_extendedprice AS DECIMAL(18,4)) AS y
      |        FROM lineitem) z)""".stripMargin

  private def r2DuckSql: String = r2Sql

  val sql: Map[String, String] = Map(
    "q_agg_white" ->
      (s"""WITH $abSql,
        |rows_ AS (
        |  SELECT n,
        |    CAST(xd * 10000 AS BIGINT) AS z1,
        |    CAST(xd * 10000 AS BIGINT) * CAST(xd * 10000 AS BIGINT)
        |      AS z2,
        |    CAST(ROUND(
        |      (CAST(yd AS DOUBLE) - my - b * (CAST(xd AS DOUBLE) - mx))
        |      * (CAST(yd AS DOUBLE) - my
        |         - b * (CAST(xd AS DOUBLE) - mx)), 4) * 10000
        |      AS BIGINT) AS u
        |  FROM (SELECT CAST(l_quantity AS DECIMAL(18,4)) AS xd,
        |          CAST(l_extendedprice AS DECIMAL(18,4)) AS yd
        |        FROM lineitem) z CROSS JOIN ab),
        |m AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(z1) AS HUGEINT) AS s1,
        |    CAST(sum(z2) AS HUGEINT) AS s2,
        |    sum(CAST(z1 AS HUGEINT) * z2) AS s12,
        |    sum(CAST(z2 AS HUGEINT) * z2) AS s22,
        |    CAST(sum(u) AS HUGEINT) AS su,
        |    sum(CAST(z1 AS HUGEINT) * u) AS s1u,
        |    sum(CAST(z2 AS HUGEINT) * u) AS s2u,
        |    sum(CAST(u AS HUGEINT) * u) AS suu
        |  FROM rows_),
        |r AS (SELECT n, ROUND($r2DuckSql, 9) AS r2_aux FROM m)
        |SELECT n,
        |  CASE WHEN r2_aux IS NOT NULL THEN
        |    ROUND(CAST(n AS DOUBLE) * r2_aux, 6) END AS lm,
        |  CAST(2 AS BIGINT) AS df,
        |  CAST(CASE WHEN CASE WHEN r2_aux IS NOT NULL THEN
        |      ROUND(CAST(n AS DOUBLE) * r2_aux, 6) END > 5.991465
        |    THEN 1 ELSE 0 END AS BIGINT) AS heteroscedastic_5pct
        |FROM r""".stripMargin),
    "q_agg_reset" ->
      (s"""WITH $abSql,
        |rows_ AS (
        |  SELECT n,
        |    CAST(xd * 10000 AS BIGINT) AS z1,
        |    CAST(ROUND(
        |      (my + b * (CAST(xd AS DOUBLE) - mx))
        |      * (my + b * (CAST(xd AS DOUBLE) - mx)), 4) * 10000
        |      AS BIGINT) AS z2,
        |    CAST(yd * 10000 AS BIGINT) AS u
        |  FROM (SELECT CAST(l_quantity AS DECIMAL(18,4)) AS xd,
        |          CAST(l_extendedprice AS DECIMAL(18,4)) AS yd
        |        FROM lineitem) z CROSS JOIN ab),
        |m AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(z1) AS HUGEINT) AS s1,
        |    CAST(sum(z2) AS HUGEINT) AS s2,
        |    sum(CAST(z1 AS HUGEINT) * z2) AS s12,
        |    sum(CAST(z2 AS HUGEINT) * z2) AS s22,
        |    CAST(sum(u) AS HUGEINT) AS su,
        |    sum(CAST(z1 AS HUGEINT) * u) AS s1u,
        |    sum(CAST(z2 AS HUGEINT) * u) AS s2u,
        |    sum(CAST(u AS HUGEINT) * u) AS suu
        |  FROM rows_),
        |r AS (
        |  SELECT n, ROUND($r2DuckSql, 12) AS r2full,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0 THEN
        |      (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
        |        - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
        |      - (CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))
        |        * (CAST(n AS DOUBLE) * CAST(s1u AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(su AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) END
        |      AS ssr0n2,
        |    (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
        |      - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) AS syyn2
        |  FROM m),
        |f AS (
        |  SELECT n,
        |    ROUND(ssr0n2 / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
        |      / 1e8, 2) AS ssr_linear,
        |    ROUND(syyn2 * (1.0 - r2full) / CAST(n AS DOUBLE)
        |      / CAST(n AS DOUBLE) / 1e8, 2) AS ssr_reset,
        |    CASE WHEN r2full IS NOT NULL AND ssr0n2 IS NOT NULL
        |        AND syyn2 * (1.0 - r2full) > 0 AND n > 3 THEN
        |      ROUND((ssr0n2 - syyn2 * (1.0 - r2full))
        |        / (syyn2 * (1.0 - r2full)
        |          / (CAST(n AS DOUBLE) - 3.0)), 6) END AS f_reset,
        |    CAST(1 AS BIGINT) AS df1, n - 3 AS df2
        |  FROM r)
        |SELECT n, ssr_linear, ssr_reset, f_reset, df1, df2,
        |  CAST(CASE WHEN f_reset > 3.841459 THEN 1 ELSE 0 END
        |    AS BIGINT) AS misspecified_5pct
        |FROM f""".stripMargin),
    "q_agg_neweywest" ->
      """WITH g AS MATERIALIZED (
        |  SELECT et, day, y,
        |    CAST(row_number() OVER (PARTITION BY et ORDER BY day)
        |      AS BIGINT) AS idx
        |  FROM (SELECT event_type AS et,
        |      epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |      CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
        |        AS y
        |    FROM events GROUP BY 1, 2) z),
        |base0 AS MATERIALIZED (
        |  SELECT et, idx, y, count(*) OVER (PARTITION BY et) AS n,
        |    2 * idx - count(*) OVER (PARTITION BY et) - 1 AS t2
        |  FROM g),
        |base AS MATERIALIZED (
        |  SELECT et, idx, y, n, t2,
        |    sum(y) OVER (PARTITION BY et) AS sy,
        |    sum(y * t2) OVER (PARTITION BY et) AS numb,
        |    sum(t2 * t2) OVER (PARTITION BY et) AS s22
        |  FROM base0),
        |resid AS MATERIALIZED (
        |  SELECT et, idx, n, s22, numb,
        |    CAST(ROUND(CAST(y AS DOUBLE)
        |      - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (2.0 * CAST(numb AS DOUBLE) / CAST(s22 AS DOUBLE))
        |        * (CAST(t2 AS DOUBLE) / 2.0), 0) AS BIGINT) AS uq,
        |    CAST(ROUND(CAST(y AS DOUBLE)
        |      - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (2.0 * CAST(numb AS DOUBLE) / CAST(s22 AS DOUBLE))
        |        * (CAST(t2 AS DOUBLE) / 2.0), 0) AS BIGINT) * t2 AS v2
        |  FROM base WHERE s22 > 0),
        |peret AS (
        |  SELECT et, CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(s22) AS BIGINT) AS s22,
        |    max(2.0 * CAST(numb AS DOUBLE) / CAST(s22 AS DOUBLE)) AS b2,
        |    sum(CAST(v2 AS HUGEINT) * v2) AS g0,
        |    sum(CAST(uq AS HUGEINT) * uq) AS ssr,
        |    CAST(floor(4.0 * pow(CAST(max(n) AS DOUBLE) / 100.0, 0.25))
        |      AS BIGINT) AS l
        |  FROM resid GROUP BY et),
        |gj AS (
        |  SELECT a.et, j.j, sum(CAST(a.v2 AS HUGEINT) * b.v2) AS gj
        |  FROM resid a
        |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS j) j
        |  JOIN resid b ON b.et = a.et AND b.idx = a.idx + j.j
        |  GROUP BY 1, 2),
        |ws AS (
        |  SELECT gj.et, sum(CAST(gj AS HUGEINT) * (2 * (l + 1 - j)))
        |    AS ws
        |  FROM gj JOIN peret ON peret.et = gj.et
        |  WHERE j <= l GROUP BY 1),
        |fin AS (
        |  SELECT peret.et, n, l, b2, s22, ssr,
        |    g0 * (l + 1) + coalesce(ws, CAST(0 AS HUGEINT)) AS gexact
        |  FROM peret LEFT JOIN ws ON ws.et = peret.et)
        |SELECT et AS event_type, n, l AS lag,
        |  ROUND(b2 / 1e4, 6) AS slope,
        |  CASE WHEN n > 2 AND s22 > 0 THEN
        |    ROUND(sqrt(CAST(ssr AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)
        |      / (CAST(s22 AS DOUBLE) / 4.0)) / 1e4, 6) END AS se_ols,
        |  CASE WHEN CAST(gexact AS DOUBLE) > 0 AND s22 > 0 THEN
        |    ROUND(sqrt(4.0 * CAST(gexact AS DOUBLE)
        |      / (CAST(l AS DOUBLE) + 1.0)
        |      / (CAST(s22 AS DOUBLE) * CAST(s22 AS DOUBLE))) / 1e4, 6)
        |  END AS se_hac,
        |  CASE WHEN n > 2 AND s22 > 0 AND CAST(gexact AS DOUBLE) > 0
        |      AND CAST(ssr AS DOUBLE) > 0 THEN
        |    ROUND(sqrt(4.0 * CAST(gexact AS DOUBLE)
        |        / (CAST(l AS DOUBLE) + 1.0)
        |        / (CAST(s22 AS DOUBLE) * CAST(s22 AS DOUBLE)))
        |      / sqrt(CAST(ssr AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)
        |        / (CAST(s22 AS DOUBLE) / 4.0)), 6) END AS hac_over_ols
        |FROM fin ORDER BY event_type""".stripMargin,
  )
}
