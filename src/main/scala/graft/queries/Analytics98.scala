package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 fifth wave: completing the causal / robust-regression
  * family (did + rdd + ipw get their matching, mediation, covariate-
  * adjustment, and correction siblings) — five oracled operators:
  *
  *  - q_agg_psmatch: propensity-score nearest-neighbor matching (with
  *    replacement) ATT — treated users matched to the control with the
  *    closest propensity score, ties broken by user id. The score is
  *    the one-step-Newton logistic of treatment on activity (the
  *    q_agg_logistic closed form, so the score itself is exact and
  *    deterministic); the nearest control resolves via two ordered
  *    window passes (last control at-or-below, first control above)
  *    over the user-universe-bounded score line — no all-pairs join.
  *    ATT = mean(y_treated − y_match). The matching estimator next to
  *    q_agg_ipw's weighting estimator: same design question, different
  *    bias/variance trade.
  *  - q_agg_sobel: mediation analysis X→M→Y (quantity → discount →
  *    extendedprice): path a (M~X), path b and direct c' (Y~M+X),
  *    indirect effect a·b, total effect c (Y~X), proportion mediated,
  *    and the Sobel z = a·b/√(a²·se_b² + b²·se_a²) — all closed-form
  *    from ONE exact cents-lattice moment scan.
  *  - q_agg_ancova: one-way ANCOVA of extendedprice across returnflag
  *    groups adjusting for quantity — pooled within-group slope,
  *    covariate-adjusted group means at the grand covariate mean, and
  *    the group-effect F on adjusted sums of squares. The "did the
  *    groups differ AFTER controlling for volume" test the raw ANOVA
  *    can't answer.
  *  - q_agg_huber: one IRLS step of the Huber M-estimate of location
  *    for event value (k = 1.345σ from exact moments): weights
  *    w = min(1, k/|x−μ₀|), μ₁ = Σwx/Σw with lattice-rounded terms —
  *    the outlier-robust mean next to q_agg_trimmed/winsorized, as a
  *    deterministic one-step (the full fixpoint is a tolerance
  *    convention; the first step carries the robustness).
  *  - q_agg_wls: weighted least squares of extendedprice on quantity
  *    with w = 1/quantity (the variance∝quantity model) beside the
  *    OLS pair — the CORRECTION that q_agg_breuschpagan's detection
  *    calls for. Weighted moments ride 12dp DECIMAL lattices.
  *
  * Determinism: every score/weight is a fixed double tree over exact
  * integer moments; order-sensitive weighted sums ride explicit
  * DECIMAL lattices; matching ties resolve on (score, user id). Scale:
  * psmatch windows run on the user-universe-bounded score table (one
  * user-keyed agg from events); sobel/ancova/wls are single moment
  * scans (ancova per bounded group); huber is two scans (moments,
  * then reweighted moments against a 1-row broadcast). */
object Analytics98 {

  /** Per-user (tr, y, x=n_ev) frame — the q_agg_ipw unit table. */
  private def users(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        max(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("tr"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("CAST(ROUND(value, 9) AS DECIMAL(28,9))"))),
          lit(0).cast("decimal(28,9)")).as("y"))

  /** NN-matching ATT over a (user_id, tr, y, x) unit frame. No
    * checkpoint: the score-line windows must keep their Aggregate
    * lineage visible for the WindowAudit bounded-input contract. */
  private[graft] def psmatchAtt(u: DataFrame): DataFrame = {
    // one-step-Newton logistic propensity of tr on x (exact moments)
    val b = Analytics96.logisticNewton(
      u.select(col("x"), col("tr").as("y")))
      .select(col("b0"), col("b1"))
    val scored = u.crossJoin(broadcast(b))
      .select(col("user_id"), col("tr"), col("y"),
        when(col("b0").isNotNull, round(lit(1.0)
          / (lit(1.0) + exp(-(col("b0") + col("b1")
            * col("x").cast("double")))), 12)).as("ps"))
      .filter(col("ps").isNotNull)
    // nearest control by score: the classic sorted-line trick — for
    // every row, the last control at-or-before and the first control
    // after it on the (ps, user_id) order; nearest = closer of the
    // two. BOTH directions run as O(n) RUNNING frames (the forward
    // neighbor via a reversed-order running last): Spark evaluates a
    // first_value over a current-row→unbounded-FOLLOWING frame by
    // rescanning the tail per row — O(n²), measured 11.6 s vs ~0.6 s
    // on the ×10 events probe before this form
    val wAsc = Window.orderBy(col("ps"), col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDescRev = Window.orderBy(col("ps").desc, col("user_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ctlPs = when(col("tr") === 0, col("ps"))
    val ctlY = when(col("tr") === 0, dbl(col("y")))
    val m = scored
      .withColumn("lo_ps", last(ctlPs, ignoreNulls = true).over(wAsc))
      .withColumn("lo_y", last(ctlY, ignoreNulls = true).over(wAsc))
      .withColumn("hi_ps", last(ctlPs, ignoreNulls = true).over(wDescRev))
      .withColumn("hi_y", last(ctlY, ignoreNulls = true).over(wDescRev))
      .filter(col("tr") === 1)
      .select(col("user_id"), col("ps"), dbl(col("y")).as("yt"),
        // nearer of the two candidates; at equal gap prefer the lower
        // (deterministic, documented)
        when(col("lo_ps").isNotNull && (col("hi_ps").isNull ||
          (col("ps") - col("lo_ps")) <= (col("hi_ps") - col("ps"))),
          col("lo_y")).otherwise(col("hi_y")).as("ym"))
      .filter(col("ym").isNotNull)
    m.agg(count(lit(1)).as("n_matched"),
        sum(expr("CAST(ROUND(yt - ym, 9) AS DECIMAL(38,9))")).as("sd"))
      .select(col("n_matched"),
        when(col("n_matched") > 0,
          round(dbl(col("sd")) / dbl(col("n_matched")), 6)).as("att"))
  }

  private def qAggPsmatch(s: SparkSession, d: String): DataFrame =
    psmatchAtt(users(s, d))

  /** Mediation X→M→Y from one exact moment scan (x=qty, m=discount
    * hundredths, y=price cents). */
  private def qAggSobel(s: SparkSession, d: String): DataFrame = {
    val mm = t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)")
          .as("m"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("m")).as("sm"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sxx"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0))"))
          .as("sxm"),
        sum(expr("CAST(m AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0))"))
          .as("smm"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sxy"),
        sum(expr("CAST(m AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("smy"),
        sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("syy"))
    // centered double moments off the exact integers
    val c = mm.select(col("n"),
      expr("CAST(n AS DOUBLE)").as("nd"),
      expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("cxx"),
      expr("CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("cxm"),
      expr("CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("cmm"),
      expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("cxy"),
      expr("CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("cmy"),
      expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("cyy"))
    c.filter(col("cxx") > 0)
      .select(col("n"), col("nd"), col("cxx"), col("cmm"), col("cyy"),
        (col("cxm") / col("cxx")).as("a"),        // M ~ X slope
        (col("cxy") / col("cxx")).as("ctot"),     // Y ~ X total effect
        col("cxm"), col("cxy"), col("cmy"))
      .filter(col("cmm") * col("cxx") - col("cxm") * col("cxm") > 0)
      .select(col("n"), col("nd"), col("a"), col("ctot"),
        // Y ~ M + X partial slopes
        ((col("cmy") * col("cxx") - col("cxy") * col("cxm"))
          / (col("cmm") * col("cxx") - col("cxm") * col("cxm"))).as("bb"),
        ((col("cxy") * col("cmm") - col("cmy") * col("cxm"))
          / (col("cmm") * col("cxx") - col("cxm") * col("cxm")))
          .as("cdir"),
        col("cxx"), col("cmm"), col("cyy"), col("cxm"), col("cxy"),
        col("cmy"))
      .select(col("n"), col("a"), col("bb"), col("cdir"), col("ctot"),
        // se_a² from M~X residual variance; se_b² from Y~M+X
        ((col("cmm") - col("a") * col("cxm")) / (col("nd") - 2.0)
          / col("cxx")).as("va"),
        ((col("cyy") - col("bb") * col("cmy") - col("cdir") * col("cxy"))
          / (col("nd") - 3.0)
          / (col("cmm") - col("cxm") * col("cxm") / col("cxx"))).as("vb"))
      .select(col("n"), round(col("a"), 9).as("a_path"),
        round(col("bb"), 9).as("b_path"),
        round(col("cdir"), 9).as("direct_effect"),
        round(col("ctot"), 9).as("total_effect"),
        round(col("a") * col("bb"), 9).as("indirect_effect"),
        when(abs(col("ctot")) > 1e-12,
          round(col("a") * col("bb") / col("ctot"), 6))
          .as("prop_mediated"),
        when(col("a") * col("a") * col("vb")
          + col("bb") * col("bb") * col("va") > 0,
          round(col("a") * col("bb")
            / sqrt(col("a") * col("a") * col("vb")
              + col("bb") * col("bb") * col("va")), 6)).as("sobel_z"))
  }

  /** One-way ANCOVA across returnflag groups, covariate = quantity. */
  private def qAggAncova(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "lineitem")
      .select(col("l_returnflag").as("grp"),
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sxx"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sxy"),
        sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("syy"))
      // centered within-group moments
      .select(col("grp"), col("n"),
        expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").as("mx"),
        expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("my"),
        expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
          + " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").as("wxx"),
        expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)"
          + " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("wxy"),
        expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)"
          + " * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("wyy"),
        col("sx"), col("sy"))
    val tot = g.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"),
      sum(col("wxx")).as("exx"), sum(col("wxy")).as("exy"),
      sum(col("wyy")).as("eyy"),
      (sum(col("sx")).cast("double") / sum(col("n")).cast("double"))
        .as("gmx"))
    val adj = g.crossJoin(broadcast(tot))
      .filter(col("exx") > 0)
      .select(col("grp"), col("n"), col("nn"), col("k"),
        col("exx"), col("exy"), col("eyy"),
        (col("exy") / col("exx")).as("bw"),
        col("mx"), col("my"), col("gmx"))
      .select(col("grp"), col("n"), col("nn"), col("k"), col("exx"),
        col("exy"), col("eyy"), col("bw"),
        // adjusted mean at the grand covariate mean, in dollars
        round((col("my") - col("bw") * (col("mx") - col("gmx")))
          / 100.0, 6).as("adj_mean"),
        col("my"), col("mx"))
    // F: SSE under pooled-within model vs SSE ignoring groups — both
    // need the total (between+within) covariate algebra; derive the
    // between part from the group table itself
    val btw = adj
      .agg(max(col("nn")).as("nn"), max(col("k")).as("k"),
        max(col("exx")).as("exx"), max(col("exy")).as("exy"),
        max(col("eyy")).as("eyy"),
        sum(expr("CAST(n AS DOUBLE) * mx")).as("snmx"),
        sum(expr("CAST(n AS DOUBLE) * my")).as("snmy"),
        sum(expr("CAST(n AS DOUBLE) * mx * mx")).as("snmx2"),
        sum(expr("CAST(n AS DOUBLE) * mx * my")).as("snmxy"),
        sum(expr("CAST(n AS DOUBLE) * my * my")).as("snmy2"))
      .select(col("nn"), col("k"), col("exx"), col("exy"), col("eyy"),
        (col("exx") + col("snmx2") - col("snmx") * col("snmx")
          / col("nn").cast("double")).as("txx"),
        (col("exy") + col("snmxy") - col("snmx") * col("snmy")
          / col("nn").cast("double")).as("txy"),
        (col("eyy") + col("snmy2") - col("snmy") * col("snmy")
          / col("nn").cast("double")).as("tyy"))
    val f = btw
      .filter(col("exx") > 0 && col("txx") > 0)
      .select(col("nn"), col("k"),
        (col("eyy") - col("exy") * col("exy") / col("exx")).as("ssew"),
        (col("tyy") - col("txy") * col("txy") / col("txx")).as("sset"))
      .select(col("nn"), col("k"), col("ssew"), col("sset"),
        when(col("ssew") > 0 && col("k") > 1
          && col("nn").cast("double") - col("k").cast("double") - 1 > 0,
          round(((col("sset") - col("ssew"))
            / (col("k").cast("double") - 1.0))
            / (col("ssew") / (col("nn").cast("double")
              - col("k").cast("double") - 1.0)), 6)).as("f_group"))
    adj.select(col("grp"), col("n"), col("adj_mean"),
        round(col("bw") / 100.0, 6).as("pooled_slope"))
      .crossJoin(broadcast(f.select(col("f_group"))))
      .orderBy(col("grp"))
  }

  /** One Huber IRLS step for the location of event value. */
  private def qAggHuber(s: SparkSession, d: String): DataFrame = {
    val v = events(s, d)
      .select(expr("CAST(ROUND(value, 9) AS DECIMAL(28,9))").as("x"))
    val m0 = v.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"))
      .select(col("n"),
        (dbl(col("sx")) / dbl(col("n"))).as("mu0"),
        expr("""sqrt(greatest(0.0,
               |  CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)
               |  - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               |    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))"""
          .stripMargin).as("sd"))
      .select(col("n"), col("mu0"), col("sd"),
        (lit(1.345) * col("sd")).as("k"))
    v.crossJoin(broadcast(m0))
      .filter(col("sd") > 0)
      .select(col("n"), col("mu0"), col("k"),
        // w = min(1, k/|x−μ0|); lattice-rounded weighted terms
        expr("""CAST(ROUND(least(1.0, k / greatest(1e-300,
               |  abs(CAST(x AS DOUBLE) - mu0)))
               |  * CAST(x AS DOUBLE), 9) AS DECIMAL(38,9))"""
          .stripMargin).as("wx"),
        expr("""CAST(ROUND(least(1.0, k / greatest(1e-300,
               |  abs(CAST(x AS DOUBLE) - mu0))), 9) AS DECIMAL(38,9))"""
          .stripMargin).as("w"))
      .agg(max(col("n")).as("n"), max(col("mu0")).as("mu0raw"),
        sum(col("wx")).as("swx"), sum(col("w")).as("sw"))
      .select(col("n"), round(col("mu0raw"), 6).as("mean"),
        when(dbl(col("sw")) > 0,
          round(dbl(col("swx")) / dbl(col("sw")), 6)).as("huber_mean"),
        round(dbl(col("sw")) / dbl(col("n")), 6).as("effective_weight"))
  }

  /** WLS (w = 1/quantity) beside OLS for price ~ quantity. */
  private def qAggWls(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("y"))
      .filter(col("x") > 0)
    li.select(col("x"), col("y"),
        // w = 1/x on a 12dp lattice; the other weighted moments are
        // EXACT by cancellation: Σw·x = n, Σw·x² = Σx, Σw·x·y = Σy
        expr("CAST(ROUND(1.0 / CAST(x AS DOUBLE), 12) AS DECIMAL(18,12))")
          .as("w"),
        expr("""CAST(ROUND(CAST(y AS DOUBLE) / CAST(x AS DOUBLE), 6)
               | AS DECIMAL(38,6))""".stripMargin).as("yox"))
      .agg(count(lit(1)).as("n"),
        sum(col("w")).as("sw"), sum(col("x")).as("sx"),
        sum(col("yox")).as("syox"), sum(col("y")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sx2"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sxy"))
      .select(col("n"), col("sw"), col("sx"), col("syox"), col("sy"),
        // WLS slope = (Sw·Swxy − Swx·Swy)/(Sw·Swx² − Swx²) with
        // Swx = n, Swx² = Σx, Swxy = Σy, Swy = Σy/x
        expr("""(CAST(sw AS DOUBLE) * CAST(sy AS DOUBLE)
               | - CAST(n AS DOUBLE) * CAST(syox AS DOUBLE))"""
          .stripMargin).as("num"),
        expr("""(CAST(sw AS DOUBLE) * CAST(sx AS DOUBLE)
               | - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"""
          .stripMargin).as("den"),
        // OLS slope for comparison
        expr("""(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"""
          .stripMargin).as("onum"),
        expr("""(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""
          .stripMargin).as("oden"))
      .select(col("n"),
        when(col("den") > 0, round(col("num") / col("den") / 100.0, 6))
          .as("b1_wls"),
        when(col("den") > 0, round((dbl(col("syox"))
          - col("num") / col("den") * dbl(col("n")))
          / dbl(col("sw")) / 100.0, 6)).as("b0_wls"),
        when(col("oden") > 0,
          round(col("onum") / col("oden") / 100.0, 6)).as("b1_ols"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_psmatch" -> (qAggPsmatch _),
    "q_agg_sobel" -> (qAggSobel _),
    "q_agg_ancova" -> (qAggAncova _),
    "q_agg_huber" -> (qAggHuber _),
    "q_agg_wls" -> (qAggWls _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_psmatch" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
        |    CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tr,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value, 9) AS DECIMAL(28,9)) END),
        |      CAST(0 AS DECIMAL(28,9))) AS y
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS sxx,
        |    sum(tr) AS s1, sum(x * tr) AS sx1
        |  FROM u),
        |s AS (
        |  SELECT n, sx, sxx,
        |    CAST(n AS DECIMAL(19,0)) * sxx
        |      - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
        |      AS det,
        |    CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE) / 2.0 AS g0,
        |    CAST(sx1 AS DOUBLE) - CAST(sx AS DOUBLE) / 2.0 AS g1
        |  FROM m),
        |b AS (
        |  SELECT
        |    CASE WHEN CAST(det AS DOUBLE) > 0 THEN ROUND(4.0
        |      * (CAST(sxx AS DOUBLE) * g0 - CAST(sx AS DOUBLE) * g1)
        |      / CAST(det AS DOUBLE), 9) END AS b0,
        |    CASE WHEN CAST(det AS DOUBLE) > 0 THEN ROUND(4.0
        |      * (CAST(n AS DOUBLE) * g1 - CAST(sx AS DOUBLE) * g0)
        |      / CAST(det AS DOUBLE), 9) END AS b1
        |  FROM s),
        |scored AS (
        |  SELECT user_id, tr, y,
        |    ROUND(1.0 / (1.0 + exp(-(b0 + b1 * CAST(x AS DOUBLE)))), 12)
        |      AS ps
        |  FROM u CROSS JOIN b WHERE b0 IS NOT NULL),
        |w AS (
        |  SELECT user_id, tr, CAST(y AS DOUBLE) AS yd, ps,
        |    last_value(CASE WHEN tr = 0 THEN ps END IGNORE NULLS)
        |      OVER wa AS lo_ps,
        |    last_value(CASE WHEN tr = 0 THEN CAST(y AS DOUBLE) END
        |      IGNORE NULLS) OVER wa AS lo_y,
        |    last_value(CASE WHEN tr = 0 THEN ps END IGNORE NULLS)
        |      OVER wd AS hi_ps,
        |    last_value(CASE WHEN tr = 0 THEN CAST(y AS DOUBLE) END
        |      IGNORE NULLS) OVER wd AS hi_y
        |  FROM scored
        |  WINDOW wa AS (ORDER BY ps, user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wd AS (ORDER BY ps DESC, user_id DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mt AS (
        |  SELECT user_id, yd AS yt,
        |    CASE WHEN lo_ps IS NOT NULL AND (hi_ps IS NULL
        |        OR (ps - lo_ps) <= (hi_ps - ps))
        |      THEN lo_y ELSE hi_y END AS ym
        |  FROM w WHERE tr = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |  CASE WHEN count(*) > 0 THEN
        |    ROUND(CAST(sum(CAST(ROUND(yt - ym, 9) AS DECIMAL(38,9)))
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) END AS att
        |FROM mt WHERE ym IS NOT NULL""".stripMargin,
    "q_agg_sobel" ->
      """WITH mm AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT))
        |      AS sm,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS sy,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0)))
        |      AS sxx,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS sxm,
        |    sum(CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS smm,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS sxy,
        |    sum(CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS smy,
        |    sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS syy
        |  FROM lineitem),
        |c AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxx,
        |    CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sm AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxm,
        |    CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cmm,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cxy,
        |    CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cmy,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS cyy
        |  FROM mm),
        |p AS (
        |  SELECT n, nd, cxx, cmm, cyy, cxm, cxy, cmy,
        |    cxm / cxx AS a, cxy / cxx AS ctot,
        |    (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS bb,
        |    (cxy * cmm - cmy * cxm) / (cmm * cxx - cxm * cxm) AS cdir
        |  FROM c
        |  WHERE cxx > 0 AND cmm * cxx - cxm * cxm > 0),
        |v AS (
        |  SELECT n, a, bb, cdir, ctot,
        |    (cmm - a * cxm) / (nd - 2.0) / cxx AS va,
        |    (cyy - bb * cmy - cdir * cxy) / (nd - 3.0)
        |      / (cmm - cxm * cxm / cxx) AS vb
        |  FROM p)
        |SELECT n, ROUND(a, 9) AS a_path, ROUND(bb, 9) AS b_path,
        |  ROUND(cdir, 9) AS direct_effect,
        |  ROUND(ctot, 9) AS total_effect,
        |  ROUND(a * bb, 9) AS indirect_effect,
        |  CASE WHEN abs(ctot) > 1e-12
        |    THEN ROUND(a * bb / ctot, 6) END AS prop_mediated,
        |  CASE WHEN a * a * vb + bb * bb * va > 0
        |    THEN ROUND(a * bb / sqrt(a * a * vb + bb * bb * va), 6)
        |  END AS sobel_z
        |FROM v""".stripMargin,
    "q_agg_ancova" ->
      """WITH g AS (
        |  SELECT l_returnflag AS grp, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS sy,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0)))
        |      AS sxx,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS sxy,
        |    sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS syy
        |  FROM lineitem GROUP BY 1),
        |gw AS (
        |  SELECT grp, n,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS wxx,
        |    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS wxy,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS wyy,
        |    sx, sy
        |  FROM g),
        |tot AS (
        |  SELECT sum(n) AS nn, CAST(count(*) AS BIGINT) AS k,
        |    sum(wxx) AS exx, sum(wxy) AS exy, sum(wyy) AS eyy,
        |    CAST(sum(sx) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS gmx
        |  FROM gw),
        |adj AS (
        |  SELECT grp, n, nn, k, exx, exy, eyy, exy / exx AS bw,
        |    ROUND((my - (exy / exx) * (mx - gmx)) / 100.0, 6)
        |      AS adj_mean,
        |    mx, my
        |  FROM gw CROSS JOIN tot WHERE exx > 0),
        |btw AS (
        |  SELECT max(nn) AS nn, max(k) AS k, max(exx) AS exx,
        |    max(exy) AS exy, max(eyy) AS eyy,
        |    max(exx) + sum(CAST(n AS DOUBLE) * mx * mx)
        |      - sum(CAST(n AS DOUBLE) * mx) * sum(CAST(n AS DOUBLE) * mx)
        |        / CAST(max(nn) AS DOUBLE) AS txx,
        |    max(exy) + sum(CAST(n AS DOUBLE) * mx * my)
        |      - sum(CAST(n AS DOUBLE) * mx) * sum(CAST(n AS DOUBLE) * my)
        |        / CAST(max(nn) AS DOUBLE) AS txy,
        |    max(eyy) + sum(CAST(n AS DOUBLE) * my * my)
        |      - sum(CAST(n AS DOUBLE) * my) * sum(CAST(n AS DOUBLE) * my)
        |        / CAST(max(nn) AS DOUBLE) AS tyy
        |  FROM adj),
        |f AS (
        |  SELECT
        |    CASE WHEN (eyy - exy * exy / exx) > 0 AND k > 1
        |        AND CAST(nn AS DOUBLE) - CAST(k AS DOUBLE) - 1 > 0
        |      THEN ROUND((((tyy - txy * txy / txx)
        |          - (eyy - exy * exy / exx))
        |          / (CAST(k AS DOUBLE) - 1.0))
        |        / ((eyy - exy * exy / exx)
        |          / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE) - 1.0)), 6)
        |    END AS f_group
        |  FROM btw WHERE exx > 0 AND txx > 0)
        |SELECT adj.grp, adj.n, adj.adj_mean,
        |  ROUND(adj.bw / 100.0, 6) AS pooled_slope, f.f_group
        |FROM adj CROSS JOIN f
        |ORDER BY grp""".stripMargin,
    "q_agg_huber" ->
      """WITH v AS (
        |  SELECT CAST(ROUND(value, 9) AS DECIMAL(28,9)) AS x
        |  FROM events),
        |m0 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu0,
        |    sqrt(greatest(0.0,
        |      CAST(sum(x * x) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      - (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |        * (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))))
        |      AS sd
        |  FROM v),
        |k0 AS (SELECT n, mu0, sd, 1.345 * sd AS k FROM m0),
        |w AS (
        |  SELECT n, mu0, k,
        |    CAST(ROUND(least(1.0, k / greatest(1e-300,
        |      abs(CAST(x AS DOUBLE) - mu0)))
        |      * CAST(x AS DOUBLE), 9) AS DECIMAL(38,9)) AS wx,
        |    CAST(ROUND(least(1.0, k / greatest(1e-300,
        |      abs(CAST(x AS DOUBLE) - mu0))), 9) AS DECIMAL(38,9)) AS w
        |  FROM v CROSS JOIN k0 WHERE sd > 0)
        |SELECT max(n) AS n, ROUND(max(mu0), 6) AS mean,
        |  CASE WHEN CAST(sum(w) AS DOUBLE) > 0
        |    THEN ROUND(CAST(sum(wx) AS DOUBLE)
        |      / CAST(sum(w) AS DOUBLE), 6) END AS huber_mean,
        |  ROUND(CAST(sum(w) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        |    AS effective_weight
        |FROM w""".stripMargin,
    "q_agg_wls" ->
      """WITH li AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS y
        |  FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(1.0 / CAST(x AS DOUBLE), 12)
        |      AS DECIMAL(18,12))) AS sw,
        |    sum(x) AS sx,
        |    sum(CAST(ROUND(CAST(y AS DOUBLE) / CAST(x AS DOUBLE), 6)
        |      AS DECIMAL(38,6))) AS syox,
        |    sum(y) AS sy,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS sx2,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |      AS sxy
        |  FROM li),
        |s AS (
        |  SELECT n, sw, syox,
        |    CAST(sw AS DOUBLE) * CAST(sy AS DOUBLE)
        |      - CAST(n AS DOUBLE) * CAST(syox AS DOUBLE) AS num,
        |    CAST(sw AS DOUBLE) * CAST(sx AS DOUBLE)
        |      - CAST(n AS DOUBLE) * CAST(n AS DOUBLE) AS den,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS onum,
        |    CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS oden
        |  FROM m)
        |SELECT n,
        |  CASE WHEN den > 0 THEN ROUND(num / den / 100.0, 6)
        |  END AS b1_wls,
        |  CASE WHEN den > 0 THEN ROUND((CAST(syox AS DOUBLE)
        |    - num / den * CAST(n AS DOUBLE))
        |    / CAST(sw AS DOUBLE) / 100.0, 6) END AS b0_wls,
        |  CASE WHEN oden > 0 THEN ROUND(onum / oden / 100.0, 6)
        |  END AS b1_ols
        |FROM s""".stripMargin,
  )
}
