package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 third wave: the causal-estimation / calibration hole next
  * to the existing design-based family (did/rdd/mde/srm/systematic) —
  * five oracled operators:
  *
  *  - q_agg_ipw: inverse-propensity-weighted (Hájek) treatment-effect
  *    estimate on observational event data — treated = users who ever
  *    fired a `signup`, outcome = the user's total `purchase` value,
  *    propensity = the EXACT within-stratum treatment share over
  *    activity strata (deterministic, no fitted model). Strata that
  *    violate positivity (e ∈ {0,1}) are excluded and counted — the
  *    estimator is undefined there, and silently dropping them is the
  *    classic IPW bug.
  *  - q_agg_isotonic: isotonic (monotone non-decreasing) regression of
  *    mean extendedprice on quantity via the exact minimax formula
  *    iso(i) = max_{j≤i} min_{k≥i} avg(y[j..k]) — the closed form of
  *    PAVA, chosen over the sequential pool-adjacent algorithm because
  *    it is ORDER-FREE set algebra over a bounded grid (quantity has
  *    ≤50 distinct values), hence expressible identically in both
  *    engines. The raw corpus collapses to per-quantity exact sums
  *    first; the O(grid³) cover join runs on ≤50 rows, never on data.
  *    This is the reward-model / probability calibration primitive.
  *  - q_agg_logistic: one exact Newton step from β=0 for the logistic
  *    regression P(returnflag='R') ~ quantity. At β=0 every p_i = ½,
  *    so the step has the closed form β₁ = 4·(XᵀX)⁻¹Xᵀ(y−½) — fully
  *    determined by exact integer moments (quantity ≤ 50 ⇒ all
  *    moments fit BIGINT well past sf100; the 2×2 solve happens on a
  *    1-row aggregate). Reported with the fitted probability at the
  *    mean quantity. The production-scoring sibling of q_agg_ols.
  *  - q_agg_ridge: ridge regression (λ = n, i.e. a unit per-row prior)
  *    of extendedprice on (quantity, discount) from ONE exact-integer
  *    moment scan (the chow cents idiom), solved closed-form on the
  *    centered 2×2 system, with the OLS (λ=0) coefficients alongside
  *    so the shrinkage is visible. (C+λI) is positive-definite for
  *    any λ>0, so the ridge path needs no determinant guard; the OLS
  *    pair keeps the degenerate-input CASE gate.
  *  - q_sample_ht: Horvitz–Thompson total estimation under
  *    deterministic Poisson-PPS sampling — π_i = min(1, n·rᵢ/R) over
  *    customer revenue, inclusion decided by the md5-uniform hash (the
  *    LlmText15 split idiom), HT total = Σ_sample rᵢ/πᵢ vs the true
  *    total. Deterministic end-to-end (hash inclusion, exact cents),
  *    so exactly oracled — unlike RNG sampling. Completes the design
  *    family: systematic (Madow) draws the sample, HT estimates from
  *    one.
  *
  * Determinism: propensities and π are exact-integer ratios; every
  * per-row weighted term is rounded to an explicit DECIMAL lattice
  * before summation (doubles never sum in engine order); final
  * statistics are 6dp rounds of identical double expressions. Scale:
  * ipw is one user-keyed agg + a bounded-strata broadcast; isotonic
  * collapses to the ≤50-point grid before any join; logistic/ridge
  * are single moment scans; ht is one customer-keyed agg against a
  * 1-row broadcast total. */
object Analytics96 {

  /** Per-user treatment/outcome/stratum table: treated = ever-signup,
    * y = total purchase value on the 9dp lattice, stratum = capped
    * activity ventile (bounded ≤10 strata at any corpus size).
    * `n_ev` is kept as the covariate the AIPW outcome models
    * (Analytics103) regress on. */
  private[queries] def userFrame(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("tr"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("CAST(ROUND(value, 9) AS DECIMAL(28,9))"))),
          lit(0).cast("decimal(28,9)")).as("y"))
      .select(col("user_id"), col("n_ev"), col("tr"), col("y"),
        expr("least(n_ev div 20, 9L)").as("st"))

  /** Hájek-normalized IPW ATE over exact stratum propensities.
    * Input: one row per unit with (tr ∈ {0,1}, y DECIMAL, st). */
  private[graft] def ipwEstimate(u: DataFrame): DataFrame = {
    val strata = u.groupBy(col("st"))
      .agg(count(lit(1)).as("nn"), sum(col("tr")).as("nt"))
      .select(col("st"), col("nn"), col("nt"),
        (col("nt") > 0 && col("nt") < col("nn")).as("ok"),
        (dbl(col("nt")) / dbl(col("nn"))).as("e"))
    val w = u.join(broadcast(strata), Seq("st"))
      .select(col("tr"), col("ok"),
        // per-user weighted terms on the 9dp lattice (w ≤ stratum
        // size, y ≤ per-user purchase total ⇒ terms ≪ DECIMAL(38,9))
        expr("""CASE WHEN ok THEN CAST(ROUND(CAST(y AS DOUBLE)
               |  / (CASE WHEN tr = 1 THEN e ELSE 1.0 - e END), 9)
               |  AS DECIMAL(38,9)) END""".stripMargin).as("wy"),
        expr("""CASE WHEN ok THEN CAST(ROUND(1.0
               |  / (CASE WHEN tr = 1 THEN e ELSE 1.0 - e END), 9)
               |  AS DECIMAL(38,9)) END""".stripMargin).as("ww"))
    w.agg(count(lit(1)).as("n_users"), sum(col("tr")).as("n_treated"),
        sum(when(!col("ok"), 1L).otherwise(0L)).as("n_excluded"),
        sum(when(col("tr") === 1, col("wy"))).as("sy1"),
        sum(when(col("tr") === 1, col("ww"))).as("sw1"),
        sum(when(col("tr") === 0, col("wy"))).as("sy0"),
        sum(when(col("tr") === 0, col("ww"))).as("sw0"))
      .select(col("n_users"), col("n_treated"), col("n_excluded"),
        when(dbl(col("sw1")) > 0,
          round(dbl(col("sy1")) / dbl(col("sw1")), 6)).as("mu_treated"),
        when(dbl(col("sw0")) > 0,
          round(dbl(col("sy0")) / dbl(col("sw0")), 6)).as("mu_control"),
        when(dbl(col("sw1")) > 0 && dbl(col("sw0")) > 0,
          round(dbl(col("sy1")) / dbl(col("sw1"))
            - dbl(col("sy0")) / dbl(col("sw0")), 6)).as("ate_ipw"))
  }

  private def qAggIpw(s: SparkSession, d: String): DataFrame =
    ipwEstimate(userFrame(s, d))

  /** Minimax isotonic fit over a (q, cnt, sy) grid — returns
    * (i, iso) where iso is the fitted mean in the sy unit. All joins
    * run on the bounded grid. */
  private[graft] def isotonicFit(g: DataFrame): DataFrame = {
    val wq = Window.orderBy(col("q"))
    val pre = g
      .withColumn("cn", sum(col("cnt")).over(wq))
      .withColumn("cy", sum(col("sy")).over(wq))
      .withColumn("pn", coalesce(sum(col("cnt"))
        .over(wq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("py", coalesce(sum(col("sy"))
        .over(wq.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .localCheckpoint(true) // grid-sized; cuts the 3-way self-join lineage
    val pairs = pre.select(col("q").as("j"), col("pn"), col("py"))
      .join(pre.select(col("q").as("k"), col("cn"), col("cy")),
        col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cy") - col("py")).cast("double")
          / (col("cn") - col("pn")).cast("double")).as("a"))
    pairs
      .join(pre.select(col("q").as("i")),
        col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("j")).agg(min(col("a")).as("ma"))
      .groupBy(col("i")).agg(max(col("ma")).as("iso"))
  }

  /** Isotonic fit of mean extendedprice (cents) on the quantity grid
    * via the minimax closed form — all joins on the ≤50-row grid. */
  private def qAggIsotonic(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("q"),
        // cents ride DECIMAL so the per-grid-point sum can't hit the
        // BIGINT wrap at extreme volume (Spark ANSI throws where
        // DuckDB HUGEINTs — the kruskal-bound class, widened away)
        expr("CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT) AS DECIMAL(19,0))").as("cents"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sy"))
    g.join(isotonicFit(g), col("q") === col("i"))
      .select(col("q").as("quantity"), col("cnt").as("n"),
        round(dbl(col("sy")) / dbl(col("cnt")) / 100.0, 6)
          .as("raw_mean"),
        round(col("iso") / 100.0, 6).as("iso_fit"))
      .orderBy(col("quantity"))
  }

  /** One Newton step from β=0 on an (x BIGINT, y ∈ {0,1}) frame. */
  private[graft] def logisticNewton(xy: DataFrame): DataFrame =
    xy
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        // x² rides DECIMAL(19,0)² → (38,0): exact for any caller's x
        // range (psmatch feeds per-user activity counts here, which
        // have no 50-cap), no BIGINT wrap
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sxx"),
        sum(col("y")).as("s1"), sum(col("x") * col("y")).as("sx1"))
      .select(col("n"),
        expr("""CAST(n AS DECIMAL(19,0)) * sxx
               | - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))"""
          .stripMargin).as("det"),
        expr("CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE) / 2.0").as("g0"),
        expr("CAST(sx1 AS DOUBLE) - CAST(sx AS DOUBLE) / 2.0").as("g1"),
        col("sx"), col("sxx"))
      .select(col("n"),
        when(dbl(col("det")) > 0, round(lit(4.0)
          * (dbl(col("sxx")) * col("g0") - dbl(col("sx")) * col("g1"))
          / dbl(col("det")), 9)).as("b0"),
        when(dbl(col("det")) > 0, round(lit(4.0)
          * (dbl(col("n")) * col("g1") - dbl(col("sx")) * col("g0"))
          / dbl(col("det")), 9)).as("b1"),
        col("sx"), col("det"))
      .select(col("n"), col("b0"), col("b1"),
        when(dbl(col("det")) > 0, round(lit(1.0) / (lit(1.0)
          + exp(-(col("b0") + col("b1") * dbl(col("sx")) / dbl(col("n"))))),
          6)).as("p_at_mean_qty"))

  /** One Newton step from β=0 for P(returnflag='R') ~ quantity. */
  private def qAggLogistic(s: SparkSession, d: String): DataFrame =
    logisticNewton(t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y")))

  /** Ridge (λ=n) + OLS of extendedprice on (quantity, discount) from
    * one exact cents-lattice moment scan. */
  private def qAggRidge(s: SparkSession, d: String): DataFrame = {
    val m = t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("x1"),
        expr("CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)")
          .as("x2"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(x1 AS DECIMAL(19,0)) * CAST(x1 AS DECIMAL(19,0))"))
          .as("s11"),
        sum(expr("CAST(x1 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0))"))
          .as("s12"),
        sum(expr("CAST(x2 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0))"))
          .as("s22"),
        sum(expr("CAST(x1 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("s1y"),
        sum(expr("CAST(x2 AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("s2y"))
    // centered moments in DOUBLE off the exact integers (ssr idiom)
    val c = m.select(col("n"),
      expr("CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("c11"),
      expr("CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("c12"),
      expr("CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("c22"),
      expr("CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("c1y"),
      expr("CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE)"
        + " / CAST(n AS DOUBLE)").as("c2y"),
      expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("my"),
      expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)").as("m1"),
      expr("CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)").as("m2"))
    def solve(lam: String, b1: String, b2: String) =
      Seq(
        s"""((c22 + $lam) * c1y - c12 * c2y)
           | / ((c11 + $lam) * (c22 + $lam) - c12 * c12)""".stripMargin
          -> b1,
        s"""((c11 + $lam) * c2y - c12 * c1y)
           | / ((c11 + $lam) * (c22 + $lam) - c12 * c12)""".stripMargin
          -> b2)
    val rg = solve("CAST(n AS DOUBLE)", "r1", "r2")
    val ol = solve("0.0", "o1", "o2")
    c.select((col("n") +: (rg ++ ol).map { case (e, a) =>
        expr(e).as(a) } :+ col("my") :+ col("m1") :+ col("m2")
        :+ expr("c11 * c22 - c12 * c12").as("detols")): _*)
      .select(col("n"),
        round(col("r1") / 100.0, 6).as("b1_ridge"),
        round(col("r2") / 100.0, 6).as("b2_ridge"),
        round((col("my") - col("r1") * col("m1")
          - col("r2") * col("m2")) / 100.0, 6).as("b0_ridge"),
        // OLS needs the positive-definite gate ridge doesn't
        when(col("detols") > 0, round(col("o1") / 100.0, 6))
          .as("b1_ols"),
        when(col("detols") > 0, round(col("o2") / 100.0, 6))
          .as("b2_ols"))
  }

  /** Horvitz–Thompson total over a (c, r) size frame under the
    * md5-uniform Poisson-PPS design with target sample size n=100. */
  private[graft] def htEstimate(rev: DataFrame): DataFrame = {
    val tot = rev.agg(sum(col("r")).as("tt"), count(lit(1)).as("n_pop"))
    rev.crossJoin(broadcast(tot))
      .filter(col("tt") > 0)
      .select(col("c"), col("r"), col("tt"), col("n_pop"),
        expr("least(1.0, 100.0 * CAST(r AS DOUBLE) / CAST(tt AS DOUBLE))")
          .as("pi"),
        (expr("CAST(conv(substring(md5(CAST(c AS STRING)), 1, 6), 16, 10)"
          + " AS BIGINT)").cast("double") / lit(16777216.0)).as("u"))
      .select(col("tt"), col("n_pop"), col("pi"),
        when(col("u") < col("pi"),
          // HT terms r/π ≤ max(r, T/100): 4dp lattice keeps the sum
          // exact and engine-identical
          expr("CAST(ROUND(CAST(r AS DOUBLE) / pi, 4) AS DECIMAL(38,4))"))
          .as("ht"))
      .agg(max(col("n_pop")).as("n_pop"),
        sum(when(col("ht").isNotNull, 1L).otherwise(0L)).as("n_sample"),
        max(col("tt")).as("true_total_cents"),
        sum(col("ht")).as("htsum"),
        sum(expr("CAST(ROUND(pi, 9) AS DECIMAL(28,9))")).as("epi"))
      .select(col("n_pop"), col("n_sample"), col("true_total_cents"),
        round(dbl(col("htsum")) / 100.0, 2).as("ht_total"),
        when(col("true_total_cents") > 0,
          round(dbl(col("htsum")) / dbl(col("true_total_cents")), 6))
          .as("ht_ratio"),
        round(dbl(col("epi")), 6).as("expected_n"))
  }

  /** HT revenue-total estimation over per-customer order revenue. */
  private def qSampleHt(s: SparkSession, d: String): DataFrame =
    htEstimate(t(s, d, "orders")
      .select(col("o_custkey").as("c"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("r"))
      .groupBy(col("c")).agg(sum(col("r")).as("r")))

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_ipw" -> (qAggIpw _),
    "q_agg_isotonic" -> (qAggIsotonic _),
    "q_agg_logistic" -> (qAggLogistic _),
    "q_agg_ridge" -> (qAggRidge _),
    "q_sample_ht" -> (qSampleHt _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_ipw" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tr,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value, 9) AS DECIMAL(28,9)) END),
        |      CAST(0 AS DECIMAL(28,9))) AS y
        |  FROM events GROUP BY user_id),
        |us AS (SELECT user_id, tr, y, least(n_ev // 20, 9) AS st FROM u),
        |strata AS (
        |  SELECT st, CAST(count(*) AS BIGINT) AS nn, sum(tr) AS nt,
        |    (sum(tr) > 0 AND sum(tr) < count(*)) AS ok,
        |    CAST(sum(tr) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS e
        |  FROM us GROUP BY st),
        |w AS (
        |  SELECT tr, ok,
        |    CASE WHEN ok THEN CAST(ROUND(CAST(y AS DOUBLE)
        |      / (CASE WHEN tr = 1 THEN e ELSE 1.0 - e END), 9)
        |      AS DECIMAL(38,9)) END AS wy,
        |    CASE WHEN ok THEN CAST(ROUND(1.0
        |      / (CASE WHEN tr = 1 THEN e ELSE 1.0 - e END), 9)
        |      AS DECIMAL(38,9)) END AS ww
        |  FROM us JOIN strata USING (st))
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(tr) AS BIGINT) AS n_treated,
        |  CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_excluded,
        |  CASE WHEN CAST(sum(CASE WHEN tr = 1 THEN ww END) AS DOUBLE) > 0
        |    THEN ROUND(CAST(sum(CASE WHEN tr = 1 THEN wy END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN tr = 1 THEN ww END) AS DOUBLE), 6)
        |  END AS mu_treated,
        |  CASE WHEN CAST(sum(CASE WHEN tr = 0 THEN ww END) AS DOUBLE) > 0
        |    THEN ROUND(CAST(sum(CASE WHEN tr = 0 THEN wy END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN tr = 0 THEN ww END) AS DOUBLE), 6)
        |  END AS mu_control,
        |  CASE WHEN CAST(sum(CASE WHEN tr = 1 THEN ww END) AS DOUBLE) > 0
        |    AND CAST(sum(CASE WHEN tr = 0 THEN ww END) AS DOUBLE) > 0
        |    THEN ROUND(CAST(sum(CASE WHEN tr = 1 THEN wy END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN tr = 1 THEN ww END) AS DOUBLE)
        |      - CAST(sum(CASE WHEN tr = 0 THEN wy END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN tr = 0 THEN ww END) AS DOUBLE), 6)
        |  END AS ate_ipw
        |FROM w""".stripMargin,
    "q_agg_isotonic" ->
      """WITH g AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS sy
        |  FROM lineitem GROUP BY 1),
        |pre AS (
        |  SELECT q, cnt, sy,
        |    sum(cnt) OVER (ORDER BY q) AS cn,
        |    sum(sy) OVER (ORDER BY q) AS cy,
        |    coalesce(sum(cnt) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pn,
        |    coalesce(sum(sy) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS py
        |  FROM g),
        |pairs AS (
        |  SELECT j.q AS j, k.q AS k,
        |    CAST(k.cy - j.py AS DOUBLE) / CAST(k.cn - j.pn AS DOUBLE)
        |      AS a
        |  FROM pre j JOIN pre k ON j.q <= k.q),
        |minj AS (
        |  SELECT i.q AS i, p.j, min(p.a) AS ma
        |  FROM pairs p JOIN pre i ON p.j <= i.q AND i.q <= p.k
        |  GROUP BY 1, 2),
        |iso AS (SELECT i, max(ma) AS iso FROM minj GROUP BY i)
        |SELECT g.q AS quantity, g.cnt AS n,
        |  ROUND(CAST(g.sy AS DOUBLE) / CAST(g.cnt AS DOUBLE) / 100.0, 6)
        |    AS raw_mean,
        |  ROUND(iso.iso / 100.0, 6) AS iso_fit
        |FROM g JOIN iso ON g.q = iso.i
        |ORDER BY quantity""".stripMargin,
    "q_agg_logistic" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
        |      AS sxx,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS s1,
        |    sum(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS sx1
        |  FROM lineitem),
        |s AS (
        |  SELECT n,
        |    CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
        |      - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
        |      AS det,
        |    CAST(s1 AS DOUBLE) - CAST(n AS DOUBLE) / 2.0 AS g0,
        |    CAST(sx1 AS DOUBLE) - CAST(sx AS DOUBLE) / 2.0 AS g1,
        |    sx, sxx
        |  FROM m),
        |b AS (
        |  SELECT n, det, sx,
        |    CASE WHEN CAST(det AS DOUBLE) > 0 THEN ROUND(4.0
        |      * (CAST(sxx AS DOUBLE) * g0 - CAST(sx AS DOUBLE) * g1)
        |      / CAST(det AS DOUBLE), 9) END AS b0,
        |    CASE WHEN CAST(det AS DOUBLE) > 0 THEN ROUND(4.0
        |      * (CAST(n AS DOUBLE) * g1 - CAST(sx AS DOUBLE) * g0)
        |      / CAST(det AS DOUBLE), 9) END AS b1
        |  FROM s)
        |SELECT n, b0, b1,
        |  CASE WHEN CAST(det AS DOUBLE) > 0 THEN ROUND(1.0 / (1.0
        |    + exp(-(b0 + b1 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))),
        |    6) END AS p_at_mean_qty
        |FROM b""".stripMargin,
    "q_agg_ridge" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS s1,
        |    sum(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT))
        |      AS s2,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS sy,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0)))
        |      AS s11,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS s12,
        |    sum(CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS s22,
        |    sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS s1y,
        |    sum(CAST(CAST(CAST(l_discount AS DECIMAL(6,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))
        |      * CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |        AS BIGINT) AS DECIMAL(19,0))) AS s2y
        |  FROM lineitem),
        |c AS (
        |  SELECT n,
        |    CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS c11,
        |    CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS c12,
        |    CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS c22,
        |    CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS c1y,
        |    CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS c2y,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2
        |  FROM m),
        |b AS (
        |  SELECT n, my, m1, m2,
        |    ((c22 + CAST(n AS DOUBLE)) * c1y - c12 * c2y)
        |      / ((c11 + CAST(n AS DOUBLE)) * (c22 + CAST(n AS DOUBLE))
        |         - c12 * c12) AS r1,
        |    ((c11 + CAST(n AS DOUBLE)) * c2y - c12 * c1y)
        |      / ((c11 + CAST(n AS DOUBLE)) * (c22 + CAST(n AS DOUBLE))
        |         - c12 * c12) AS r2,
        |    c11 * c22 - c12 * c12 AS detols,
        |    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS o1,
        |    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS o2
        |  FROM c)
        |SELECT n,
        |  ROUND(r1 / 100.0, 6) AS b1_ridge,
        |  ROUND(r2 / 100.0, 6) AS b2_ridge,
        |  ROUND((my - r1 * m1 - r2 * m2) / 100.0, 6) AS b0_ridge,
        |  CASE WHEN detols > 0 THEN ROUND(o1 / 100.0, 6) END AS b1_ols,
        |  CASE WHEN detols > 0 THEN ROUND(o2 / 100.0, 6) END AS b2_ols
        |FROM b""".stripMargin,
    "q_sample_ht" ->
      """WITH rev AS (
        |  SELECT o_custkey AS c,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS r
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(r) AS BIGINT) AS tt,
        |          CAST(count(*) AS BIGINT) AS n_pop
        |        FROM rev),
        |w AS (
        |  SELECT tt, n_pop,
        |    least(1.0, 100.0 * CAST(r AS DOUBLE) / CAST(tt AS DOUBLE))
        |      AS pi,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(
        |          substr(md5(CAST(c AS VARCHAR)), 1, 6), ''),
        |          ch -> CAST(strpos('0123456789abcdef', ch) - 1
        |            AS BIGINT))),
        |        (h, x) -> h * 16 + x) AS DOUBLE) / 16777216.0 AS u,
        |    r
        |  FROM rev CROSS JOIN tot WHERE tt > 0),
        |ht AS (
        |  SELECT tt, n_pop, pi,
        |    CASE WHEN u < pi THEN CAST(ROUND(CAST(r AS DOUBLE) / pi, 4)
        |      AS DECIMAL(38,4)) END AS ht
        |  FROM w)
        |SELECT max(n_pop) AS n_pop,
        |  CAST(sum(CASE WHEN ht IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sample,
        |  max(tt) AS true_total_cents,
        |  ROUND(CAST(sum(ht) AS DOUBLE) / 100.0, 2) AS ht_total,
        |  CASE WHEN max(tt) > 0 THEN ROUND(CAST(sum(ht) AS DOUBLE)
        |    / CAST(max(tt) AS DOUBLE), 6) END AS ht_ratio,
        |  ROUND(CAST(sum(CAST(ROUND(pi, 9) AS DECIMAL(28,9))) AS DOUBLE),
        |    6) AS expected_n
        |FROM ht""".stripMargin,
  )
}
