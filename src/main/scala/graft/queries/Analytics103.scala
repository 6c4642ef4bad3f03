package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 first wave: the doubly-robust estimator the causal family
  * was still missing, two classic rank tests the ordered/dispersion
  * corner lacked, and the re-identification diagnostic beside the
  * k-anonymity sweep — four oracled operators:
  *
  *  - q_agg_aipw: augmented IPW (doubly-robust) ATE on the same
  *    observational frame as q_agg_ipw — propensity = exact
  *    within-stratum treatment share (positivity violations excluded
  *    AND counted, the q_agg_ipw contract), outcome models = per-arm
  *    OLS of purchase total on activity (exact moment scans). The
  *    estimator stays consistent if EITHER model is right — the
  *    production default over raw IPW, reported next to the
  *    model-only ATE so the augmentation is visible.
  *  - q_agg_jonckheere: Jonckheere–Terpstra ordered-alternative trend
  *    test — does lineitem quantity trend across the FIVE ordered
  *    order-priority groups; pairwise Mann–Whitney mass computed on
  *    the (priority × quantity≤50) count grid (≤250 cells), never on
  *    row pairs; ties get the standard ½ credit; z via the classical
  *    (ties-uncorrected) normal approximation, stated as such.
  *  - q_agg_ansari: Ansari–Bradley equal-dispersion test (deep- vs
  *    no-discount quantities) — scores min(i, N+1−i) from both ends,
  *    tie-averaged per quantity via the exact closed-form range sum
  *    on the ≤50-cell grid; z from the permutation variance of a
  *    linear rank statistic. The dispersion sibling of
  *    q_agg_mannwhitney's location test.
  *  - q_quality_uniqueness: drop-one re-identification audit — sample
  *    uniqueness (classes of size 1 and the rows they expose) for the
  *    full (nation, segment, balance-band) quasi-identifier AND each
  *    drop-one subset, via ONE grouping-sets scan: which attribute
  *    drives disclosure risk, the question k-anonymity's single-QI
  *    sweep (q_quality_kanon) can't answer.
  *
  * Determinism: propensities/scores are exact-integer ratios; every
  * per-row double term is rounded to an explicit DECIMAL lattice
  * before summation; z statistics are 6dp rounds of identical double
  * trees over exact moments. Scale: aipw is two scans of the
  * user-keyed frame against 1-row/10-row broadcasts; both rank tests
  * collapse the fact stream to bounded value grids before any join
  * (grid pair work ≤250², constant forever); uniqueness is one
  * grouping-sets aggregation over a dimension table. BIGINT bounds:
  * the JT/AB closed forms keep k(k+1)/2-style products ≤ N², exact in
  * BIGINT to N ≈ 3e9 rows (sf≈500); moments that square cell counts
  * ride DECIMAL(19,0)² → (38,0). */
object Analytics103 {

  /** AIPW: strata propensities (exact shares) + per-arm OLS outcome
    * models on x = n_ev, combined per unit. */
  private def qAggAipw(s: SparkSession, d: String): DataFrame = {
    val u = Analytics96.userFrame(s, d).localCheckpoint(true)
    val strata = u.groupBy(col("st"))
      .agg(count(lit(1)).as("nn"), sum(col("tr")).as("nt"))
      .select(col("st"), (col("nt") > 0 && col("nt") < col("nn")).as("ok"),
        (dbl(col("nt")) / dbl(col("nn"))).as("e"))
    // per-arm OLS moments: x exact BIGINT, y on the 9dp lattice; the
    // cross moment x·y rides a 6dp-rounded per-row lattice (identical
    // double product of exact values in both engines)
    val mom = u.groupBy(col("tr"))
      .agg(count(lit(1)).as("n"), sum(col("n_ev")).as("sx"),
        sum(expr("CAST(n_ev AS DECIMAL(19,0))" +
          " * CAST(n_ev AS DECIMAL(19,0))")).as("sxx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(ROUND(CAST(n_ev AS DOUBLE) * CAST(y AS DOUBLE), 6)" +
          " AS DECIMAL(38,6))")).as("sxy"))
      .select(col("tr"), col("n"),
        expr("""CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"""
          .stripMargin).as("vx"),
        expr("""CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               | - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"""
          .stripMargin).as("cxy"),
        expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("my"),
        expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").as("mx"))
      .select(col("tr"),
        when(col("vx") > 0, col("cxy") / col("vx")).as("b"),
        when(col("vx") > 0, col("my") - (col("cxy") / col("vx"))
          * col("mx")).as("a"))
    val coef = mom.groupBy()
      .agg(max(when(col("tr") === 1, col("a"))).as("a1"),
        max(when(col("tr") === 1, col("b"))).as("b1"),
        max(when(col("tr") === 0, col("a"))).as("a0"),
        max(when(col("tr") === 0, col("b"))).as("b0"))
    u.join(broadcast(strata), Seq("st"))
      .crossJoin(broadcast(coef))
      .select(col("tr"), col("ok"),
        // per-unit influence terms on the 9dp lattice; m_t(x) = a_t + b_t·x
        expr("""CASE WHEN ok AND a1 IS NOT NULL AND a0 IS NOT NULL THEN
               |  CAST(ROUND(
               |    (a1 + b1 * CAST(n_ev AS DOUBLE))
               |    - (a0 + b0 * CAST(n_ev AS DOUBLE))
               |    + CASE WHEN tr = 1 THEN (CAST(y AS DOUBLE)
               |        - (a1 + b1 * CAST(n_ev AS DOUBLE))) / e
               |      ELSE -(CAST(y AS DOUBLE)
               |        - (a0 + b0 * CAST(n_ev AS DOUBLE))) / (1.0 - e)
               |      END, 9) AS DECIMAL(38,9)) END""".stripMargin)
          .as("phi"),
        expr("""CASE WHEN ok AND a1 IS NOT NULL AND a0 IS NOT NULL THEN
               |  CAST(ROUND((a1 + b1 * CAST(n_ev AS DOUBLE))
               |    - (a0 + b0 * CAST(n_ev AS DOUBLE)), 9)
               |    AS DECIMAL(38,9)) END""".stripMargin).as("md"))
      .agg(count(lit(1)).as("n_users"), sum(col("tr")).as("n_treated"),
        sum(when(col("phi").isNull, 1L).otherwise(0L)).as("n_excluded"),
        count(col("phi")).as("n_ok"),
        sum(col("phi")).as("sphi"), sum(col("md")).as("smd"))
      .select(col("n_users"), col("n_treated"), col("n_excluded"),
        when(col("n_ok") > 0,
          round(dbl(col("smd")) / dbl(col("n_ok")), 6)).as("ate_model"),
        when(col("n_ok") > 0,
          round(dbl(col("sphi")) / dbl(col("n_ok")), 6)).as("ate_aipw"))
  }

  /** (priority 1..5, quantity, count) grid — the JT input. */
  private[queries] def jtGrid(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_orderkey"), expr("CAST(l_quantity AS BIGINT)").as("q"))
      .join(t(s, d, "orders").select(col("o_orderkey").as("l_orderkey"),
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g")),
        Seq("l_orderkey"))
      .groupBy(col("g"), col("q")).agg(count(lit(1)).as("cnt"))

  private def qAggJonckheere(s: SparkSession, d: String): DataFrame = {
    val grid = jtGrid(s, d).localCheckpoint(true) // ≤250 cells
    // 2U = 2·Σ_{g1<g2, q1<q2} c1·c2 + Σ_{g1<g2, q1=q2} c1·c2 (½-tie
    // credit kept integer); cell products ride DECIMAL(19,0)²
    val a = grid.select(col("g").as("g1"), col("q").as("q1"),
      col("cnt").as("c1"))
    val b = grid.select(col("g").as("g2"), col("q").as("q2"),
      col("cnt").as("c2"))
    val u2 = a.join(b, col("g1") < col("g2") && col("q1") <= col("q2"))
      .select((when(col("q1") < col("q2"), lit(2L)).otherwise(lit(1L))
        * expr("CAST(c1 AS DECIMAL(19,0)) * CAST(c2 AS DECIMAL(19,0))"))
        .as("p"))
      .agg(coalesce(sum(col("p")), lit(0).cast("decimal(38,0)")).as("u2"))
    val gs = grid.groupBy(col("g")).agg(sum(col("cnt")).as("ng"))
      .agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(expr("CAST(ng AS DECIMAL(19,0)) * CAST(ng AS DECIMAL(19,0))"))
          .as("sng2"),
        // Σ ng²(2ng+3) in DOUBLE off exact ng (the ssr idiom: the
        // value passes BIGINT near sf100, the double tree is
        // engine-identical)
        sum(expr("CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE)" +
          " * (2.0 * CAST(ng AS DOUBLE) + 3.0)")).as("sng23"))
    u2.crossJoin(broadcast(gs))
      .select(col("n"), col("k").as("n_groups"),
        round(dbl(col("u2")) / 2.0, 1).as("u_stat"),
        expr("""(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               | - CAST(sng2 AS DOUBLE)) / 4.0""".stripMargin).as("e_u"),
        expr("""(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               |  * (2.0 * CAST(n AS DOUBLE) + 3.0) - sng23) / 72.0"""
          .stripMargin).as("var_u"))
      .select(col("n"), col("n_groups"), col("u_stat"),
        round(col("e_u"), 1).as("e_u"),
        when(col("var_u") > 0, round((col("u_stat") - col("e_u"))
          / sqrt(col("var_u")), 6)).as("z"))
  }

  private def qAggAnsari(s: SparkSession, d: String): DataFrame = {
    // samples: X = deep-discount lines (>5%), Y = the rest; value grid
    // = quantity (≤50 cells); combined midrank range per cell from
    // cumulative counts, AB score = tie-averaged min(i, N+1−i)
    val grid = t(s, d, "lineitem")
      .select(expr("CAST(l_quantity AS BIGINT)").as("q"),
        when(col("l_discount") > 0.05, 1L).otherwise(0L).as("x"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("cx"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("q"))
    val ranked = grid // grid-bounded window (the kruskal/dunn contract)
      .withColumn("hi", sum(col("cnt")).over(w))
      .localCheckpoint(true)
    val tot = ranked.agg(max(col("hi")).as("nn"),
      sum(col("cx")).as("m"))
    // S(k) = Σ_{i≤k} min(i, N+1−i), closed form split at M=(N+1) div 2;
    // exact BIGINT to N ≈ 3e9 (k(k+1)/2 ≤ N²/2 < 2^63)
    val sk = "CASE WHEN %1$s <= mm THEN %1$s * (%1$s + 1L) div 2 " +
      "ELSE mm * (mm + 1L) div 2 + (%1$s - mm) * (nn + 1L) " +
      "- (%1$s * (%1$s + 1L) div 2 - mm * (mm + 1L) div 2) END"
    val scored = ranked.crossJoin(broadcast(tot))
      .withColumn("mm", expr("(nn + 1L) div 2"))
      .withColumn("lo", col("hi") - col("cnt"))
      .withColumn("rsum",
        expr(sk.format("hi")) - expr(sk.format("lo")))
      // tie-averaged score and its per-cell contributions on 9dp
      // lattices (identical double trees over exact integers)
      .withColumn("ms", expr("CAST(rsum AS DOUBLE) / CAST(cnt AS DOUBLE)"))
    val agg = scored.agg(max(col("nn")).as("nn"), max(col("m")).as("m"),
      sum(expr("CAST(ROUND(CAST(cx AS DOUBLE) * ms, 9)" +
        " AS DECIMAL(38,9))")).as("wstat"),
      sum(expr("CAST(ROUND(CAST(cnt AS DOUBLE) * ms, 9)" +
        " AS DECIMAL(38,9))")).as("ssum"),
      sum(expr("CAST(ROUND(CAST(cnt AS DOUBLE) * ms * ms, 9)" +
        " AS DECIMAL(38,9))")).as("ss2"))
    agg.select(col("m").as("n_x"), (col("nn") - col("m")).as("n_y"),
        col("nn"), round(dbl(col("wstat")), 4).as("w_stat"),
        expr("CAST(ssum AS DOUBLE) / CAST(nn AS DOUBLE)").as("sbar"),
        expr("""CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE)
               |   - CAST(m AS DOUBLE))
               | / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))
               | * (CAST(ss2 AS DOUBLE) - CAST(nn AS DOUBLE)
               |   * (CAST(ssum AS DOUBLE) / CAST(nn AS DOUBLE))
               |   * (CAST(ssum AS DOUBLE) / CAST(nn AS DOUBLE)))"""
          .stripMargin).as("var_w"))
      .select(col("n_x"), col("n_y"), col("w_stat"),
        round(dbl(col("n_x")) * col("sbar"), 4).as("e_w"),
        when(col("var_w") > 0, round((col("w_stat")
          - dbl(col("n_x")) * col("sbar")) / sqrt(col("var_w")), 6))
          .as("z"))
  }

  /** Drop-one uniqueness audit over (nation, segment, balance band) —
    * one grouping-sets scan, per-set class stats. */
  private def qQualityUniqueness(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "customer")
      .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / lit(1000.0)).cast("bigint").as("balband"))
    base.createOrReplaceTempView("graft_uniq_base")
    s.sql(
      """SELECT
        |  CASE grouping_id(nat, seg, balband)
        |    WHEN 0 THEN 'nat+seg+bal'
        |    WHEN 4 THEN 'seg+bal'
        |    WHEN 2 THEN 'nat+bal'
        |    WHEN 1 THEN 'nat+seg' END AS qi,
        |  nat, seg, balband, count(*) AS sz
        |FROM graft_uniq_base
        |GROUP BY GROUPING SETS ((nat, seg, balband), (seg, balband),
        |  (nat, balband), (nat, seg))""".stripMargin)
      .groupBy(col("qi"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("sz") === 1, 1L).otherwise(0L)).as("n_unique_classes"),
        sum(col("sz")).as("n_rows"),
        min(col("sz")).as("min_class"))
      .select(col("qi"), col("n_classes"), col("n_unique_classes"),
        col("n_rows"), col("min_class"),
        when(col("n_rows") > 0, round(dbl(col("n_unique_classes"))
          / dbl(col("n_rows")), 9)).as("uniq_share"))
      .orderBy(col("qi"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_aipw" -> (qAggAipw _),
    "q_agg_jonckheere" -> (qAggJonckheere _),
    "q_agg_ansari" -> (qAggAnsari _),
    "q_quality_uniqueness" -> (qQualityUniqueness _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_aipw" ->
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tr,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value, 9) AS DECIMAL(28,9)) END),
        |      CAST(0 AS DECIMAL(28,9))) AS y
        |  FROM events GROUP BY user_id),
        |us AS (SELECT user_id, n_ev, tr, y, least(n_ev // 20, 9) AS st
        |       FROM u),
        |strata AS (
        |  SELECT st, (sum(tr) > 0 AND sum(tr) < count(*)) AS ok,
        |    CAST(sum(tr) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS e
        |  FROM us GROUP BY st),
        |mom AS (
        |  SELECT tr, CAST(count(*) AS BIGINT) AS n, sum(n_ev) AS sx,
        |    sum(CAST(n_ev AS HUGEINT) * n_ev) AS sxx, sum(y) AS sy,
        |    sum(CAST(ROUND(CAST(n_ev AS DOUBLE) * CAST(y AS DOUBLE), 6)
        |      AS DECIMAL(38,6))) AS sxy
        |  FROM us GROUP BY tr),
        |ab AS (
        |  SELECT tr,
        |    CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        |      THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END AS b,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
        |  FROM mom),
        |coef AS (
        |  SELECT
        |    max(CASE WHEN tr = 1 THEN my - b * mx END) AS a1,
        |    max(CASE WHEN tr = 1 THEN b END) AS b1,
        |    max(CASE WHEN tr = 0 THEN my - b * mx END) AS a0,
        |    max(CASE WHEN tr = 0 THEN b END) AS b0
        |  FROM ab),
        |terms AS (
        |  SELECT tr,
        |    CASE WHEN ok AND a1 IS NOT NULL AND a0 IS NOT NULL THEN
        |      CAST(ROUND(
        |        (a1 + b1 * CAST(n_ev AS DOUBLE))
        |        - (a0 + b0 * CAST(n_ev AS DOUBLE))
        |        + CASE WHEN tr = 1 THEN (CAST(y AS DOUBLE)
        |            - (a1 + b1 * CAST(n_ev AS DOUBLE))) / e
        |          ELSE -(CAST(y AS DOUBLE)
        |            - (a0 + b0 * CAST(n_ev AS DOUBLE))) / (1.0 - e)
        |          END, 9) AS DECIMAL(38,9)) END AS phi,
        |    CASE WHEN ok AND a1 IS NOT NULL AND a0 IS NOT NULL THEN
        |      CAST(ROUND((a1 + b1 * CAST(n_ev AS DOUBLE))
        |        - (a0 + b0 * CAST(n_ev AS DOUBLE)), 9)
        |        AS DECIMAL(38,9)) END AS md
        |  FROM us JOIN strata USING (st) CROSS JOIN coef)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(tr) AS BIGINT) AS n_treated,
        |  CAST(sum(CASE WHEN phi IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_excluded,
        |  CASE WHEN count(phi) > 0 THEN
        |    ROUND(CAST(sum(md) AS DOUBLE) / count(phi), 6) END
        |    AS ate_model,
        |  CASE WHEN count(phi) > 0 THEN
        |    ROUND(CAST(sum(phi) AS DOUBLE) / count(phi), 6) END
        |    AS ate_aipw
        |FROM terms""".stripMargin,
    "q_agg_jonckheere" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |u2 AS (
        |  SELECT coalesce(sum((CASE WHEN a.q < b.q THEN 2 ELSE 1 END)
        |    * CAST(a.cnt AS HUGEINT) * b.cnt), 0) AS u2
        |  FROM grid a JOIN grid b ON a.g < b.g AND a.q <= b.q),
        |gs AS (
        |  SELECT sum(ng) AS n, CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(ng AS HUGEINT) * ng) AS sng2,
        |    sum(CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE)
        |      * (2.0 * CAST(ng AS DOUBLE) + 3.0)) AS sng23
        |  FROM (SELECT g, sum(cnt) AS ng FROM grid GROUP BY g) z),
        |c AS (
        |  SELECT CAST(n AS BIGINT) AS n, k AS n_groups,
        |    ROUND(CAST(u2 AS DOUBLE) / 2.0, 1) AS u_stat,
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(sng2 AS DOUBLE)) / 4.0 AS e_u,
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      * (2.0 * CAST(n AS DOUBLE) + 3.0) - sng23) / 72.0 AS var_u
        |  FROM u2 CROSS JOIN gs)
        |SELECT n, n_groups, u_stat, ROUND(e_u, 1) AS e_u,
        |  CASE WHEN var_u > 0
        |    THEN ROUND((u_stat - e_u) / sqrt(var_u), 6) END AS z
        |FROM c""".stripMargin,
    "q_agg_ansari" ->
      """WITH grid AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cx
        |  FROM lineitem GROUP BY 1),
        |ranked AS (
        |  SELECT q, cnt, cx, sum(cnt) OVER (ORDER BY q) AS hi
        |  FROM grid),
        |tot AS (SELECT max(hi) AS nn, sum(cx) AS m FROM ranked),
        |scored AS (
        |  SELECT cnt, cx,
        |    CAST(
        |      (CASE WHEN hi <= mm THEN hi * (hi + 1) // 2
        |        ELSE mm * (mm + 1) // 2 + (hi - mm) * (nn + 1)
        |          - (hi * (hi + 1) // 2 - mm * (mm + 1) // 2) END)
        |      - (CASE WHEN lo <= mm THEN lo * (lo + 1) // 2
        |        ELSE mm * (mm + 1) // 2 + (lo - mm) * (nn + 1)
        |          - (lo * (lo + 1) // 2 - mm * (mm + 1) // 2) END)
        |      AS DOUBLE) / CAST(cnt AS DOUBLE) AS ms,
        |    nn, m
        |  FROM (SELECT q, cnt, cx, hi, hi - cnt AS lo,
        |          (nn + 1) // 2 AS mm, nn, m
        |        FROM ranked CROSS JOIN tot) z),
        |agg AS (
        |  SELECT max(nn) AS nn, max(m) AS m,
        |    sum(CAST(ROUND(CAST(cx AS DOUBLE) * ms, 9)
        |      AS DECIMAL(38,9))) AS wstat,
        |    sum(CAST(ROUND(CAST(cnt AS DOUBLE) * ms, 9)
        |      AS DECIMAL(38,9))) AS ssum,
        |    sum(CAST(ROUND(CAST(cnt AS DOUBLE) * ms * ms, 9)
        |      AS DECIMAL(38,9))) AS ss2
        |  FROM scored),
        |c AS (
        |  SELECT CAST(m AS BIGINT) AS n_x,
        |    CAST(nn - m AS BIGINT) AS n_y,
        |    ROUND(CAST(wstat AS DOUBLE), 4) AS w_stat,
        |    CAST(m AS DOUBLE) AS md, CAST(nn AS DOUBLE) AS nd,
        |    CAST(ssum AS DOUBLE) / CAST(nn AS DOUBLE) AS sbar,
        |    CAST(m AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(m AS DOUBLE))
        |      / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0))
        |      * (CAST(ss2 AS DOUBLE) - CAST(nn AS DOUBLE)
        |        * (CAST(ssum AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (CAST(ssum AS DOUBLE) / CAST(nn AS DOUBLE))) AS var_w
        |  FROM agg)
        |SELECT n_x, n_y, w_stat, ROUND(md * sbar, 4) AS e_w,
        |  CASE WHEN var_w > 0
        |    THEN ROUND((w_stat - md * sbar) / sqrt(var_w), 6) END AS z
        |FROM c""".stripMargin,
    "q_quality_uniqueness" ->
      """WITH base AS (
        |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balband
        |  FROM customer),
        |cls AS (
        |  SELECT CASE grouping(nat, seg, balband)
        |      WHEN 0 THEN 'nat+seg+bal'
        |      WHEN 4 THEN 'seg+bal'
        |      WHEN 2 THEN 'nat+bal'
        |      WHEN 1 THEN 'nat+seg' END AS qi,
        |    count(*) AS sz
        |  FROM base
        |  GROUP BY GROUPING SETS ((nat, seg, balband), (seg, balband),
        |    (nat, balband), (nat, seg)))
        |SELECT qi, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique_classes,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(min(sz) AS BIGINT) AS min_class,
        |  CASE WHEN sum(sz) > 0 THEN
        |    ROUND(CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(sz) AS DOUBLE), 9) END AS uniq_share
        |FROM cls GROUP BY qi
        |ORDER BY qi""".stripMargin,
  )
}
