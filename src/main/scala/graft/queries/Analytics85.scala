package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 third wave: five classical statistical tests / agreement
  * measures the existing battery lacked —
  *
  *  - q_agg_jarquebera: the normality omnibus (JB = n/6·(S² + K²/4))
  *    per return flag, riding q_agg_skewkurt's exact decimal power
  *    sums;
  *  - q_agg_fisherexact: Fisher's exact test on the 2×2 region ×
  *    account-balance supplier table — the hypergeometric two-sided
  *    p-value computed WITHOUT lgamma (neither engine's libm is
  *    trusted): a log-factorial table built as a 9dp-rounded DECIMAL
  *    cumulative sum over the bounded 0..n integer grid, so both
  *    engines sum identical lattice values;
  *  - q_agg_moodmedian: Mood's median test across event types — the
  *    grand median off the bounded decimal bucket grid, then a k×2
  *    chi-square on above/≤ counts;
  *  - q_agg_icc: one-way random-effects intraclass correlation
  *    ICC(1,1) of order totals within customers (unequal group sizes,
  *    the n₀ adjustment) — "how much of price variance is
  *    between-customer";
  *  - q_agg_ccc: Lin's concordance correlation between the order
  *    header total and the lineitem-summed revenue — agreement, not
  *    just correlation (penalizes scale/location shift), the
  *    dataset-reconciliation metric.
  *
  * Determinism: every test statistic derives from exact BIGINT /
  * DECIMAL aggregates; per-group double terms (si²/ni, ln k, exp lp)
  * are rounded to a fixed lattice before DECIMAL summation; final
  * ratios are IEEE doubles of exact inputs rounded to 6dp.
  *
  * Scale: JB/ICC/CCC are single-scan moment aggregates; Fisher's
  * support grid is margin-bounded (and the scaladoc is explicit that
  * Fisher IS the small-table test — at 100 TB margins the exact
  * p-value degenerates and q_agg_chisq is the production path);
  * Mood's runs on the (type × bucket) grid. */
object Analytics85 {

  /** Jarque–Bera normality test of quantity per return flag. */
  private def qAggJarquebera(s: SparkSession, d: String): DataFrame = {
    val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val m2 = s"""(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - $mu * $mu)"""
    val m3 = s"""(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - 3.0 * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                |  + 2.0 * $mu * $mu * $mu)""".stripMargin
    val m4 = s"""(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                |  - 4.0 * $mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                |  + 6.0 * $mu * $mu
                |    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                |  - 3.0 * $mu * $mu * $mu * $mu)""".stripMargin
    val sk = s"($m3 / ($m2 * sqrt($m2)))"
    val ku = s"($m4 / ($m2 * $m2) - 3.0)"
    t(s, d, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(7,2)").as("x"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("x * x")).as("s2"),
        sum(expr("(x * x) * x")).as("s3"),
        sum(expr("((x * x) * x) * x")).as("s4"))
      .selectExpr("l_returnflag", "n",
        s"ROUND($sk, 6) AS skewness",
        s"ROUND($ku, 6) AS excess_kurtosis",
        s"""ROUND(CAST(n AS DOUBLE) / 6.0
           |  * ($sk * $sk + $ku * $ku / 4.0), 6) AS jb""".stripMargin,
        s"""CAST(CASE WHEN CAST(n AS DOUBLE) / 6.0
           |  * ($sk * $sk + $ku * $ku / 4.0) > 5.991465 THEN 1 ELSE 0
           |  END AS BIGINT) AS reject_5pct""".stripMargin)
      .orderBy(col("l_returnflag"))
  }

  /** Fisher's exact test (two-sided, "sum of probabilities ≤ observed"
    * convention with the R-style 1e-7 tolerance) on ASIA-supplier ×
    * high-balance. The log-factorial lattice: lf(j) = Σ_{i≤j}
    * round(ln i, 9) summed in DECIMAL — identical in both engines
    * (9dp, not 12 — see the lattice comment below). */
  private def qAggFisherexact(s: SparkSession, d: String): DataFrame = {
    val sup = t(s, d, "supplier")
      .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(when(col("r_name") === "ASIA", 1L).otherwise(0L).as("e"),
        when(col("s_acctbal") > 5000.0, 1L).otherwise(0L).as("o"))
    val cts = sup.agg(
      sum(expr("e * o")).as("a"),
      sum(expr("e * (1 - o)")).as("b"),
      sum(expr("(1 - e) * o")).as("c"),
      sum(expr("(1 - e) * (1 - o)")).as("dd"))
      .select(col("a"), col("b"), col("c"), col("dd"),
        (col("a") + col("b")).as("r1"), (col("c") + col("dd")).as("r2"),
        (col("a") + col("c")).as("c1"), (col("b") + col("dd")).as("c2"),
        (col("a") + col("b") + col("c") + col("dd")).as("n"))
    // 9dp ln lattice, cumulative over the bounded 0..n grid. 9dp, not
    // 12dp (r14 sf0.1 finding): round(ln i, L) is a cross-engine
    // LOTTERY when JVM Math.log and libm log disagree by an ulp near a
    // 10^-L boundary — at 12dp the per-entry hit probability is ~1e-3
    // and the ~4,700 lattice draws at sf0.1 virtually guarantee a
    // divergent entry (observed: p_observed flipped a 6dp boundary);
    // at 9dp the boundary is 1000x wider and the whole-run odds drop
    // to ~1e-2 percent.
    // DECIMAL(20,9), not (30,9): the window sum promotes to (30,9)
    // and the 9-term lp chain then grows one precision digit per
    // addition, topping out at EXACTLY (38,9) — a (30,9) ladder summed
    // to (38,9) would push the chain to precision 39, where Spark's
    // allowPrecisionLoss silently trims lp to scale 6 while DuckDB
    // keeps scale 9 (r14 sf0.1 finding: every term's lp differed at
    // the 7th decimal). 20 digits hold lf up to ~1e10-row margins.
    val lf = cts.select(explode(expr("sequence(0L, n)")).as("j"))
      .withColumn("lnj", when(col("j") > 0,
        expr("CAST(ROUND(ln(CAST(j AS DOUBLE)), 9) AS DECIMAL(20,9))"))
        .otherwise(lit(0).cast("decimal(20,9)")))
      .withColumn("lf", sum(col("lnj")).over(Window.orderBy(col("j"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("j"), col("lf"))
    def lfAs(as: String): DataFrame =
      lf.select(col("j").as(s"${as}_j"), col("lf").as(as))
    val cand = cts
      .select(col("*"),
        explode(expr("sequence(greatest(0L, r1 + c1 - n), least(r1, c1))"))
          .as("k"))
      .join(broadcast(lfAs("lk")), col("k") === col("lk_j"))
      .join(broadcast(lfAs("lr1k")), col("r1") - col("k") === col("lr1k_j"))
      .join(broadcast(lfAs("lc1k")), col("c1") - col("k") === col("lc1k_j"))
      .join(broadcast(lfAs("lrest")),
        col("n") - col("r1") - col("c1") + col("k") === col("lrest_j"))
      .join(broadcast(lfAs("lfr1")), col("r1") === col("lfr1_j"))
      .join(broadcast(lfAs("lfr2")), col("r2") === col("lfr2_j"))
      .join(broadcast(lfAs("lfc1")), col("c1") === col("lfc1_j"))
      .join(broadcast(lfAs("lfc2")), col("c2") === col("lfc2_j"))
      .join(broadcast(lfAs("lfn")), col("n") === col("lfn_j"))
      .select(col("a"), col("k"),
        (col("lfr1") + col("lfr2") + col("lfc1") + col("lfc2")
          - col("lfn") - col("lk") - col("lr1k") - col("lc1k")
          - col("lrest")).as("lp"))
    val obs = cand.filter(col("k") === col("a"))
      .select(col("lp").as("lp_obs"))
    cand.crossJoin(broadcast(obs))
      .select(col("a"), col("k"), col("lp"), col("lp_obs"))
      .agg(
        max(when(col("k") === col("a"),
          expr("CAST(ROUND(exp(CAST(lp AS DOUBLE)), 9)" +
            " AS DECIMAL(18,9))"))).as("p_obs"),
        sum(when(col("lp") <= col("lp_obs")
            + lit("0.0000001").cast("decimal(30,9)"),
          expr("CAST(ROUND(exp(CAST(lp AS DOUBLE)), 9)" +
            " AS DECIMAL(18,9))"))).as("p2"))
      // final 6dp round in DECIMAL, then cast out: the sf0.1 two-sided
      // sum lands EXACTLY on a 6dp midpoint (…7500000), where
      // round-via-double splits engines (Spark shortest-repr HALF_UP
      // vs DuckDB multiply-rint); decimal ROUND is half-up on both
      .select(dbl(round(col("p_obs"), 6)).as("p_observed_table"),
        dbl(round(least(col("p2"), lit(1.0).cast("decimal(18,9)")), 6))
          .as("p_two_sided"))
  }

  /** Mood's median test: do event types share a common median value?
    * Grand median = lower median off the ROUND(value,1) bucket grid. */
  private def qAggMoodmedian(s: SparkSession, d: String): DataFrame = {
    val grid = events(s, d)
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("sc"))
      .groupBy(col("g"), col("sc")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val med = grid.groupBy(col("sc")).agg(sum(col("cnt")).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(grid.agg(sum(col("cnt")).as("nn"))))
      .filter(col("cum") >= expr("(nn + 1) div 2"))
      .agg(min(col("sc")).as("med"))
    val cells = grid.crossJoin(broadcast(med))
      .groupBy(col("g"))
      .agg(sum(when(col("sc") > col("med"), col("cnt")).otherwise(0L))
        .as("above"),
        sum(when(col("sc") <= col("med"), col("cnt")).otherwise(0L))
          .as("ble"))
    val tot = cells.agg(sum(col("above")).as("ta"), sum(col("ble")).as("tb"),
      count(lit(1)).as("k"))
    cells.crossJoin(broadcast(tot)).crossJoin(broadcast(med))
      .select(col("g"), col("above"), col("ble"), col("k"), col("med"),
        expr("""CASE WHEN ta > 0 AND tb > 0 THEN CAST(ROUND(
               |  pow(CAST(above AS DOUBLE) - CAST((above + ble) AS DOUBLE)
               |      * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE), 2)
               |    / (CAST((above + ble) AS DOUBLE) * CAST(ta AS DOUBLE)
               |       / CAST(ta + tb AS DOUBLE))
               |  + pow(CAST(ble AS DOUBLE) - CAST((above + ble) AS DOUBLE)
               |      * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE), 2)
               |    / (CAST((above + ble) AS DOUBLE) * CAST(tb AS DOUBLE)
               |       / CAST(ta + tb AS DOUBLE)), 9)
               | AS DECIMAL(30,9)) END""".stripMargin).as("cell"))
      .agg(max(col("med")).as("gm"),
        max(col("k") - 1).as("df"),
        sum(col("cell")).as("chi2d"))
      .select(dbl(col("gm")).as("grand_median"), col("df"),
        round(dbl(col("chi2d")), 6).as("chi2"))
  }

  /** One-way random-effects ICC(1,1) of order totals within customers. */
  private def qAggIcc(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_custkey"), dec(col("o_totalprice")).as("x"))
    val g = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("ni"), sum(col("x")).as("si"))
      .select(col("ni"), col("si"),
        expr("""CAST(ROUND(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
               |  / CAST(ni AS DOUBLE), 9) AS DECIMAL(30,9))""".stripMargin)
          .as("ti"),
        (col("ni") * col("ni")).as("ni2"))
    val tots = o.agg(count(lit(1)).as("nn"), sum(col("x")).as("sx"),
      sum(expr("x * x")).as("sxx"))
    g.agg(count(lit(1)).as("k"), sum(col("ni2")).as("sni2"),
        sum(col("ti")).as("st"))
      .crossJoin(broadcast(tots))
      .selectExpr("k", "nn",
        """CASE WHEN k >= 2 AND nn > k THEN ROUND(
          |  ((CAST(st AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          |      / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
          |   - (CAST(sxx AS DOUBLE) - CAST(st AS DOUBLE))
          |      / CAST(nn - k AS DOUBLE))
          |  / ((CAST(st AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
          |      / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
          |   + ((CAST(nn AS DOUBLE) - CAST(sni2 AS DOUBLE)
          |        / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE) - 1.0)
          |     * (CAST(sxx AS DOUBLE) - CAST(st AS DOUBLE))
          |        / CAST(nn - k AS DOUBLE)), 6) END AS icc1""".stripMargin,
        """CASE WHEN k >= 2 THEN ROUND((CAST(nn AS DOUBLE)
          |  - CAST(sni2 AS DOUBLE) / CAST(nn AS DOUBLE))
          |  / CAST(k - 1 AS DOUBLE), 6) END AS n0""".stripMargin)
  }

  /** Lin's concordance between header total and lineitem revenue. */
  private def qAggCcc(s: SparkSession, d: String): DataFrame = {
    val y = t(s, d, "lineitem").groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("ysum"))
      .select(col("l_orderkey").as("ok"),
        col("ysum").cast("decimal(18,4)").as("y"))
    val pairs = t(s, d, "orders")
      .select(col("o_orderkey").as("ok"), dec(col("o_totalprice")).as("x"))
      .join(y, Seq("ok"))
    val m = pairs.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
      sum(expr("x * y")).as("sxy"))
    val mx = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    val my = "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    val vx = s"(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - $mx * $mx)"
    val vy = s"(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - $my * $my)"
    val cv = s"(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - $mx * $my)"
    m.selectExpr("n",
      s"""CASE WHEN $vx + $vy + ($mx - $my) * ($mx - $my) > 0 THEN
         |  ROUND(2.0 * $cv
         |    / ($vx + $vy + ($mx - $my) * ($mx - $my)), 6) END
         | AS ccc""".stripMargin,
      s"""CASE WHEN $vx > 0 AND $vy > 0 THEN
         |  ROUND($cv / sqrt($vx * $vy), 6) END AS pearson_r""".stripMargin,
      s"ROUND($mx - $my, 6) AS location_shift")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_jarquebera" -> (qAggJarquebera _),
    "q_agg_fisherexact" -> (qAggFisherexact _),
    "q_agg_moodmedian" -> (qAggMoodmedian _),
    "q_agg_icc" -> (qAggIcc _),
    "q_agg_ccc" -> (qAggCcc _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_jarquebera" -> {
      val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
      val m2 = s"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - $mu * $mu)"
      val m3 = s"""(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                  | - 3.0 * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  | + 2.0 * $mu * $mu * $mu)""".stripMargin
      val m4 = s"""(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                  | - 4.0 * $mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                  | + 6.0 * $mu * $mu
                  |   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                  | - 3.0 * $mu * $mu * $mu * $mu)""".stripMargin
      val sk = s"($m3 / ($m2 * sqrt($m2)))"
      val ku = s"($m4 / ($m2 * $m2) - 3.0)"
      s"""WITH b AS (
         |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |    sum(x) AS s1, sum(x * x) AS s2,
         |    sum((x * x) * x) AS s3, sum(((x * x) * x) * x) AS s4
         |  FROM (SELECT l_returnflag,
         |          CAST(l_quantity AS DECIMAL(7,2)) AS x FROM lineitem)
         |  GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  ROUND($sk, 6) AS skewness,
         |  ROUND($ku, 6) AS excess_kurtosis,
         |  ROUND(CAST(n AS DOUBLE) / 6.0
         |    * ($sk * $sk + $ku * $ku / 4.0), 6) AS jb,
         |  CAST(CASE WHEN CAST(n AS DOUBLE) / 6.0
         |    * ($sk * $sk + $ku * $ku / 4.0) > 5.991465 THEN 1 ELSE 0
         |    END AS BIGINT) AS reject_5pct
         |FROM b ORDER BY l_returnflag""".stripMargin
    },
    "q_agg_fisherexact" ->
      // the ladder is MATERIALIZED and joined via precomputed index
      // columns: DuckDB 1.0 planned the original 9-way lf self-join as
      // nested loops (50+ min at sf0.1, uninterruptible); this shape
      // hash-joins in ~1 s with identical semantics
      """WITH s2 AS (
        |  SELECT CASE WHEN r_name = 'ASIA' THEN 1 ELSE 0 END AS e,
        |    CASE WHEN s_acctbal > 5000.0 THEN 1 ELSE 0 END AS o
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |                JOIN region ON n_regionkey = r_regionkey),
        |cts AS (
        |  SELECT a, b, c, dd, a + b AS r1, c + dd AS r2,
        |    a + c AS c1, b + dd AS c2, a + b + c + dd AS n
        |  FROM (SELECT CAST(sum(e * o) AS BIGINT) AS a,
        |          CAST(sum(e * (1 - o)) AS BIGINT) AS b,
        |          CAST(sum((1 - e) * o) AS BIGINT) AS c,
        |          CAST(sum((1 - e) * (1 - o)) AS BIGINT) AS dd
        |        FROM s2)),
        |lf AS MATERIALIZED (
        |  SELECT j, sum(CASE WHEN j > 0 THEN
        |      CAST(ROUND(ln(CAST(j AS DOUBLE)), 9) AS DECIMAL(20,9))
        |      ELSE CAST(0 AS DECIMAL(20,9)) END)
        |    OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) AS lf
        |  FROM (SELECT unnest(generate_series(0, (SELECT n FROM cts)))
        |          AS j)),
        |konst AS MATERIALIZED (
        |  SELECT cts.a,
        |    (SELECT lf FROM lf WHERE j = cts.r1)
        |    + (SELECT lf FROM lf WHERE j = cts.r2)
        |    + (SELECT lf FROM lf WHERE j = cts.c1)
        |    + (SELECT lf FROM lf WHERE j = cts.c2)
        |    - (SELECT lf FROM lf WHERE j = cts.n) AS base,
        |    cts.r1, cts.c1, cts.n
        |  FROM cts),
        |ks AS MATERIALIZED (
        |  SELECT k.k, konst.a, konst.base,
        |    konst.r1 - k.k AS j1, konst.c1 - k.k AS j2,
        |    konst.n - konst.r1 - konst.c1 + k.k AS j3
        |  FROM konst,
        |    (SELECT unnest(generate_series(
        |       greatest(0, (SELECT r1 + c1 - n FROM cts)),
        |       least((SELECT r1 FROM cts), (SELECT c1 FROM cts)))) AS k)
        |      AS k),
        |cand AS (
        |  SELECT ks.a, ks.k,
        |    ks.base - lk.lf - l1.lf - l2.lf - l3.lf AS lp
        |  FROM ks
        |  JOIN lf lk ON lk.j = ks.k
        |  JOIN lf l1 ON l1.j = ks.j1
        |  JOIN lf l2 ON l2.j = ks.j2
        |  JOIN lf l3 ON l3.j = ks.j3),
        |obs AS (SELECT lp AS lp_obs FROM cand WHERE k = a)
        |SELECT
        |  CAST(ROUND(max(CASE WHEN k = a THEN
        |    CAST(ROUND(exp(CAST(lp AS DOUBLE)), 9) AS DECIMAL(18,9))
        |    END), 6) AS DOUBLE) AS p_observed_table,
        |  CAST(ROUND(least(sum(CASE WHEN lp <= lp_obs
        |      + CAST('0.0000001' AS DECIMAL(30,9)) THEN
        |    CAST(ROUND(exp(CAST(lp AS DOUBLE)), 9) AS DECIMAL(18,9))
        |    END), CAST(1.0 AS DECIMAL(18,9))), 6) AS DOUBLE)
        |    AS p_two_sided
        |FROM cand, obs""".stripMargin,
    "q_agg_moodmedian" ->
      """WITH grid AS (
        |  SELECT event_type AS g,
        |    CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS sc,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT min(sc) AS med FROM (
        |    SELECT sc, sum(c) OVER (ORDER BY sc) AS cum,
        |      sum(c) OVER () AS nn
        |    FROM (SELECT sc, sum(cnt) AS c FROM grid GROUP BY sc))
        |  WHERE cum >= (nn + 1) // 2),
        |cells AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN sc > (SELECT med FROM med) THEN cnt
        |      ELSE 0 END) AS BIGINT) AS above,
        |    CAST(sum(CASE WHEN sc <= (SELECT med FROM med) THEN cnt
        |      ELSE 0 END) AS BIGINT) AS ble
        |  FROM grid GROUP BY g),
        |tot AS (
        |  SELECT CAST(sum(above) AS BIGINT) AS ta,
        |    CAST(sum(ble) AS BIGINT) AS tb,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM cells)
        |SELECT CAST(max((SELECT med FROM med)) AS DOUBLE) AS grand_median,
        |  CAST(max(k - 1) AS BIGINT) AS df,
        |  ROUND(CAST(sum(CASE WHEN ta > 0 AND tb > 0 THEN CAST(ROUND(
        |    pow(CAST(above AS DOUBLE) - CAST((above + ble) AS DOUBLE)
        |        * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE), 2)
        |      / (CAST((above + ble) AS DOUBLE) * CAST(ta AS DOUBLE)
        |         / CAST(ta + tb AS DOUBLE))
        |    + pow(CAST(ble AS DOUBLE) - CAST((above + ble) AS DOUBLE)
        |        * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE), 2)
        |      / (CAST((above + ble) AS DOUBLE) * CAST(tb AS DOUBLE)
        |         / CAST(ta + tb AS DOUBLE)), 9) AS DECIMAL(30,9))
        |    END) AS DOUBLE), 6) AS chi2
        |FROM cells, tot""".stripMargin,
    "q_agg_icc" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(o_totalprice AS DECIMAL(19,4)) AS x FROM orders),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ni, sum(x) AS si
        |  FROM o GROUP BY o_custkey),
        |ga AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ni * ni) AS BIGINT) AS sni2,
        |    sum(CAST(ROUND(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
        |      / CAST(ni AS DOUBLE), 9) AS DECIMAL(30,9))) AS st
        |  FROM g),
        |tots AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn, sum(x) AS sx,
        |    sum(x * x) AS sxx
        |  FROM o)
        |SELECT k, nn,
        |  CASE WHEN k >= 2 AND nn > k THEN ROUND(
        |    ((CAST(st AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
        |     - (CAST(sxx AS DOUBLE) - CAST(st AS DOUBLE))
        |        / CAST(nn - k AS DOUBLE))
        |    / ((CAST(st AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |        / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
        |     + ((CAST(nn AS DOUBLE) - CAST(sni2 AS DOUBLE)
        |          / CAST(nn AS DOUBLE)) / CAST(k - 1 AS DOUBLE) - 1.0)
        |       * (CAST(sxx AS DOUBLE) - CAST(st AS DOUBLE))
        |          / CAST(nn - k AS DOUBLE)), 6) END AS icc1,
        |  CASE WHEN k >= 2 THEN ROUND((CAST(nn AS DOUBLE)
        |    - CAST(sni2 AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / CAST(k - 1 AS DOUBLE), 6) END AS n0
        |FROM ga, tots""".stripMargin,
    "q_agg_ccc" -> {
      val mx = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
      val my = "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
      val vx = s"(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - $mx * $mx)"
      val vy = s"(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE) - $my * $my)"
      val cv = s"(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE) - $mx * $my)"
      s"""WITH yt AS (
         |  SELECT l_orderkey AS ok,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
         |      AS DECIMAL(19,4)) AS y
         |  FROM lineitem GROUP BY l_orderkey),
         |p AS (
         |  SELECT CAST(o_totalprice AS DECIMAL(19,4)) AS x, y
         |  FROM orders JOIN yt ON o_orderkey = ok),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
         |    sum(y) AS sy, sum(x * x) AS sxx, sum(y * y) AS syy,
         |    sum(x * y) AS sxy
         |  FROM p)
         |SELECT n,
         |  CASE WHEN $vx + $vy + ($mx - $my) * ($mx - $my) > 0 THEN
         |    ROUND(2.0 * $cv
         |      / ($vx + $vy + ($mx - $my) * ($mx - $my)), 6) END AS ccc,
         |  CASE WHEN $vx > 0 AND $vy > 0 THEN
         |    ROUND($cv / sqrt($vx * $vy), 6) END AS pearson_r,
         |  ROUND($mx - $my, 6) AS location_shift
         |FROM m""".stripMargin
    },
  )
}
