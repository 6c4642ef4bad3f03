package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 tenth wave: post-hoc comparisons, sampling diagnostics,
  * graph partition quality, and calibration testing —
  *
  *  - q_agg_dunn: Dunn's post-hoc test after Kruskal–Wallis — every
  *    event-type pair's rank-mean z with the tie-corrected variance
  *    and the Bonferroni-adjusted 5% flag (k=5 groups → 10
  *    comparisons → |z| > 2.807034). Mean ranks come off the same
  *    exact decimal bucket midrank lattice as q_agg_kruskal (rank
  *    sums are exact multiples of ½ in DECIMAL — no raw-value sort);
  *  - q_sample_ess: the effective sample size of importance weights
  *    that rebalance the document corpus to a UNIFORM source mix
  *    (w ∝ 1/n_source): ESS = (Σw)²/Σw², the ess_ratio, and the max
  *    single-weight share — the "will this reweighting explode my
  *    variance" gate every mixture change runs before training;
  *  - q_graph_conductance: conductance of the hub cut — S = nodes at
  *    or above the P90 degree (threshold off the bounded degree
  *    grid), φ = cut(S) / min(vol S, vol S̄) — "are the hubs a
  *    community or just glue", the partition-quality primitive next
  *    to q_graph_modularity;
  *  - q_agg_hosmer: the Hosmer–Lemeshow calibration chi-square of the
  *    value/100 score over ten FIXED-width probability bins (fixed
  *    width, not rank deciles, so tie handling is trivially
  *    deterministic) — the significance companion to
  *    q_agg_calibration's ECE.
  *
  * Determinism: rank sums and expected counts ride exact DECIMAL
  * lattices; thresholds come from integer cumulative grids; final
  * ratios are fixed double trees rounded to 6dp. Scale: dunn's state
  * is the (type × bucket) grid; ess is one map-side aggregate over a
  * broadcast source-size table; conductance is two node-keyed
  * membership joins; hosmer is a 10-bin grid. */
object Analytics92 {

  /** Dunn's post-hoc pairwise z over the bucket midrank lattice. */
  private def qAggDunn(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("sc"))
      .groupBy(col("g"), col("sc")).agg(count(lit(1)).as("cnt"))
    val byV = b.groupBy(col("sc")).agg(sum(col("cnt")).as("c"))
    val wOrd = Window.orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // midrank·2 is an exact integer: 2·before + c + 1.
    // Overflow bound (ADVICE r13): the tie cube c³−c is computed in
    // BIGINT, exact up to c ≈ 2.1M rows per 0.1-value bucket (c³ <
    // 2⁶³); past that Spark wraps silently while DuckDB throws. Same
    // bound as the kruskal tie-sum idiom (Analytics59) — at 100 TB
    // move the cube after a DECIMAL(38,0) cast on both engines.
    val mid = byV
      .withColumn("before", coalesce(sum(col("c")).over(wOrd), lit(0L)))
      .select(col("sc"), col("c"),
        (lit(2L) * col("before") + col("c") + 1L).as("mr2"),
        ((col("c") * col("c")) * col("c") - col("c")).as("tt"))
    val byG = b.join(mid.select(col("sc"), col("mr2")), Seq("sc"))
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("ng"),
        sum((col("cnt") * col("mr2")).cast("decimal(38,0)")).as("rs2"))
    val tot = mid.agg(sum(col("c")).as("nn"), sum(col("tt")).as("st"))
    val base = byG.crossJoin(broadcast(tot))
    val p = base.select(col("g").as("g1"), col("ng").as("n1"),
        col("rs2").as("r1"), col("nn"), col("st"))
      .join(base.select(col("g").as("g2"), col("ng").as("n2"),
        col("rs2").as("r2")), col("g1") < col("g2"))
    p.select(col("g1"), col("g2"), col("n1"), col("n2"),
        expr("""CASE WHEN nn > 1 AND n1 > 0 AND n2 > 0 THEN
               |  (CAST(r1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE))
               |   - CAST(r2 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE)))
               |  / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
               |      / 12.0
               |    - CAST(st AS DOUBLE)
               |      / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))
               |    * (1.0 / CAST(n1 AS DOUBLE)
               |       + 1.0 / CAST(n2 AS DOUBLE))) END""".stripMargin)
          .as("z"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        round(col("z"), 6).as("z"),
        when(col("z").isNotNull,
          expr("CAST(CASE WHEN abs(z) > 2.807034 THEN 1 ELSE 0 END" +
            " AS BIGINT)")).as("sig_bonf_5pct"))
      .orderBy(col("g1"), col("g2"))
  }

  /** ESS of uniform-source-mix importance weights over documents. */
  private def qSampleEss(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("source"))
    val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val k = bySrc.agg(count(lit(1)).as("k"), sum(col("ns")).as("nn"))
    // per-doc weight w = (N/k)/n_source, on the 12dp lattice
    bySrc.crossJoin(broadcast(k))
      .select(col("source"), col("ns"), col("k"), col("nn"),
        expr("""CAST(ROUND(CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)
               |  / CAST(ns AS DOUBLE), 12) AS DECIMAL(28,12))"""
          .stripMargin).as("w"))
      // per-stratum products rounded to an explicit 9dp DECIMAL lattice
      // BEFORE the sum (ADVICE r13): BIGINT·DECIMAL(28,12) exceeds
      // precision 38 in Spark, whose allowPrecisionLoss silently rounds
      // to scale 6 while DuckDB keeps exact DECIMAL(38,24) — the 9dp
      // round-then-DECIMAL-sum idiom (neyman/cmh/hosmer) pins both.
      .agg(max(col("nn")).as("n_docs"), max(col("k")).as("n_sources"),
        sum(expr("""CAST(ROUND(CAST(ns AS DOUBLE) * CAST(w AS DOUBLE),
               | 9) AS DECIMAL(38,9))""".stripMargin)).as("sw"),
        sum(expr("""CAST(ROUND(CAST(ns AS DOUBLE) * CAST(w AS DOUBLE)
               | * CAST(w AS DOUBLE), 9) AS DECIMAL(38,9))"""
          .stripMargin)).as("sw2"),
        max(col("w")).as("wmax"))
      .select(col("n_docs"), col("n_sources"),
        when(dbl(col("sw2")) > 0, round(dbl(col("sw")) * dbl(col("sw"))
          / dbl(col("sw2")), 2)).as("ess"),
        when(dbl(col("sw2")) > 0 && col("n_docs") > 0,
          round(dbl(col("sw")) * dbl(col("sw")) / dbl(col("sw2"))
            / dbl(col("n_docs")), 6)).as("ess_ratio"),
        when(dbl(col("sw")) > 0,
          round(dbl(col("wmax")) / dbl(col("sw")), 6))
          .as("max_weight_share"))
  }

  /** Conductance of the ≥P90-degree hub cut of the co-pair graph. */
  private def qGraphConductance(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val grid = deg.groupBy(col("deg")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("deg"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val thr = grid
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(grid.agg(sum(col("c")).as("nn"))))
      .filter(expr("cum * 10 >= nn * 9"))
      .agg(min(col("deg")).as("thr"))
    val mem = deg.crossJoin(broadcast(thr))
      .select(col("u"), col("deg"),
        when(col("deg") >= col("thr"), 1L).otherwise(0L).as("in_s"))
    val vols = mem.agg(sum(when(col("in_s") === 1, col("deg"))
        .otherwise(0L)).as("vol_s"),
      sum(when(col("in_s") === 0, col("deg")).otherwise(0L))
        .as("vol_rest"),
      sum(col("in_s")).as("n_s"))
    val cut = e
      .join(mem.select(col("u"), col("in_s").as("su")), Seq("u"))
      .join(mem.select(col("u").as("v"), col("in_s").as("sv")),
        Seq("v"))
      .agg(sum(when(col("su") =!= col("sv"), 1L).otherwise(0L))
        .as("cut"))
    vols.crossJoin(broadcast(cut))
      .select(col("n_s"), col("vol_s"), col("vol_rest"), col("cut"),
        when(least(col("vol_s"), col("vol_rest")) > 0,
          round(dbl(col("cut"))
            / dbl(least(col("vol_s"), col("vol_rest"))), 6))
          .as("conductance"))
  }

  /** Hosmer–Lemeshow over ten fixed-width probability bins. */
  private def qAggHosmer(s: SparkSession, d: String): DataFrame = {
    val bins = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("y"),
        expr("least(greatest(value / 100.0, 0.001), 0.999)").as("p"))
      .select(col("y"), col("p"),
        expr("least(CAST(floor(p * 10.0) AS BIGINT), 9L)").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("obs"),
        sum(expr("CAST(ROUND(p, 9) AS DECIMAL(28,9))")).as("ex"))
    bins
      .select(col("bin"), col("n"), col("obs"), col("ex"),
        expr("""CASE WHEN CAST(ex AS DOUBLE) > 0
               | AND CAST(ex AS DOUBLE) < CAST(n AS DOUBLE) THEN
               |CAST(ROUND(pow(CAST(obs AS DOUBLE) - CAST(ex AS DOUBLE), 2)
               |  / (CAST(ex AS DOUBLE)
               |     * (1.0 - CAST(ex AS DOUBLE) / CAST(n AS DOUBLE))), 9)
               | AS DECIMAL(28,9)) END""".stripMargin).as("term"))
      .agg(count(lit(1)).as("n_bins"),
        sum(when(col("term").isNotNull, 1L).otherwise(0L)).as("n_used"),
        sum(col("term")).as("hl"))
      .select(col("n_bins"), col("n_used"),
        round(dbl(col("hl")), 6).as("hl_chi2"),
        greatest(col("n_used") - 2, lit(0L)).as("df"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_dunn" -> (qAggDunn _),
    "q_sample_ess" -> (qSampleEss _),
    "q_graph_conductance" -> (qGraphConductance _),
    "q_agg_hosmer" -> (qAggHosmer _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_dunn" ->
      """WITH b AS (
        |  SELECT event_type AS g,
        |    CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS sc,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |byv AS (SELECT sc, CAST(sum(cnt) AS BIGINT) AS c
        |        FROM b GROUP BY sc),
        |mid AS (
        |  SELECT sc, c,
        |    2 * coalesce(sum(c) OVER (ORDER BY sc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + c + 1 AS mr2,
        |    c * c * c - c AS tt
        |  FROM byv),
        |byg AS (
        |  SELECT g, CAST(sum(cnt) AS BIGINT) AS ng,
        |    CAST(sum(CAST(cnt * mr2 AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |      AS rs2
        |  FROM b JOIN mid USING (sc) GROUP BY g),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
        |  CAST(sum(tt) AS BIGINT) AS st FROM mid),
        |z AS (
        |  SELECT a.g AS g1, bb.g AS g2, a.ng AS n1, bb.ng AS n2,
        |    CASE WHEN nn > 1 AND a.ng > 0 AND bb.ng > 0 THEN
        |      (CAST(a.rs2 AS DOUBLE) / (2.0 * CAST(a.ng AS DOUBLE))
        |       - CAST(bb.rs2 AS DOUBLE) / (2.0 * CAST(bb.ng AS DOUBLE)))
        |      / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0)
        |          / 12.0
        |        - CAST(st AS DOUBLE)
        |          / (12.0 * (CAST(nn AS DOUBLE) - 1.0)))
        |        * (1.0 / CAST(a.ng AS DOUBLE)
        |           + 1.0 / CAST(bb.ng AS DOUBLE))) END AS z
        |  FROM byg a JOIN byg bb ON a.g < bb.g, tot)
        |SELECT g1, g2, n1, n2, ROUND(z, 6) AS z,
        |  CASE WHEN z IS NOT NULL THEN
        |    CAST(CASE WHEN abs(z) > 2.807034 THEN 1 ELSE 0 END
        |      AS BIGINT) END AS sig_bonf_5pct
        |FROM z ORDER BY g1, g2""".stripMargin,
    "q_sample_ess" ->
      """WITH bysrc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS ns
        |  FROM documents GROUP BY source),
        |k AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |  CAST(sum(ns) AS BIGINT) AS nn FROM bysrc),
        |w AS (
        |  SELECT ns, k.k, k.nn,
        |    CAST(ROUND(CAST(nn AS DOUBLE) / CAST(k AS DOUBLE)
        |      / CAST(ns AS DOUBLE), 12) AS DECIMAL(28,12)) AS w
        |  FROM bysrc, k),
        |a AS (
        |  SELECT CAST(max(nn) AS BIGINT) AS n_docs,
        |    CAST(max(k) AS BIGINT) AS n_sources,
        |    sum(CAST(ROUND(CAST(ns AS DOUBLE) * CAST(w AS DOUBLE),
        |      9) AS DECIMAL(38,9))) AS sw,
        |    sum(CAST(ROUND(CAST(ns AS DOUBLE) * CAST(w AS DOUBLE)
        |      * CAST(w AS DOUBLE), 9) AS DECIMAL(38,9))) AS sw2,
        |    max(w) AS wmax
        |  FROM w)
        |SELECT n_docs, n_sources,
        |  CASE WHEN CAST(sw2 AS DOUBLE) > 0 THEN
        |    ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
        |      / CAST(sw2 AS DOUBLE), 2) END AS ess,
        |  CASE WHEN CAST(sw2 AS DOUBLE) > 0 AND n_docs > 0 THEN
        |    ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
        |      / CAST(sw2 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) END
        |    AS ess_ratio,
        |  CASE WHEN CAST(sw AS DOUBLE) > 0 THEN
        |    ROUND(CAST(wmax AS DOUBLE) / CAST(sw AS DOUBLE), 6) END
        |    AS max_weight_share
        |FROM a""".stripMargin,
    "q_graph_conductance" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v FROM e UNION ALL
        |        SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |grid AS (SELECT deg, CAST(count(*) AS BIGINT) AS c
        |         FROM deg GROUP BY deg),
        |thr AS (
        |  SELECT CAST(min(deg) AS BIGINT) AS thr FROM (
        |    SELECT deg, sum(c) OVER (ORDER BY deg) AS cum,
        |      sum(c) OVER () AS nn
        |    FROM grid)
        |  WHERE cum * 10 >= nn * 9),
        |mem AS (
        |  SELECT u, deg,
        |    CASE WHEN deg >= (SELECT thr FROM thr) THEN 1 ELSE 0 END
        |      AS in_s
        |  FROM deg),
        |vols AS (
        |  SELECT CAST(sum(CASE WHEN in_s = 1 THEN deg ELSE 0 END)
        |      AS BIGINT) AS vol_s,
        |    CAST(sum(CASE WHEN in_s = 0 THEN deg ELSE 0 END) AS BIGINT)
        |      AS vol_rest,
        |    CAST(sum(in_s) AS BIGINT) AS n_s
        |  FROM mem),
        |cut AS (
        |  SELECT CAST(sum(CASE WHEN mu.in_s <> mv.in_s THEN 1 ELSE 0
        |    END) AS BIGINT) AS cut
        |  FROM e JOIN mem mu ON e.u = mu.u JOIN mem mv ON e.v = mv.u)
        |SELECT n_s, vol_s, vol_rest, cut,
        |  CASE WHEN least(vol_s, vol_rest) > 0 THEN
        |    ROUND(CAST(cut AS DOUBLE)
        |      / CAST(least(vol_s, vol_rest) AS DOUBLE), 6) END
        |    AS conductance
        |FROM vols, cut""".stripMargin,
    "q_agg_hosmer" ->
      """WITH b AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS y,
        |    least(greatest(value / 100.0, 0.001), 0.999) AS p
        |  FROM events WHERE event_type IN ('purchase', 'view')),
        |bins AS (
        |  SELECT least(CAST(floor(p * 10.0) AS BIGINT), 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT)
        |      AS obs,
        |    sum(CAST(ROUND(p, 9) AS DECIMAL(28,9))) AS ex
        |  FROM b GROUP BY 1),
        |terms AS (
        |  SELECT bin, n, obs, ex,
        |    CASE WHEN CAST(ex AS DOUBLE) > 0
        |      AND CAST(ex AS DOUBLE) < CAST(n AS DOUBLE) THEN
        |    CAST(ROUND(pow(CAST(obs AS DOUBLE) - CAST(ex AS DOUBLE), 2)
        |      / (CAST(ex AS DOUBLE)
        |         * (1.0 - CAST(ex AS DOUBLE) / CAST(n AS DOUBLE))), 9)
        |      AS DECIMAL(28,9)) END AS term
        |  FROM bins)
        |SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_used,
        |  ROUND(CAST(sum(term) AS DOUBLE), 6) AS hl_chi2,
        |  CAST(greatest(sum(CASE WHEN term IS NOT NULL THEN 1 ELSE 0
        |    END) - 2, 0) AS BIGINT) AS df
        |FROM terms""".stripMargin,
  )
}
