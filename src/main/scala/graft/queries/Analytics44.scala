package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 wave: landmark closeness centrality (the "how central is
  * every node" ranking derived from the landmark distance field) and
  * the t-closeness audit (the distribution-leak companion completing
  * the k-anonymity / l-diversity governance triad).
  *
  * Scale notes:
  *  - Closeness reuses the q_graph_landmarks discipline: ONE 3-source
  *    relaxation run over the write-once co-pair parquet, node-keyed
  *    shuffles with map-side min combines; the per-node reduction is a
  *    second node-keyed aggregate over the (landmark, node, dist)
  *    state — L landmarks cost one extra BIGINT per state row, never
  *    L traversals.
  *  - Every closeness figure stays in exact BIGINT arithmetic
  *    (integer `div` harmonic terms, integer distance sums) until the
  *    single final division — no float-summation ordering between
  *    engines.
  *  - t-closeness works on |c·N − g·sz| integer cross-multiples, so
  *    the threshold sweep compares exact BIGINTs (10·Σ|…| > tn·sz·N
  *    for t = tn/20) — zero boundary hazard. The class table is
  *    QI-cardinality-bounded, the segment domain (5) and the 1-row
  *    corpus total attach as broadcasts, and the t sweep is a 3-row
  *    broadcast cross join over classes, not three audits. BIGINT
  *    headroom: 10·Σ|c·N − g·sz| ≤ 20·sz·N ≈ 2·10^15 even at a
  *    10^10-row corpus with 10^4-row classes. */
object Analytics44 {

  /** Landmark closeness centrality — for each node of the support-≥2
    * co-purchase graph, aggregate its distances to the top-3-degree
    * landmarks (q_graph_landmarks' field) into the two classic
    * centrality figures: closeness (landmarks reached per unit
    * distance) and harmonic centrality (Σ 1/dist, robust to
    * unreachable pairs). The harmonic term is the exact integer
    * 10^12 div dist, and closeness divides exact BIGINTs once at
    * emission — deterministic across engines and partitionings. */
  private def qGraphCloseness(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .withColumn("w", expr("1000000 div cn"))
    val sym = e.select(col("u"), col("v"), col("w"))
      .union(e.select(col("v").as("u"), col("u").as("v"), col("w")))
      .localCheckpoint(true)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val src = deg.orderBy(desc("deg"), col("u")).limit(3)
      .select(col("u").as("l"), col("u"), lit(0L).as("dist"))
    def relax(dk: DataFrame): DataFrame =
      dk.union(dk.join(sym, Seq("u"))
          .select(col("l"), col("v").as("u"),
            (col("dist") + col("w")).as("dist")))
        .groupBy(col("l"), col("u")).agg(min(col("dist")).as("dist"))
    val d4 = relax(relax(relax(relax(src))))
    d4.groupBy(col("u"))
      .agg(count(lit(1)).as("n_lm"),
        sum(col("dist")).as("sum_dist"),
        sum(when(col("dist") > 0, expr("1000000000000 div dist"))
          .otherwise(0L)).as("harm_e12"))
      .select(col("u").as("node"), col("n_lm"), col("sum_dist"),
        col("harm_e12"),
        when(col("sum_dist") > 0,
          round(dbl(col("n_lm")) * lit(1000000.0) / dbl(col("sum_dist")), 9))
          .as("closeness"))
      .orderBy(desc("harm_e12"), col("node"))
  }

  /** t-closeness audit — the third privacy gate: a class can be
    * k-anonymous AND l-diverse while its sensitive-value DISTRIBUTION
    * still leaks (e.g. 90% one segment vs 20% globally). For
    * categorical sensitive attributes the earth-mover distance reduces
    * to total variation: tvd = ½ Σ_v |p_class(v) − p_global(v)|.
    * QI = (nation, balance band), sensitive = market segment; per
    * candidate t ∈ {0.20, 0.35, 0.50}: classes whose tvd exceeds t and
    * the rows they expose. The compare is the exact-integer
    * cross-multiple 10·Σ|c·N − g·sz| > tn·sz·N (t = tn/20). */
  private def qQualityTclose(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qi = t(s, d, "customer")
      .select(col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / lit(1000.0)).cast("bigint").as("balband"),
        col("c_mktsegment").as("seg"))
    val cnt = qi.groupBy(col("nat"), col("balband"), col("seg"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val cls = cnt.groupBy(col("nat"), col("balband"))
      .agg(sum(col("c")).as("sz"))
    val glob = cnt.groupBy(col("seg")).agg(sum(col("c")).as("g"))
    val tot = cnt.agg(sum(col("c")).as("n_total"))
    val terms = cls.crossJoin(broadcast(glob))
      .join(cnt, Seq("nat", "balband", "seg"), "left")
      .crossJoin(broadcast(tot))
      .select(col("nat"), col("balband"), col("sz"), col("n_total"),
        abs(coalesce(col("c"), lit(0L)) * col("n_total")
          - col("g") * col("sz")).as("term"))
    val tvdCls = terms.groupBy(col("nat"), col("balband"),
        col("sz"), col("n_total"))
      .agg(sum(col("term")).as("sum_abs"))
    val ts = Seq((4L, "0.20"), (7L, "0.35"), (10L, "0.50"))
      .toDF("tn", "t")
    tvdCls.crossJoin(broadcast(ts))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("sum_abs") * 10 > col("tn") * col("sz") * col("n_total"),
          1L).otherwise(0L)).as("classes_above"),
        sum(when(col("sum_abs") * 10 > col("tn") * col("sz") * col("n_total"),
          col("sz")).otherwise(0L)).as("rows_exposed"),
        sum(col("sz")).as("n_rows"),
        max(round(dbl(col("sum_abs"))
          / (lit(2.0) * dbl(col("sz")) * dbl(col("n_total"))), 9))
          .as("max_tvd"))
      .select(col("t"), col("n_classes"), col("classes_above"),
        col("rows_exposed"), col("n_rows"), col("max_tvd"),
        when(col("n_rows") > 0,
          round(dbl(col("rows_exposed")) / dbl(col("n_rows")), 9))
          .as("exposed_share"))
      .orderBy(col("t"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_closeness" -> (qGraphCloseness _),
    "q_quality_tclose" -> (qQualityTclose _),
  )

  val sql: Map[String, String] = Map(
    // Same 3-source unrolled relaxations as q_graph_landmarks, then a
    // per-node integer reduction; 10^12 // dist and the distance sums
    // are exact BIGINTs in both engines.
    "q_graph_closeness" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v, count(*) AS cn
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT u, v, 1000000 // cn AS w FROM e
        |        UNION ALL
        |        SELECT v AS u, u AS v, 1000000 // cn AS w FROM e),
        |deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM sym GROUP BY u),
        |src AS MATERIALIZED (SELECT u AS l, u, CAST(0 AS BIGINT) AS dist
        |        FROM deg ORDER BY deg DESC, u LIMIT 3),
        |d1 AS MATERIALIZED (SELECT l, u, min(dist) AS dist FROM (
        |         SELECT l, u, dist FROM src
        |         UNION ALL
        |         SELECT p.l, s.v AS u, p.dist + s.w AS dist
        |         FROM src p JOIN sym s ON s.u = p.u) GROUP BY l, u),
        |d2 AS MATERIALIZED (SELECT l, u, min(dist) AS dist FROM (
        |         SELECT l, u, dist FROM d1
        |         UNION ALL
        |         SELECT p.l, s.v AS u, p.dist + s.w AS dist
        |         FROM d1 p JOIN sym s ON s.u = p.u) GROUP BY l, u),
        |d3 AS MATERIALIZED (SELECT l, u, min(dist) AS dist FROM (
        |         SELECT l, u, dist FROM d2
        |         UNION ALL
        |         SELECT p.l, s.v AS u, p.dist + s.w AS dist
        |         FROM d2 p JOIN sym s ON s.u = p.u) GROUP BY l, u),
        |d4 AS MATERIALIZED (SELECT l, u, min(dist) AS dist FROM (
        |         SELECT l, u, dist FROM d3
        |         UNION ALL
        |         SELECT p.l, s.v AS u, p.dist + s.w AS dist
        |         FROM d3 p JOIN sym s ON s.u = p.u) GROUP BY l, u)
        |SELECT u AS node, CAST(count(*) AS BIGINT) AS n_lm,
        |  CAST(sum(dist) AS BIGINT) AS sum_dist,
        |  CAST(sum(CASE WHEN dist > 0 THEN 1000000000000 // dist
        |           ELSE 0 END) AS BIGINT) AS harm_e12,
        |  CASE WHEN sum(dist) > 0 THEN
        |    round(CAST(count(*) AS DOUBLE) * 1000000.0
        |      / CAST(sum(dist) AS DOUBLE), 9) END AS closeness
        |FROM d4 GROUP BY u ORDER BY harm_e12 DESC, node""".stripMargin,
    // Exact-integer total-variation: Σ|c·N − g·sz| per class; the
    // sweep compares 10·Σ > tn·sz·N, all BIGINT.
    "q_quality_tclose" ->
      """WITH qi AS (SELECT c_nationkey AS nat,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balband,
        |  c_mktsegment AS seg FROM customer),
        |cnt AS (SELECT nat, balband, seg, CAST(count(*) AS BIGINT) AS c
        |        FROM qi GROUP BY 1, 2, 3),
        |cls AS (SELECT nat, balband, CAST(sum(c) AS BIGINT) AS sz
        |        FROM cnt GROUP BY 1, 2),
        |gseg AS (SELECT seg, CAST(sum(c) AS BIGINT) AS g
        |         FROM cnt GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cnt),
        |terms AS (SELECT cls.nat, cls.balband, cls.sz, tot.n_total,
        |    abs(COALESCE(cnt.c, 0) * tot.n_total - gseg.g * cls.sz)
        |      AS term
        |  FROM cls CROSS JOIN gseg
        |  LEFT JOIN cnt ON cnt.nat = cls.nat
        |    AND cnt.balband = cls.balband AND cnt.seg = gseg.seg
        |  CROSS JOIN tot),
        |tvd AS (SELECT nat, balband, sz, n_total,
        |          CAST(sum(term) AS BIGINT) AS sum_abs
        |        FROM terms GROUP BY 1, 2, 3, 4),
        |ts AS (SELECT tn, t FROM (VALUES (4, '0.20'), (7, '0.35'),
        |        (10, '0.50')) v(tn, t))
        |SELECT t, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN sum_abs * 10 > tn * sz * n_total
        |    THEN 1 ELSE 0 END) AS BIGINT) AS classes_above,
        |  CAST(sum(CASE WHEN sum_abs * 10 > tn * sz * n_total
        |    THEN sz ELSE 0 END) AS BIGINT) AS rows_exposed,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  max(round(CAST(sum_abs AS DOUBLE)
        |    / (2.0 * CAST(sz AS DOUBLE) * CAST(n_total AS DOUBLE)), 9))
        |    AS max_tvd,
        |  CASE WHEN sum(sz) > 0 THEN
        |    round(CAST(sum(CASE WHEN sum_abs * 10 > tn * sz * n_total
        |      THEN sz ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(sz) AS DOUBLE), 9) END AS exposed_share
        |FROM tvd CROSS JOIN ts GROUP BY t, tn ORDER BY t""".stripMargin,
  )
}
