package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 eleventh wave: two graph-structure operators —
  *
  *  - q_graph_bipartite: the weighted one-mode projection of the
  *    user × event-type bipartite graph: for every type pair, the
  *    shared-user count with cosine and Jaccard normalization — the
  *    co-engagement matrix behind "users who do A also do B";
  *  - q_graph_ktruss: 4-truss peeling of the support-≥2 co-purchase
  *    graph, two unrolled rounds (drop every edge in fewer than 2
  *    triangles, recount, drop again), reporting surviving edge
  *    counts per round — the cohesion filter that strips tree-like
  *    fringe q_graph_kcore's degree test cannot see. Bounded-round by
  *    design for oracle-expressibility (the same trade as q_graph_cc
  *    vs q_graph_cc_fixpoint; q_graph_coredecomp carries the
  *    fixpoint discipline for per-node cohesion).
  *
  * Scale notes: the projection's self-join fans out per user only to
  * |type-vocab|² combos (bounded), and its output is the vocab² grid;
  * degrees broadcast. Truss support is one wedge join per round keyed
  * on node ids (each surviving triangle counted once per edge via the
  * shared-neighbor equijoin), state is one row per surviving edge,
  * and round count is a fixed constant — no driver-side data moves
  * beyond the final 3-row report. */
object Analytics72 {

  /** Weighted one-mode projection of user × event_type. */
  private def qGraphBipartite(s: SparkSession, d: String): DataFrame = {
    val ut = events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val deg = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val pairs = ut.select(col("user_id"), col("event_type").as("ta"))
      .join(ut.select(col("user_id"), col("event_type").as("tb")),
        Seq("user_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(deg.select(col("event_type").as("ta"),
        col("n").as("na"))), Seq("ta"))
      .join(broadcast(deg.select(col("event_type").as("tb"),
        col("n").as("nb"))), Seq("tb"))
      .select(col("ta"), col("tb"), col("shared"), col("na"), col("nb"),
        round(dbl(col("shared")) /
          sqrt(dbl(col("na")) * dbl(col("nb"))), 6).as("cosine"),
        round(dbl(col("shared")) /
          dbl(col("na") + col("nb") - col("shared")), 6).as("jaccard"))
      .orderBy(col("ta"), col("tb"))
  }

  /** Per-edge triangle support: common-neighbor count over the
    * symmetric adjacency. */
  private def support(e: DataFrame, sym: DataFrame): DataFrame =
    e.join(sym.select(col("u").as("su"), col("v").as("w")),
        col("su") === col("u"))
      .join(sym.select(col("u").as("sv"), col("v").as("w2")),
        col("sv") === col("v") && col("w2") === col("w"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("sup"))

  /** 4-truss, two unrolled peel rounds; (round, n_edges) report. */
  private def qGraphKtruss(s: SparkSession, d: String): DataFrame = {
    val e0 = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v")).localCheckpoint(true)
    def symOf(e: DataFrame) =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    val e1 = support(e0, symOf(e0)).filter(col("sup") >= 2)
      .select(col("u"), col("v")).localCheckpoint(true)
    val e2 = support(e1, symOf(e1)).filter(col("sup") >= 2)
      .select(col("u"), col("v"))
    e0.agg(count(lit(1)).as("n_edges")).select(lit(0L).as("round"),
        col("n_edges"))
      .union(e1.agg(count(lit(1)).as("n_edges"))
        .select(lit(1L).as("round"), col("n_edges")))
      .union(e2.agg(count(lit(1)).as("n_edges"))
        .select(lit(2L).as("round"), col("n_edges")))
      .orderBy(col("round"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_bipartite" -> (qGraphBipartite _),
    "q_graph_ktruss" -> (qGraphKtruss _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_bipartite" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |deg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |        FROM ut GROUP BY event_type),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, shared, da.n AS na, db.n AS nb,
        |  round(CAST(shared AS DOUBLE)
        |    / sqrt(CAST(da.n AS DOUBLE) * CAST(db.n AS DOUBLE)), 6)
        |    AS cosine,
        |  round(CAST(shared AS DOUBLE)
        |    / CAST(da.n + db.n - shared AS DOUBLE), 6) AS jaccard
        |FROM p JOIN deg da ON p.ta = da.event_type
        |       JOIN deg db ON p.tb = db.event_type
        |ORDER BY ta, tb""".stripMargin,
    "q_graph_ktruss" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |s0 AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |e1 AS (
        |  SELECT e.u, e.v
        |  FROM e0 e JOIN s0 a ON a.u = e.u JOIN s0 b
        |    ON b.u = e.v AND b.v = a.v
        |  GROUP BY e.u, e.v HAVING count(*) >= 2),
        |s1 AS (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
        |e2 AS (
        |  SELECT e.u, e.v
        |  FROM e1 e JOIN s1 a ON a.u = e.u JOIN s1 b
        |    ON b.u = e.v AND b.v = a.v
        |  GROUP BY e.u, e.v HAVING count(*) >= 2)
        |SELECT CAST(0 AS BIGINT) AS round,
        |  CAST(count(*) AS BIGINT) AS n_edges FROM e0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT) FROM e1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM e2
        |ORDER BY round""".stripMargin,
  )
}
