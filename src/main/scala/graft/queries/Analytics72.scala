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

  /** Per-edge triangle support via DEGREE-ORIENTED triangle
    * enumeration (the q_graph_triangles discipline): each triangle is
    * produced exactly once at its low-degree apex — wedge fan-out is
    * oriented-out-degree-bounded, never hub-degree-bounded — then
    * distributed to its three canonical edges. The first naive
    * common-neighbor formulation blew up 73× under the lineitem ×3
    * densification probe; this one tracks triangle count. */
  private[queries] def support(e0: DataFrame): DataFrame = {
    val e = e0.localCheckpoint(true)
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val ed = e
      .join(deg.select(col("u"), col("deg").as("du"))
        .hint("shuffle_hash"), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv"))
        .hint("shuffle_hash"), Seq("v"))
    val lowFirst = expr("du < dv OR (du = dv AND u < v)")
    val o = ed.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("src"),
      when(lowFirst, col("v")).otherwise(col("u")).as("dst"),
      when(lowFirst, col("dv")).otherwise(col("du")).as("dd"))
    val w = o.select(col("src"), col("dst").as("b"), col("dd").as("db"))
      .join(o.select(col("src"), col("dst").as("c"), col("dd").as("dc")),
        Seq("src"))
      .filter(expr("db < dc OR (db = dc AND b < c)"))
    val tri = w.join(o.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"))
      .select(col("src").as("a"), col("b"), col("c"))
    tri.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .union(tri.select(least(col("a"), col("c")).as("u"),
        greatest(col("a"), col("c")).as("v")))
      .union(tri.select(least(col("b"), col("c")).as("u"),
        greatest(col("b"), col("c")).as("v")))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("sup"))
  }

  /** 4-truss, two unrolled peel rounds; (round, n_edges) report. */
  private def qGraphKtruss(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions): both peel
    // rounds checkpoint eagerly inside the wrapper
    val e0 = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v")).localCheckpoint(true)
    val e1 = support(e0).filter(col("sup") >= 2)
      .select(col("u"), col("v")).localCheckpoint(true)
    val e2 = support(e1).filter(col("sup") >= 2)
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
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |s0 AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |d0 AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |       FROM s0 GROUP BY u),
        |o0 AS MATERIALIZED (SELECT
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END
        |    AS src,
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END
        |    AS dst,
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END
        |    AS dd
        |  FROM (SELECT e.u, e.v, da.deg AS du, db.deg AS dv
        |        FROM e0 e JOIN d0 da ON e.u = da.u
        |                  JOIN d0 db ON e.v = db.u)),
        |t0 AS MATERIALIZED (SELECT w.src AS a, w.b, w.c
        |       FROM (SELECT o1.src, o1.dst AS b, o2.dst AS c
        |             FROM o0 o1 JOIN o0 o2 ON o1.src = o2.src
        |             AND (o1.dd < o2.dd
        |                  OR (o1.dd = o2.dd AND o1.dst < o2.dst))) w
        |       JOIN o0 ON w.b = o0.src AND w.c = o0.dst),
        |e1 AS (
        |  SELECT u, v FROM (
        |    SELECT least(a, b) AS u, greatest(a, b) AS v FROM t0
        |    UNION ALL
        |    SELECT least(a, c), greatest(a, c) FROM t0
        |    UNION ALL
        |    SELECT least(b, c), greatest(b, c) FROM t0)
        |  GROUP BY u, v HAVING count(*) >= 2),
        |s1 AS MATERIALIZED (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
        |d1 AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |       FROM s1 GROUP BY u),
        |o1 AS MATERIALIZED (SELECT
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END
        |    AS src,
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END
        |    AS dst,
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END
        |    AS dd
        |  FROM (SELECT e.u, e.v, da.deg AS du, db.deg AS dv
        |        FROM e1 e JOIN d1 da ON e.u = da.u
        |                  JOIN d1 db ON e.v = db.u)),
        |t1 AS MATERIALIZED (SELECT w.src AS a, w.b, w.c
        |       FROM (SELECT o1.src, o1.dst AS b, o2.dst AS c
        |             FROM o1 JOIN o1 o2 ON o1.src = o2.src
        |             AND (o1.dd < o2.dd
        |                  OR (o1.dd = o2.dd AND o1.dst < o2.dst))) w
        |       JOIN o1 ON w.b = o1.src AND w.c = o1.dst),
        |e2 AS (
        |  SELECT u, v FROM (
        |    SELECT least(a, b) AS u, greatest(a, b) AS v FROM t1
        |    UNION ALL
        |    SELECT least(a, c), greatest(a, c) FROM t1
        |    UNION ALL
        |    SELECT least(b, c), greatest(b, c) FROM t1)
        |  GROUP BY u, v HAVING count(*) >= 2)
        |SELECT CAST(0 AS BIGINT) AS round,
        |  CAST(count(*) AS BIGINT) AS n_edges FROM e0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT) FROM e1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM e2
        |ORDER BY round""".stripMargin,
  )
}
