package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 graph-structure + data-ops wave: the clustering-coefficient
  * report (per-node triangle density — the "is this graph clumpy or
  * tree-like" diagnostic next to the existing triangle/modularity/
  * assortativity battery) and the ingestion-freshness report (per-type
  * staleness and coverage vs the corpus calendar — the first page of
  * any data-ops dashboard).
  *
  * Scale notes: clustering rides the degree-oriented triangle
  * enumeration (each triangle counted once from its lowest-rank apex —
  * the q_graph_triangles discipline: wedge fan-out is bounded by the
  * ORIENTED out-degree, so hubs don't quadratically explode), plus a
  * node-keyed degree join; the summary collapses to one row. Freshness
  * is two map-side-combined aggregates over the fact table joined on a
  * 1-row broadcast calendar span. */
object Analytics62 {

  /** Local clustering coefficient summary of the support-≥2 co-purchase
    * graph: per-node lcc = 2·tri / (deg·(deg−1)) for deg ≥ 2 nodes,
    * reported as the mean lcc, the zero-lcc share, and the global
    * transitivity 3·T / Σ C(deg,2). */
  private def qGraphClustcoef(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    val deg = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val ed = e
      .join(deg.select(col("u"), col("deg").as("du")).hint("shuffle_hash"),
        Seq("u"))
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
    val triPerNode = tri.select(col("a").as("u"))
      .union(tri.select(col("b").as("u")))
      .union(tri.select(col("c").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("tri"))
    val lcc = deg.join(triPerNode, Seq("u"), "left")
      .select(col("u"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
      .filter(col("deg") >= 2)
      .withColumn("lcc", expr(
        "CAST(ROUND(2.0 * CAST(tri AS DOUBLE) " +
          "/ (CAST(deg AS DOUBLE) * (CAST(deg AS DOUBLE) - 1.0)), 9) " +
          "AS DECIMAL(18,9))"))
      .withColumn("wedges", expr("deg * (deg - 1) div 2"))
    lcc.agg(
        count(lit(1)).as("n_nodes"),
        sum(col("tri")).as("tri3"),
        sum(col("wedges")).as("nw"),
        sum(col("lcc")).as("slcc"),
        sum(when(col("tri") === 0, 1L).otherwise(0L)).as("n_zero"))
      .select(col("n_nodes"),
        expr("tri3 div 3").as("n_triangles"),
        round(dbl(col("slcc")) / dbl(col("n_nodes")), 6).as("avg_lcc"),
        round(dbl(col("n_zero")) / dbl(col("n_nodes")), 6)
          .as("zero_share"),
        // a triangle contributes one closed wedge at each of its 3
        // nodes, so transitivity = Σ tri / Σ wedges (deg≥2 nodes hold
        // every wedge); an edgeless graph would have no deg≥2 rows
        when(col("nw") > 0,
          round(dbl(col("tri3")) / dbl(col("nw")), 6)).as("transitivity"))
  }

  /** Ingestion-freshness report per event type: last-seen day,
    * staleness vs the corpus max day, active-day coverage of the
    * calendar span, and mean events per active day. */
  private def qQualityFreshness(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
    val span = ev.agg(min(col("day")).as("glo"), max(col("day")).as("ghi"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("day")).as("last_day"),
        countDistinct(col("day")).as("active_days"))
      .crossJoin(broadcast(span))
      .select(col("event_type"), col("n_events"),
        col("last_day"),
        (col("ghi") - col("last_day")).as("days_stale"),
        col("active_days"),
        (col("ghi") - col("glo") + 1).as("span_days"),
        round(dbl(col("active_days")) / dbl(col("ghi") - col("glo") + 1),
          6).as("coverage"),
        round(dbl(col("n_events")) / dbl(col("active_days")), 6)
          .as("events_per_active_day"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_clustcoef" -> (qGraphClustcoef _),
    "q_quality_freshness" -> (qQualityFreshness _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_clustcoef" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |ed AS MATERIALIZED (SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
        |       FROM e JOIN deg du ON e.u = du.u
        |              JOIN deg dv ON e.v = dv.u),
        |o AS MATERIALIZED (SELECT
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst,
        |  CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS dd
        |  FROM ed),
        |w AS MATERIALIZED (SELECT o1.src, o1.dst AS b, o2.dst AS c
        |      FROM o o1 JOIN o o2 ON o1.src = o2.src
        |      AND (o1.dd < o2.dd OR (o1.dd = o2.dd AND o1.dst < o2.dst))),
        |tri AS MATERIALIZED (SELECT w.src AS a, w.b, w.c
        |        FROM w JOIN o ON w.b = o.src AND w.c = o.dst),
        |tpn AS MATERIALIZED (
        |  SELECT u, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS u FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) GROUP BY u),
        |lcc AS MATERIALIZED (
        |  SELECT d.u, d.deg, COALESCE(t.tri, 0) AS tri,
        |    CAST(ROUND(2.0 * CAST(COALESCE(t.tri, 0) AS DOUBLE)
        |      / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0)),
        |      9) AS DECIMAL(18,9)) AS lcc,
        |    d.deg * (d.deg - 1) // 2 AS wedges
        |  FROM deg d LEFT JOIN tpn t ON d.u = t.u
        |  WHERE d.deg >= 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(tri) // 3 AS BIGINT) AS n_triangles,
        |  ROUND(CAST(sum(lcc) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS avg_lcc,
        |  ROUND(CAST(sum(CASE WHEN tri = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS zero_share,
        |  CASE WHEN sum(wedges) > 0
        |    THEN ROUND(CAST(sum(tri) AS DOUBLE)
        |      / CAST(sum(wedges) AS DOUBLE), 6) END AS transitivity
        |FROM lcc""".stripMargin,
    "q_quality_freshness" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |span AS (SELECT min(day) AS glo, max(day) AS ghi FROM ev),
        |per AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |    max(day) AS last_day,
        |    CAST(count(DISTINCT day) AS BIGINT) AS active_days
        |  FROM ev GROUP BY event_type)
        |SELECT event_type, n_events, last_day,
        |  ghi - last_day AS days_stale, active_days,
        |  ghi - glo + 1 AS span_days,
        |  ROUND(CAST(active_days AS DOUBLE)
        |    / CAST(ghi - glo + 1 AS DOUBLE), 6) AS coverage,
        |  ROUND(CAST(n_events AS DOUBLE) / CAST(active_days AS DOUBLE), 6)
        |    AS events_per_active_day
        |FROM per CROSS JOIN span ORDER BY event_type""".stripMargin,
  )
}
