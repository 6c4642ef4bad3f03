package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 seventh wave: lagged autocorrelation of the event rate
  * (seasonality detection), bounded k-core peeling of the co-purchase
  * graph (dense-substructure extraction), and centroid-distance
  * embedding outliers (the vector-data-quality gate).
  *
  * Scale notes:
  *  - Autocorrelation runs over the HOURLY table (one raw-data pass to
  *    build it): a single per-type ordered window yields both lag
  *    columns, and the moment aggregate is exact BIGINT with the
  *    q_agg_corr double finish — pair counts differ per lag, so every
  *    moment is lag-conditional.
  *  - k-core peeling is the unrolled-iteration shape (3 peels like
  *    PageRank's 3 rounds): each round recomputes degrees (node-keyed
  *    agg) and semi-joins the edge list against surviving nodes. A
  *    production fixpoint loop would iterate the same round to
  *    stability; the bounded unroll keeps the oracle expressible.
  *  - Outliers broadcast the 8 seed centroids (k-means family) and
  *    rank by the per-row fold distance — the distance doubles are
  *    bit-stable (fixed fold order), and the global top-20 is a
  *    distributed TakeOrdered cut, not a full sort. */
object Analytics8 {

  /** Lag-1 and lag-24 autocorrelation of hourly event counts per type —
    * the 24-hour coefficient IS the daily-seasonality signal. Pearson
    * over (c_t, c_{t−k}) pairs with lag-conditional exact moments. */
  private def qTimeAutocorr(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    def r(lagCol: String, nn: String): String =
      s"""ROUND((CAST($nn AS DOUBLE) * CAST(sxy_$lagCol AS DOUBLE)
         |  - CAST(sx_$lagCol AS DOUBLE) * CAST(sy_$lagCol AS DOUBLE))
         | / (sqrt(CAST($nn AS DOUBLE) * CAST(sxx_$lagCol AS DOUBLE)
         |         - CAST(sx_$lagCol AS DOUBLE) * CAST(sx_$lagCol AS DOUBLE))
         |    * sqrt(CAST($nn AS DOUBLE) * CAST(syy_$lagCol AS DOUBLE)
         |           - CAST(sy_$lagCol AS DOUBLE)
         |             * CAST(sy_$lagCol AS DOUBLE))), 6)""".stripMargin
    hourly
      // one projection → one Window node over the shared spec
      .select(col("*"),
        lag(col("c"), 1).over(w).as("l1"),
        lag(col("c"), 24).over(w).as("l24"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("l1").isNotNull, 1L)).as("n1"),
        sum(when(col("l1").isNotNull, col("c"))).as("sx_l1"),
        sum(col("l1")).as("sy_l1"),
        sum(col("c") * col("l1")).as("sxy_l1"),
        sum(when(col("l1").isNotNull, col("c") * col("c"))).as("sxx_l1"),
        sum(col("l1") * col("l1")).as("syy_l1"),
        sum(when(col("l24").isNotNull, 1L)).as("n24"),
        sum(when(col("l24").isNotNull, col("c"))).as("sx_l24"),
        sum(col("l24")).as("sy_l24"),
        sum(col("c") * col("l24")).as("sxy_l24"),
        sum(when(col("l24").isNotNull, col("c") * col("c"))).as("sxx_l24"),
        sum(col("l24") * col("l24")).as("syy_l24"))
      .selectExpr("event_type", "n1", s"${r("l1", "n1")} AS r_lag1",
        "n24", s"${r("l24", "n24")} AS r_lag24")
      .orderBy(col("event_type"))
  }

  /** Bounded 3-core peeling of the support-≥2 co-purchase graph: 3
    * rounds of drop-nodes-with-degree-<3 + induced-subgraph, reporting
    * surviving node/edge counts per round — the dense-core extraction
    * that separates structural products from the periphery. */
  private def qGraphKcore(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions)
    val e0 = coPairCounts(s, d).filter(col("cn") >= 2) // materialized (Tables)
      .select(col("u"), col("v"))
      .localCheckpoint(true)
    // Eager checkpoint per peel round (r15): each surviving edge set is
    // referenced by the next peel (×3: the sym union reads e twice plus
    // the filtered join) AND by its own stats branch, and the two semi
    // joins key on u and v respectively — differently-keyed exchanges,
    // so nothing is reused and the unmaterialized 3-level nesting
    // re-evaluates lower peels multiplicatively. Edge sets are exact —
    // values unchanged.
    def peel(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val keep = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).select(col("u"))
      e.join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    val e1 = peel(e0); val e2 = peel(e1); val e3 = peel(e2)
    def stats(round: Int, e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      sym.agg(countDistinct(col("u")).as("n_nodes"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .select(lit(round).as("round"), col("n_nodes"), col("n_edges"))
    }
    stats(0, e0).union(stats(1, e1)).union(stats(2, e2))
      .union(stats(3, e3))
      .orderBy("round")
  }

  /** Top-20 embedding outliers by squared distance to their assigned
    * seed centroid (vec_id 0..7, the k-means family's quantizer) — the
    * vector-data-quality gate that surfaces mis-embedded rows. */
  private def qEmbedOutlier(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val c = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("j"), col("embedding").as("cemb"))
    val d2 = expr(
      """aggregate(transform(sequence(1, 64),
        |  i -> (CAST(element_at(embedding, i) AS DOUBLE)
        |        - CAST(element_at(cemb, i) AS DOUBLE))
        |     * (CAST(element_at(embedding, i) AS DOUBLE)
        |        - CAST(element_at(cemb, i) AS DOUBLE))), 0D,
        |  (acc, p) -> acc + p)""".stripMargin)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("j"))
    emb.crossJoin(broadcast(c)).withColumn("d2", d2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("j").as("cluster"),
        round(col("d2"), 6).as("dist2"))
      .orderBy(desc("dist2"), col("vec_id")).limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_autocorr" -> (qTimeAutocorr _),
    "q_graph_kcore" -> (qGraphKcore _),
    "q_embed_outlier" -> (qEmbedOutlier _),
  )

  val sql: Map[String, String] = Map(
    "q_time_autocorr" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |lg AS (
        |  SELECT event_type, c,
        |    lag(c, 1) OVER (PARTITION BY event_type ORDER BY hr) AS l1,
        |    lag(c, 24) OVER (PARTITION BY event_type ORDER BY hr) AS l24
        |  FROM hourly),
        |m AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN c END) AS BIGINT)
        |      AS sx_l1,
        |    CAST(sum(l1) AS BIGINT) AS sy_l1,
        |    CAST(sum(c * l1) AS BIGINT) AS sxy_l1,
        |    CAST(sum(CASE WHEN l1 IS NOT NULL THEN c * c END) AS BIGINT)
        |      AS sxx_l1,
        |    CAST(sum(l1 * l1) AS BIGINT) AS syy_l1,
        |    CAST(sum(CASE WHEN l24 IS NOT NULL THEN 1 END) AS BIGINT)
        |      AS n24,
        |    CAST(sum(CASE WHEN l24 IS NOT NULL THEN c END) AS BIGINT)
        |      AS sx_l24,
        |    CAST(sum(l24) AS BIGINT) AS sy_l24,
        |    CAST(sum(c * l24) AS BIGINT) AS sxy_l24,
        |    CAST(sum(CASE WHEN l24 IS NOT NULL THEN c * c END) AS BIGINT)
        |      AS sxx_l24,
        |    CAST(sum(l24 * l24) AS BIGINT) AS syy_l24
        |  FROM lg GROUP BY event_type)
        |SELECT event_type, n1,
        |  ROUND((CAST(n1 AS DOUBLE) * CAST(sxy_l1 AS DOUBLE)
        |    - CAST(sx_l1 AS DOUBLE) * CAST(sy_l1 AS DOUBLE))
        |   / (sqrt(CAST(n1 AS DOUBLE) * CAST(sxx_l1 AS DOUBLE)
        |           - CAST(sx_l1 AS DOUBLE) * CAST(sx_l1 AS DOUBLE))
        |      * sqrt(CAST(n1 AS DOUBLE) * CAST(syy_l1 AS DOUBLE)
        |             - CAST(sy_l1 AS DOUBLE) * CAST(sy_l1 AS DOUBLE))), 6)
        |    AS r_lag1,
        |  n24,
        |  ROUND((CAST(n24 AS DOUBLE) * CAST(sxy_l24 AS DOUBLE)
        |    - CAST(sx_l24 AS DOUBLE) * CAST(sy_l24 AS DOUBLE))
        |   / (sqrt(CAST(n24 AS DOUBLE) * CAST(sxx_l24 AS DOUBLE)
        |           - CAST(sx_l24 AS DOUBLE) * CAST(sx_l24 AS DOUBLE))
        |      * sqrt(CAST(n24 AS DOUBLE) * CAST(syy_l24 AS DOUBLE)
        |             - CAST(sy_l24 AS DOUBLE)
        |               * CAST(sy_l24 AS DOUBLE))), 6) AS r_lag24
        |FROM m ORDER BY event_type""".stripMargin,
    "q_graph_kcore" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e0 AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |s0 AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |k0 AS MATERIALIZED (SELECT u FROM s0 GROUP BY u HAVING count(*) >= 3),
        |e1 AS MATERIALIZED (SELECT e0.u, e0.v FROM e0
        |       WHERE e0.u IN (SELECT u FROM k0)
        |         AND e0.v IN (SELECT u FROM k0)),
        |s1 AS MATERIALIZED (SELECT u, v FROM e1 UNION ALL SELECT v, u FROM e1),
        |k1 AS MATERIALIZED (SELECT u FROM s1 GROUP BY u HAVING count(*) >= 3),
        |e2 AS MATERIALIZED (SELECT e1.u, e1.v FROM e1
        |       WHERE e1.u IN (SELECT u FROM k1)
        |         AND e1.v IN (SELECT u FROM k1)),
        |s2 AS MATERIALIZED (SELECT u, v FROM e2 UNION ALL SELECT v, u FROM e2),
        |k2 AS MATERIALIZED (SELECT u FROM s2 GROUP BY u HAVING count(*) >= 3),
        |e3 AS MATERIALIZED (SELECT e2.u, e2.v FROM e2
        |       WHERE e2.u IN (SELECT u FROM k2)
        |         AND e2.v IN (SELECT u FROM k2))
        |SELECT 0 AS round,
        |  (SELECT CAST(count(DISTINCT u) AS BIGINT)
        |   FROM (SELECT u FROM s0 UNION ALL SELECT v FROM s0) z)
        |    AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges
        |UNION ALL SELECT 1,
        |  (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM
        |    (SELECT u FROM e1 UNION ALL SELECT v FROM e1) z1),
        |  (SELECT CAST(count(*) AS BIGINT) FROM e1)
        |UNION ALL SELECT 2,
        |  (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM
        |    (SELECT u FROM e2 UNION ALL SELECT v FROM e2) z2),
        |  (SELECT CAST(count(*) AS BIGINT) FROM e2)
        |UNION ALL SELECT 3,
        |  (SELECT CAST(count(DISTINCT u) AS BIGINT) FROM
        |    (SELECT u FROM e3 UNION ALL SELECT v FROM e3) z3),
        |  (SELECT CAST(count(*) AS BIGINT) FROM e3)
        |ORDER BY round""".stripMargin,
    "q_embed_outlier" ->
      """WITH c AS (SELECT vec_id AS j, embedding AS cemb
        |  FROM embeddings WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.j,
        |    list_reduce(list_transform(generate_series(1, 64),
        |      i -> (CAST(e.embedding[i] AS DOUBLE)
        |            - CAST(c.cemb[i] AS DOUBLE))
        |         * (CAST(e.embedding[i] AS DOUBLE)
        |            - CAST(c.cemb[i] AS DOUBLE))),
        |      (a, b) -> a + b) AS d2
        |  FROM embeddings e, c),
        |asg AS (SELECT vec_id, j, d2 FROM (
        |    SELECT vec_id, j, d2,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY d2, j) AS rn FROM d)
        |  WHERE rn = 1)
        |SELECT vec_id, j AS cluster, round(d2, 6) AS dist2
        |FROM asg ORDER BY dist2 DESC, vec_id LIMIT 20""".stripMargin,
  )
}
