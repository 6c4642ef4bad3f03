package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 ninth wave: weighted label-propagation communities over the
  * co-purchase graph, hour-of-day seasonal decomposition of the event
  * stream, and a Johnson–Lindenstrauss random sign projection of the
  * embedding cloud.
  *
  * Scale notes:
  *  - Label propagation is the synchronous 2-round unroll (PageRank
  *    discipline): each round is one edge⋈label shuffle + a (node,
  *    candidate-label) weight agg + a per-node argmax window — the
  *    group for the window is one node's neighbor-label set, bounded by
  *    degree. Labels/weights stay exact BIGINTs; ties break to the
  *    smallest label, so the fixpoint is engine-independent.
  *  - The seasonal profile collapses the stream to (type, hour) and
  *    (type, hour-of-day) exact-count tables in one pass each; the
  *    index is a ratio of BIGINT products (exact in doubles far past
  *    this scale), never a floating accumulation.
  *  - The JL projection is map-only and shuffle-free: the ±1 sign
  *    matrix is derived per (dim, component) from md5 INSIDE a fixed-
  *    order fold, so both engines walk dimensions 1..64 in the same
  *    order and no broadcast state exists at all; 1/√16 = 0.25 keeps
  *    the scaling dyadic-exact. */
object Analytics10 {

  /** 2-round synchronous weighted label propagation on the support-≥2
    * co-purchase graph (community detection): each node adopts the
    * neighbor label with the largest total edge weight (tie → smallest
    * label). Output: the 20 largest communities. */
  private def qGraphLabelprop(s: SparkSession, d: String): DataFrame = {
    val l2 = lp2Labels(lpSymEdges(s, d))
    l2.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      .orderBy(desc("sz"), col("lbl")).limit(20)
  }

  /** The symmetric support-≥2 co-purchase edge list (u, v, cn). Shared
    * by label propagation and the modularity scorer. */
  private[queries] def lpSymEdges(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
    e.select(col("u"), col("v"), col("cn"))
      .union(e.select(col("v").as("u"), col("u").as("v"), col("cn")))
      .localCheckpoint(true)
  }

  /** Node labels after 2 synchronous weighted label-propagation rounds
    * (tie → smallest label) over a precomputed symmetric edge list.
    * Shared with q_graph_modularity, which scores this exact partition. */
  private[queries] def lp2Labels(sym: DataFrame): DataFrame = {
    val init = sym.select(col("u")).distinct()
      .withColumn("lbl", col("u"))
    def step(lab: DataFrame): DataFrame = {
      val nbr = sym.join(
        lab.select(col("u").as("v"), col("lbl")), Seq("v"))
        .groupBy(col("u"), col("lbl")).agg(sum(col("cn")).as("w"))
      val win = Window.partitionBy(col("u"))
        .orderBy(desc("w"), col("lbl"))
      nbr.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1).select(col("u"), col("lbl"))
    }
    step(step(init))
  }

  /** Hour-of-day seasonal profile per event type: mean hourly count per
    * hod slot and the seasonal index against the type's overall hourly
    * mean — the additive-decomposition seasonal term. */
  private def qTimeSeasonal(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val hod = hourly
      .withColumn("hod", col("hr") % 24)
      .groupBy(col("event_type"), col("hod"))
      .agg(sum(col("c")).as("s_h"), count(lit(1)).as("c_h"))
    val tot = hourly.groupBy(col("event_type"))
      .agg(sum(col("c")).as("s_t"), count(lit(1)).as("c_t"))
    hod.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("hod"), col("c_h").as("n_hours"),
        round(dbl(col("s_h")) / dbl(col("c_h")), 6).as("mean_c"),
        // idx = (s_h/c_h)/(s_t/c_t) as one exact-integer cross ratio
        round(dbl(col("s_h") * col("c_t"))
          / dbl(col("c_h") * col("s_t")), 6).as("idx"))
      .orderBy(col("event_type"), col("hod"))
  }

  /** Johnson–Lindenstrauss projection 64 → 16 dims with a ±1/√16 sign
    * matrix derived from md5("rp_<i>_<j>") — the distance-preserving
    * dimensionality reduction in front of ANN / clustering. Map-only;
    * the fold walks dims in fixed order so the double sum is bit-stable. */
  private def qEmbedRandproj(s: SparkSession, d: String): DataFrame = {
    t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        explode(expr("sequence(1, 16)")).as("j"))
      .select(col("vec_id"), col("j"), round(expr(
        """aggregate(transform(sequence(1, 64),
          |    i -> CAST(element_at(embedding, i) AS DOUBLE)
          |      * (CASE WHEN substring(md5(concat('rp_',
          |            CAST(i AS STRING), '_', CAST(j AS STRING))), 1, 1)
          |            IN ('0','1','2','3','4','5','6','7')
          |         THEN CAST(1.0 AS DOUBLE)
          |         ELSE CAST(-1.0 AS DOUBLE) END)),
          |  CAST(0.0 AS DOUBLE), (acc, p) -> acc + p) * 0.25""".stripMargin), 6)
        // + 0.0 canonicalizes IEEE -0.0 (a fold can land exactly on
        // negative zero at volume — caught by the r15 sf1 campaign;
        // the covariance op's precedent)
        .plus(lit(0.0)).as("y"))
      .orderBy(col("vec_id"), col("j"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_labelprop" -> (qGraphLabelprop _),
    "q_time_seasonal" -> (qTimeSeasonal _),
    "q_embed_randproj" -> (qEmbedRandproj _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_labelprop" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e0 AS (SELECT a.pk AS u, b.pk AS v,
        |         CAST(count(*) AS BIGINT) AS cn
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v, cn FROM e0
        |        UNION ALL SELECT v, u, cn FROM e0),
        |l0 AS (SELECT DISTINCT u, u AS lbl FROM sym),
        |n1 AS (SELECT sym.u, l0.lbl, CAST(sum(sym.cn) AS BIGINT) AS w
        |       FROM sym JOIN l0 ON sym.v = l0.u GROUP BY 1, 2),
        |l1 AS (SELECT u, lbl FROM (
        |         SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u
        |           ORDER BY w DESC, lbl) AS rn FROM n1) z
        |       WHERE rn = 1),
        |n2 AS (SELECT sym.u, l1.lbl, CAST(sum(sym.cn) AS BIGINT) AS w
        |       FROM sym JOIN l1 ON sym.v = l1.u GROUP BY 1, 2),
        |l2 AS (SELECT u, lbl FROM (
        |         SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u
        |           ORDER BY w DESC, lbl) AS rn FROM n2) z
        |       WHERE rn = 1)
        |SELECT lbl, CAST(count(*) AS BIGINT) AS sz
        |FROM l2 GROUP BY lbl
        |ORDER BY sz DESC, lbl LIMIT 20""".stripMargin,
    "q_time_seasonal" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |hod AS (
        |  SELECT event_type, hr % 24 AS hod,
        |    CAST(sum(c) AS BIGINT) AS s_h,
        |    CAST(count(*) AS BIGINT) AS c_h
        |  FROM hourly GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS s_t,
        |    CAST(count(*) AS BIGINT) AS c_t
        |  FROM hourly GROUP BY 1)
        |SELECT hod.event_type, hod.hod, hod.c_h AS n_hours,
        |  round(CAST(s_h AS DOUBLE) / CAST(c_h AS DOUBLE), 6) AS mean_c,
        |  round(CAST(s_h * c_t AS DOUBLE)
        |    / CAST(c_h * s_t AS DOUBLE), 6) AS idx
        |FROM hod JOIN tot ON hod.event_type = tot.event_type
        |ORDER BY hod.event_type, hod.hod""".stripMargin,
    "q_embed_randproj" ->
      """WITH j16 AS (SELECT unnest(range(1, 17)) AS j)
        |SELECT vec_id, CAST(j AS INT) AS j,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(generate_series(1, 64),
        |      i -> CAST(embedding[i] AS DOUBLE)
        |        * (CASE WHEN substring(md5('rp_' || i || '_' || j), 1, 1)
        |              IN ('0','1','2','3','4','5','6','7')
        |           THEN CAST(1.0 AS DOUBLE)
        |           ELSE CAST(-1.0 AS DOUBLE) END))),
        |    (acc, p) -> acc + p) * 0.25, 6) + 0.0 AS y
        |FROM embeddings CROSS JOIN j16
        |ORDER BY vec_id, j""".stripMargin,
  )
}
