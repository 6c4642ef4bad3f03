package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 similarity wave: embedding-space STRUCTURE reports —
  *
  *  - q_embed_knngraph: the exact k=3 cosine kNN graph over the
  *    hash-capped vector sample, summarized per label (edge count,
  *    reciprocity rate, mean 3rd-NN similarity). Reciprocity and kth-NN
  *    similarity are the standard "is this space clustered or smeared"
  *    retrieval-health probes (a reciprocal edge = both endpoints rank
  *    each other top-k);
  *  - q_embed_energy: the energy distance between two label groups
  *    (Székely–Rizzo: 2·E|X−Y| − E|X−X′| − E|Y−Y′|) over capped
  *    samples — the nonparametric two-sample test for "did my
  *    embedding distribution move" that q_embed_drift's centroid shift
  *    cannot see (equal means, different shapes).
  *
  * Scale: both ops cap their pair work by deterministic md5-order
  * sampling (the q_embed_isotropy discipline) — the capped sample is
  * the REPORT path; the production path for full-corpus neighbor
  * structure is the IVF index family (q_sim_ann_ivf / index_search).
  * Pair joins are broadcast (cap² rows, cap ≤ 512); only (id, sim)
  * tuples ever aggregate. Dot products round to 6 dp before ranking
  * (engine-portable order). */
object LlmSim6 {

  private[queries] def capped(s: SparkSession, d: String, cap: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "embeddings")
      .orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))
      .limit(cap)
  }

  /** The k=3 edge table before the consumer checkpoint — exposed so
    * PlanSpec10 can assert the pair join broadcasts (the checkpoint
    * truncates lineage, hiding this stage from the final plan). */
  private[queries] def knnEdges(s: SparkSession, d: String): DataFrame = {
    val base = capped(s, d, 512)
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint(true)
    val a = base.select(col("vec_id").as("a"), col("label").as("la"),
      col("embedding").as("ea"))
    val b = base.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val sims = a.join(broadcast(b), col("a") =!= col("b"))
      .withColumn("sim", expr(
        "ROUND(float_dot(ea, eb) / (sqrt(float_dot(ea, ea)) " +
          "* sqrt(float_dot(eb, eb))), 6)"))
      .select(col("a"), col("la"), col("b"), col("sim"))
    val w = Window.partitionBy(col("a"))
      .orderBy(desc("sim"), col("b"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
  }

  /** Exact k=3 cosine kNN graph over the capped sample, per-label
    * summary. */
  private def qEmbedKnngraph(s: SparkSession, d: String): DataFrame = {
    val knn = knnEdges(s, d).localCheckpoint(true)
    val rec = knn.select(col("a"), col("b"))
      .join(knn.select(col("b").as("a"), col("a").as("b"),
        lit(1L).as("has_rev")), Seq("a", "b"), "left")
    val recAgg = knn.select(col("a"), col("la")).distinct()
      .join(rec.groupBy(col("a"))
        .agg(sum(coalesce(col("has_rev"), lit(0L))).as("n_rec")), Seq("a"))
      .groupBy(col("la"))
      .agg(count(lit(1)).as("n_nodes"), (count(lit(1)) * 3).as("n_edges"),
        sum(col("n_rec")).as("n_reciprocal"))
    val k3 = knn.filter(col("rn") === 3)
      .groupBy(col("la"))
      .agg(sum(expr("CAST(ROUND(sim, 6) AS DECIMAL(18,6))")).as("ssim"))
    recAgg.join(k3, Seq("la"))
      .select(col("la").as("label"), col("n_nodes"), col("n_edges"),
        col("n_reciprocal"),
        expr("ROUND(CAST(n_reciprocal AS DOUBLE) " +
          "/ CAST(n_edges AS DOUBLE), 6)").as("reciprocity"),
        expr("ROUND(CAST(ssim AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)")
          .as("mean_sim3"))
      .orderBy(col("label"))
  }

  /** Energy distance between label-0 and label-1 embedding groups
    * over 128-capped samples. */
  private def qEmbedEnergy(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    def grp(lbl: Int): DataFrame =
      t(s, d, "embeddings").filter(col("label") === lbl)
        .orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))
        .limit(128)
        .select(col("vec_id"), col("embedding"))
    val x = grp(0).localCheckpoint(true)
    val y = grp(1).localCheckpoint(true)
    def meanDist(l: DataFrame, r: DataFrame, strict: Boolean): DataFrame = {
      val pairs = l.select(col("vec_id").as("i"), col("embedding").as("ei"))
        .join(broadcast(r.select(col("vec_id").as("j"),
          col("embedding").as("ej"))),
          // within-group: unordered pairs once; cross-group: all pairs
          if (strict) col("i") < col("j") else lit(true))
      pairs.withColumn("dist", expr(
          "ROUND(sqrt(greatest(float_dot(ei, ei) - 2.0 * float_dot(ei, ej) " +
            "+ float_dot(ej, ej), 0.0)), 6)"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(dist AS DECIMAL(18,6))")).as("sd"))
        .select(expr("CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)").as("md"),
          col("n"))
    }
    val exy = meanDist(x, y, strict = false)
      .select(col("md").as("e_xy"), col("n").as("n_xy"))
    val exx = meanDist(x, x, strict = true)
      .select(col("md").as("e_xx"), col("n").as("n_xx"))
    val eyy = meanDist(y, y, strict = true)
      .select(col("md").as("e_yy"), col("n").as("n_yy"))
    exy.crossJoin(exx).crossJoin(eyy)
      .select(col("n_xy"), col("n_xx"), col("n_yy"),
        expr("ROUND(e_xy, 6)").as("e_xy"),
        expr("ROUND(e_xx, 6)").as("e_xx"),
        expr("ROUND(e_yy, 6)").as("e_yy"),
        expr("ROUND(2.0 * e_xy - e_xx - e_yy, 6)").as("energy_dist"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_knngraph" -> (qEmbedKnngraph _),
    "q_embed_energy" -> (qEmbedEnergy _),
  )

  // DuckDB side computes dot products as element-aligned unnest +
  // SUM(double) — the q_sim_cosine_topk convention; list_dot_product
  // accumulates in float32 and drifts ~2e-7 from Spark's double-
  // accumulating float_dot, which breaks the 6-dp round.
  val sql: Map[String, String] = Map(
    "q_embed_knngraph" ->
      """WITH base AS (
        |  SELECT vec_id, label, embedding FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 512),
        |norms AS (
        |  SELECT vec_id, SUM(x * x) AS n2 FROM (
        |    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        |    FROM base) z GROUP BY vec_id),
        |z AS (
        |  SELECT a.vec_id AS a, a.label AS la, b.vec_id AS b,
        |    CAST(unnest(a.embedding) AS DOUBLE) AS px,
        |    CAST(unnest(b.embedding) AS DOUBLE) AS ex
        |  FROM base a JOIN base b ON a.vec_id <> b.vec_id),
        |dots AS (
        |  SELECT a, la, b, SUM(px * ex) AS dp FROM z GROUP BY 1, 2, 3),
        |sims AS (
        |  SELECT a, la, b,
        |    ROUND(dp / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS sim
        |  FROM dots JOIN norms na ON na.vec_id = dots.a
        |  JOIN norms nb ON nb.vec_id = dots.b),
        |knn AS (
        |  SELECT a, la, b, sim,
        |    row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
        |  FROM sims QUALIFY rn <= 3),
        |rec AS (
        |  SELECT k.a, count(r.a) AS n_rec
        |  FROM knn k LEFT JOIN knn r ON r.a = k.b AND r.b = k.a
        |  GROUP BY k.a),
        |nodes AS (
        |  SELECT DISTINCT a, la FROM knn),
        |agg AS (
        |  SELECT la, CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(count(*) * 3 AS BIGINT) AS n_edges,
        |    CAST(sum(n_rec) AS BIGINT) AS n_reciprocal
        |  FROM nodes JOIN rec ON nodes.a = rec.a GROUP BY la),
        |k3 AS (
        |  SELECT la, sum(CAST(ROUND(sim, 6) AS DECIMAL(18,6))) AS ssim
        |  FROM knn WHERE rn = 3 GROUP BY la)
        |SELECT agg.la AS label, n_nodes, n_edges, n_reciprocal,
        |  ROUND(CAST(n_reciprocal AS DOUBLE) / CAST(n_edges AS DOUBLE), 6)
        |    AS reciprocity,
        |  ROUND(CAST(ssim AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
        |    AS mean_sim3
        |FROM agg JOIN k3 ON agg.la = k3.la
        |ORDER BY label""".stripMargin,
    "q_embed_energy" ->
      """WITH x AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE label = 0
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 128),
        |y AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE label = 1
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 128),
        |u AS (SELECT * FROM x UNION ALL SELECT * FROM y),
        |norms AS (
        |  SELECT vec_id, SUM(v * v) AS n2 FROM (
        |    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
        |    FROM u) z GROUP BY vec_id),
        |dot AS (
        |  SELECT i, j, SUM(px * ex) AS dp FROM (
        |    SELECT a.vec_id AS i, b.vec_id AS j,
        |      CAST(unnest(a.embedding) AS DOUBLE) AS px,
        |      CAST(unnest(b.embedding) AS DOUBLE) AS ex
        |    FROM u a JOIN u b ON a.vec_id < b.vec_id) z
        |  GROUP BY i, j),
        |dist AS (
        |  SELECT i, j,
        |    CAST(ROUND(sqrt(greatest(na.n2 - 2.0 * dp + nb.n2, 0.0)), 6)
        |      AS DECIMAL(18,6)) AS dist
        |  FROM dot JOIN norms na ON na.vec_id = dot.i
        |  JOIN norms nb ON nb.vec_id = dot.j),
        |dxy AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(dist) AS sd
        |  FROM dist
        |  WHERE (i IN (SELECT vec_id FROM x) AND j IN (SELECT vec_id FROM y))
        |     OR (i IN (SELECT vec_id FROM y) AND j IN (SELECT vec_id FROM x))),
        |dxx AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(dist) AS sd
        |  FROM dist
        |  WHERE i IN (SELECT vec_id FROM x) AND j IN (SELECT vec_id FROM x)),
        |dyy AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(dist) AS sd
        |  FROM dist
        |  WHERE i IN (SELECT vec_id FROM y) AND j IN (SELECT vec_id FROM y)),
        |f AS (
        |  SELECT dxy.n AS n_xy, dxx.n AS n_xx, dyy.n AS n_yy,
        |    CAST(dxy.sd AS DOUBLE) / CAST(dxy.n AS DOUBLE) AS e_xy,
        |    CAST(dxx.sd AS DOUBLE) / CAST(dxx.n AS DOUBLE) AS e_xx,
        |    CAST(dyy.sd AS DOUBLE) / CAST(dyy.n AS DOUBLE) AS e_yy
        |  FROM dxy CROSS JOIN dxx CROSS JOIN dyy)
        |SELECT n_xy, n_xx, n_yy, ROUND(e_xy, 6) AS e_xy,
        |  ROUND(e_xx, 6) AS e_xx, ROUND(e_yy, 6) AS e_yy,
        |  ROUND(2.0 * e_xy - e_xx - e_yy, 6) AS energy_dist
        |FROM f""".stripMargin,
  )
}
