package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 sixth wave: the cluster-validity family q_embed_kmeans
  * lacked — after a clustering runs, the pipeline needs a verdict on
  * whether the partition is any good, and each classical index answers
  * a different question. Three oracled operators, all over the SAME
  * nearest-seed-centroid assignment q_embed_kmeans performs (seeds =
  * vec_id 0..7, squared-distance argmin tie-broken by centroid id):
  *
  *  - q_embed_silhouette: simplified (centroid-based) silhouette —
  *    per point a = distance to own centroid, b = distance to the
  *    nearest OTHER centroid, s = (b−a)/max(a,b); reported per
  *    cluster. The O(n·k·d) form that replaces the O(n²) pairwise
  *    silhouette at scale (the same substitution sklearn documents);
  *    the assignment crossJoin already produces all k distances, so
  *    b is a second-smallest over the rows already in hand.
  *  - q_embed_calinski: Calinski–Harabasz variance-ratio criterion
  *    (BSS/(k−1))/(WSS/(n−k)) — computed entirely from one
  *    (cluster, dim) moment grid via WSS = Σ(Sq² − Sq²/n): no second
  *    data pass, no distance to updated centroids ever materialized.
  *  - q_embed_daviesbouldin: Davies–Bouldin index — per-cluster
  *    scatter Sⱼ = √(WSSⱼ/nⱼ) around the UPDATED centroid and
  *    worst-pair ratio max_{i≠j}(Sᵢ+Sⱼ)/Mᵢⱼ, all off the same moment
  *    grid plus an 8×8×64 centroid-pair grid (bounded algebra).
  *
  * Determinism: the assignment reuses q_embed_kmeans' order-preserving
  * per-dimension fold (proven identical across engines at sf1);
  * silhouette s is rounded to 6dp per point and summed in DECIMAL;
  * the moment grids quantize each coordinate to the ×10⁹ BIGINT
  * lattice FIRST (the kmeans centroid trick), so every sum is exact
  * integer arithmetic and WSS/BSS/Sⱼ/Mᵢⱼ are identical double trees
  * over exact moments. Scale: one crossJoin-broadcast scan (k = 8
  * rows) for the assignment; everything after lives on k×d grids. */
object Analytics108 {

  /** Per-vector nearest/second-nearest seed distances:
    * (vec_id, [embedding], cluster j, d2 own, d2 next). The 64-float
    * array is carried through the window shuffle only when the
    * consumer needs it (silhouette doesn't — dropping it halves the
    * shuffled row width). */
  private def assigned(s: SparkSession, d: String,
      needEmbedding: Boolean = true): DataFrame = {
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
    val ranked = emb.crossJoin(broadcast(c)).withColumn("d2", d2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val aggs = Seq(
      max(when(col("rn") === 1, col("j"))).as("cluster"),
      max(when(col("rn") === 1, col("d2"))).as("a2"),
      max(when(col("rn") === 2, col("d2"))).as("b2"))
    val withEmb = if (needEmbedding)
      max(col("embedding")).as("embedding") +: aggs else aggs
    ranked.groupBy(col("vec_id")).agg(withEmb.head, withEmb.tail: _*)
  }

  private def qEmbedSilhouette(s: SparkSession, d: String): DataFrame =
    assigned(s, d, needEmbedding = false)
      .select(col("cluster"),
        expr("""CAST(ROUND(CASE
               |  WHEN greatest(sqrt(a2), sqrt(b2)) > 0 THEN
               |    (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2))
               |  ELSE 0.0 END, 6) AS DECIMAL(18,6))""".stripMargin)
          .as("sil"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"), sum(col("sil")).as("ssil"))
      .select(col("cluster"), col("size"),
        round(dbl(col("ssil")) / dbl(col("size")), 6).as("mean_sil"))
      .orderBy(col("cluster"))

  /** (cluster, dim, n, Sq, Sq2) moment grid on the ×10⁹ lattice. */
  private def momentGrid(s: SparkSession, d: String): DataFrame =
    assigned(s, d)
      .select(col("cluster"), posexplode(col("embedding"))
        .as(Seq("i0", "v")))
      .select(col("cluster"), (col("i0") + 1).cast("long").as("dim"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)")
          .as("q"))
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
        sum(expr("CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))"))
          .as("sq2"))

  /** Per-(cluster, dim) within-SS in original units², 6dp-rounded
    * DECIMAL so the cross-cell sums are order-free. */
  private def wssCell: org.apache.spark.sql.Column =
    expr("""CAST(ROUND((CAST(sq2 AS DOUBLE)
           |  - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
           |    / CAST(n AS DOUBLE)) / 1e18, 6) AS DECIMAL(28,6))"""
      .stripMargin)

  private def qEmbedCalinski(s: SparkSession, d: String): DataFrame = {
    val g = momentGrid(s, d).localCheckpoint(true) // 8×64 grid
    val wss = g.select(wssCell.as("w"))
      .agg(sum(col("w")).as("wss"))
    // total SS from the grid's per-dim collapse (same lattice)
    val tss = g.groupBy(col("dim"))
      .agg(sum(col("n")).as("n"), sum(col("sq")).as("sq"),
        sum(col("sq2")).as("sq2"))
      .select(wssCell.as("w"))
      .agg(sum(col("w")).as("tss"))
    val nk = g.groupBy(col("dim")).agg(sum(col("n")).as("n"))
      .agg(max(col("n")).as("n")) // n identical across dims
    wss.crossJoin(tss).crossJoin(nk)
      .select(col("n"), lit(8L).as("k"),
        round(dbl(col("tss")), 6).as("tss"),
        round(dbl(col("wss")), 6).as("wss"),
        round(dbl(col("tss")) - dbl(col("wss")), 6).as("bss"),
        when(col("n") > 8 && dbl(col("wss")) > 0,
          round(((dbl(col("tss")) - dbl(col("wss"))) / 7.0)
            / (dbl(col("wss")) / (dbl(col("n")) - 8.0)), 6)).as("ch"))
  }

  private def qEmbedDaviesbouldin(s: SparkSession, d: String): DataFrame = {
    val g = momentGrid(s, d).localCheckpoint(true)
    // per-cluster scatter Sⱼ = √(WSSⱼ/nⱼ)
    val scat = g.groupBy(col("cluster"))
      .agg(max(col("n")).as("size"), sum(wssCell).as("wssj"))
      .select(col("cluster"), col("size"),
        when(dbl(col("wssj")) >= 0,
          sqrt(dbl(col("wssj")) / dbl(col("size")))).as("sj"))
    // updated centroids on a 9dp decimal lattice → exact pair distances
    val cent = g.select(col("cluster"), col("dim"),
      expr("""CAST(ROUND(CAST(sq AS DOUBLE) / 1000000000.0
             |  / CAST(n AS DOUBLE), 9) AS DECIMAL(19,9))""".stripMargin)
        .as("c"))
    val m2 = cent.select(col("cluster").as("ci"), col("dim"),
        col("c").as("cc1"))
      .join(cent.select(col("cluster").as("cj"), col("dim"),
        col("c").as("cc2")), Seq("dim"))
      .filter(col("ci") < col("cj"))
      .groupBy(col("ci"), col("cj"))
      .agg(sum((col("cc1") - col("cc2")) * (col("cc1") - col("cc2")))
        .as("m2"))
    val ratios = m2
      .join(scat.select(col("cluster").as("ci"), col("sj").as("si")),
        Seq("ci"))
      .join(scat.select(col("cluster").as("cj"), col("sj").as("sj2")),
        Seq("cj"))
      .filter(dbl(col("m2")) > 0)
      .select(col("ci"), col("cj"),
        ((col("si") + col("sj2")) / sqrt(dbl(col("m2")))).as("ratio"))
    val worst = ratios.select(col("ci").as("cluster"), col("ratio"))
      .union(ratios.select(col("cj").as("cluster"), col("ratio")))
      .groupBy(col("cluster")).agg(max(col("ratio")).as("db_j"))
    scat.join(worst, Seq("cluster"))
      .select(col("cluster"), col("size"), round(col("sj"), 6).as("s_j"),
        round(col("db_j"), 6).as("db_j"))
      .orderBy(col("cluster"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_silhouette" -> (qEmbedSilhouette _),
    "q_embed_calinski" -> (qEmbedCalinski _),
    "q_embed_daviesbouldin" -> (qEmbedDaviesbouldin _),
  )

  private val asgSql =
    """WITH c AS (SELECT vec_id AS j, embedding AS cemb
      |  FROM embeddings WHERE vec_id < 8),
      |dd AS (SELECT e.vec_id, c.j, e.embedding,
      |    list_reduce(list_transform(generate_series(1, 64),
      |      i -> (CAST(e.embedding[i] AS DOUBLE)
      |            - CAST(c.cemb[i] AS DOUBLE))
      |         * (CAST(e.embedding[i] AS DOUBLE)
      |            - CAST(c.cemb[i] AS DOUBLE))),
      |      (a, b) -> a + b) AS d2
      |  FROM embeddings e, c),
      |asg AS (SELECT vec_id,
      |    max(CASE WHEN rn = 1 THEN j END) AS cluster,
      |    max(embedding) AS embedding,
      |    max(CASE WHEN rn = 1 THEN d2 END) AS a2,
      |    max(CASE WHEN rn = 2 THEN d2 END) AS b2
      |  FROM (SELECT vec_id, j, embedding, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
      |    FROM dd) z
      |  WHERE rn <= 2 GROUP BY vec_id)""".stripMargin

  private val gridSql =
    """grid AS (SELECT cluster, u.i AS dim,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(floor(CAST(embedding[u.i] AS DOUBLE)
      |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS sq,
      |    sum(CAST(CAST(floor(CAST(embedding[u.i] AS DOUBLE)
      |        * 1000000000.0) AS BIGINT) AS HUGEINT)
      |      * CAST(floor(CAST(embedding[u.i] AS DOUBLE)
      |        * 1000000000.0) AS BIGINT)) AS sq2
      |  FROM asg, unnest(generate_series(1, 64)) AS u(i)
      |  GROUP BY cluster, u.i)""".stripMargin

  private val wssCellSql =
    """CAST(ROUND((CAST(sq2 AS DOUBLE)
      |  - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
      |    / CAST(n AS DOUBLE)) / 1e18, 6) AS DECIMAL(28,6))""".stripMargin

  val sql: Map[String, String] = Map(
    "q_embed_silhouette" -> (asgSql +
      """
        |SELECT cluster, CAST(count(*) AS BIGINT) AS size,
        |  ROUND(CAST(sum(CAST(ROUND(CASE
        |      WHEN greatest(sqrt(a2), sqrt(b2)) > 0 THEN
        |        (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2))
        |      ELSE 0.0 END, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS mean_sil
        |FROM asg GROUP BY cluster ORDER BY cluster""".stripMargin),
    "q_embed_calinski" -> (asgSql + ",\n" + gridSql +
      s""",
        |wss AS (SELECT sum($wssCellSql) AS wss FROM grid),
        |tot AS (SELECT dim, sum(n) AS n, sum(sq) AS sq, sum(sq2) AS sq2
        |        FROM grid GROUP BY dim),
        |tss AS (SELECT sum($wssCellSql) AS tss FROM tot),
        |nk AS (SELECT max(n) AS n
        |       FROM (SELECT dim, CAST(sum(n) AS BIGINT) AS n
        |             FROM grid GROUP BY dim) z)
        |SELECT n, CAST(8 AS BIGINT) AS k,
        |  ROUND(CAST(tss AS DOUBLE), 6) AS tss,
        |  ROUND(CAST(wss AS DOUBLE), 6) AS wss,
        |  ROUND(CAST(tss AS DOUBLE) - CAST(wss AS DOUBLE), 6) AS bss,
        |  CASE WHEN n > 8 AND CAST(wss AS DOUBLE) > 0 THEN
        |    ROUND(((CAST(tss AS DOUBLE) - CAST(wss AS DOUBLE)) / 7.0)
        |      / (CAST(wss AS DOUBLE) / (CAST(n AS DOUBLE) - 8.0)), 6)
        |  END AS ch
        |FROM wss CROSS JOIN tss CROSS JOIN nk""".stripMargin),
    "q_embed_daviesbouldin" -> (asgSql + ",\n" + gridSql +
      s""",
        |scat AS (SELECT cluster, max(n) AS size,
        |    sum($wssCellSql) AS wssj
        |  FROM grid GROUP BY cluster),
        |sj AS (SELECT cluster, CAST(size AS BIGINT) AS size,
        |    CASE WHEN CAST(wssj AS DOUBLE) >= 0 THEN
        |      sqrt(CAST(wssj AS DOUBLE) / CAST(size AS DOUBLE)) END AS sj
        |  FROM scat),
        |cent AS (SELECT cluster, dim,
        |    CAST(ROUND(CAST(sq AS DOUBLE) / 1000000000.0
        |      / CAST(n AS DOUBLE), 9) AS DECIMAL(19,9)) AS c
        |  FROM grid),
        |m2 AS (SELECT a.cluster AS ci, b.cluster AS cj,
        |    sum((a.c - b.c) * (a.c - b.c)) AS m2
        |  FROM cent a JOIN cent b ON a.dim = b.dim
        |    AND a.cluster < b.cluster
        |  GROUP BY 1, 2),
        |ratios AS (SELECT ci, cj,
        |    (si.sj + sjj.sj) / sqrt(CAST(m2 AS DOUBLE)) AS ratio
        |  FROM m2 JOIN sj si ON si.cluster = m2.ci
        |    JOIN sj sjj ON sjj.cluster = m2.cj
        |  WHERE CAST(m2 AS DOUBLE) > 0),
        |worst AS (SELECT cluster, max(ratio) AS db_j FROM (
        |    SELECT ci AS cluster, ratio FROM ratios
        |    UNION ALL SELECT cj AS cluster, ratio FROM ratios) z
        |  GROUP BY cluster)
        |SELECT sj.cluster, size, ROUND(sj.sj, 6) AS s_j,
        |  ROUND(db_j, 6) AS db_j
        |FROM sj JOIN worst ON worst.cluster = sj.cluster
        |ORDER BY sj.cluster""".stripMargin),
  )
}
