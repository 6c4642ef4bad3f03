package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 embedding-health + graph-elite wave: the per-dimension
  * statistics profile (dead/dominant dimension screen — the first
  * check on any embedding export), an isotropy report (mean pairwise
  * cosine over a deterministic bounded pair sample + norm
  * concentration — anisotropic embedding spaces break cosine
  * retrieval), and the rich-club coefficient (do high-degree nodes
  * preferentially interconnect — the hub-collusion structure report).
  *
  * Scale notes: dimstats is one explode + (dim)-keyed aggregate (64
  * groups); isotropy caps the pair sample at 512 hash-ordered vectors
  * (bounded-probe-set discipline — the window runs over ≤512 rows, the
  * corpus is only scanned once to rank); rich-club is a node-degree
  * join + a threshold-bounded edge filter per k ∈ {2,4,8}. */
object Analytics64 {

  /** Per-dimension profile of the embedding table: mean, variance,
    * min, max per dimension plus the variance rank — the dead/dominant
    * dimension screen. */
  private def qEmbedDimstats(s: SparkSession, d: String): DataFrame = {
    val x = t(s, d, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .select((col("pos") + 1).as("dim"), dbl(col("v")).as("v"))
    val stats = x.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(v, 9) AS DECIMAL(28,9))")).as("s1"),
        sum(expr("CAST(ROUND(v * v, 9) AS DECIMAL(28,9))")).as("s2"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .select(col("dim"), col("n"),
        round(dbl(col("s1")) / dbl(col("n")), 6).as("mean"),
        when(col("n") > 1,
          round((dbl(col("s2")) - dbl(col("s1")) * dbl(col("s1"))
            / dbl(col("n"))) / (dbl(col("n")) - 1.0), 6)).as("var"),
        round(col("mn"), 6).as("mn"), round(col("mx"), 6).as("mx"))
    stats.withColumn("var_rank",
        row_number().over(Window.orderBy(desc("var"), col("dim"))))
      .orderBy(col("dim"))
  }

  /** Isotropy report: mean (and mean absolute) cosine over 256
    * deterministic pairs of hash-ordered vectors, plus norm mean /
    * stddev / coefficient of variation. Near-zero mean cosine and a
    * small norm CV are what healthy, retrieval-ready spaces look
    * like. */
  private def qEmbedIsotropy(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val capped = t(s, d, "embeddings")
      .orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))
      .limit(512)
      .select(col("vec_id"), col("embedding"))
    // pair consecutive rows of the bounded sample: (2i-1, 2i)
    val rn = capped.withColumn("rn", row_number().over(
      Window.orderBy(expr("md5(CAST(vec_id AS STRING))"), col("vec_id"))))
      .withColumn("p", expr("(rn + 1) div 2"))
    val a = rn.filter(expr("rn % 2 = 1"))
      .select(col("p"), col("embedding").as("ea"))
    val b = rn.filter(expr("rn % 2 = 0"))
      .select(col("p"), col("embedding").as("eb"))
    val cos = a.join(b, Seq("p"))
      .select(expr("float_dot(ea, eb)").as("dp"),
        expr("float_dot(ea, ea)").as("na"),
        expr("float_dot(eb, eb)").as("nb"))
      .filter(col("na") > 0 && col("nb") > 0)
      .select(expr("CAST(ROUND(dp / (sqrt(na) * sqrt(nb)), 9) " +
        "AS DECIMAL(18,9))").as("cos"))
    val cosAgg = cos.agg(count(lit(1)).as("n_pairs"),
      sum(col("cos")).as("sc"), sum(abs(col("cos"))).as("sa"))
    val norms = capped
      .select(expr("sqrt(float_dot(embedding, embedding))").as("nr"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("CAST(ROUND(nr, 9) AS DECIMAL(28,9))")).as("n1"),
        sum(expr("CAST(ROUND(nr * nr, 9) AS DECIMAL(28,9))")).as("n2"))
    cosAgg.crossJoin(broadcast(norms))
      .select(col("n_pairs"), col("n_vecs"),
        round(dbl(col("sc")) / dbl(col("n_pairs")), 6).as("mean_cos"),
        round(dbl(col("sa")) / dbl(col("n_pairs")), 6).as("mean_abs_cos"),
        round(dbl(col("n1")) / dbl(col("n_vecs")), 6).as("mean_norm"),
        when(col("n_vecs") > 1,
          round(sqrt((dbl(col("n2")) - dbl(col("n1")) * dbl(col("n1"))
            / dbl(col("n_vecs"))) / (dbl(col("n_vecs")) - 1.0)), 6))
          .as("sd_norm"),
        when(col("n_vecs") > 1 && dbl(col("n1")) > 0,
          round(sqrt((dbl(col("n2")) - dbl(col("n1")) * dbl(col("n1"))
            / dbl(col("n_vecs"))) / (dbl(col("n_vecs")) - 1.0)) /
            (dbl(col("n1")) / dbl(col("n_vecs"))), 6)).as("norm_cv"))
  }

  /** Rich-club coefficient of the support-≥2 co-purchase graph at
    * degree thresholds k ∈ {2, 4, 8}: φ(k) = 2·E_k / (N_k·(N_k−1))
    * over the subgraph of nodes with degree > k. */
  private def qGraphRichclub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    val deg = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val ks = Seq(2L, 4L, 8L).toDF("k")
    val nk = deg.crossJoin(broadcast(ks))
      .filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
    val ed = e
      .join(deg.select(col("u"), col("deg").as("du")).hint("shuffle_hash"),
        Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv"))
        .hint("shuffle_hash"), Seq("v"))
    val ek = ed.crossJoin(broadcast(ks))
      .filter(col("du") > col("k") && col("dv") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
    nk.join(ek, Seq("k"), "left")
      .select(col("k"), col("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"),
        when(col("n_k") > 1,
          round(lit(2.0) * dbl(coalesce(col("e_k"), lit(0L))) /
            (dbl(col("n_k")) * (dbl(col("n_k")) - 1.0)), 6)).as("phi"))
      .orderBy(col("k"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_dimstats" -> (qEmbedDimstats _),
    "q_embed_isotropy" -> (qEmbedIsotropy _),
    "q_graph_richclub" -> (qGraphRichclub _),
  )

  val sql: Map[String, String] = Map(
    "q_embed_dimstats" ->
      """WITH x AS (
        |  SELECT generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |stats AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(v, 9) AS DECIMAL(28,9))) AS s1,
        |    sum(CAST(ROUND(v * v, 9) AS DECIMAL(28,9))) AS s2,
        |    min(v) AS mn, max(v) AS mx
        |  FROM x GROUP BY dim),
        |prof AS (
        |  SELECT CAST(dim AS INT) AS dim, n,
        |    ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |    CASE WHEN n > 1 THEN ROUND((CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0), 6) END
        |      AS var,
        |    ROUND(mn, 6) AS mn, ROUND(mx, 6) AS mx
        |  FROM stats)
        |SELECT dim, n, mean, var, mn, mx,
        |  CAST(row_number() OVER (ORDER BY var DESC, dim) AS INT)
        |    AS var_rank
        |FROM prof ORDER BY dim""".stripMargin,
    "q_embed_isotropy" ->
      """WITH capped AS (
        |  SELECT vec_id, embedding,
        |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |      vec_id) AS rn
        |  FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 512),
        |pr AS (SELECT (rn + 1) // 2 AS p, rn % 2 AS side, embedding
        |       FROM capped),
        |z AS (
        |  SELECT a.p,
        |    CAST(unnest(a.embedding) AS DOUBLE) AS xa,
        |    CAST(unnest(b.embedding) AS DOUBLE) AS xb
        |  FROM (SELECT p, embedding FROM pr WHERE side = 1) a
        |  JOIN (SELECT p, embedding FROM pr WHERE side = 0) b
        |    ON a.p = b.p),
        |dots AS (
        |  SELECT p, sum(xa * xb) AS dp, sum(xa * xa) AS na,
        |    sum(xb * xb) AS nb
        |  FROM z GROUP BY p),
        |cosv AS (
        |  SELECT CAST(ROUND(dp / (sqrt(na) * sqrt(nb)), 9)
        |    AS DECIMAL(18,9)) AS cos
        |  FROM dots WHERE na > 0 AND nb > 0),
        |cagg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs, sum(cos) AS sc,
        |    sum(abs(cos)) AS sa
        |  FROM cosv),
        |nzx AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM capped),
        |nz AS (SELECT vec_id, sqrt(sum(v * v)) AS nr
        |       FROM nzx GROUP BY vec_id),
        |norms AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |    sum(CAST(ROUND(nr, 9) AS DECIMAL(28,9))) AS n1,
        |    sum(CAST(ROUND(nr * nr, 9) AS DECIMAL(28,9))) AS n2
        |  FROM nz)
        |SELECT n_pairs, n_vecs,
        |  ROUND(CAST(sc AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
        |    AS mean_cos,
        |  ROUND(CAST(sa AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6)
        |    AS mean_abs_cos,
        |  ROUND(CAST(n1 AS DOUBLE) / CAST(n_vecs AS DOUBLE), 6)
        |    AS mean_norm,
        |  CASE WHEN n_vecs > 1 THEN
        |    ROUND(sqrt((CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE)
        |      * CAST(n1 AS DOUBLE) / CAST(n_vecs AS DOUBLE))
        |      / (CAST(n_vecs AS DOUBLE) - 1.0)), 6) END AS sd_norm,
        |  CASE WHEN n_vecs > 1 AND CAST(n1 AS DOUBLE) > 0 THEN
        |    ROUND(sqrt((CAST(n2 AS DOUBLE) - CAST(n1 AS DOUBLE)
        |      * CAST(n1 AS DOUBLE) / CAST(n_vecs AS DOUBLE))
        |      / (CAST(n_vecs AS DOUBLE) - 1.0))
        |      / (CAST(n1 AS DOUBLE) / CAST(n_vecs AS DOUBLE)), 6) END
        |    AS norm_cv
        |FROM cagg CROSS JOIN norms""".stripMargin,
    "q_graph_richclub" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |ks AS (SELECT CAST(k AS BIGINT) AS k
        |       FROM (VALUES (2), (4), (8)) AS t(k)),
        |nk AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n_k
        |  FROM deg CROSS JOIN ks WHERE deg > k GROUP BY k),
        |ed AS (SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
        |       FROM e JOIN deg du ON e.u = du.u
        |              JOIN deg dv ON e.v = dv.u),
        |ek AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS e_k
        |  FROM ed CROSS JOIN ks WHERE du > k AND dv > k GROUP BY k)
        |SELECT nk.k, nk.n_k, COALESCE(ek.e_k, 0) AS e_k,
        |  CASE WHEN nk.n_k > 1 THEN
        |    ROUND(2.0 * CAST(COALESCE(ek.e_k, 0) AS DOUBLE)
        |      / (CAST(nk.n_k AS DOUBLE) * (CAST(nk.n_k AS DOUBLE) - 1.0)),
        |      6) END AS phi
        |FROM nk LEFT JOIN ek ON nk.k = ek.k
        |ORDER BY nk.k""".stripMargin,
  )
}
