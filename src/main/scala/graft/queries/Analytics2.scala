package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 analytics wave: graph structure metrics (degree histogram,
  * degree-oriented triangle counting), DSIR-style importance weighting
  * for training-data selection, the embedding covariance matrix, and MMR
  * diversified retrieval — the graph/selection/retrieval primitives next
  * in line after PageRank, the LM scorers, and the ANN family.
  *
  * Scale notes:
  *  - The co-purchase graph derives from a SELF-JOIN CO-PARTITIONED on
  *    l_orderkey (one shuffle); per-order fan-out is bounded by order
  *    size (≤ C(7,2) pairs at TPC-H shape), never quadratic in the
  *    table.
  *  - Triangle counting uses the degree-ordering orientation (the
  *    MapReduce-classic from Suri & Vassilvitskii "Counting Triangles
  *    and the Curse of the Last Reducer", WWW'11): every edge points
  *    from its lower-(degree, id) endpoint to the higher one, so each
  *    node's out-degree is O(√m) and the wedge join is O(m^{3/2}) —
  *    NOT the unbounded hub-squared blowup of naive adjacency joins.
  *    Wedge closure probes the oriented edge set again (equi-join on
  *    the two endpoints; every shuffle is on join keys, AQE handles
  *    residual skew).
  *  - DSIR (Xie et al. 2023, "Data Selection for Language Models via
  *    Importance Resampling"): token features are HASHED into a fixed
  *    1024-bucket space, so both LM count tables are ≤1024 rows
  *    regardless of corpus size — they BROADCAST, and the corpus makes
  *    exactly one explode pass. That bounded-feature trick is the whole
  *    point of hashed DSIR at 100 TB (an unhashed vocab LM would need
  *    the shuffle-join of q_text_unigram_lm instead).
  *  - Covariance: one map-only explode to (i, j≤i, xᵢ·xⱼ) triples —
  *    dim²/2-bounded hash agg with map-side partials; the shuffle
  *    carries ≤ 2080 rows per partition regardless of corpus size. The
  *    per-dim mean table (64 rows) broadcasts back.
  *  - MMR re-rank: candidate generation is the broadcast-probe cosine
  *    top-k funnel (no all-pairs); the greedy selection runs inside
  *    `mapGroups` per probe over the ≤30-row shortlist — per-group
  *    state is k·dim floats, distributed across probes, nothing
  *    collects to the driver.
  *
  * Determinism: triangle/degree math is pure integers; DSIR follows the
  * bigram-LM discipline (per-token ln rounded to 9 dp, summed as
  * DECIMAL — order-independent); covariance follows the centroid
  * discipline (exact float→double products, 6-dp round absorbing
  * sum-order noise); MMR is oracle-free (float greedy) and pinned by
  * ScalaTest instead. */
object Analytics2 {

  /** Distinct co-purchase edges (u < v): two parts that appear in the
    * same order. The join is co-partitioned on l_orderkey. With
    * `minSupport > 1`, only pairs co-purchased in at least that many
    * DISTINCT orders survive — the market-basket minimum-support rule.
    * At sf0.1 the full graph is 1.196M edges of which only ~3.6k have
    * support ≥ 2: one-off co-occurrences are noise that grows linearly
    * with the data, while supported edges track real structure. Any
    * all-pairs-of-edges consumer (triangles) MUST take the pruned
    * graph; single-pass aggregations (degree histogram) can afford the
    * full one. */
  private def coEdges(s: SparkSession, d: String,
      minSupport: Int = 1): DataFrame = {
    val pc = coPairCounts(s, d) // materialized once per SF (Tables)
    (if (minSupport <= 1) pc else pc.filter(col("cn") >= minSupport))
      .select(col("u"), col("v"))
  }

  /** Undirected degree per node of the co-purchase graph. */
  private def degrees(e: DataFrame): DataFrame =
    e.union(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))

  /** Degree histogram in power-of-two buckets — the first structural
    * report on any production graph (spotting hubs and the tail). The
    * bucket is the integer bit-length minus one (= ⌊log₂ deg⌋ with no
    * floating point anywhere). */
  private def qGraphDegree(s: SparkSession, d: String): DataFrame =
    degrees(coEdges(s, d))
      .withColumn("bucket", expr("CAST(length(bin(deg)) - 1 AS INT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      .orderBy("bucket")

  /** Top-20 nodes by triangle participation, via degree-ordered
    * orientation: orient each edge toward its higher-(deg, id)
    * endpoint, enumerate wedges at the LOW-rank apex (out-degree
    * bounded O(√m)), close them against the oriented edge set. Each
    * triangle is found exactly once, then credited to all 3 corners.
    * Runs on the support-≥2 graph: the wedge join is quadratic in
    * out-degree, so the noise edges (co-purchased exactly once — 99.7%
    * of the full sf0.1 graph) must be pruned FIRST; without the support
    * floor this op spent 113 s at sf0.1 on pure noise wedges. */
  private def qGraphTriangles(s: SparkSession, d: String): DataFrame = {
    val e = coEdges(s, d, minSupport = 2)
    val deg = degrees(e)
    // attach endpoint degrees (node-keyed tables; shuffle join — at
    // 100 TB the degree table is node-count sized, not broadcastable)
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
    // wedges at the apex: unordered out-neighbor pairs, ranked (dd, id)
    val w = o.select(col("src"), col("dst").as("b"), col("dd").as("db"))
      .join(o.select(col("src"), col("dst").as("c"), col("dd").as("dc")),
        Seq("src"))
      .filter(expr("db < dc OR (db = dc AND b < c)"))
    // closure: the (b, c) edge is oriented b→c because rank(b) < rank(c)
    val tri = w.join(o.select(col("src").as("b"), col("dst").as("c")),
      Seq("b", "c"))
      .select(col("src").as("a"), col("b"), col("c"))
    tri.select(col("a").as("part"))
      .union(tri.select(col("b").as("part")))
      .union(tri.select(col("c").as("part")))
      .groupBy(col("part")).agg(count(lit(1)).as("n_tri"))
      .orderBy(desc("n_tri"), col("part")).limit(20)
  }

  /** DSIR importance weight per document: hashed-unigram bag-of-words
    * LMs for the target distribution (lang = 'en') and the source
    * distribution (whole corpus), add-1 smoothed over the fixed
    * 1024-bucket feature space; weight = mean over tokens of
    * ln p_target(f) − ln p_source(f). High weight = looks like the
    * target corpus → keep for training. Both count tables are ≤1024
    * rows (broadcast); md5-derived bucketing is engine-portable. */
  private def qTextDsir(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("f", expr(
        "pmod(cast(conv(substring(md5(w), 1, 6), 16, 10) as bigint), 1024)"))
      .select(col("doc_id"), col("lang"), col("f"))
    val ct = tok.filter(col("lang") === "en")
      .groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val cs = tok.groupBy(col("f")).agg(count(lit(1)).as("cs"))
    val tot = ct.agg(sum(col("ct")).as("nt"))
      .crossJoin(cs.agg(sum(col("cs")).as("ns")))
    tok
      .join(broadcast(ct), Seq("f"), "left")
      .join(broadcast(cs), Seq("f"))
      .crossJoin(broadcast(tot))
      .withColumn("lp", expr(
        """cast(round(ln((coalesce(ct, 0L) + 1.0)
          |  / (CAST(nt AS DOUBLE) + 1024.0)), 9) as decimal(18,9))
          |- cast(round(ln((cs + 1.0)
          |  / (CAST(ns AS DOUBLE) + 1024.0)), 9) as decimal(18,9))"""
          .stripMargin))
      .groupBy(col("doc_id"))
      .agg(sum(col("lp")).as("sw"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        // + 0.0 canonicalizes IEEE -0.0 (a zero-sum doc rounds to
        // negative zero in one engine at volume — r15 sf1 campaign)
        (round(col("sw").cast("double") / col("n_tokens"), 6) + lit(0.0))
          .as("dsir_w"))
      .orderBy("doc_id")
  }

  /** Embedding covariance matrix (upper triangle, 1-based dims): the
    * input to whitening / PCA / OOD scoring.
    *
    * Bounded-state accumulation (the justified mapPartitions escape
    * hatch, q_mm_phash precedent): each partition folds its vectors
    * into ONE (n, 2080-cell product-sum grid, 64 dim sums) partial —
    * no 2,080-row explode per vector — then the tiny per-partition
    * partials (≤ #partitions rows) explode and merge in a dim²-bounded
    * hash agg. cov = E[xᵢxⱼ] − E[xᵢ]E[xⱼ], round-6dp finals as before. */
  private[queries] def qEmbedCovariance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val partials = t(s, d, "embeddings")
      .select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        val grid = new Array[Double](2080) // 64·65/2 upper-triangle cells
        val sums = new Array[Double](64)
        var n = 0L
        while (it.hasNext) {
          val v = it.next()
          var i = 0
          var k = 0
          while (i < 64) {
            val xi = v(i).toDouble
            sums(i) += xi
            var j = i
            while (j < 64) { grid(k) += xi * v(j).toDouble; k += 1; j += 1 }
            i += 1
          }
          n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator((n, grid.toSeq, sums.toSeq))
      }.toDF("n", "grid", "sums")
    // flat cell index k (row-major over i ≤ j) → 1-based (i, j)
    val kmapSeq = (for { i <- 1 to 64; j <- i to 64 } yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
    val km = s.createDataFrame(kmapSeq).toDF("k", "i", "j")
    val cells = partials
      .select(col("n"), posexplode(col("grid")).as(Seq("k", "sp")))
      .groupBy(col("k"))
      .agg(sum(col("sp")).as("sp"), sum(col("n")).as("n"))
      .join(broadcast(km), Seq("k"))
    val means = partials
      .select(col("n"), posexplode(col("sums")).as(Seq("i0", "sx")))
      .groupBy(col("i0"))
      .agg((sum(col("sx")) / sum(col("n"))).as("m"))
      .select((col("i0") + 1).as("i"), col("m"))
    cells
      .join(broadcast(means.select(col("i"), col("m").as("mi"))), Seq("i"))
      .join(broadcast(means.select(col("i").as("j"), col("m").as("mj"))),
        Seq("j"))
      .select(col("i"), col("j"), col("n"),
        // + 0.0 canonicalizes IEEE -0.0 (engines render it differently)
        (round(col("sp") / col("n") - col("mi") * col("mj"), 6) + lit(0.0))
          .as("cov"))
      .orderBy("i", "j")
  }

  private[graft] case class Cand(probe_id: Long, vec_id: Long, sim: Double,
      emb: Array[Float])
  private[graft] case class MmrPick(probe_id: Long, rank: Int, vec_id: Long,
      mmr_score: Double)

  /** Maximal-marginal-relevance diversified top-k (λ = 0.7, k = 10 from
    * a 30-candidate cosine shortlist): the retrieval re-rank that keeps
    * a RAG/nearest-neighbor result set from collapsing onto near
    * duplicates. Candidates come from the broadcast-probe exact-cosine
    * funnel; the greedy runs per probe inside mapGroups with tie-breaks
    * on vec_id, so results are deterministic and no driver collect ever
    * sees the vectors. Oracle-free (greedy float argmax is not
    * SQL-expressible); AnalyticsSpec pins the contract. */
  private def qSimMmr(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = t(s, d, "embeddings")
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("q"))
    val shortlist = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("sim", expr(
        """float_dot(embedding, q) / (sqrt(float_dot(embedding, embedding))
          |* sqrt(float_dot(q, q)))""".stripMargin))
      .withColumn("rn", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(desc("sim"), col("vec_id"))))
      .filter(col("rn") <= 30)
      .select(col("probe_id"), col("vec_id"), col("sim"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
      .map { case (p, v, sim, emb) => Cand(p, v, sim, emb) }
    shortlist.groupByKey(_.probe_id)
      .flatMapGroups { (probe, it) =>
        val cands = it.toArray.sortBy(c => (-c.sim, c.vec_id))
        def cos(a: Array[Float], b: Array[Float]): Double = {
          var dotAb = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dotAb += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
            nb += b(i).toDouble * b(i); i += 1
          }
          dotAb / (math.sqrt(na) * math.sqrt(nb))
        }
        val lambda = 0.7
        val selected = scala.collection.mutable.ArrayBuffer[Cand]()
        val out = scala.collection.mutable.ArrayBuffer[MmrPick]()
        val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
        var rank = 1
        while (rank <= 10 && remaining.nonEmpty) {
          var bestIdx = 0
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < remaining.length) {
            val c = remaining(i)
            val maxSel =
              if (selected.isEmpty) 0.0
              else selected.map(sc => cos(c.emb, sc.emb)).max
            val score = lambda * c.sim - (1.0 - lambda) * maxSel
            // strict > keeps the earliest (highest-sim, lowest-id) on ties
            if (score > bestScore) { bestScore = score; bestIdx = i }
            i += 1
          }
          val pick = remaining.remove(bestIdx)
          selected += pick
          out += MmrPick(probe, rank, pick.vec_id,
            math.rint(bestScore * 1e6) / 1e6)
          rank += 1
        }
        out.iterator
      }
      .toDF()
      .orderBy("probe_id", "rank")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_degree" -> (qGraphDegree _),
    "q_graph_triangles" -> (qGraphTriangles _),
    "q_text_dsir" -> (qTextDsir _),
    "q_embed_covariance" -> (qEmbedCovariance _),
    "q_sim_mmr" -> (qSimMmr _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_degree" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u)
        |SELECT CAST(length(bin(deg)) - 1 AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  min(deg) AS min_deg, max(deg) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_graph_triangles" ->
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
        |nodes AS MATERIALIZED (SELECT a AS part FROM tri
        |          UNION ALL SELECT b FROM tri
        |          UNION ALL SELECT c FROM tri)
        |SELECT part, CAST(count(*) AS BIGINT) AS n_tri
        |FROM nodes GROUP BY part ORDER BY n_tri DESC, part
        |LIMIT 20""".stripMargin,
    "q_text_dsir" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(md5(w), 1, 6), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 1024 AS f
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents) z
        |  WHERE w <> ''),
        |ct AS (SELECT f, CAST(count(*) AS BIGINT) AS ct
        |       FROM tok WHERE lang = 'en' GROUP BY f),
        |cs AS (SELECT f, CAST(count(*) AS BIGINT) AS cs
        |       FROM tok GROUP BY f),
        |tot AS (SELECT (SELECT CAST(sum(ct) AS BIGINT) FROM ct) AS nt,
        |               (SELECT CAST(sum(cs) AS BIGINT) FROM cs) AS ns),
        |lp AS (SELECT tok.doc_id,
        |    CAST(ROUND(ln((COALESCE(ct.ct, 0) + 1.0)
        |      / (CAST(nt AS DOUBLE) + 1024.0)), 9) AS DECIMAL(18,9))
        |    - CAST(ROUND(ln((cs.cs + 1.0)
        |      / (CAST(ns AS DOUBLE) + 1024.0)), 9) AS DECIMAL(18,9)) AS lp
        |  FROM tok LEFT JOIN ct ON tok.f = ct.f
        |           JOIN cs ON tok.f = cs.f
        |           CROSS JOIN tot),
        |agg AS (SELECT doc_id, SUM(lp) AS sw, COUNT(*) AS n
        |        FROM lp GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  ROUND(CAST(sw AS DOUBLE) / n, 6) + 0.0 AS dsir_w
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_embed_covariance" ->
      """WITH idx AS (
        |  SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j
        |  FROM generate_series(1, 64) g1(i)
        |       CROSS JOIN generate_series(1, 64) g2(j)
        |  WHERE j >= i),
        |p AS (SELECT i, j,
        |    CAST(e.embedding[i] AS DOUBLE)
        |    * CAST(e.embedding[j] AS DOUBLE) AS p
        |  FROM embeddings e CROSS JOIN idx),
        |s AS (SELECT i, j, sum(p) AS sp, CAST(count(*) AS BIGINT) AS n
        |      FROM p GROUP BY i, j),
        |m AS (SELECT CAST(i AS INT) AS i,
        |        avg(CAST(e.embedding[i] AS DOUBLE)) AS m
        |      FROM embeddings e CROSS JOIN generate_series(1, 64) g(i)
        |      GROUP BY 1)
        |SELECT s.i, s.j, s.n,
        |  ROUND(s.sp / s.n - mi.m * mj.m, 6) + 0.0 AS cov
        |FROM s JOIN m mi ON s.i = mi.i JOIN m mj ON s.j = mj.i
        |ORDER BY s.i, s.j""".stripMargin,
  )
}
