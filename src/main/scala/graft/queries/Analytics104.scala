package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 second wave: two cascade-model ranking metrics the
  * retrieval-evaluation family (Analytics84) lacked, the
  * moving-average lexical-diversity measure beside TTR/Herdan, and
  * the hubness diagnostic over the kNN graph — four oracled
  * operators:
  *
  *  - q_win_err: Expected Reciprocal Rank@10 (Chapelle et al.,
  *    CIKM'09) per order priority on q_agg_ndcg's graded setup —
  *    the cascade model: ERR = Σᵣ (1/r)·Rᵣ·Π_{i<r}(1−Rᵢ),
  *    R = (2^rel−1)/16. Because rel ∈ {0..3}, every cascade prefix
  *    product is the exact rational 15^a·13^b·9^c / 16^(a+b+c) of
  *    BOUNDED integer powers — both engines divide the same exact
  *    integers, no pow()-chain drift.
  *  - q_win_rbp: Rank-Biased Precision@10 (Moffat & Zobel, TOIS'08;
  *    p = 0.8) — the user-persistence metric: RBP = (1−p)·Σ p^{r−1}
  *    rel_r, again on exact rationals 8^{r−1}/10^{r−1}.
  *  - q_text_mattr: Moving-Average TTR (Covington & McFall, JQL'10;
  *    window 25) — the length-invariant lexical diversity score TTR
  *    cannot give. Computed WITHOUT materializing windows: token
  *    occurrence j is distinct-in-window for starts i ∈
  *    (prev_occurrence(j), j] ∩ [j−W+1, j] ∩ [1, L−W+1], so
  *    Σ_windows distinct(i) = Σ_j clamp-range-length — ONE lag
  *    window over (doc, token), map arithmetic after; exact integer
  *    sums, O(L) per doc instead of O(L·W).
  *  - q_embed_hubness: hubness of the k=3 cosine kNN graph
  *    (Radovanović et al., JMLR'10) — skewness of the in-degree
  *    (k-occurrence) distribution plus antihub share, the
  *    high-dimensionality pathology check for an embedding space;
  *    rides LlmSim6.knnEdges (the q_embed_knngraph machinery) over
  *    the 512-cap md5 sample.
  *
  * Determinism: every per-rank term is an exact integer ratio taken
  * to DOUBLE once, rounded to a 12dp lattice, and summed in DECIMAL;
  * MATTR is pure integer arithmetic until one final division;
  * hubness moments are exact integers (in-degree ≤ 511). Scale: the
  * ranking metrics are one order-partitioned window pass + a grouped
  * mean (the Analytics84 shape); mattr is one (doc, token)-keyed lag
  * shuffle, linear in tokens; hubness is the knnEdges broadcast pair
  * join capped at 512². */
object Analytics104 {

  /** exact small-integer power via pow + snap-round (values ≤ 16¹⁰ are
    * exactly representable; ROUND absorbs any sub-ulp libm noise). */
  private def ipow(base: Int, e: String): String =
    s"CAST(ROUND(pow(CAST($base AS DOUBLE), CAST($e AS DOUBLE)), 0)" +
      " AS BIGINT)"

  private def qWinErr(s: SparkSession, d: String): DataFrame = {
    val base = Analytics84.ranked(s, d)
      .withColumn("rel", expr("CAST(l_quantity AS BIGINT) % 4"))
      .filter(col("pos") <= 10)
    val wPrev = Window.partitionBy(col("l_orderkey")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // cascade prefix: counts of grades 1/2/3 among EARLIER ranks →
    // Π(1−Rᵢ) = 15^a·13^b·9^c / 16^(a+b+c), exact integers ≤ 16⁹
    val terms = base
      .withColumn("a", coalesce(sum(when(col("rel") === 1, 1L)
        .otherwise(0L)).over(wPrev), lit(0L)))
      .withColumn("b", coalesce(sum(when(col("rel") === 2, 1L)
        .otherwise(0L)).over(wPrev), lit(0L)))
      .withColumn("c", coalesce(sum(when(col("rel") === 3, 1L)
        .otherwise(0L)).over(wPrev), lit(0L)))
      .select(col("l_orderkey"),
        expr(s"""CAST(ROUND(CAST(${ipow(15, "a")} * ${ipow(13, "b")}
                |    * ${ipow(9, "c")}
                |    * (${ipow(2, "rel")} - 1L) AS DOUBLE)
                |  / CAST(${ipow(16, "a + b + c + 1")} * pos AS DOUBLE),
                |  12) AS DECIMAL(18,12))""".stripMargin).as("term"))
    val perq = terms.groupBy(col("l_orderkey"))
      .agg(sum(col("term")).as("errq"))
    Analytics84.withPriority(perq, s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_queries"), sum(col("errq")).as("se"))
      .select(col("o_orderpriority"), col("n_queries"),
        round(dbl(col("se")) / dbl(col("n_queries")), 6).as("err10"))
      .orderBy(col("o_orderpriority"))
  }

  private def qWinRbp(s: SparkSession, d: String): DataFrame = {
    val base = Analytics84.ranked(s, d)
      .withColumn("relbin",
        when(expr("CAST(l_quantity AS BIGINT) % 4") >= 2, 1L)
          .otherwise(0L))
      .filter(col("pos") <= 10)
    // (1−p)·p^{r−1} = 2·8^{r−1} / 10^r, exact integers ≤ 10¹⁰
    val perq = base
      .select(col("l_orderkey"),
        expr(s"""CAST(ROUND(CAST(2L * ${ipow(8, "pos - 1L")} * relbin
                |    AS DOUBLE) / CAST(${ipow(10, "pos")} AS DOUBLE),
                |  12) AS DECIMAL(18,12))""".stripMargin).as("term"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("term")).as("rbpq"))
    Analytics84.withPriority(perq, s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_queries"), sum(col("rbpq")).as("sr"))
      .select(col("o_orderpriority"), col("n_queries"),
        round(dbl(col("sr")) / dbl(col("n_queries")), 6).as("rbp10"))
      .orderBy(col("o_orderpriority"))
  }

  private val W = 25 // MATTR window (tokens)

  private def qTextMattr(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("j", "w")))
      .select(col("doc_id"), (col("j") + 1).cast("long").as("p"),
        col("w"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val wTok = Window.partitionBy(col("doc_id"), col("w"))
      .orderBy(col("p"))
    toks
      .withColumn("len", count(lit(1)).over(wDoc))
      .withColumn("prev", coalesce(lag(col("p"), 1).over(wTok), lit(0L)))
      .filter(col("len") >= W)
      // occurrence p is the window-distinct representative for starts
      // i ∈ [max(prev+1, p−W+1, 1), min(p, len−W+1)]
      .select(col("doc_id"), col("len"),
        greatest(lit(0L),
          least(col("p"), col("len") - W + 1)
            - greatest(col("prev") + 1, col("p") - W + 1, lit(1L))
            + 1).as("contrib"))
      .groupBy(col("doc_id"))
      .agg(max(col("len")).as("n_tokens"), sum(col("contrib")).as("sc"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - W + 1).as("n_windows"),
        round(dbl(col("sc"))
          / (lit(W.toDouble) * dbl(col("n_tokens") - W + 1)), 6)
          .as("mattr"))
      .orderBy(col("doc_id"))
  }

  private def qEmbedHubness(s: SparkSession, d: String): DataFrame = {
    val knn = LlmSim6.knnEdges(s, d).localCheckpoint(true)
    val nodes = knn.select(col("a")).distinct()
    val indeg = nodes
      .join(knn.groupBy(col("b")).agg(count(lit(1)).as("din")),
        col("a") === col("b"), "left")
      .select(col("a"), coalesce(col("din"), lit(0L)).as("din"))
    indeg.agg(count(lit(1)).as("n"), sum(col("din")).as("sd"),
        sum(col("din") * col("din")).as("sd2"),
        sum(col("din") * col("din") * col("din")).as("sd3"),
        max(col("din")).as("max_in"),
        sum(when(col("din") === 0, 1L).otherwise(0L)).as("n_antihubs"))
      .select(col("n").as("n_nodes"), col("max_in"), col("n_antihubs"),
        round(dbl(col("sd")) / dbl(col("n")), 6).as("mean_in"),
        expr("""CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)
               | - (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               |   * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))"""
          .stripMargin).as("m2"),
        expr("""CAST(sd3 AS DOUBLE) / CAST(n AS DOUBLE)
               | - 3.0 * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               |   * CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)
               | + 2.0 * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               |   * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
               |   * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))"""
          .stripMargin).as("m3"))
      .select(col("n_nodes"), col("max_in"), col("n_antihubs"),
        col("mean_in"),
        when(col("m2") > 0,
          round(col("m3") / (col("m2") * sqrt(col("m2"))), 6)).as("skew_k"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_err" -> (qWinErr _),
    "q_win_rbp" -> (qWinRbp _),
    "q_text_mattr" -> (qTextMattr _),
    "q_embed_hubness" -> (qEmbedHubness _),
  )

  private val rankedSql =
    """WITH ranked AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |    CAST(row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT)
      |      AS pos
      |  FROM lineitem),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_win_err" -> (rankedSql +
      """base AS (
        |  SELECT l_orderkey, pos, CAST(l_quantity AS BIGINT) % 4 AS rel
        |  FROM ranked WHERE pos <= 10),
        |casc AS (
        |  SELECT l_orderkey, pos, rel,
        |    coalesce(sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END)
        |      OVER w, 0) AS a,
        |    coalesce(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END)
        |      OVER w, 0) AS b,
        |    coalesce(sum(CASE WHEN rel = 3 THEN 1 ELSE 0 END)
        |      OVER w, 0) AS c
        |  FROM base
        |  WINDOW w AS (PARTITION BY l_orderkey ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |terms AS (
        |  SELECT l_orderkey,
        |    CAST(ROUND(CAST(
        |        CAST(ROUND(pow(15.0, CAST(a AS DOUBLE)), 0) AS BIGINT)
        |      * CAST(ROUND(pow(13.0, CAST(b AS DOUBLE)), 0) AS BIGINT)
        |      * CAST(ROUND(pow(9.0, CAST(c AS DOUBLE)), 0) AS BIGINT)
        |      * (CAST(ROUND(pow(2.0, CAST(rel AS DOUBLE)), 0) AS BIGINT)
        |        - 1) AS DOUBLE)
        |      / CAST(CAST(ROUND(pow(16.0, CAST(a + b + c + 1 AS DOUBLE)),
        |          0) AS BIGINT) * pos AS DOUBLE), 12)
        |      AS DECIMAL(18,12)) AS term
        |  FROM casc),
        |perq AS (
        |  SELECT l_orderkey, sum(term) AS errq FROM terms GROUP BY 1)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_queries,
        |  ROUND(CAST(sum(errq) AS DOUBLE) / count(*), 6) AS err10
        |FROM perq JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_win_rbp" -> (rankedSql +
      """terms AS (
        |  SELECT l_orderkey,
        |    CAST(ROUND(CAST(2
        |      * CAST(ROUND(pow(8.0, CAST(pos - 1 AS DOUBLE)), 0)
        |        AS BIGINT)
        |      * (CASE WHEN CAST(l_quantity AS BIGINT) % 4 >= 2
        |         THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(CAST(ROUND(pow(10.0, CAST(pos AS DOUBLE)), 0)
        |        AS BIGINT) AS DOUBLE), 12) AS DECIMAL(18,12)) AS term
        |  FROM ranked WHERE pos <= 10),
        |perq AS (
        |  SELECT l_orderkey, sum(term) AS rbpq FROM terms GROUP BY 1)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_queries,
        |  ROUND(CAST(sum(rbpq) AS DOUBLE) / count(*), 6) AS rbp10
        |FROM perq JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "q_text_mattr" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(generate_subscripts(string_split(text, ' '), 1)
         |      AS BIGINT) AS p,
         |    unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |lagd AS (
         |  SELECT doc_id, p, w,
         |    CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS len,
         |    coalesce(lag(p, 1) OVER (PARTITION BY doc_id, w
         |      ORDER BY p), 0) AS prev
         |  FROM toks),
         |contrib AS (
         |  SELECT doc_id, len,
         |    greatest(0, least(p, len - $W + 1)
         |      - greatest(prev + 1, p - $W + 1, 1) + 1) AS contrib
         |  FROM lagd WHERE len >= $W)
         |SELECT doc_id, max(len) AS n_tokens,
         |  max(len) - $W + 1 AS n_windows,
         |  ROUND(CAST(sum(contrib) AS DOUBLE)
         |    / ($W.0 * CAST(max(len) - $W + 1 AS DOUBLE)), 6) AS mattr
         |FROM contrib GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    // knn CTEs mirror q_embed_knngraph's oracle (same 512-cap sample,
    // same element-aligned double dot products)
    "q_embed_hubness" ->
      """WITH base AS (
        |  SELECT vec_id, label, embedding FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 512),
        |norms AS (
        |  SELECT vec_id, SUM(x * x) AS n2 FROM (
        |    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        |    FROM base) z GROUP BY vec_id),
        |z AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |    CAST(unnest(a.embedding) AS DOUBLE) AS px,
        |    CAST(unnest(b.embedding) AS DOUBLE) AS ex
        |  FROM base a JOIN base b ON a.vec_id <> b.vec_id),
        |dots AS (
        |  SELECT a, b, SUM(px * ex) AS dp FROM z GROUP BY 1, 2),
        |sims AS (
        |  SELECT a, b,
        |    ROUND(dp / (sqrt(na.n2) * sqrt(nb.n2)), 6) AS sim
        |  FROM dots JOIN norms na ON na.vec_id = dots.a
        |  JOIN norms nb ON nb.vec_id = dots.b),
        |knn AS (
        |  SELECT a, b,
        |    row_number() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
        |  FROM sims QUALIFY rn <= 3),
        |nodes AS (SELECT DISTINCT a FROM knn),
        |indeg AS (
        |  SELECT nodes.a, CAST(coalesce(d.din, 0) AS BIGINT) AS din
        |  FROM nodes LEFT JOIN (
        |    SELECT b, count(*) AS din FROM knn GROUP BY b) d
        |    ON d.b = nodes.a),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(din) AS sd,
        |    sum(din * din) AS sd2, sum(din * din * din) AS sd3,
        |    max(din) AS max_in,
        |    CAST(sum(CASE WHEN din = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_antihubs
        |  FROM indeg),
        |c AS (
        |  SELECT n AS n_nodes, max_in, n_antihubs,
        |    ROUND(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_in,
        |    CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) AS m2,
        |    CAST(sd3 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 3.0 * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
        |        * CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      + 2.0 * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)) AS m3
        |  FROM mom)
        |SELECT n_nodes, max_in, n_antihubs, mean_in,
        |  CASE WHEN m2 > 0 THEN ROUND(m3 / (m2 * sqrt(m2)), 6) END AS skew_k
        |FROM c""".stripMargin,
  )
}
