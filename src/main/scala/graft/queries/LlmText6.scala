package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 text/retrieval wave: winnowing document fingerprints (the
  * MOSS/local-fingerprinting selection rule), a Zipf rank-frequency slope
  * fit over the corpus vocabulary, and reciprocal-rank-fusion hybrid
  * retrieval (lexical BM25 list ⊕ dense cosine list) — the fingerprint /
  * corpus-health / hybrid-search primitives next to the LM scorers.
  *
  * Scale notes:
  *  - Winnowing is a pure per-row computation (k-gram hash chain, sliding
  *    window min, distinct) in higher-order expressions — NO shuffle
  *    before the final presentation sort; 100 TB of documents fingerprint
  *    map-only. The DuckDB oracle uses the exploded window-function form;
  *    the equivalence of the two shapes is the point of the check.
  *  - Zipf fits ln(freq) on ln(rank) over the TOP-500 terms: the vocab
  *    count table is the only shuffle, the top-500 cut is a distributed
  *    TakeOrderedAndProject, and the regression runs over 500 rows.
  *  - RRF re-uses the two bounded ranked lists (each a distributed top-50
  *    cut); the fusion join touches ≤100 rows. Ranks are assigned AFTER
  *    the top-k cut, so the row_number window never sees more than 50
  *    rows in one partition regardless of corpus size.
  *
  * Determinism: fingerprints are md5-derived integers (engine-portable);
  * Zipf logs are rounded to 9 dp and summed as DECIMAL (order-free); RRF
  * scores are two-term fixed-order double sums over integer ranks. */
object LlmText6 {

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03;
    * k = 5 char-grams, window w = 4): for every window of 4 consecutive
    * k-gram hashes keep the minimum (position breaks hash ties), then
    * report the distinct selected hashes per document — the guarantee is
    * any shared substring of ≥ k+w−1 = 8 chars shares a fingerprint.
    * Expected density of the selected set is 2/(w+1).
    *
    * The windowed min is 4 shifted copies of `enc` zipped with `least`,
    * NOT `transform(…, i -> array_min(slice(enc, i, 4)))`. The lambda
    * form references `enc` exactly once, so CollapseProject inlines the
    * O(L)-md5 `enc` expression INTO the lambda body — re-evaluating it
    * per window, O(L²) interpreted md5s per document (caught by the r14
    * sf0.1 materializing oracle run: 25 min single-task; invisible to
    * `.count()`-driven timing, which prunes the projection). The
    * 4-reference form is blocked from collapsing (non-cheap expr
    * referenced >1×), so `enc` evaluates once per row and the whole
    * fingerprint is O(L) again. zip_with pads the shorter shifted
    * copies with NULL and Spark's `least` ignores NULLs, so the final
    * slice(1, L−7) keeps exactly the full 4-wide windows. */
  private def qTextWinnowing(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(length(col("text")) >= 8)
      .withColumn("enc", expr(
        """transform(sequence(1, length(text) - 4), i ->
          |  CAST(conv(substring(md5(substring(text, i, 5)), 1, 6), 16, 10)
          |       AS BIGINT) * 10000000 + i)""".stripMargin))
      .withColumn("fps", expr(
        """array_distinct(transform(
          |  slice(
          |    zip_with(
          |      zip_with(enc, slice(enc, 2, length(text)),
          |        (a, b) -> least(a, b)),
          |      zip_with(slice(enc, 3, length(text)),
          |        slice(enc, 4, length(text)), (a, b) -> least(a, b)),
          |      (a, b) -> least(a, b)),
          |    1, length(text) - 7),
          |  x -> x div 10000000))""".stripMargin))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        expr("aggregate(fps, 0L, (a, x) -> a + x)").as("fp_checksum"),
        expr("""ROUND(CAST(size(fps) AS DOUBLE)
               | / CAST(length(text) - 7 AS DOUBLE), 6)""".stripMargin)
          .as("density"))
      .orderBy(col("doc_id"))

  /** Zipf rank-frequency fit: OLS slope/intercept of ln(freq) on
    * ln(rank) over the top-500 vocabulary terms — the classic corpus
    * health check (natural text ≈ slope −1; synthetic/templated corpora
    * drift toward 0). Logs are 9-dp-rounded DECIMALs so the moment sums
    * are order-independent; the finish mirrors q_agg_ols. */
  private def qTextZipf(s: SparkSession, d: String): DataFrame = {
    val freq = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("w")).limit(500)
    val ranked = freq
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("cnt"), col("w"))).cast("long"))
      .withColumn("x", expr(
        "CAST(ROUND(ln(CAST(rn AS DOUBLE)), 9) AS DECIMAL(12,9))"))
      .withColumn("y", expr(
        "CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9))"))
    val cov = """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))""".stripMargin
    val varx = """(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))""".stripMargin
    ranked
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .selectExpr("n AS n_terms",
        s"ROUND($cov / $varx, 6) AS slope",
        s"""ROUND((CAST(sy AS DOUBLE) - $cov / $varx
           |  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
           |AS intercept""".stripMargin)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09;
    * K = 60) of a lexical and a dense ranked list — the standard hybrid
    * search merge. List 1: BM25 top-50 for the fixed query terms
    * (q_text_bm25's scorer). List 2: cosine top-50 to probe vector 0
    * over the embeddings joined to documents by id. Score =
    * Σ 1/(60+rank) over the lists containing the doc. */
  private def qSimFuse(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // --- lexical list: BM25 (same scorer discipline as q_text_bm25) ---
    val terms = Seq("join", "vector", "scan")
    val base = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val withTf = terms.zipWithIndex.foldLeft(
      base.withColumn("dl", size(col("ws")))) { case (df, (term, i)) =>
      df.withColumn(s"tf$i", expr(s"size(filter(ws, x -> x = '$term'))"))
    }.drop("ws")
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"),
      sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"))
    def contrib(i: Int): String =
      s"""CASE WHEN tf$i > 0 THEN
         |  ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
         |           / (CAST(df$i AS DOUBLE) + 0.5))
         |  * (CAST(tf$i AS DOUBLE) * 2.2)
         |  / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
         |      * CAST(dl AS DOUBLE)
         |      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         |ELSE 0.0 END""".stripMargin
    val lex = withTf.crossJoin(broadcast(stats))
      .withColumn("score",
        expr(s"ROUND((${contrib(0)} + ${contrib(1)}) + ${contrib(2)}, 6)"))
      .filter(col("score") > 0.0)
      .select(col("doc_id"), col("score"))
      .orderBy(desc("score"), col("doc_id")).limit(50)
      .withColumn("r1", row_number().over(
        Window.orderBy(desc("score"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r1"))
    // --- dense list: cosine to probe vector 0 (6-dp pre-round rank) ---
    val e = t(s, d, "embeddings")
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q"))
    val dense = e.crossJoin(broadcast(probe))
      .withColumn("sim", expr(
        """ROUND(float_dot(embedding, q)
          | / (sqrt(float_dot(embedding, embedding))
          |    * sqrt(float_dot(q, q))), 6)""".stripMargin))
      .select(col("vec_id").as("doc_id"), col("sim"))
      .orderBy(desc("sim"), col("doc_id")).limit(50)
      .withColumn("r2", row_number().over(
        Window.orderBy(desc("sim"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("r2"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("r1"), lit(0L)).as("lex_rank"),
        coalesce(col("r2"), lit(0L)).as("dense_rank"),
        expr("""ROUND(COALESCE(1.0 / (60.0 + CAST(r1 AS DOUBLE)), 0.0)
               |  + COALESCE(1.0 / (60.0 + CAST(r2 AS DOUBLE)), 0.0), 6)"""
          .stripMargin).as("rrf"))
      .orderBy(desc("rrf"), col("doc_id")).limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_winnowing" -> (qTextWinnowing _),
    "q_text_zipf" -> (qTextZipf _),
    "q_sim_fuse" -> (qSimFuse _),
  )

  val sql: Map[String, String] = Map(
    "q_text_winnowing" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS L
        |           FROM documents WHERE length(text) >= 8),
        |g AS (SELECT doc_id, L, text,
        |        unnest(range(1, L - 3)) AS i FROM d),
        |e AS (SELECT doc_id, L, i,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(
        |      string_split(substr(md5(substr(text, CAST(i AS INT), 5)),
        |                          1, 6), ''),
        |      c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |    (h, x) -> h * 16 + x) * 10000000 + i AS enc
        |  FROM g),
        |w AS (SELECT doc_id, L, i,
        |        min(enc) OVER (PARTITION BY doc_id ORDER BY i
        |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
        |      FROM e),
        |fps AS (SELECT DISTINCT doc_id, L, sel // 10000000 AS fp
        |        FROM w WHERE i <= L - 7)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_fp,
        |  CAST(sum(fp) AS BIGINT) AS fp_checksum,
        |  ROUND(CAST(count(*) AS DOUBLE) / CAST(L - 7 AS DOUBLE), 6)
        |    AS density
        |FROM fps GROUP BY doc_id, L ORDER BY doc_id""".stripMargin,
    "q_text_zipf" ->
      """WITH freq AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents) z
        |  WHERE w <> '' GROUP BY w
        |  ORDER BY cnt DESC, w LIMIT 500),
        |ranked AS (
        |  SELECT cnt,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS rn
        |  FROM freq),
        |t2 AS (SELECT
        |    CAST(ROUND(ln(CAST(rn AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
        |    CAST(ROUND(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
        |  FROM ranked),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |        sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |      FROM t2)
        |SELECT n AS n_terms,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
        |  ROUND((CAST(sy AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
        |FROM m""".stripMargin,
    "q_sim_fuse" ->
      """WITH d2 AS (
        |  SELECT doc_id, len(ws) AS dl,
        |    len(list_filter(ws, x -> x = 'join')) AS tf0,
        |    len(list_filter(ws, x -> x = 'vector')) AS tf1,
        |    len(list_filter(ws, x -> x = 'scan')) AS tf2
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents)),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS sum_dl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM d2),
        |sc AS (
        |  SELECT doc_id, ROUND(
        |    (CASE WHEN tf0 > 0 THEN
        |       ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
        |                / (CAST(df0 AS DOUBLE) + 0.5))
        |       * (CAST(tf0 AS DOUBLE) * 2.2)
        |       / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75
        |           * CAST(dl AS DOUBLE)
        |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |     ELSE 0.0 END
        |     + CASE WHEN tf1 > 0 THEN
        |       ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
        |                / (CAST(df1 AS DOUBLE) + 0.5))
        |       * (CAST(tf1 AS DOUBLE) * 2.2)
        |       / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75
        |           * CAST(dl AS DOUBLE)
        |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |     ELSE 0.0 END)
        |     + CASE WHEN tf2 > 0 THEN
        |       ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
        |                / (CAST(df2 AS DOUBLE) + 0.5))
        |       * (CAST(tf2 AS DOUBLE) * 2.2)
        |       / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75
        |           * CAST(dl AS DOUBLE)
        |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |     ELSE 0.0 END, 6) AS score
        |  FROM d2 CROSS JOIN st),
        |lex AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
        |      AS BIGINT) AS r1
        |  FROM sc WHERE score > 0.0
        |  ORDER BY score DESC, doc_id LIMIT 50),
        |probe AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |z AS (SELECT e.vec_id,
        |        CAST(unnest(probe.q) AS DOUBLE) AS px,
        |        CAST(unnest(e.embedding) AS DOUBLE) AS ex
        |      FROM probe CROSS JOIN embeddings e),
        |dots AS (SELECT vec_id, SUM(px*ex) AS dp, SUM(px*px) AS p2,
        |                SUM(ex*ex) AS n2
        |         FROM z GROUP BY 1),
        |sims AS (SELECT vec_id AS doc_id,
        |           ROUND(dp / (sqrt(p2) * sqrt(n2)), 6) AS sim FROM dots),
        |dense AS (
        |  SELECT doc_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id)
        |      AS BIGINT) AS r2
        |  FROM sims ORDER BY sim DESC, doc_id LIMIT 50),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
        |    COALESCE(r1, 0) AS lex_rank, COALESCE(r2, 0) AS dense_rank,
        |    ROUND(COALESCE(1.0 / (60.0 + CAST(r1 AS DOUBLE)), 0.0)
        |      + COALESCE(1.0 / (60.0 + CAST(r2 AS DOUBLE)), 0.0), 6)
        |      AS rrf
        |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
        |SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
        |  CAST(dense_rank AS BIGINT) AS dense_rank, rrf
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
  )
}
