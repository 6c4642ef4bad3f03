package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 sixth wave: two curation diagnostics —
  *
  *  - q_text_scriptmix: per-language character-class composition of
  *    the corpus (letter/digit/space/other shares, plus the
  *    has-digit and non-ASCII flags) — the script-mixing /
  *    confusable-injection screen a poisoning-aware ingest runs
  *    before any tokenizer sees the data. Char-class counts are
  *    length-diffs under regexp_replace (no per-char explode);
  *  - q_embed_cka: linear Centered-Kernel-Alignment between the
  *    FIRST 8 and LAST 8 embedding dimensions — "do the two halves of
  *    the representation encode the same geometry" (CKA ≈ 1 means
  *    redundant dims, ≈ 0 means independent subspaces), the
  *    representation-similarity diagnostic of the probing literature,
  *    computed from exact covariance blocks:
  *    CKA = ‖Cxy‖²_F / (‖Cxx‖_F · ‖Cyy‖_F).
  *
  * Determinism: per-doc shares and per-pair moment products are
  * rounded to a 9dp lattice before DECIMAL summation; the CKA block
  * norms sum 9dp-rounded squared covariances. Scale: scriptmix is one
  * map-only pass into a per-lang aggregate; CKA explodes only the 16
  * selected dims (16² pair terms per vector, map-side combined into a
  * 256-cell grid — never a vector×vector join). */
object Analytics88 {

  /** Character-class composition per language. */
  private def qTextScriptmix(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("lang"), col("text"), length(col("text")).as("n"))
      .withColumn("la",
        col("n") - length(regexp_replace(col("text"), "[A-Za-z]", "")))
      .withColumn("di",
        col("n") - length(regexp_replace(col("text"), "[0-9]", "")))
      .withColumn("ws",
        col("n") - length(regexp_replace(col("text"), "[ \\t]", "")))
      .withColumn("nonascii",
        when(length(regexp_replace(col("text"), "[\\x00-\\x7F]", "")) > 0,
          1L).otherwise(0L))
    def share(c: String): org.apache.spark.sql.Column =
      expr(s"""CASE WHEN n > 0 THEN CAST(ROUND(CAST($c AS DOUBLE)
              |  / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))
              |  ELSE CAST(0 AS DECIMAL(28,9)) END""".stripMargin)
    docs
      .select(col("lang"), col("nonascii"),
        when(col("di") > 0, 1L).otherwise(0L).as("hasdig"),
        share("la").as("sl"), share("di").as("sd"), share("ws").as("sw"),
        share("n - la - di - ws").as("so"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sl")).as("tl"),
        sum(col("sd")).as("td"), sum(col("sw")).as("tw"),
        sum(col("so")).as("to"), sum(col("hasdig")).as("nd"),
        sum(col("nonascii")).as("na"))
      .select(col("lang"), col("n_docs"),
        round(dbl(col("tl")) / dbl(col("n_docs")), 6).as("letter_share"),
        round(dbl(col("td")) / dbl(col("n_docs")), 6).as("digit_share"),
        round(dbl(col("tw")) / dbl(col("n_docs")), 6).as("space_share"),
        round(dbl(col("to")) / dbl(col("n_docs")), 6).as("other_share"),
        round(dbl(col("nd")) / dbl(col("n_docs")), 6).as("pct_with_digit"),
        round(dbl(col("na")) / dbl(col("n_docs")), 6).as("pct_nonascii"))
      .orderBy(col("lang"))
  }

  /** Linear CKA between embedding dims 1-8 and 57-64. */
  private def qEmbedCka(s: SparkSession, d: String): DataFrame = {
    val dims = (1 to 8) ++ (57 to 64)
    val emb = t(s, d, "embeddings")
    val vals = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("p0", "x")))
      .withColumn("i", col("p0") + 1)
      .filter(col("i").isin(dims.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("i"), dbl(col("x")).as("x"))
    val pairs = vals.select(col("vec_id"), col("i"), col("x"))
      .join(vals.select(col("vec_id"), col("i").as("j"),
        col("x").as("y")), Seq("vec_id"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(x * y, 9) AS DECIMAL(38,9))")).as("sxy"))
    val means = vals.groupBy(col("i"))
      .agg(sum(expr("CAST(ROUND(x, 9) AS DECIMAL(38,9))")).as("sx"))
    val cov = pairs
      .join(broadcast(means.select(col("i"), col("sx").as("si"))),
        Seq("i"))
      .join(broadcast(means.select(col("i").as("j"), col("sx").as("sj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        expr("""CAST(ROUND(CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
               |  - (CAST(si AS DOUBLE) / CAST(n AS DOUBLE))
               |    * (CAST(sj AS DOUBLE) / CAST(n AS DOUBLE)), 9)
               | AS DECIMAL(28,9))""".stripMargin).as("c"),
        max(col("n")).over().as("nn"))
    val inX = (c: String) => s"$c <= 8"
    val inY = (c: String) => s"$c >= 57"
    cov
      .select(col("nn").as("n_vectors"),
        expr(s"""CASE WHEN ${inX("i")} AND ${inY("j")} THEN
                |  CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 9)
                |    AS DECIMAL(28,9)) END""".stripMargin).as("txy"),
        expr(s"""CASE WHEN ${inX("i")} AND ${inX("j")} THEN
                |  CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 9)
                |    AS DECIMAL(28,9)) END""".stripMargin).as("txx"),
        expr(s"""CASE WHEN ${inY("i")} AND ${inY("j")} THEN
                |  CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 9)
                |    AS DECIMAL(28,9)) END""".stripMargin).as("tyy"))
      .groupBy(col("n_vectors"))
      .agg(sum(col("txy")).as("hxy"), sum(col("txx")).as("hxx"),
        sum(col("tyy")).as("hyy"))
      .select(col("n_vectors"),
        when(dbl(col("hxx")) > 0 && dbl(col("hyy")) > 0,
          round(dbl(col("hxy"))
            / sqrt(dbl(col("hxx")) * dbl(col("hyy"))), 6)).as("cka"),
        round(dbl(col("hxy")), 6).as("hsic_xy"),
        round(dbl(col("hxx")), 6).as("hsic_xx"),
        round(dbl(col("hyy")), 6).as("hsic_yy"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_scriptmix" -> (qTextScriptmix _),
    "q_embed_cka" -> (qEmbedCka _),
  )

  val sql: Map[String, String] = Map(
    "q_text_scriptmix" ->
      """WITH d AS (
        |  SELECT lang, CAST(len(text) AS BIGINT) AS n,
        |    CAST(len(text) - len(regexp_replace(text, '[A-Za-z]', '',
        |      'g')) AS BIGINT) AS la,
        |    CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS BIGINT) AS di,
        |    CAST(len(text) - len(regexp_replace(text, '[ \t]', '', 'g'))
        |      AS BIGINT) AS ws,
        |    CASE WHEN len(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
        |      > 0 THEN 1 ELSE 0 END AS nonascii
        |  FROM documents),
        |sh AS (
        |  SELECT lang, nonascii,
        |    CASE WHEN di > 0 THEN 1 ELSE 0 END AS hasdig,
        |    CASE WHEN n > 0 THEN CAST(ROUND(CAST(la AS DOUBLE)
        |      / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))
        |      ELSE CAST(0 AS DECIMAL(28,9)) END AS sl,
        |    CASE WHEN n > 0 THEN CAST(ROUND(CAST(di AS DOUBLE)
        |      / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))
        |      ELSE CAST(0 AS DECIMAL(28,9)) END AS sd,
        |    CASE WHEN n > 0 THEN CAST(ROUND(CAST(ws AS DOUBLE)
        |      / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))
        |      ELSE CAST(0 AS DECIMAL(28,9)) END AS sw,
        |    CASE WHEN n > 0 THEN CAST(ROUND(
        |      CAST(n - la - di - ws AS DOUBLE)
        |      / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))
        |      ELSE CAST(0 AS DECIMAL(28,9)) END AS so
        |  FROM d)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  ROUND(CAST(sum(sl) AS DOUBLE) / count(*), 6) AS letter_share,
        |  ROUND(CAST(sum(sd) AS DOUBLE) / count(*), 6) AS digit_share,
        |  ROUND(CAST(sum(sw) AS DOUBLE) / count(*), 6) AS space_share,
        |  ROUND(CAST(sum(so) AS DOUBLE) / count(*), 6) AS other_share,
        |  ROUND(CAST(sum(hasdig) AS DOUBLE) / count(*), 6)
        |    AS pct_with_digit,
        |  ROUND(CAST(sum(nonascii) AS DOUBLE) / count(*), 6)
        |    AS pct_nonascii
        |FROM sh GROUP BY lang ORDER BY lang""".stripMargin,
    "q_embed_cka" ->
      """WITH dims AS (
        |  SELECT CAST(i AS INT) AS i FROM generate_series(1, 8) g(i)
        |  UNION ALL
        |  SELECT CAST(i AS INT) FROM generate_series(57, 64) g(i)),
        |vals AS (
        |  SELECT e.vec_id, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS x
        |  FROM embeddings e CROSS JOIN dims d),
        |pairs AS (
        |  SELECT a.i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(a.x * b.x, 9) AS DECIMAL(38,9))) AS sxy
        |  FROM vals a JOIN vals b ON a.vec_id = b.vec_id
        |  GROUP BY a.i, b.i),
        |means AS (
        |  SELECT i, sum(CAST(ROUND(x, 9) AS DECIMAL(38,9))) AS sx
        |  FROM vals GROUP BY i),
        |cov AS (
        |  SELECT p.i, p.j,
        |    CAST(ROUND(CAST(p.sxy AS DOUBLE) / CAST(p.n AS DOUBLE)
        |      - (CAST(mi.sx AS DOUBLE) / CAST(p.n AS DOUBLE))
        |        * (CAST(mj.sx AS DOUBLE) / CAST(p.n AS DOUBLE)), 9)
        |      AS DECIMAL(28,9)) AS c,
        |    p.n
        |  FROM pairs p JOIN means mi ON p.i = mi.i
        |               JOIN means mj ON p.j = mj.i),
        |h AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n_vectors,
        |    sum(CASE WHEN i <= 8 AND j >= 57 THEN
        |      CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 9)
        |        AS DECIMAL(28,9)) END) AS hxy,
        |    sum(CASE WHEN i <= 8 AND j <= 8 THEN
        |      CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 9)
        |        AS DECIMAL(28,9)) END) AS hxx,
        |    sum(CASE WHEN i >= 57 AND j >= 57 THEN
        |      CAST(ROUND(CAST(c AS DOUBLE) * CAST(c AS DOUBLE), 9)
        |        AS DECIMAL(28,9)) END) AS hyy
        |  FROM cov)
        |SELECT n_vectors,
        |  CASE WHEN CAST(hxx AS DOUBLE) > 0 AND CAST(hyy AS DOUBLE) > 0
        |    THEN ROUND(CAST(hxy AS DOUBLE)
        |      / sqrt(CAST(hxx AS DOUBLE) * CAST(hyy AS DOUBLE)), 6) END
        |    AS cka,
        |  ROUND(CAST(hxy AS DOUBLE), 6) AS hsic_xy,
        |  ROUND(CAST(hxx AS DOUBLE), 6) AS hsic_xx,
        |  ROUND(CAST(hyy AS DOUBLE), 6) AS hsic_yy
        |FROM h""".stripMargin,
  )
}
