package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 tenth wave: TextRank keyword extraction (PageRank over the
  * word co-occurrence graph), a deterministic count-min sketch with its
  * exact-count error report, and a trained-and-evaluated multinomial
  * naive-Bayes language classifier — the classical text-mining trio on
  * top of the corpus.
  *
  * Scale notes:
  *  - TextRank's graph is VOCAB-bounded (distinct co-occurring word
  *    pairs with support ≥ 3), not corpus-bounded: the raw token stream
  *    collapses to the weighted edge list in one shuffle, and the two
  *    rank rounds shuffle only node-sized tables (the PageRank
  *    floor-scaled-BIGINT message discipline, weighted by cn/wdeg).
  *  - The count-min sketch is 4×32 = 128 exact-BIGINT cells — mergeable
  *    map-side partials by construction (this is WHY CM sketches work
  *    on streams); the md5-derived bucket functions make build and
  *    probe portable across engines with zero shared state.
  *  - Naive Bayes trains on the 64-bucket hashed feature space (fixed
  *    vocabulary by construction, like q_text_hashtf), so the model is
  *    a ≤ langs×64-row broadcast grid; scoring is one pass over holdout
  *    token counts. Per-term ln rounds to 9 dp → DECIMAL sums → exact
  *    argmax (tie → smallest lang), so train AND predict are
  *    engine-portable with no floating accumulation anywhere. */
object LlmText8 {

  /** Word-pair edges (support ≥ 3) from adjacent tokens. */
  private def wordEdges(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("ws"), explode(expr("sequence(1, size(ws) - 1)")).as("i"))
      .select(expr("element_at(ws, i)").as("a"),
        expr("element_at(ws, CAST(i + 1 AS INT))").as("b"))
      .filter(col("a") =!= col("b") && col("a") =!= "" && col("b") =!= "")
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= 3)
  }

  /** TextRank keywords: 2 weighted PageRank rounds (d = 0.85) over the
    * co-occurrence graph, messages floor-scaled to BIGINTs so the
    * per-node sum is exact and engine-order-free. Top-30 words. */
  private def qTextTextrank(s: SparkSession, d: String): DataFrame = {
    val e0 = wordEdges(s, d)
    val sym = e0.select(col("u"), col("v"), col("cn"))
      .union(e0.select(col("v").as("u"), col("u").as("v"), col("cn")))
      .repartition(col("u")).persist()
    val wdeg = sym.groupBy(col("u")).agg(sum(col("cn")).as("wdeg"))
    val nn = wdeg.agg(count(lit(1)).as("nn"))
    var r = wdeg.crossJoin(broadcast(nn))
      .select(col("u"),
        expr("CAST(1 AS DOUBLE) / CAST(nn AS DOUBLE)").as("r"),
        col("wdeg"), col("nn"))
    for (_ <- 1 to 2) {
      val contrib = sym.join(r, "u")
        .select(col("v").as("u"), expr(
          """CAST(floor(r * 1000000000000000.0 * CAST(cn AS DOUBLE)
            |  / CAST(wdeg AS DOUBLE)) AS BIGINT)""".stripMargin).as("c"))
      val sums = contrib.groupBy(col("u")).agg(sum(col("c")).as("s"))
      r = sums.join(r.select(col("u"), col("wdeg"), col("nn")), "u")
        .select(col("u"), expr(
          """CAST(0.15 AS DOUBLE) / CAST(nn AS DOUBLE)
            |+ CAST(0.85 AS DOUBLE)
            |  * (CAST(s AS DOUBLE) / 1000000000000000.0)""".stripMargin)
          .as("r"), col("wdeg"), col("nn"))
        .localCheckpoint(true)
    }
    sym.unpersist()
    r.select(col("u").as("word"), round(col("r"), 12).as("rank"))
      .orderBy(desc("rank"), col("word")).limit(30)
  }

  /** Count-min sketch (d = 4 rows × w = 32 buckets, md5-derived hash
    * family) over the token stream, probed for the top-10 exact-count
    * tokens: estimate = min over rows of the bucket cell; the report
    * carries the sketch's overcount against ground truth. */
  private def qAggCountmin(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    def bucket(rCol: String): String =
      s"""CAST(CAST(conv(substring(md5(concat('cm',
         |  CAST($rCol AS STRING), '_', w)), 1, 4), 16, 10) AS BIGINT)
         |  % 32 AS BIGINT)""".stripMargin
    // Sketch cells from the vocab count table (weights, not re-scans).
    val cells = vocab
      .select(col("w"), col("c"), explode(expr("sequence(0, 3)")).as("r"))
      .select(col("r"), expr(bucket("r")).as("bkt"), col("c"))
      .groupBy(col("r"), col("bkt")).agg(sum(col("c")).as("cell"))
    val top10 = vocab
      .orderBy(desc("c"), col("w")).limit(10)
      .select(col("w"), col("c"), explode(expr("sequence(0, 3)")).as("r"))
      .select(col("w"), col("c"), col("r"), expr(bucket("r")).as("bkt"))
    top10.join(broadcast(cells), Seq("r", "bkt"))
      .groupBy(col("w"), col("c"))
      .agg(min(col("cell")).as("cm_est"))
      .select(col("w").as("token"), col("c").as("exact_c"),
        col("cm_est"), (col("cm_est") - col("c")).as("overcount"))
      .orderBy(desc("exact_c"), col("token"))
  }

  /** Multinomial naive Bayes over the 64-bucket hashed feature space:
    * train on the 75% content-fingerprint split (q_split_holdout's
    * rule), Laplace-smoothed per-class bucket log-probs, predict the
    * holdout, report the (actual, predicted) confusion matrix. */
  private def qTextNaivebayes(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("ck",
        md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("split",
        when(substring(col("ck"), 1, 1) <= "b", "train")
          .otherwise("holdout"))
    val tok = docs
      .select(col("doc_id"), col("lang"), col("split"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("bkt", expr(
        "CAST(CAST(conv(substring(md5(w), 1, 6), 16, 10) AS BIGINT) % 64" +
          " AS BIGINT)"))
    val trainCnt = tok.filter(col("split") === "train")
      .groupBy(col("lang"), col("bkt")).agg(count(lit(1)).as("cnt"))
    val trainTot = trainCnt.groupBy(col("lang"))
      .agg(sum(col("cnt")).as("tot"))
    // Full langs×64 grid (fixed feature space): absent cells smooth to
    // ln(1 / (tot + 64)).
    val grid = trainTot
      .select(col("lang"), col("tot"),
        explode(expr("sequence(0, 63)")).as("bkt"))
      .join(trainCnt, Seq("lang", "bkt"), "left")
      .select(col("lang"), col("bkt"), col("tot"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val priors = docs.filter(col("split") === "train")
      .groupBy(col("lang")).agg(count(lit(1)).as("nd"))
    val ndTot = priors.agg(sum(col("nd")).as("ndt"))
    val priorTerm = priors.crossJoin(broadcast(ndTot))
      .select(col("lang"), expr(
        """CAST(ROUND(ln(CAST(nd AS DOUBLE) / CAST(ndt AS DOUBLE)), 9)
          |  AS DECIMAL(18,9))""".stripMargin).as("pri"))
    val tf = tok.filter(col("split") === "holdout")
      .groupBy(col("doc_id"), col("lang"), col("bkt"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .join(broadcast(grid.withColumnRenamed("lang", "cand")),
        Seq("bkt"))
      .withColumn("term", expr(
        """CAST(ROUND(CAST(tf AS DOUBLE)
          |  * ln((CAST(cnt AS DOUBLE) + 1.0)
          |        / (CAST(tot AS DOUBLE) + 64.0)), 9)
          |  AS DECIMAL(18,9))""".stripMargin))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum(col("term")).as("lik"))
      .join(broadcast(priorTerm.withColumnRenamed("lang", "cand")),
        Seq("cand"))
      .withColumn("score",
        col("lik") + col("pri").cast("decimal(28,9)"))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(desc("score"), col("cand"))
    scored.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1)
      .groupBy(col("lang").as("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_textrank" -> (qTextTextrank _),
    "q_agg_countmin" -> (qAggCountmin _),
    "q_text_naivebayes" -> (qTextNaivebayes _),
  )

  val sql: Map[String, String] = Map(
    "q_text_textrank" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS ws FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |idx AS (SELECT ws, unnest(range(1, len(ws))) AS i FROM tok),
        |pr AS (SELECT ws[i] AS a, ws[i + 1] AS b FROM idx
        |       WHERE ws[i] <> ws[i + 1] AND ws[i] <> ''
        |         AND ws[i + 1] <> ''),
        |e0 AS (SELECT least(a, b) AS u, greatest(a, b) AS v,
        |         CAST(count(*) AS BIGINT) AS cn
        |       FROM pr GROUP BY 1, 2 HAVING count(*) >= 3),
        |sym AS (SELECT u, v, cn FROM e0
        |        UNION ALL SELECT v, u, cn FROM e0),
        |wdeg AS (SELECT u, CAST(sum(cn) AS BIGINT) AS wdeg
        |         FROM sym GROUP BY u),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM wdeg),
        |r0 AS (SELECT u, CAST(1 AS DOUBLE) / CAST(nn AS DOUBLE) AS r,
        |         wdeg, nn FROM wdeg, nn),
        |c1 AS (SELECT sym.v AS u,
        |         CAST(floor(r0.r * 1000000000000000.0
        |           * CAST(sym.cn AS DOUBLE)
        |           / CAST(r0.wdeg AS DOUBLE)) AS BIGINT) AS c
        |       FROM sym JOIN r0 ON sym.u = r0.u),
        |s1 AS (SELECT u, CAST(sum(c) AS BIGINT) AS s FROM c1 GROUP BY u),
        |r1 AS (SELECT d.u, CAST(0.15 AS DOUBLE) / CAST(d.nn AS DOUBLE)
        |         + CAST(0.85 AS DOUBLE)
        |           * (CAST(s.s AS DOUBLE) / 1000000000000000.0) AS r,
        |         d.wdeg, d.nn
        |       FROM s1 s JOIN r0 d ON s.u = d.u),
        |c2 AS (SELECT sym.v AS u,
        |         CAST(floor(r1.r * 1000000000000000.0
        |           * CAST(sym.cn AS DOUBLE)
        |           / CAST(r1.wdeg AS DOUBLE)) AS BIGINT) AS c
        |       FROM sym JOIN r1 ON sym.u = r1.u),
        |s2 AS (SELECT u, CAST(sum(c) AS BIGINT) AS s FROM c2 GROUP BY u),
        |r2 AS (SELECT d.u, CAST(0.15 AS DOUBLE) / CAST(d.nn AS DOUBLE)
        |         + CAST(0.85 AS DOUBLE)
        |           * (CAST(s.s AS DOUBLE) / 1000000000000000.0) AS r
        |       FROM s2 s JOIN r1 d ON s.u = d.u)
        |SELECT u AS word, round(r, 12) AS rank
        |FROM r2 ORDER BY rank DESC, word LIMIT 30""".stripMargin,
    "q_agg_countmin" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |          FROM tok WHERE w <> '' GROUP BY w),
        |hashed AS (
        |  SELECT w, c, r,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |          substr(md5('cm' || r || '_' || w), 1, 4), ''),
        |        ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 32 AS bkt
        |  FROM vocab, (SELECT unnest(range(0, 4)) AS r) rows4),
        |cells AS (SELECT r, bkt, CAST(sum(c) AS BIGINT) AS cell
        |          FROM hashed GROUP BY r, bkt),
        |top10 AS (SELECT w, c FROM vocab ORDER BY c DESC, w LIMIT 10)
        |SELECT h.w AS token, h.c AS exact_c,
        |  CAST(min(cells.cell) AS BIGINT) AS cm_est,
        |  CAST(min(cells.cell) - h.c AS BIGINT) AS overcount
        |FROM hashed h
        |JOIN top10 ON h.w = top10.w
        |JOIN cells ON h.r = cells.r AND h.bkt = cells.bkt
        |GROUP BY h.w, h.c
        |ORDER BY exact_c DESC, token""".stripMargin,
    "q_text_naivebayes" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, text,
        |    CASE WHEN substr(md5(regexp_replace(lower(text),
        |        '\s+', ' ', 'g')), 1, 1) <= 'b'
        |      THEN 'train' ELSE 'holdout' END AS split
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, lang, split,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(md5(w), 1, 6), ''),
        |        ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 64 AS bkt
        |  FROM (SELECT doc_id, lang, split,
        |          unnest(string_split(text, ' ')) AS w FROM docs) z
        |  WHERE w <> ''),
        |traincnt AS (SELECT lang, bkt, CAST(count(*) AS BIGINT) AS cnt
        |             FROM tok WHERE split = 'train' GROUP BY lang, bkt),
        |traintot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS tot
        |             FROM traincnt GROUP BY lang),
        |grid AS (
        |  SELECT tt.lang, g.bkt, tt.tot, COALESCE(tc.cnt, 0) AS cnt
        |  FROM traintot tt
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS bkt) g
        |  LEFT JOIN traincnt tc ON tc.lang = tt.lang AND tc.bkt = g.bkt),
        |priors AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
        |           FROM docs WHERE split = 'train' GROUP BY lang),
        |ndtot AS (SELECT CAST(sum(nd) AS BIGINT) AS ndt FROM priors),
        |priorterm AS (
        |  SELECT lang, CAST(ROUND(ln(CAST(nd AS DOUBLE)
        |      / CAST(ndt AS DOUBLE)), 9) AS DECIMAL(18,9)) AS pri
        |  FROM priors CROSS JOIN ndtot),
        |tf AS (SELECT doc_id, lang, bkt, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok WHERE split = 'holdout'
        |       GROUP BY doc_id, lang, bkt),
        |lik AS (
        |  SELECT tf.doc_id, tf.lang, grid.lang AS cand,
        |    sum(CAST(ROUND(CAST(tf.tf AS DOUBLE)
        |      * ln((CAST(grid.cnt AS DOUBLE) + 1.0)
        |            / (CAST(grid.tot AS DOUBLE) + 64.0)), 9)
        |      AS DECIMAL(18,9))) AS lik
        |  FROM tf JOIN grid ON tf.bkt = grid.bkt
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT lik.doc_id, lik.lang, lik.cand,
        |    lik.lik + CAST(pt.pri AS DECIMAL(28,9)) AS score
        |  FROM lik JOIN priorterm pt ON lik.cand = pt.lang),
        |best AS (
        |  SELECT doc_id, lang, cand FROM (
        |    SELECT doc_id, lang, cand, ROW_NUMBER() OVER (
        |      PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        |    FROM scored) z
        |  WHERE rn = 1)
        |SELECT lang AS actual, cand AS predicted,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM best GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin,
  )
}
