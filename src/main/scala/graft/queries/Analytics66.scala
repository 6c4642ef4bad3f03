package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 fourth wave: the two missing split-family classics and a
  * model fit. Group k-fold (folds keyed on SOURCE — all of a source's
  * documents land in one fold, the leakage guard content-hash kfold
  * can't give when near-copies share provenance rather than text) and
  * the stratified holdout (exact 80/20 within each language — class
  * proportions preserved by construction, unlike a global hash
  * threshold). Plus a 2-component Gaussian mixture fit by two unrolled
  * EM iterations over the BOUNDED value-bucket histogram — the
  * "is this metric bimodal" model a monitoring page fits.
  *
  * Scale notes: both splits are one map-side assignment + one bounded
  * aggregate (stratified needs a per-stratum rank — a per-language
  * shuffle sort, the ntile discipline). EM runs entirely on the
  * 0.1-bucket table: responsibilities and moment sums are
  * bucket-bounded regardless of corpus size, every weighted sum is
  * 9-dp-DECIMAL-routed, and the two engines walk an identical
  * E/M expression tree (init from exact cumulative rank picks). */
object Analytics66 {

  /** Group 5-fold assignment keyed on source: per fold, sources/docs/
    * chars, plus the explicit leakage guarantee (max folds any single
    * source touches — 1 by construction). */
  private def qSplitGroupkfold(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("fold",
        expr("CAST(conv(substring(md5(source), 1, 6), 16, 10) " +
          "AS BIGINT) % 5"))
    val perFold = docs.groupBy(col("fold"))
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val leak = docs.groupBy(col("source"))
      .agg(countDistinct(col("fold")).as("nf"))
      .agg(max(col("nf")).as("max_folds_per_source"))
    perFold.crossJoin(broadcast(leak))
      .select(col("fold"), col("n_sources"), col("n_docs"), col("chars"),
        col("max_folds_per_source"))
      .orderBy(col("fold"))
  }

  /** Stratified 80/20 holdout within each language: deterministic
    * md5-rank pick of exactly ⌊4n/5⌋ train docs per language. */
  private def qSplitStratified(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id"))
    val nl = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    docs.withColumn("rn", row_number().over(w))
      .join(broadcast(nl), Seq("lang"))
      .withColumn("part",
        when(col("rn") <= expr("(4 * nl) div 5"), "train")
          .otherwise("test"))
      .groupBy(col("lang"))
      .agg(max(col("nl")).as("n"),
        sum(when(col("part") === "train", 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("part") === "test", 1L).otherwise(0L)).as("n_test"),
        sum(when(col("part") === "train", col("n_chars"))
          .otherwise(0L)).as("train_chars"))
      .select(col("lang"), col("n"), col("n_train"), col("n_test"),
        round(dbl(col("n_train")) / dbl(col("n")), 6).as("train_share"),
        col("train_chars"))
      .orderBy(col("lang"))
  }

  /** 2-component Gaussian mixture on event value (0.1 buckets): init
    * μ from the exact p25/p75 bucket picks and σ from the global
    * spread, then two unrolled EM iterations on the bucket histogram.
    * Output: weights, means, sds after iteration 2. */
  private def qAggMixture(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .select(expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum(col("c")).as("n"),
      sum(expr("CAST(ROUND(CAST(b AS DOUBLE) * c, 9) " +
        "AS DECIMAL(28,9))")).as("sb"),
      sum(expr("CAST(ROUND(CAST(b AS DOUBLE) * CAST(b AS DOUBLE) * c, " +
        "9) AS DECIMAL(28,9))")).as("sbb"))
    val wq = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = cells.withColumn("cumi", sum(col("c")).over(wq))
      .crossJoin(broadcast(tot))
    def pick(rk: String) = ranked
      .filter(col("cumi") >= expr(rk) &&
        col("cumi") - col("c") < expr(rk))
      .select(dbl(col("b")))
    val mu10 = pick("(n + 3) div 4")
    val mu20 = pick("(3 * n + 1) div 4")
    // init state: (w1, mu1, s1, w2, mu2, s2) — population sd for both
    val init = tot
      .crossJoin(broadcast(mu10.toDF("m1")))
      .crossJoin(broadcast(mu20.toDF("m2")))
      .select(col("n"),
        lit(0.5).as("w1"), col("m1").as("mu1"),
        sqrt(expr("CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE) " +
          "- (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "* (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))")).as("s1"),
        lit(0.5).as("w2"), col("m2").as("mu2"),
        sqrt(expr("CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE) " +
          "- (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "* (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))")).as("s2"))
      .filter(col("s1") > 0)
    // one EM iteration: E responsibilities on the bucket grid, M step
    // moment sums (all 9-dp DECIMAL), new params
    def emStep(params: DataFrame): DataFrame = {
      val e = cells.crossJoin(broadcast(params))
        .withColumn("x", dbl(col("b")))
        .withColumn("l1", expr(
          "w1 / s1 * exp(-(x - mu1) * (x - mu1) / (2.0 * s1 * s1))"))
        .withColumn("l2", expr(
          "w2 / s2 * exp(-(x - mu2) * (x - mu2) / (2.0 * s2 * s2))"))
        .withColumn("r1", expr(
          "CASE WHEN l1 + l2 > 0 THEN l1 / (l1 + l2) ELSE 0.5 END"))
      e.agg(
          max(col("n")).as("n"),
          sum(expr("CAST(ROUND(c * r1, 9) AS DECIMAL(28,9))")).as("k1"),
          sum(expr("CAST(ROUND(c * r1 * x, 9) AS DECIMAL(28,9))"))
            .as("m1s"),
          sum(expr("CAST(ROUND(c * r1 * x * x, 9) AS DECIMAL(28,9))"))
            .as("v1s"),
          sum(expr("CAST(ROUND(c * (1.0 - r1), 9) AS DECIMAL(28,9))"))
            .as("k2"),
          sum(expr("CAST(ROUND(c * (1.0 - r1) * x, 9) " +
            "AS DECIMAL(28,9))")).as("m2s"),
          sum(expr("CAST(ROUND(c * (1.0 - r1) * x * x, 9) " +
            "AS DECIMAL(28,9))")).as("v2s"))
        .filter(dbl(col("k1")) > 0 && dbl(col("k2")) > 0)
        .select(col("n"),
          expr("CAST(k1 AS DOUBLE) / CAST(n AS DOUBLE)").as("w1"),
          expr("CAST(m1s AS DOUBLE) / CAST(k1 AS DOUBLE)").as("mu1"),
          sqrt(greatest(expr(
            "CAST(v1s AS DOUBLE) / CAST(k1 AS DOUBLE) " +
              "- (CAST(m1s AS DOUBLE) / CAST(k1 AS DOUBLE)) " +
              "* (CAST(m1s AS DOUBLE) / CAST(k1 AS DOUBLE))"),
            lit(1e-6))).as("s1"),
          expr("CAST(k2 AS DOUBLE) / CAST(n AS DOUBLE)").as("w2"),
          expr("CAST(m2s AS DOUBLE) / CAST(k2 AS DOUBLE)").as("mu2"),
          sqrt(greatest(expr(
            "CAST(v2s AS DOUBLE) / CAST(k2 AS DOUBLE) " +
              "- (CAST(m2s AS DOUBLE) / CAST(k2 AS DOUBLE)) " +
              "* (CAST(m2s AS DOUBLE) / CAST(k2 AS DOUBLE))"),
            lit(1e-6))).as("s2"))
    }
    emStep(emStep(init))
      .select(col("n"),
        round(col("w1"), 6).as("w1"), round(col("mu1"), 6).as("mu1"),
        round(col("s1"), 6).as("s1"),
        round(col("w2"), 6).as("w2"), round(col("mu2"), 6).as("mu2"),
        round(col("s2"), 6).as("s2"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_split_groupkfold" -> (qSplitGroupkfold _),
    "q_split_stratified_lang" -> (qSplitStratified _),
    "q_agg_mixture" -> (qAggMixture _),
  )

  private def emSql(prev: String, out: String): String =
    s"""$out AS (
      |  SELECT n,
      |    CAST(k1 AS DOUBLE) / CAST(n AS DOUBLE) AS w1,
      |    CAST(m1s AS DOUBLE) / CAST(k1 AS DOUBLE) AS mu1,
      |    sqrt(GREATEST(CAST(v1s AS DOUBLE) / CAST(k1 AS DOUBLE)
      |      - (CAST(m1s AS DOUBLE) / CAST(k1 AS DOUBLE))
      |      * (CAST(m1s AS DOUBLE) / CAST(k1 AS DOUBLE)), 1e-6)) AS s1,
      |    CAST(k2 AS DOUBLE) / CAST(n AS DOUBLE) AS w2,
      |    CAST(m2s AS DOUBLE) / CAST(k2 AS DOUBLE) AS mu2,
      |    sqrt(GREATEST(CAST(v2s AS DOUBLE) / CAST(k2 AS DOUBLE)
      |      - (CAST(m2s AS DOUBLE) / CAST(k2 AS DOUBLE))
      |      * (CAST(m2s AS DOUBLE) / CAST(k2 AS DOUBLE)), 1e-6)) AS s2
      |  FROM (
      |    SELECT max(n) AS n,
      |      sum(CAST(ROUND(c * r1, 9) AS DECIMAL(28,9))) AS k1,
      |      sum(CAST(ROUND(c * r1 * x, 9) AS DECIMAL(28,9))) AS m1s,
      |      sum(CAST(ROUND(c * r1 * x * x, 9) AS DECIMAL(28,9))) AS v1s,
      |      sum(CAST(ROUND(c * (1.0 - r1), 9) AS DECIMAL(28,9))) AS k2,
      |      sum(CAST(ROUND(c * (1.0 - r1) * x, 9) AS DECIMAL(28,9)))
      |        AS m2s,
      |      sum(CAST(ROUND(c * (1.0 - r1) * x * x, 9)
      |        AS DECIMAL(28,9))) AS v2s
      |    FROM (
      |      SELECT c, n, x,
      |        CASE WHEN l1 + l2 > 0 THEN l1 / (l1 + l2) ELSE 0.5 END
      |          AS r1
      |      FROM (
      |        SELECT c, n, CAST(b AS DOUBLE) AS x,
      |          w1 / s1 * exp(-(CAST(b AS DOUBLE) - mu1)
      |            * (CAST(b AS DOUBLE) - mu1) / (2.0 * s1 * s1)) AS l1,
      |          w2 / s2 * exp(-(CAST(b AS DOUBLE) - mu2)
      |            * (CAST(b AS DOUBLE) - mu2) / (2.0 * s2 * s2)) AS l2
      |        FROM cells CROSS JOIN $prev) q) ee
      |  ) mm
      |  WHERE CAST(k1 AS DOUBLE) > 0 AND CAST(k2 AS DOUBLE) > 0)"""
      .stripMargin

  val sql: Map[String, String] = Map(
    "q_split_groupkfold" ->
      """WITH docs AS (
        |  SELECT source, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(md5(source), 1, 6), ''),
        |        ch -> CAST(strpos('0123456789abcdef', ch) - 1
        |          AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 5 AS fold
        |  FROM documents),
        |perfold AS (
        |  SELECT fold, CAST(count(DISTINCT source) AS BIGINT)
        |      AS n_sources,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM docs GROUP BY fold),
        |leak AS (
        |  SELECT CAST(max(nf) AS BIGINT) AS max_folds_per_source FROM (
        |    SELECT source, count(DISTINCT fold) AS nf
        |    FROM docs GROUP BY source))
        |SELECT fold, n_sources, n_docs, chars, max_folds_per_source
        |FROM perfold CROSS JOIN leak ORDER BY fold""".stripMargin,
    "q_split_stratified_lang" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents),
        |nl AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl
        |       FROM documents GROUP BY lang),
        |parts AS (
        |  SELECT d.lang, nl.nl,
        |    CASE WHEN d.rn <= (4 * nl.nl) // 5 THEN 'train'
        |         ELSE 'test' END AS part,
        |    d.n_chars
        |  FROM docs d JOIN nl ON d.lang = nl.lang)
        |SELECT lang, CAST(max(nl) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN part = 'train' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN part = 'test' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_test,
        |  ROUND(CAST(sum(CASE WHEN part = 'train' THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(max(nl) AS DOUBLE), 6) AS train_share,
        |  CAST(sum(CASE WHEN part = 'train' THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS train_chars
        |FROM parts GROUP BY lang ORDER BY lang""".stripMargin,
    "q_agg_mixture" -> (
      """WITH cells AS (
        |  SELECT CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(ROUND(CAST(b AS DOUBLE) * c, 9) AS DECIMAL(28,9)))
        |      AS sb,
        |    sum(CAST(ROUND(CAST(b AS DOUBLE) * CAST(b AS DOUBLE) * c, 9)
        |      AS DECIMAL(28,9))) AS sbb
        |  FROM cells),
        |ranked AS (
        |  SELECT b, c, sum(c) OVER (ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumi, n
        |  FROM cells CROSS JOIN tot),
        |m1p AS (SELECT CAST(b AS DOUBLE) AS m1 FROM ranked
        |        WHERE cumi >= (n + 3) // 4 AND cumi - c < (n + 3) // 4),
        |m2p AS (SELECT CAST(b AS DOUBLE) AS m2 FROM ranked
        |        WHERE cumi >= (3 * n + 1) // 4
        |          AND cumi - c < (3 * n + 1) // 4),
        |p0 AS (
        |  SELECT n, CAST(0.5 AS DOUBLE) AS w1, m1 AS mu1,
        |    sqrt(CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))) AS s1,
        |    CAST(0.5 AS DOUBLE) AS w2, m2 AS mu2,
        |    sqrt(CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))) AS s2
        |  FROM tot CROSS JOIN m1p CROSS JOIN m2p
        |  WHERE sqrt(CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))) > 0),
        |""".stripMargin +
      emSql("p0", "p1") + ",\n" + emSql("p1", "p2") + "\n" +
      """SELECT n, ROUND(w1, 6) AS w1, ROUND(mu1, 6) AS mu1,
        |  ROUND(s1, 6) AS s1, ROUND(w2, 6) AS w2,
        |  ROUND(mu2, 6) AS mu2, ROUND(s2, 6) AS s2
        |FROM p2""".stripMargin),
  )
}
