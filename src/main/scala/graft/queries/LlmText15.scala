package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 tenth wave: two training-data-pipeline guards —
  *
  *  - q_split_leakage: the dedup-aware train/test split. A plain
  *    row-hash split leaks near-duplicates across the boundary (the
  *    classic eval-inflation bug); this op assigns WHOLE near-dup
  *    clusters (q_dedup_cluster's blocking + connected components) to
  *    a split by an md5 bucket of the cluster representative, and
  *    reports the audit: per-split doc/cluster counts plus the number
  *    of straddling clusters, which is structurally zero.
  *  - q_text_gibberish: the OCR-garbage / mojibake screen for English
  *    docs — max consonant-run length, vowel share, digit ratio, and
  *    a combined score; the cheap lexical cousin of
  *    q_text_compressibility.
  *
  * Scale notes: leakage rides the same bounded blocking join and
  * accumulator-gated CC driver as q_dedup_cluster (state = one
  * (doc, grp) row per doc); the audit is two grp-keyed aggregates.
  * Gibberish is map-only per doc plus one top-k (TakeOrdered — no
  * global sort). Both are deterministic: md5 buckets, integer
  * character counts, single IEEE ratio ops. */
object LlmText15 {

  /** Cluster-aware split with leakage audit. */
  private def qSplitLeakage(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val a = docs.select(col("doc_id").as("x"), col("lang"), col("source"),
      col("n_chars").as("nc_x"))
    val b = docs.select(col("doc_id").as("y"), col("lang"), col("source"),
      col("n_chars").as("nc_y"))
    val pairs = a.join(b, Seq("lang", "source"))
      .filter(abs(col("nc_x") - col("nc_y")) <= 2 && col("x") < col("y"))
      .select(col("x"), col("y"))
    val cc = LlmText2.connectedComponents(docs.select(col("doc_id")),
      pairs)
    val assigned = cc.withColumn("split",
      when(expr("CAST(conv(substring(md5(CAST(grp AS STRING)), 1, 6), " +
        "16, 10) AS BIGINT) % 10") < 8, "train").otherwise("test"))
    // one row per cluster (split is a function of grp)
    val clusters = assigned.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        min(col("split")).as("split"))
    val straddle = clusters
      .agg(sum(when(col("n_splits") > 1, 1L).otherwise(0L))
        .as("n_straddling"))
    clusters.groupBy(col("split"))
      .agg(sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_clusters"),
        max(col("n_docs")).as("max_cluster_docs"))
      .crossJoin(broadcast(straddle))
      .orderBy(col("split"))
  }

  /** Gibberish screen over English docs (letters >= 20): top 20 by
    * score. */
  private def qTextGibberish(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .filter(col("lang") === "en")
      .withColumn("lo", lower(col("text")))
      .withColumn("n_letters",
        length(regexp_replace(col("lo"), "[^a-z]", "")))
      .filter(col("n_letters") >= 20)
      .withColumn("n_vowels",
        length(regexp_replace(col("lo"), "[^aeiou]", "")))
      .withColumn("n_digits",
        length(regexp_replace(col("lo"), "[^0-9]", "")))
      .withColumn("max_run", expr(
        """array_max(transform(
          |  split(regexp_replace(lo, '[^bcdfghjklmnpqrstvwxyz]+', ' '),
          |        ' '),
          |  x -> CAST(length(x) AS INT)))""".stripMargin))
      .withColumn("vowel_share",
        round(dbl(col("n_vowels")) / dbl(col("n_letters")), 6))
      .withColumn("digit_ratio",
        round(dbl(col("n_digits")) / dbl(length(col("text"))), 6))
      .withColumn("score", round(
        dbl(col("max_run")) / 10.0 +
          greatest(lit(0.0), lit(0.3) - col("vowel_share")) * 3.0 +
          col("digit_ratio"), 6))
      .select(col("doc_id"), col("max_run"), col("vowel_share"),
        col("digit_ratio"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_split_leakage" -> (qSplitLeakage _),
    "q_text_gibberish" -> (qTextGibberish _),
  )

  val sql: Map[String, String] = Map(
    "q_split_leakage" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.doc_id AS x, b.doc_id AS y
        |  FROM documents a JOIN documents b
        |    ON a.lang = b.lang AND a.source = b.source
        |   AND abs(a.n_chars - b.n_chars) <= 2 AND a.doc_id < b.doc_id),
        |edges AS (SELECT x, y FROM pairs
        |          UNION SELECT y AS x, x AS y FROM pairs),
        |lbl AS (
        |  SELECT doc_id, doc_id AS root FROM documents
        |  UNION
        |  SELECT e.y AS doc_id, l.root FROM lbl l
        |  JOIN edges e ON e.x = l.doc_id WHERE l.root < e.y),
        |cc AS (SELECT doc_id, MIN(root) AS grp FROM lbl GROUP BY doc_id),
        |assigned AS (
        |  SELECT doc_id, grp,
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(
        |          substr(md5(CAST(grp AS VARCHAR)), 1, 6), ''),
        |          ch -> CAST(strpos('0123456789abcdef', ch) - 1
        |            AS BIGINT))),
        |        (h, x) -> h * 16 + x) % 10 < 8
        |    THEN 'train' ELSE 'test' END AS split
        |  FROM cc),
        |clusters AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
        |    count(DISTINCT split) AS n_splits, min(split) AS split
        |  FROM assigned GROUP BY grp),
        |straddle AS (
        |  SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_straddling
        |  FROM clusters)
        |SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_clusters,
        |  CAST(max(n_docs) AS BIGINT) AS max_cluster_docs,
        |  n_straddling
        |FROM clusters CROSS JOIN straddle
        |GROUP BY split, n_straddling
        |ORDER BY split""".stripMargin,
    "q_text_gibberish" ->
      """WITH f AS (
        |  SELECT doc_id, text, lower(text) AS lo,
        |    CAST(len(regexp_replace(lower(text), '[^a-z]', '', 'g'))
        |      AS INT) AS n_letters,
        |    CAST(len(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
        |      AS INT) AS n_vowels,
        |    CAST(len(regexp_replace(lower(text), '[^0-9]', '', 'g'))
        |      AS INT) AS n_digits
        |  FROM documents WHERE lang = 'en'),
        |r AS (
        |  SELECT doc_id, n_letters, n_vowels, n_digits,
        |    CAST(list_max(list_transform(string_split(
        |      regexp_replace(lo, '[^bcdfghjklmnpqrstvwxyz]+', ' ', 'g'),
        |      ' '), x -> len(x))) AS INT) AS max_run,
        |    round(CAST(n_vowels AS DOUBLE)
        |      / CAST(n_letters AS DOUBLE), 6) AS vowel_share,
        |    round(CAST(n_digits AS DOUBLE)
        |      / CAST(len(text) AS DOUBLE), 6) AS digit_ratio
        |  FROM f WHERE n_letters >= 20)
        |SELECT doc_id, max_run, vowel_share, digit_ratio,
        |  round(CAST(max_run AS DOUBLE) / 10.0
        |    + greatest(0.0, 0.3 - vowel_share) * 3.0
        |    + digit_ratio, 6) AS score
        |FROM r
        |ORDER BY round(CAST(max_run AS DOUBLE) / 10.0
        |    + greatest(0.0, 0.3 - vowel_share) * 3.0
        |    + digit_ratio, 6) DESC, doc_id
        |LIMIT 20""".stripMargin,
  )
}
