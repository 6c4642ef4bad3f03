package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 featurization wave: per-language character n-gram profiles
  * (the TRAINING side of Cavnar–Trenkle language ID — q_text_langid is
  * the inference side) and hashing-trick term-frequency features (the
  * input representation for the fastText-style quality classifiers).
  *
  * Scale notes:
  *  - The n-gram profile explodes to (lang, trigram) ONCE and
  *    hash-aggregates with map-side partials; the per-language top-10
  *    cut is a bounded window over the language-count-sized table (a
  *    few hundred rows per language at any corpus size, because only
  *    counted trigrams survive the aggregate — the raw stream never
  *    sorts).
  *  - Hashed TF kills the unbounded-vocabulary problem by construction:
  *    features live in a FIXED 64-bucket space (md5-derived bucketing,
  *    engine-portable), so the count table is ≤ 64 rows per document
  *    and the dense (doc, bucket) grid is doc_count × 64 — linear in
  *    the corpus with a constant factor, no vocab table anywhere. The
  *    sparse counts co-partition with the grid on (doc_id, bucket). */
object LlmText7 {

  /** Per-language character trigram profile: top-10 trigrams per lang
    * by frequency (tie-break on the gram) over the raw text — the
    * profile table a Cavnar–Trenkle language identifier trains. */
  private def qTextKgramProfile(s: SparkSession, d: String): DataFrame = {
    val grams = t(s, d, "documents")
      .filter(length(col("text")) >= 3) // sequence(1, n<1) runs backwards
      // spread the per-char trigram explode across the cluster: the
      // scan inherits the parquet file layout (ONE file locally), and
      // only narrow (lang, text) rows shuffle
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("g"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cnt"))
    grams
      .withColumn("rn", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(desc("cnt"), col("g"))))
      .filter(col("rn") <= 10)
      .select(col("lang"), col("rn"), col("g"), col("cnt"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Hashing-trick term frequencies (64 buckets, md5-derived): the
    * dense (doc_id, bucket, tf) grid a linear text classifier consumes.
    * Zero buckets are materialized so the feature space is explicit. */
  private def qTextHashtf(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("bucket", expr(
        "pmod(cast(conv(substring(md5(w), 1, 6), 16, 10) as bigint), 64)"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val grid = docs.select(col("doc_id"),
      explode(expr("sequence(0L, 63L)")).as("bucket"))
    grid.join(counts, Seq("doc_id", "bucket"), "left")
      .select(col("doc_id"), col("bucket"),
        coalesce(col("tf"), lit(0L)).as("tf"))
      .orderBy(col("doc_id"), col("bucket"))
  }

  /** Trigram-profile language ID — the INFERENCE side of
    * q_text_kgram_profile's training: each document is scored by how
    * many of its distinct trigrams appear in each language's top-50
    * profile, predicted = argmax (score desc, lang asc tie-break), and
    * the output is the (actual, predicted) confusion matrix. The
    * profile table is n_langs × 50 rows → broadcast; documents make
    * one distinct-trigram explode pass and the overlap aggregate is
    * keyed (doc, candidate-lang), bounded by profile hits. */
  private def qTextLangidNgram(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").filter(length(col("text")) >= 3)
    // both the profile build and the overlap scoring read the exploded
    // trigram stream — checkpoint it once (q_win_retention discipline)
    val grams = docs
      // repartition before the distinct-trigram explode (file-layout-
      // bound parallelism otherwise; the checkpoint then keeps the
      // spread partitioning for both consumers)
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("doc_id"), col("lang"), explode(expr(
        "array_distinct(transform(sequence(1, length(text) - 2), " +
          "i -> substring(text, i, 3)))")).as("g"))
      .localCheckpoint(true)
    val profiles = grams
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(desc("cnt"), col("g"))))
      .filter(col("rn") <= 50)
      .select(col("lang").as("cand"), col("g"))
    val overlap = grams
      .join(broadcast(profiles), Seq("g"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(count(lit(1)).as("score"))
    overlap
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(desc("score"), col("cand"))))
      .filter(col("rn") === 1)
      .groupBy(col("lang").as("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("actual"), col("predicted"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_kgram_profile" -> (qTextKgramProfile _),
    "q_text_hashtf" -> (qTextHashtf _),
    "q_text_langid_ngram" -> (qTextLangidNgram _),
  )

  val sql: Map[String, String] = Map(
    "q_text_kgram_profile" ->
      """WITH grams AS (
        |  SELECT lang, substr(text, CAST(i AS INT), 3) AS g
        |  FROM (SELECT lang, text, unnest(range(1, length(text) - 1)) AS i
        |        FROM documents WHERE length(text) >= 3) z),
        |counts AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS cnt
        |           FROM grams GROUP BY lang, g),
        |ranked AS (
        |  SELECT lang, g, cnt,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, g) AS INT) AS rn
        |  FROM counts)
        |SELECT lang, rn, g, cnt FROM ranked WHERE rn <= 10
        |ORDER BY lang, rn""".stripMargin,
    "q_text_langid_ngram" ->
      """WITH grams AS (
        |  SELECT doc_id, lang, unnest(list_distinct(list_transform(
        |    range(1, length(text) - 1),
        |    i -> substr(text, CAST(i AS INT), 3)))) AS g
        |  FROM documents WHERE length(text) >= 3),
        |profiles AS (
        |  SELECT lang AS cand, g FROM (
        |    SELECT lang, g, ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, g) AS rn
        |    FROM grams GROUP BY lang, g) z
        |  WHERE rn <= 50),
        |overlap AS (
        |  SELECT grams.doc_id, grams.lang, profiles.cand,
        |    CAST(count(*) AS BIGINT) AS score
        |  FROM grams JOIN profiles ON grams.g = profiles.g
        |  GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT doc_id, lang, cand FROM (
        |    SELECT doc_id, lang, cand,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, cand) AS rn
        |    FROM overlap) z
        |  WHERE rn = 1)
        |SELECT lang AS actual, cand AS predicted,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM best GROUP BY 1, 2 ORDER BY actual, predicted""".stripMargin,
    "q_text_hashtf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(md5(w), 1, 6), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 64 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) z
        |  WHERE w <> ''),
        |counts AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS tf
        |           FROM tok GROUP BY doc_id, bucket),
        |grid AS (SELECT doc_id, unnest(range(0, 64)) AS bucket
        |         FROM documents)
        |SELECT g.doc_id, CAST(g.bucket AS BIGINT) AS bucket,
        |  COALESCE(c.tf, 0) AS tf
        |FROM grid g LEFT JOIN counts c
        |  ON g.doc_id = c.doc_id AND g.bucket = c.bucket
        |ORDER BY g.doc_id, g.bucket""".stripMargin,
  )
}
