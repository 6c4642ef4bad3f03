package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import Tables._

/** Round-7 formats wave: deterministic surrogate-key minting (the
  * warehouse-dimension key every pipeline needs, with no RNG and no
  * monotonically_increasing_id non-determinism) and PERMISSIVE
  * corrupt-record capture on CSV ingest (the messy-feed behavior the
  * Avro subsystem implements for containers, at the text-format
  * layer).
  *
  * Scale notes:
  *  - Surrogate keys are map-only md5 over a namespaced natural key —
  *    no sequence bottleneck, no shuffle; the collision audit is one
  *    count-distinct aggregate broadcast back onto the sample rows.
  *  - The corrupt-capture read streams the file once; classification
  *    (good / short-row / corrupt) happens per-row in the parser.
  *    Spark's contract, pinned by the oracle: type-malformed rows
  *    populate `_corrupt_record`; SHORT rows null-fill silently —
  *    at 100 TB you must count both, because only one of them is
  *    flagged. */
object Formats2 {

  /** Deterministic UUID-shaped surrogate keys for the first 20 orders
    * + a global collision audit (n_keys vs n_distinct). */
  private def qFnSurrogate(s: SparkSession, d: String): DataFrame = {
    val keyed = t(s, d, "orders")
      .select(col("o_orderkey"),
        md5(concat(lit("orders|"), col("o_orderkey").cast("string")))
          .as("h"))
      .select(col("o_orderkey"), concat_ws("-",
        substring(col("h"), 1, 8), substring(col("h"), 9, 4),
        substring(col("h"), 13, 4), substring(col("h"), 17, 4),
        substring(col("h"), 21, 12)).as("surrogate_uuid"))
    val audit = keyed.agg(count(lit(1)).as("n_keys"),
      countDistinct(col("surrogate_uuid")).as("n_distinct"))
    keyed.orderBy(col("o_orderkey")).limit(20)
      .crossJoin(broadcast(audit))
  }

  /** PERMISSIVE CSV ingest over a feed with injected damage: doc_id
    * % 10 == 3 rows lose their last field (short row → silent
    * null-fill), % 10 == 7 rows carry a non-numeric number (type
    * error → `_corrupt_record`). Reports the per-category counts and
    * the good-row checksum. */
  private def qSourceCsvCorrupt(s: SparkSession, d: String): DataFrame = {
    val base = freshDir("csv_corrupt")
    t(s, d, "documents")
      .select(expr(
        """CASE
          |  WHEN doc_id % 10 = 3 THEN concat(doc_id, ',', lang)
          |  WHEN doc_id % 10 = 7 THEN concat(doc_id, ',', lang, ',broken')
          |  ELSE concat(doc_id, ',', lang, ',', n_chars)
          |END""".stripMargin).as("value"))
      .coalesce(1).write.mode("overwrite").text(base)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    val read = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(base)
      .select(
        when(col("_corrupt_record").isNotNull, "corrupt")
          .when(col("n_chars").isNull, "short_row")
          .otherwise("good").as("category"),
        col("n_chars"))
    read.groupBy(col("category"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("chars"))
      .orderBy(col("category"))
  }

  /** PERMISSIVE JSON-lines ingest over a feed with injected damage:
    * doc_id % 10 == 3 rows lose the n_chars KEY (missing field →
    * silent null-fill), % 10 == 7 rows are structurally malformed
    * (truncated object → `_corrupt_record`). The JSON twin of
    * q_source_csv_corrupt — same 100 TB lesson: the parser flags only
    * one of the two damage classes, so a robust ingest counts both. */
  private def qSourceJsonCorrupt(s: SparkSession, d: String): DataFrame = {
    val base = freshDir("json_corrupt")
    t(s, d, "documents")
      .select(expr(
        """CASE
          |  WHEN doc_id % 10 = 3 THEN concat('{"doc_id": ', doc_id,
          |    ', "lang": "', lang, '"}')
          |  WHEN doc_id % 10 = 7 THEN concat('{"doc_id": ', doc_id,
          |    ', "lang": "', lang, '", "n_chars": ', n_chars)
          |  ELSE concat('{"doc_id": ', doc_id, ', "lang": "', lang,
          |    '", "n_chars": ', n_chars, '}')
          |END""".stripMargin).as("value"))
      .coalesce(1).write.mode("overwrite").text(base)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType),
      StructField("_corrupt_record", StringType)))
    val read = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(base)
      .select(
        when(col("_corrupt_record").isNotNull, "corrupt")
          .when(col("n_chars").isNull, "missing_field")
          .otherwise("good").as("category"),
        col("n_chars"))
    read.groupBy(col("category"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("chars"))
      .orderBy(col("category"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_fn_surrogate" -> (qFnSurrogate _),
    "q_source_csv_corrupt" -> (qSourceCsvCorrupt _),
    "q_source_json_corrupt" -> (qSourceJsonCorrupt _),
  )

  val sql: Map[String, String] = Map(
    "q_fn_surrogate" ->
      """WITH keyed AS (
        |  SELECT o_orderkey,
        |    md5(concat('orders|', CAST(o_orderkey AS VARCHAR))) AS h
        |  FROM orders),
        |uu AS (
        |  SELECT o_orderkey,
        |    concat_ws('-', substr(h, 1, 8), substr(h, 9, 4),
        |      substr(h, 13, 4), substr(h, 17, 4), substr(h, 21, 12))
        |      AS surrogate_uuid
        |  FROM keyed),
        |audit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(count(DISTINCT surrogate_uuid) AS BIGINT) AS n_distinct
        |  FROM uu)
        |SELECT o_orderkey, surrogate_uuid, n_keys, n_distinct
        |FROM uu, audit ORDER BY o_orderkey LIMIT 20""".stripMargin,
    "q_source_json_corrupt" ->
      """WITH c AS (
        |  SELECT CASE WHEN doc_id % 10 = 7 THEN 'corrupt'
        |              WHEN doc_id % 10 = 3 THEN 'missing_field'
        |              ELSE 'good' END AS category,
        |    CASE WHEN doc_id % 10 IN (3, 7) THEN NULL
        |         ELSE n_chars END AS n_chars
        |  FROM documents)
        |SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM c GROUP BY category ORDER BY category""".stripMargin,
    "q_source_csv_corrupt" ->
      """WITH c AS (
        |  SELECT CASE WHEN doc_id % 10 = 7 THEN 'corrupt'
        |              WHEN doc_id % 10 = 3 THEN 'short_row'
        |              ELSE 'good' END AS category,
        |    CASE WHEN doc_id % 10 IN (3, 7) THEN NULL
        |         ELSE n_chars END AS n_chars
        |  FROM documents)
        |SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM c GROUP BY category ORDER BY category""".stripMargin,
  )
}
