package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** File-format surface beyond parquet/avro: CSV and JSON source/sink
  * round trips (write from the canonical parquet tables, read back with
  * an explicit schema, prove value fidelity against the identity
  * oracle), plus regex extraction functions.
  *
  * Round-trip fidelity notes: Spark writes doubles as their
  * shortest-round-trip decimal representation, so text → double parses
  * back bit-identical; timestamps round-trip through ISO-8601 with
  * microsecond precision. Explicit read schemas keep the engine from
  * inferring wider/narrower types than the source table. */
object Formats {

  private def tmp(tag: String, d: String): String =
    freshDir(s"fmt_${tag}_${math.abs(d.hashCode)}")

  /** CSV sink + source round trip over customer (ints, doubles,
    * strings). */
  private def qSourceCsv(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val dir = tmp("csv", d)
    c.write.mode("overwrite").option("header", "true").csv(dir)
    s.read.option("header", "true").schema(c.schema).csv(dir)
      .orderBy("c_custkey")
  }

  /** JSON lines sink + source round trip over orders (timestamps,
    * doubles, strings). */
  private def qSourceJson(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    val dir = tmp("json", d)
    o.write.mode("overwrite").json(dir)
    s.read.schema(o.schema).json(dir).orderBy("o_orderkey")
  }

  /** ORC sink + source round trip over part (ints, doubles, strings) —
    * Spark's third first-class columnar format. */
  private def qSourceOrc(s: SparkSession, d: String): DataFrame = {
    val p = t(s, d, "part")
    val dir = tmp("orc", d)
    p.write.mode("overwrite").orc(dir)
    s.read.schema(p.schema).orc(dir).orderBy("p_partkey")
  }

  /** XML sink + source round trip (Spark 4 built-in XML data source —
    * rowTag element per record, explicit schema on read). */
  private def qSourceXml(s: SparkSession, d: String): DataFrame = {
    val p = t(s, d, "part")
    val dir = tmp("xml", d)
    p.write.mode("overwrite").option("rowTag", "part").xml(dir)
    s.read.schema(p.schema).option("rowTag", "part").xml(dir)
      .orderBy("p_partkey")
  }

  /** Seeded stratified sample: 20% of 'A', 5% of 'N', 0% of 'R' line
    * rows by return flag. Deterministic per seed (ScalaTest-pinned;
    * sampling is not SQL-oracle-able). */
  private def qSampleStratified(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .stat.sampleBy("l_returnflag",
        Map("A" -> 0.2, "N" -> 0.05, "R" -> 0.0), 42L)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag")

  /** Regex extraction: every s-prefixed 4+-letter token run per document,
    * joined to a string (the row-sorting harness cannot order raw array
    * cells). */
  private def qFnRegex(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        concat_ws(",", expr("regexp_extract_all(text, 's[a-z]{3,}', 0)"))
          .as("hits"),
        size(expr("regexp_extract_all(text, 's[a-z]{3,}', 0)"))
          .as("n_hits"))
      .orderBy("doc_id")

  /** Cryptographic/content hashes (md5, sha2-256) — content-addressing
    * and cache-keying primitives. */
  private def qFnHash(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), md5(col("source")).as("h_md5"),
        sha2(col("source"), 256).as("h_sha256"))
      .orderBy("doc_id")

  /** Binary encodings: integer hex, blob hex, base64. */
  private def qFnBinhex(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        hex(col("doc_id")).as("id_hex"),
        hex(col("source").cast("binary")).as("src_hex"),
        base64(col("source").cast("binary")).as("src_b64"))
      .orderBy("doc_id")

  /** Discrete percentiles (no interpolation — always a real data
    * value): SQL-standard WITHIN GROUP syntax. */
  private def qAggPctlDisc(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS q50,
        |  percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_quantity) AS q90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** File-lineage scan via the hidden `_metadata` struct — the
    * provenance primitive a 100 TB pipeline uses to trace any row back
    * to its source file and position (and to debug a bad file without
    * re-listing storage): per input file, row count and the
    * `row_index` span, plus a size sanity column. Purely scan-local —
    * the metadata columns are populated by the reader, no extra I/O;
    * one bounded agg (one row per file) follows. File NAMES are
    * environment-stable but paths are not → no SQL oracle; FormatsSpec
    * (LayoutSpec) pins the semantics. */
  private def qScanMetadata(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("_metadata.file_name").as("file_name"),
        col("_metadata.file_size").as("file_size"),
        col("_metadata.row_index").as("ri"))
      .groupBy(col("file_name"), col("file_size"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ri")).as("ri_min"), max(col("ri")).as("ri_max"))
      .orderBy("file_name")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_metadata" -> (qScanMetadata _),
    "q_fn_hash" -> (qFnHash _),
    "q_fn_binhex" -> (qFnBinhex _),
    "q_agg_pctl_disc" -> (qAggPctlDisc _),
    "q_source_csv" -> (qSourceCsv _),
    "q_source_json" -> (qSourceJson _),
    "q_source_orc" -> (qSourceOrc _),
    "q_source_xml" -> (qSourceXml _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_fn_regex" -> (qFnRegex _),
  )

  val sql: Map[String, String] = Map(
    "q_fn_hash" ->
      """SELECT doc_id, md5(source) AS h_md5, sha256(source) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_fn_binhex" ->
      """SELECT doc_id, hex(doc_id) AS id_hex,
        |  hex(CAST(source AS BLOB)) AS src_hex,
        |  to_base64(CAST(source AS BLOB)) AS src_b64
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_agg_pctl_disc" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.25) AS q25,
        |  quantile_disc(l_quantity, 0.5)  AS q50,
        |  quantile_disc(l_quantity, 0.9)  AS q90
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_source_csv" ->
      "SELECT * FROM customer ORDER BY c_custkey",
    "q_source_json" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "q_source_orc" ->
      "SELECT * FROM part ORDER BY p_partkey",
    "q_source_xml" ->
      "SELECT * FROM part ORDER BY p_partkey",
    "q_fn_regex" ->
      """SELECT doc_id,
        |  COALESCE(array_to_string(regexp_extract_all(text, 's[a-z]{3,}'), ','), '') AS hits,
        |  CAST(len(regexp_extract_all(text, 's[a-z]{3,}')) AS INT) AS n_hits
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
