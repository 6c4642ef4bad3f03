package graft.queries

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 ninth LLM-text wave: zlib compressibility scoring (the
  * Gopher-style quality signal — templated/repetitive text compresses
  * far better than natural prose) and the row-hash table diff (the
  * change-data-capture primitive: which rows of a mutated copy
  * actually changed).
  *
  * Scale notes:
  *  - Compressibility runs a REAL codec (java.util.zip.Deflater) in
  *    mapPartitions — the justified escape hatch (same rule as the
  *    multimodal byte parsers: no Expression equivalent exists); one
  *    Deflater per partition, reset per row, no per-row allocation
  *    of the compressor. Map-only; the histogram reduce is bounded.
  *    Deflate output bytes are implementation-stable for a fixed
  *    level on a fixed JRE → deterministic here, but NOT across
  *    JVM vendors — hence no SQL oracle; the spec pins ordering
  *    invariants instead of absolute ratios.
  *  - Row-hash diff: both sides reduce to (key, md5(row)) — the
  *    payload never shuffles, only 32-hex digests; one co-keyed join
  *    classifies changed/unchanged. */
object LlmText9 {

  /** Per-doc deflate compressibility ratio bucketed to a bounded
    * histogram (ratio = compressed/raw, level 6). */
  private def qTextCompressibility(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val scored = t(s, d, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var out = 0
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, raw.length.toLong, out.toLong)
        }
      }.toDF("doc_id", "raw_bytes", "compressed_bytes")
    scored
      .withColumn("bucket", expr(
        "CAST(floor(CAST(compressed_bytes AS DOUBLE) " +
          "/ CAST(raw_bytes AS DOUBLE) * 10) AS INT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_bytes")).as("raw_bytes"),
        sum(col("compressed_bytes")).as("compressed_bytes"))
      .orderBy(col("bucket"))
  }

  /** Row-hash diff of orders against a deterministically mutated copy
    * (every 97th order's total bumped): changed/unchanged counts via
    * digest comparison — the payload never shuffles. */
  private def qFnRowhashDiff(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    def hashed(df: DataFrame): DataFrame =
      df.select(col("o_orderkey").as("k"),
        md5(concat_ws("|", col("o_custkey"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS STRING)")))
          .as("h"))
    val base = hashed(o)
    val mutated = hashed(o.withColumn("o_totalprice",
      when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice"))))
    base.join(mutated.withColumnRenamed("h", "h2"), Seq("k"))
      .select(when(col("h") === col("h2"), "unchanged")
        .otherwise("changed").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("status"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_compressibility" -> (qTextCompressibility _),
    "q_fn_rowhash_diff" -> (qFnRowhashDiff _),
  )

  val sql: Map[String, String] = Map(
    // q_text_compressibility: real zlib output → no SQL oracle
    // (deflate bytes are JRE-implementation detail); LlmText9Spec
    // pins the ordering/determinism contracts.
    "q_fn_rowhash_diff" ->
      """WITH c AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0
        |              THEN 'changed' ELSE 'unchanged' END AS status
        |  FROM orders)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_rows
        |FROM c GROUP BY status ORDER BY status""".stripMargin,
  )
}
