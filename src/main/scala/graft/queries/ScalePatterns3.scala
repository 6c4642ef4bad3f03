package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 second scale-pattern wave: the hive-partitioned sink (the
  * layout every warehouse table ships in, verified against the REAL
  * directory layout it produced) and schema-evolution reads over mixed
  * parquet generations (mergeSchema — the parquet sibling of the Avro
  * subsystem's evolution-aware inference).
  *
  * Scale notes:
  *  - Partitioned sink: partition count = distinct key count is
  *    verified from the FILESYSTEM, not assumed, and the read-back
  *    carries a partition-key filter — at 100 TB that filter is the
  *    difference between listing one directory and scanning the table
  *    (the oracle row pins both the pruned row count and the layout).
  *  - MergeSchema: generations are written as separate batches into
  *    one table directory; the evolved read must (a) union the
  *    schemas, (b) null-fill the old generation, (c) keep exact sums
  *    over the new column. All three are pinned by the oracle. */
object ScalePatterns3 {

  /** Hive-partitioned write of events by event_type, then a pruned
    * read-back of ONE partition; reports real partition-dir count,
    * pruned rows, and distinct days inside the partition. */
  private def qSinkPartitioned(s: SparkSession, d: String): DataFrame = {
    val base = freshDir("sink_partitioned")
    events(s, d)
      .select(col("event_id"), col("event_type"), col("us"),
        expr("us div 86400000000").as("dt"))
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    val nDirs = {
      val (fs, path) = hfs(base)
      fs.listStatus(path).count(f => f.isDirectory
        && f.getPath.getName.startsWith("event_type=")).toLong
    }
    val clicks = s.read.parquet(base)
      .filter(col("event_type") === "click")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("dt")).as("n_days"))
    import s.implicits._
    clicks.select(lit("click").as("event_type"), col("n_rows"),
      col("n_days"), lit(nDirs).as("n_partitions"))
  }

  /** Schema-evolution read: generation 1 (no quality column) and
    * generation 2 (adds quality) live in one table dir; the
    * mergeSchema read unions them, null-fills gen-1, and keeps exact
    * aggregates over the evolved column. */
  private def qScanMergeschema(s: SparkSession, d: String): DataFrame = {
    val base = freshDir("scan_mergeschema")
    val docs = t(s, d, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"))
      .write.mode("append").parquet(base)
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"),
        (col("n_chars").cast("double") / 100.0).as("quality"))
      .write.mode("append").parquet(base)
    s.read.option("mergeSchema", "true").parquet(base)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality").isNull, 1L).otherwise(0L)).as("n_gen1"),
        sum(when(col("quality").isNotNull, 1L).otherwise(0L)).as("n_gen2"),
        dbl(sum(dec(col("quality")))).as("sum_quality"))
      .orderBy(col("lang"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_sink_partitioned" -> (qSinkPartitioned _),
    "q_scan_mergeschema" -> (qScanMergeschema _),
  )

  val sql: Map[String, String] = Map(
    "q_sink_partitioned" ->
      """SELECT 'click' AS event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))
        |    // 86400000000) AS BIGINT) AS n_days,
        |  (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
        |   FROM events) AS n_partitions
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "q_scan_mergeschema" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_gen1,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_gen2,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN
        |    CAST(CAST(n_chars AS DOUBLE) / 100.0 AS DECIMAL(18,4))
        |  END) AS DOUBLE) AS sum_quality
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
