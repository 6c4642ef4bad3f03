package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 scale-pattern wave: manifest-driven incremental ingest
  * (process only partitions absent from the committed manifest — the
  * batch-incremental pattern every production pipeline runs) and
  * small-file compaction (the table-maintenance rewrite that keeps scan
  * parallelism healthy).
  *
  * Scale notes:
  *  - Incremental: the partition listing is metadata-only (partition
  *    values, no data scan); the delta day-list collected to the driver
  *    is calendar-bounded (365 values/yr — the same bounded-model-state
  *    contract as the IVF codebooks), and the submitted job carries a
  *    STATIC partition filter, so the scan prunes to delta directories —
  *    at 100 TB the job reads only the new day's data.
  *  - Compaction: a range-clustered rewrite (repartitionByRange on the
  *    key + sortWithinPartitions) — the same shape as q_layout_zorder's
  *    rewrite, but targeting file-count hygiene; the query output
  *    reports REAL filesystem file counts, so the oracle check fails if
  *    the rewrite stops producing the declared layout. */
object ScalePatterns2 {

  /** Incremental ingest of the date-partitioned events copy: days with
    * dt % 5 == 0 are "new" (absent from the manifest); aggregate only
    * those partitions. */
  private def qScanIncremental(s: SparkSession, d: String): DataFrame = {
    val p = s"/root/repo/target/qtmp/events_bydate_${math.abs(d.hashCode)}"
    if (!pathExists(s"$p/_SUCCESS")) {
      events(s, d).withColumn("dt", expr("us div 86400000000"))
        .write.mode("overwrite").partitionBy("dt").parquet(p)
    }
    val part = s.read.parquet(p)
    // Partition-values-only listing (no data scan), then the committed
    // manifest (here: every day except dt % 5 == 0) anti-joins it.
    val avail = part.select(col("dt")).distinct()
    val manifest = avail.filter(col("dt").cast("long") % 5 =!= 0)
    // Collect the calendar-bounded delta NATIVELY typed (partition
    // column inference decides int vs string), so the isin filter
    // compares without casts and static partition pruning applies.
    val delta = avail.join(manifest, Seq("dt"), "left_anti")
      .collect().map(_.get(0))
    part.filter(col("dt").isin(delta.toSeq: _*))
      .groupBy(col("dt").cast("long").as("dt"))
      .agg(count(lit(1)).as("n_events"),
        dbl(sum(dec(col("value")))).as("sum_value"))
      .orderBy(col("dt"))
  }

  /** Small-file compaction: 64 round-robin files → 4 range-clustered
    * files; reports REAL before/after file counts + row conservation. */
  private def qLayoutCompact(s: SparkSession, d: String): DataFrame = {
    val base = freshDir("layout_compact")
    t(s, d, "documents").repartition(64)
      .write.mode("overwrite").parquet(s"$base/small")
    def nFiles(p: String): Long = {
      val (fs, path) = hfs(p)
      fs.listStatus(path).count(f => f.getPath.getName.startsWith("part-")
        && f.getPath.getName.endsWith(".parquet")).toLong
    }
    val before = nFiles(s"$base/small")
    s.read.parquet(s"$base/small")
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(s"$base/compact")
    val after = nFiles(s"$base/compact")
    val rows = s.read.parquet(s"$base/compact").count()
    import s.implicits._
    Seq(("before", before, rows), ("after", after, rows))
      .toDF("phase", "n_files", "n_rows")
      .orderBy(col("phase"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_scan_incremental" -> (qScanIncremental _),
    "q_layout_compact" -> (qLayoutCompact _),
  )

  val sql: Map[String, String] = Map(
    "q_scan_incremental" ->
      """SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |    AS BIGINT) AS dt,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 5 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_layout_compact" ->
      """SELECT 'after' AS phase, CAST(4 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM documents
        |UNION ALL
        |SELECT 'before', CAST(64 AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM documents
        |ORDER BY phase""".stripMargin,
  )
}
