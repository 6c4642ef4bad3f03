package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contracts for the incremental-ingest and compaction wave: the delta
  * job processes exactly the unmanifested days THROUGH a pruned
  * partition scan, and compaction conserves rows while hitting the
  * declared file counts on a real filesystem listing. */
class ScalePatterns2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("incremental: only days absent from the manifest (dt % 5 == 0) " +
      "are processed, via a partition-pruned scan") {
    import spark.implicits._
    val dir = Tables.freshDir("sp2_incr")
    val rows = (2000 until 2010).flatMap { day =>
      (0 until (day - 1999)).map { i =>
        val ts = java.time.LocalDateTime.ofEpochSecond(
          day.toLong * 86400 + i * 60, 0, java.time.ZoneOffset.UTC)
        (day.toLong * 100 + i, ts, 1L, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = SparkEntry.queries("q_scan_incremental")(spark, dir)
    val out = df.as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((2000L, 1L, 1.0), (2005L, 6L, 6.0)),
      s"delta days: $out")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("dt"),
      s"delta scan must carry a dt partition filter:\n$plan")
  }

  test("compact: 64 small files collapse to 4 range-clustered files " +
      "with identical content") {
    import spark.implicits._
    val dir = Tables.freshDir("sp2_compact")
    val docs = (0 until 640).map(i =>
      (i.toLong, s"doc body $i", "en", "s", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_layout_compact")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("after", 4L, 640L), ("before", 64L, 640L)),
      s"phases: $out")
    // content survives the rewrite byte-for-byte (modulo order)
    val compacted = spark.read
      .parquet("/root/repo/target/qtmp/layout_compact/compact")
      .as[(Long, String, String, String, Long)].collect().toSeq.sorted
    assert(compacted == docs.map(d =>
      (d._1, d._2, d._3, d._4, d._5)).sorted)
  }
}
