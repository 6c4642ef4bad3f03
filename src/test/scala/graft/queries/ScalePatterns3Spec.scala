package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the partitioned-sink / mergeSchema
  * wave: the sink's real directory layout matches the key cardinality
  * and the pruned read-back counts only its partition; the evolved
  * read null-fills generation 1 and keeps exact sums over the new
  * column. */
class ScalePatterns3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("partitioned sink: 2 types → 2 real partition dirs; clicks " +
      "across 2 days prune to 3 rows / 2 days") {
    import spark.implicits._
    val dir = Tables.freshDir("sp3_sink")
    val day = 86400L
    val rows = Seq(
      (1L, ts(60), "click"), (2L, ts(120), "click"),
      (3L, ts(day + 60), "click"), (4L, ts(60), "view")
    ).map { case (e, t, ty) => (e, t, 1L, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_sink_partitioned")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("click", 3L, 2L, 2L)), s"sink: $out")
  }

  test("mergeSchema: generation 1 reads back null-quality, " +
      "generation 2 keeps its exact sum") {
    import spark.implicits._
    val dir = Tables.freshDir("sp3_merge")
    Seq(
      (0L, "a", "en", "src0", 100L), (2L, "b", "en", "src0", 300L),
      (1L, "c", "en", "src0", 250L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_scan_mergeschema")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("en", 3L, 2L, 1L, 2.5)), s"merge: $out")
  }
}
