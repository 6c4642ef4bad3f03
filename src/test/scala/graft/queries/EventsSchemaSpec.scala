package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events.ts contract across driver data regenerations.
  *
  * The driver has shipped events.parquet with different physical ts
  * encodings between rounds: TIMESTAMP(NANOS) — which Spark reads as an
  * epoch-nanos LongType under `nanosAsLong` — then TIMESTAMP_NTZ(MICROS),
  * which silently broke every `ts div 1000` consumer (r6: 26 operators).
  * This spec writes BOTH shapes through the same accessor and asserts
  * identical `us`/`ts_utc` output, so the next regeneration fails loudly
  * here instead of across the whole surface. */
class EventsSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Same logical events, three physical ts generations. Micros chosen to
  // exercise sub-second precision (non-zero micros survive both paths).
  private val usValues = Seq(1704067200000000L, 1704067260123456L,
    1704070000999999L, 1735689600000001L)

  private def writeFixture(shape: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-evschema-$shape").toString
    val base = usValues.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong % 2, s"t$i", i * 1.5, "{}") }
      .toDF("event_id", "us_in", "user_id", "event_type", "value", "props")
    val withTs = shape match {
      // epoch-nanos LongType: how a TIMESTAMP(NANOS) parquet column reads
      // under nanosAsLong — physically a plain int64 on disk.
      case "nanos_long" => base.selectExpr(
        "event_id", "us_in * 1000 AS ts", "user_id", "event_type", "value", "props")
      // TIMESTAMP_NTZ(MICROS): the current driver generation.
      case "ntz" => base.selectExpr(
        "event_id", "timestamp_micros(us_in) AS ts_l", "user_id", "event_type", "value", "props")
        .selectExpr("event_id", "CAST(ts_l AS TIMESTAMP_NTZ) AS ts",
          "user_id", "event_type", "value", "props")
      // tz-adjusted TIMESTAMP(MICROS), for completeness.
      case "ltz" => base.selectExpr(
        "event_id", "timestamp_micros(us_in) AS ts", "user_id", "event_type", "value", "props")
    }
    withTs.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def usOut(dir: String): Map[Long, (Long, Long)] =
    Tables.events(spark, dir)
      .selectExpr("event_id", "us", "unix_micros(ts_utc) AS ts_utc_us")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("nanos-long, ntz, and ltz events generations yield identical us/ts_utc") {
    val expected = usValues.zipWithIndex
      .map { case (us, i) => i.toLong -> (us, us) }
      .toMap
    for (shape <- Seq("nanos_long", "ntz", "ltz")) {
      val got = usOut(writeFixture(shape))
      assert(got == expected, s"shape=$shape: $got")
    }
  }

  test("an unsupported ts type fails loudly, not with a wrong answer") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evschema-bad").toString
    Seq((1L, "not-a-time", 0L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}
