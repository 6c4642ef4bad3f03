package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the concurrency/stickiness/arrival-CV
  * wave: three overlapping 5-minute windows peak at 3 (and touching
  * windows do NOT double-count), a hand-built two-day period hits its
  * exact DAU/MAU ratio, and constant vs alternating gaps hit CV 0 and
  * the closed form. */
class Analytics30Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def writeEvents(dir: String, rows: Seq[(Long, Long, String)])
      : Unit = {
    import spark.implicits._
    rows.map { case (e, t, ty) => (e, ts(t), 1L, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("concurrency: events at +0s/+60s/+120s overlap to 3; an event " +
      "exactly 300s after another does not double-count") {
    val dir = Tables.freshDir("a30_conc")
    writeEvents(dir, Seq((1L, 1000L, "view"), (2L, 1060L, "view"),
      (3L, 1120L, "view"), (4L, 1300L, "view")))
    import spark.implicits._
    val out = SparkEntry.queries("q_win_concurrency")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    // event 4 starts exactly when event 1's window ends → the end
    // processes first, so the peak stays 3 (windows 2,3,4)
    assert(out == Seq((0L, 3L, 1000L * 1000000L)), s"conc: $out")
  }

  test("stickiness: users {1,2} day0 and {1} day1 give avg DAU 1.5 " +
      "over MAU 2") {
    val dir = Tables.freshDir("a30_stick")
    // user ids: events 1,3 → user 1; event 2 → user 2
    import spark.implicits._
    Seq((1L, ts(60L), 1L, "view", 1.0, "{}"),
      (2L, ts(120L), 2L, "view", 1.0, "{}"),
      (3L, ts(86460L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_stickiness")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 2L, 1.5, 0.75)), s"stick: $out")
  }

  test("arrival cv: constant 10s gaps give CV 0; gaps 10/30 give " +
      "sd/mean = sqrt(200)/20") {
    val dir = Tables.freshDir("a30_cv")
    writeEvents(dir, Seq(
      (1L, 100L, "view"), (2L, 110L, "view"), (3L, 120L, "view"),
      (4L, 200L, "click"), (5L, 210L, "click"), (6L, 240L, "click")))
    import spark.implicits._
    val out = SparkEntry.queries("q_time_arrival_cv")(spark, dir)
      .as[(String, Long, Double, Option[Double])].collect().toSeq
    val cv = r6(math.sqrt(200.0) / 20.0) // gaps 10,30: mean 20, var 200
    assert(out == Seq(("click", 2L, 20.0, Some(cv)),
      ("view", 2L, 10.0, Some(0.0))), s"cv: $out")
  }
}
