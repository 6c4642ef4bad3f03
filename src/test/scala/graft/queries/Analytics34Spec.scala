package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the CUPED/lifespan wave: a perfectly
  * correlated pre/post panel removes 100% of the variance with the
  * hand-computed θ, and lifespans 0/2/10 hit their mean, median, and
  * p90 exactly. */
class Analytics34Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("cuped: post = 2×pre across users gives theta 2 and full " +
      "variance reduction") {
    import spark.implicits._
    val dir = Tables.freshDir("a34_cuped")
    // clicks at t=0 (pre) and t=1000 (post); mid = 5e8 µs
    // u1: pre 1, post 2; u2: pre 3, post 6 → θ = cov/var = 2, r² = 1
    val rows = Seq(
      (1L, 0L, 1L, 1.0), (2L, 1000L, 1L, 2.0),
      (3L, 0L, 2L, 3.0), (4L, 1000L, 2L, 6.0)
    ).map { case (e, t, u, v) => (e, ts(t), u, "click", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_cuped")(spark, dir)
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq((2L, Some(2.0), Some(1.0))), s"cuped: $out")
  }

  test("lifespan: spans 0, 2, 10 days report mean 4, median 2, p90 10") {
    import spark.implicits._
    val dir = Tables.freshDir("a34_lifespan")
    val day = 86400L
    val rows = Seq(
      (1L, 0L, 1L),                        // u1: single event → 0 days
      (2L, 0L, 2L), (3L, 2 * day, 2L),     // u2: 2 days
      (4L, 0L, 3L), (5L, 10 * day, 3L)     // u3: 10 days
    ).map { case (e, t, u) => (e, ts(t), u, "view", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_lifespan")(spark, dir)
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out == Seq((3L, 4.0, 2L, 10L)), s"lifespan: $out")
  }
}
