package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contract for the repeat-purchase wave: 2 of 3
  * purchasers buy again, with hand-timed 3- and 7-day second
  * purchases yielding a discrete median of 3. */
class Analytics35Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("reorder: 2 of 3 purchasers repeat; 3- and 7-day gaps give " +
      "median 3 (third purchases ignored)") {
    import spark.implicits._
    val dir = Tables.freshDir("a35_reorder")
    val day = 86400L
    val rows = Seq(
      // u1: purchases at day 0, 3, 20 → gap 3 (the 20 must not matter)
      (1L, 0L, 1L), (2L, 3 * day, 1L), (3L, 20 * day, 1L),
      // u2: purchases at day 0, 7 → gap 7
      (4L, 0L, 2L), (5L, 7 * day, 2L),
      // u3: one purchase only
      (6L, 0L, 3L)
    ).map { case (e, t, u) => (e, ts(t), u, "purchase", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_reorder")(spark, dir)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq((3L, 2L, 0.666667, 3L)), s"reorder: $out")
  }
}
