package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 two-sample EDF wave: Cramér–von Mises at its
  * closed-form value on disjoint and interleaved fixtures, and
  * Anderson–Darling separating the same two regimes. */
class Analytics69Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** n days of click and view, one event per (type, day); click daily
    * means are `base + day`, view are `day`. */
  private def mkEvents(tag: String, n: Int, base: Double): String = {
    import spark.implicits._
    val dir = Tables.freshDir(tag)
    val rows = for {
      (t, off) <- Seq(("click", base), ("view", 0.0))
      d <- 0 until n
    } yield (new Timestamp(86400000L * (19723 + d)), t, off + d)
    rows.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cvm2: disjoint supports hit the closed form n/6 + 1/(12n); " +
      "identical supports hit the interleave minimum") {
    // click values {100,101,102} vs view {0,1,2}: every click above
    // every view -> U = n^4, T = n/6 + 1/(12n) = 0.527778 at n = 3.
    val hi = SparkEntry.queries("q_agg_cvm2")(
      spark, mkEvents("a69_hi", 3, 100.0)).head
    assert(hi.getLong(0) == 3 && hi.getLong(1) == 3)
    assert(hi.getLong(2) == 81, s"U: $hi")
    assert(hi.getDouble(3) == 0.527778, s"T: $hi")
    // identical daily means: ties broken view-first -> r-i = i for
    // click, i-1 for view -> U = 57, T = 57/54 - 35/36 = 0.083333.
    val lo = SparkEntry.queries("q_agg_cvm2")(
      spark, mkEvents("a69_lo", 3, 0.0)).head
    assert(lo.getLong(2) == 57, s"U: $lo")
    assert(lo.getDouble(3) == 0.083333, s"T: $lo")
  }

  test("ad2: disjoint supports score far above identical supports") {
    val hi = SparkEntry.queries("q_agg_ad2")(
      spark, mkEvents("a69_ahi", 5, 100.0)).head
    val lo = SparkEntry.queries("q_agg_ad2")(
      spark, mkEvents("a69_alo", 5, 0.0)).head
    assert(hi.getLong(0) == 5 && hi.getLong(1) == 5)
    assert(hi.getDouble(2) > 2.0, s"disjoint A2: $hi")
    assert(lo.getDouble(2) < 0.5, s"identical A2: $lo")
    assert(hi.getDouble(2) > 4 * lo.getDouble(2))
  }
}
