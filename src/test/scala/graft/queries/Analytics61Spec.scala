package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture gates for the r11 series diagnostics: Croston's
  * fold replayed by hand, permutation entropy's zero on a monotone
  * series, and the Hurst exponent's super-diffusive answer on a trend. */
class Analytics61Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  private def writeCounts(dir: String, counts: Seq[(Int, Int)]): Unit = {
    import spark.implicits._
    val rows = counts.flatMap { case (d, c) =>
      (0 until c).map(j => ((d * 1000 + j).toLong,
        base.plusDays(d.toLong).plusMinutes(j.toLong), 1L, "click",
        1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("croston: demand days {0:3, 4:6, 10:3} replay to z=3.75, p=5, " +
      "forecast 0.75; a single demand day has NULL forecast") {
    val dir = Tables.freshDir("a61_cr")
    writeCounts(dir, Seq((0, 3), (4, 6), (10, 3)))
    val r = SparkEntry.queries("q_time_croston")(spark, dir).head
    // fold: (3,-,0) → z=3; day4: z=4.5, p=4; day10: z=3.75, p=5
    assert(r.getLong(1) == 3)
    assert(r.getDouble(2) == 3.75 && r.getDouble(3) == 5.0,
      s"state: $r")
    assert(r.getDouble(4) == 0.75, s"forecast: ${r.getDouble(4)}")
    writeCounts(dir, Seq((0, 7)))
    val one = SparkEntry.queries("q_time_croston")(spark, dir).head
    assert(one.getLong(1) == 1 && one.isNullAt(4),
      "single demand day must have no forecast")
  }

  test("permutation entropy: a strictly increasing series has one " +
      "pattern and H = 0; an alternating series is richer") {
    val dir = Tables.freshDir("a61_pe")
    writeCounts(dir, (0 until 12).map(d => (d, d + 1)))
    val mono = SparkEntry.queries("q_time_permentropy")(spark, dir).head
    assert(mono.getLong(1) == 10 && mono.getLong(2) == 1,
      s"patterns: $mono")
    assert(mono.getDouble(3) == 0.0 && mono.getDouble(4) == 0.0)
    // up-down alternation: patterns 132/213 (tie rule never fires)
    writeCounts(dir, (0 until 12).map(d =>
      (d, if (d % 2 == 0) 1 else 5)))
    val alt = SparkEntry.queries("q_time_permentropy")(spark, dir).head
    assert(alt.getLong(2) == 2 && alt.getDouble(4) > 0.0,
      s"alternating: $alt")
  }

  test("hurst: a linear trend is strongly super-diffusive (H > 0.75); " +
      "a constant series yields no usable variance points") {
    val dir = Tables.freshDir("a61_hu")
    writeCounts(dir, (0 until 60).map(d => (d, d + 1)))
    val tr = SparkEntry.queries("q_time_hurst")(spark, dir).head
    assert(tr.getLong(1) == 3, s"points: $tr")
    assert(!tr.isNullAt(5) && tr.getDouble(5) > 0.75,
      s"hurst: ${tr.getDouble(5)}")
    writeCounts(dir, (0 until 60).map(d => (d, 4)))
    val const = SparkEntry.queries("q_time_hurst")(spark, dir).collect()
    assert(const.isEmpty,
      "constant series has zero block variance everywhere → no rows")
  }
}
