package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Step-by-step Scala replay of the Holt–Winters fold and the
  * fixed-point property: a perfectly weekly-periodic series leaves the
  * (level, trend, seasonals) state invariant, so the 1-day forecast is
  * the true next value exactly. */
class Analytics52Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def writeSeries(dir: String, counts: Seq[Int]): Unit = {
    import spark.implicits._
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 1000 + j).toLong,
        base.plusDays(d.toLong).plusMinutes(j.toLong), 1L, "click",
        1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def replay(counts: Seq[Int]):
      (Double, Double, Double, Double) = {
    val y = counts.map(_.toDouble)
    val l0 = y.take(7).sum / 7.0
    val b0 = (y.slice(7, 14).sum - y.take(7).sum) / 49.0
    var l = l0; var b = b0
    val s = Array.tabulate(7)(j => y(j) - l0)
    var pos = 7
    y.drop(7).foreach { yv =>
      val slot = pos % 7
      val lNew = 0.5 * (yv - s(slot)) + 0.5 * (l + b)
      val bNew = 0.5 * (lNew - l) + 0.5 * b
      s(slot) = 0.5 * (yv - lNew) + 0.5 * s(slot)
      l = lNew; b = bNew; pos += 1
    }
    (l, b, l + b + s(pos % 7), l + 7.0 * b + s((pos + 6) % 7))
  }

  test("holtwinters: fold matches a step-by-step Scala replay on a " +
      "trending weekly series") {
    val dir = Tables.freshDir("a52_hw")
    val counts = (0 until 21).map(d => 20 + d + Seq(0, 8, 3, 1, 9, 4, 2)(d % 7))
    writeSeries(dir, counts)
    val (l, b, f1, f7) = replay(counts)
    val out = SparkEntry.queries("q_time_holtwinters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(("click", 21L, r6(l), r6(b), r6(f1), r6(f7))),
      s"hw mismatch: ${out.toSeq} vs ${(r6(l), r6(b), r6(f1), r6(f7))}")
  }

  test("holtwinters: a perfectly weekly-periodic series is a fixed " +
      "point — fcst_1 equals the true next value, trend stays 0") {
    val dir = Tables.freshDir("a52_hw_fp")
    val week = Seq(10, 30, 22, 15, 40, 28, 19)
    val counts = (0 until 28).map(d => week(d % 7))
    writeSeries(dir, counts)
    val out = SparkEntry.queries("q_time_holtwinters")(spark, dir)
      .collect().head
    assert(out.getDouble(3) === 0.0, s"trend ${out.getDouble(3)} != 0")
    // day 28 (0-based) has slot 28 % 7 = 0 → true next value week(0)
    assert(out.getDouble(4) === week(0).toDouble,
      s"fcst_1 ${out.getDouble(4)} != ${week(0)}")
    // 7-day-ahead lands on slot 6 → week(6)
    assert(out.getDouble(5) === week(6).toDouble,
      s"fcst_7 ${out.getDouble(5)} != ${week(6)}")
  }
}
