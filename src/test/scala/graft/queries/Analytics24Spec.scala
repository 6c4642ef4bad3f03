package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the skyline/drawdown/backtest wave: a
  * dominated price level drops off the frontier, the drawdown curve
  * reports exact decimal gaps below the running peak, and the lag-1
  * backtest reproduces hand-computed MAE/MAPE. */
class Analytics24Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("skyline: a level dominated on both dimensions drops; " +
      "cheapest and biggest survive") {
    import spark.implicits._
    val dir = Tables.freshDir("a24_skyline")
    Seq((10.0, 5), (10.0, 7), (20.0, 6), (30.0, 9))
      .toDF("p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("q_win_skyline")(spark, dir)
      .as[(Double, Int, Long)].collect().toSeq
    // price 20 (best size 6) is beaten by price 10 / size 7 → dropped
    assert(out == Seq((10.0, 7, 2L), (30.0, 9, 1L)), s"skyline: $out")
  }

  test("drawdown: revenues 100, 60, 120 sit 0, 40, 0 below their " +
      "running peak — exact decimals") {
    import spark.implicits._
    val dir = Tables.freshDir("a24_drawdown")
    val day = 86400L
    Seq((1L, ts(60), 100.0), (2L, ts(day + 60), 60.0),
      (3L, ts(2 * day + 60), 120.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_time_drawdown")(spark, dir)
      .selectExpr("day", "CAST(rev AS DOUBLE) AS rev",
        "CAST(peak AS DOUBLE) AS peak", "CAST(drawdown AS DOUBLE) AS dd")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((0L, 100.0, 100.0, 0.0), (1L, 60.0, 100.0, 40.0),
      (2L, 120.0, 120.0, 0.0)), s"drawdown: $out")
  }

  test("backtest: daily counts 2,4,3 give MAE 1.5 and MAPE " +
      "(0.5 + 1/3)/2") {
    import spark.implicits._
    val dir = Tables.freshDir("a24_backtest")
    val day = 86400L
    val counts = Seq(2, 4, 3)
    var id = 0L
    val rows = for ((c, dd) <- counts.zipWithIndex; _ <- 1 to c) yield {
      id += 1
      (id, ts(dd * day + 60), 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_backtest")(spark, dir)
      .as[(String, Long, Double, Double)].collect().toSeq
    val mape = BigDecimal((0.5 +
      BigDecimal(1.0 / 3.0).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(("view", 2L, 1.5, mape)), s"backtest: $out")
  }
}
