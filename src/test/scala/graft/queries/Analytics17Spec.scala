package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the Kendall/Wilson/rolling-median wave:
  * monotone grids hit tau ±1 and a hand-counted tie case hits −0.5,
  * the Wilson interval matches the closed form at k=1/n=4, and the
  * 7-slot lower median smooths a hand-built spiky series. */
class Analytics17Spec extends AnyFunSuite {

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

  test("kendall: concordant grid → +1, reversed → −1, and the " +
      "tied 3-row case → −0.5") {
    import spark.implicits._
    val dir = Tables.freshDir("a17_kendall")
    // price buckets: y = floor(price/5000)
    val rows = Seq(
      ("A", 1.0, 1000.0), ("A", 2.0, 6000.0), ("A", 3.0, 12000.0),
      ("B", 1.0, 12000.0), ("B", 2.0, 6000.0), ("B", 3.0, 1000.0),
      // C: (1,y0) (1,y1) (2,y0): C=0 D=1 n1=1 n2=1 → −1/2
      ("C", 1.0, 1000.0), ("C", 1.0, 6000.0), ("C", 2.0, 1000.0))
      .map { case (g, q, p) => (g, q, p) }
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_agg_kendall")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("A", 3L, 3L, 0L, 1.0), ("B", 3L, 0L, 3L, -1.0),
      ("C", 3L, 0L, 1L, -0.5)), s"tau: $out")
  }

  test("wilson: k=1, n=4 reproduces the closed-form 95% interval") {
    import spark.implicits._
    val dir = Tables.freshDir("a17_wilson")
    // one type: values 60, 10, 10, 10 → k=1 of n=4
    val rows = Seq((1L, 60.0), (2L, 10.0), (3L, 10.0), (4L, 10.0))
      .map { case (e, v) => (e, ts(1000 + e), 1L, "click", v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_wilson")(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val z = 1.96; val n = 4.0; val p = 0.25
    val denom = 1.0 + z * z / n
    val center = p + z * z / (2.0 * n)
    val spread = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    assert(out == Seq(("click", 4L, 1L, 0.25,
      r6((center - spread) / denom), r6((center + spread) / denom))),
      s"wilson: $out")
  }

  test("rollmedian: daily counts 5,1,9,3,7 yield lower medians " +
      "3,5,5,5,3 under the 7-slot centered frame") {
    import spark.implicits._
    val dir = Tables.freshDir("a17_rollmed")
    val counts = Seq(5, 1, 9, 3, 7)
    var id = 0L
    val rows = for ((c, day) <- counts.zipWithIndex; _ <- 1 to c) yield {
      id += 1
      (id, ts(day * 86400L + 60), 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_rollmedian")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("view", 0L, 5L, 3L), ("view", 1L, 1L, 5L),
      ("view", 2L, 9L, 5L), ("view", 3L, 3L, 5L), ("view", 4L, 7L, 3L)),
      s"medians: $out")
  }
}
