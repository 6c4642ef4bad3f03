package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the elasticity/profile wave: a
  * half-price-doubles-demand pair fits elasticity −1 through the
  * exact round-9dp pipeline, and the one-pass profile reports exact
  * null/distinct/extreme values per column. */
class Analytics33Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  private def r9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("elasticity: halving price doubling demand fits −1 through " +
      "the rounded-moment pipeline") {
    import spark.implicits._
    val dir = Tables.freshDir("a33_elastic")
    Seq((1L, 2.0, 10.0), (1L, 4.0, 5.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "BrandA")).toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val out = SparkEntry.queries("q_agg_elasticity")(spark, dir)
      .as[(String, Long, Option[Double])].collect().toSeq
    // mirror the exact pipeline: per-row r9 logs, r9 products,
    // decimal sums, double finish
    val pts = Seq((10.0, 2.0), (5.0, 4.0)).map { case (p, q) =>
      (r9(math.log(p)), r9(math.log(q)))
    }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map { case (x, y) => r9(x * y) }.sum
    val sxx = pts.map { case (x, _) => r9(x * x) }.sum
    val expected = r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
    assert(out == Seq(("BrandA", 2L, Some(expected))), s"elastic: $out")
    assert(math.abs(expected - (-1.0)) < 1e-6, s"slope: $expected")
  }

  test("profile: exact null/distinct/extremes per column in one pass") {
    import spark.implicits._
    val dir = Tables.freshDir("a33_profile")
    val rows = Seq(
      (1L, ts(100), 7L, "click", 2.5, "{}"),
      (2L, ts(200), 9L, "view", 4.5, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_quality_profile")(spark, dir)
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      ("event_type", 2L, 0L, 2L, "click", "view"),
      ("user_id", 2L, 0L, 2L, "7", "9"),
      ("value", 2L, 0L, 2L, "2.5", "4.5")), s"profile: $out")
  }
}
