package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the triplet/runs/movers wave:
  * orthogonal toy vectors hit their exact hard-positive/negative
  * picks (including the no-positive anchor), a 0-0-1 sign series hits
  * the closed-form runs z, and a two-week rank swap reports ±1 rank
  * gains. */
class Analytics21Spec extends AnyFunSuite {

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

  test("triplet: orthogonal toy vectors pick the right extremes; an " +
      "anchor with no positives reports null pos and 0 semi-hard") {
    import spark.implicits._
    val dir = Tables.freshDir("a21_triplet")
    Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 0.1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_triplet")(spark, dir)
      .as[(Long, Int, Option[Long], Option[Double], Option[Long],
        Option[Double], Long)].collect().toSeq
    val s02 = r6(1.0 / math.sqrt(1.01))   // sim(v0, v2)
    val s12 = r6(0.1 / math.sqrt(1.01))   // sim(v1, v2)
    assert(out == Seq(
      (0L, 0, Some(1L), Some(0.0), Some(2L), Some(s02), 1L),
      (1L, 0, Some(0L), Some(0.0), Some(2L), Some(s12), 1L),
      (2L, 1, None, None, Some(0L), Some(s02), 0L)), s"triplet: $out")
  }

  test("runs: hourly counts 2,2,8 sign to 0,0,1 → R=2, z hits the " +
      "closed form") {
    import spark.implicits._
    val dir = Tables.freshDir("a21_runs")
    val counts = Seq(2, 2, 8)
    var id = 0L
    val rows = for ((c, h) <- counts.zipWithIndex; _ <- 1 to c) yield {
      id += 1
      (id, ts(h * 3600L + 60), 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_runs")(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    val mu = 2.0 * 1 * 2 / 3.0 + 1.0
    val sig2 = (2.0 * 1 * 2 * (2.0 * 1 * 2 - 3)) / (9.0 * 2)
    assert(out == Seq(("view", 2L, 1L, 2L, r6(mu),
      r6((2.0 - mu) / math.sqrt(sig2)))), s"runs: $out")
  }

  test("movers: a two-week rank swap reports +1 for the riser and " +
      "-1 for the faller") {
    import spark.implicits._
    val dir = Tables.freshDir("a21_movers")
    val wk = 604800L
    Seq(
      (1L, ts(60), 100.0), (2L, ts(60), 50.0),
      (1L, ts(wk + 60), 50.0), (2L, ts(wk + 60), 100.0))
      .toDF("l_partkey", "l_shipdate", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_win_movers")(spark, dir)
      .as[(Long, Long, Int, Option[Int], Option[Int], Double)]
      .collect().toSeq
    assert(out == Seq(
      (2L, 1L, 1, Some(2), Some(1), 100.0),
      (1L, 1L, 2, Some(1), Some(-1), 50.0)), s"movers: $out")
  }
}
