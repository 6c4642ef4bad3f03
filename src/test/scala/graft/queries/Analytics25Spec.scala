package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the drift/MDE/purchase-gap wave:
  * hand-built half-means produce exact per-dim diffs ranked by
  * magnitude, MDE reproduces the closed form at n=2, and gaps
  * 3/5/7 hit their discrete median and p90. */
class Analytics25Spec extends AnyFunSuite {

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

  test("drift: even means [2,0] vs odd means [0,4] rank dim 1 " +
      "(|−4|) above dim 0 (|2|)") {
    import spark.implicits._
    val dir = Tables.freshDir("a25_drift")
    Seq((0L, Array(1.0f, 0.0f), 0), (2L, Array(3.0f, 0.0f), 0),
      (1L, Array(0.0f, 4.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_drift")(spark, dir)
      .as[(Int, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1, 0.0, 4.0, -4.0), (0, 2.0, 0.0, 2.0)),
      s"drift: $out")
  }

  test("mde: values 2 and 4 give sd sqrt(2) and the closed-form " +
      "detectable effect") {
    import spark.implicits._
    val dir = Tables.freshDir("a25_mde")
    val rows = Seq((1L, 2.0), (2L, 4.0)).map { case (e, v) =>
      (e, ts(1000 + e), 1L, "click", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_mde")(spark, dir)
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    val sd = math.sqrt(2.0)
    val mde = (1.96 + 0.8416) * sd * math.sqrt(2.0 / 2.0)
    assert(out == Seq(("click", 2L, 3.0, r6(sd), r6(mde),
      r6(mde / 3.0))), s"mde: $out")
  }

  test("purchase gaps 3, 5, 7 report mean 5, median 5, p90 7") {
    import spark.implicits._
    val dir = Tables.freshDir("a25_gap")
    val day = 86400L
    Seq((1L, 1L, 0L), (2L, 1L, 3L), (3L, 1L, 10L),
      (4L, 2L, 0L), (5L, 2L, 5L))
      .map { case (ok, ck, dd) => (ok, ck, ts(dd * day + 60), 1.0) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_win_purchasegap")(spark, dir)
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(out == Seq((3L, 5.0, 5L, 7L)), s"gaps: $out")
  }
}
