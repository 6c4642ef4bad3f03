package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the lift/RFM/Markov wave: a 3-of-4
  * basket pair hits the closed-form lift, 5 strictly-ordered
  * customers land on the diagonal RFM segments, and the transition
  * matrix splits a shared prefix 50/50. */
class Analytics22Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("lift: parts co-bought in 3 of 4 orders score confidence 1 " +
      "and lift 4/3") {
    import spark.implicits._
    val dir = Tables.freshDir("a22_lift")
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (4L, 3L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_agg_lift")(spark, dir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 3L, 1.0, 1.333333)), s"lift: $out")
  }

  test("rfm: 5 strictly-ordered customers land on the diagonal " +
      "(k,k,k) segments") {
    import spark.implicits._
    val dir = Tables.freshDir("a22_rfm")
    val day = 86400L
    // customer k: k orders, each priced 10k, the last on day k
    val rows = for (k <- 1 to 5; i <- 1 to k) yield
      (k.toLong * 100 + i, k.toLong, ts(k * day + 60), k * 10.0)
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_win_rfm")(spark, dir)
      .as[(Int, Int, Int, Long)].collect().toSeq
    assert(out == (1 to 5).map(k => (k, k, k, 1L)).toSeq, s"rfm: $out")
  }

  test("markov: a shared 'view' prefix splits its outgoing " +
      "probability 50/50") {
    import spark.implicits._
    val dir = Tables.freshDir("a22_markov")
    val rows = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"), (3L, 30L, 1L, "click"),
      (4L, 10L, 2L, "view"), (5L, 20L, 2L, "error")
    ).map { case (e, t, u, ty) => (e, ts(t), u, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_markov")(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("click", "click", 1L, 1.0),
      ("view", "click", 1L, 0.5), ("view", "error", 1L, 0.5)),
      s"markov: $out")
  }
}
