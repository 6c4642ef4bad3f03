package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the Benford/churn/ntile wave:
  * hand-picked magnitudes hit their first digits and shares, a gap in
  * a user's activity counts as churn (and the censored final period is
  * excluded), and a 5-row group spreads over ntile bins 1..5. */
class Analytics19Spec extends AnyFunSuite {

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

  test("benford: totals 123/19.5/2.3/111 count digits 1:3 and 2:1 " +
      "with log10 expected shares") {
    import spark.implicits._
    val dir = Tables.freshDir("a19_benford")
    Seq((1L, 1L, 123.0), (2L, 1L, 19.5), (3L, 1L, 2.3), (4L, 1L, 111.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_agg_benford")(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    def chi2(obs: Double, exp: Double, n: Double): Double =
      r6((obs - exp) * (obs - exp) / exp * n)
    val e1 = math.log10(2.0); val e2 = math.log10(1.5)
    assert(out == Seq(
      (1, 3L, 0.75, r6(e1), chi2(0.75, e1, 4.0)),
      (2, 1L, 0.25, r6(e2), chi2(0.25, e2, 4.0))), s"benford: $out")
  }

  test("churn: a skipped period counts as churn, the final period is " +
      "right-censored out") {
    import spark.implicits._
    val dir = Tables.freshDir("a19_churn")
    val per = 2592000L // 30 days in seconds
    // u1: p0,p1 (retained at p0, churned at p1-as-last-reported? p1 is
    // not final — p2 exists via u3 — u1's next after p1 is null → churn)
    // u2: p0 only → churned at p0; u3: p0, p2 → gap → churned at p0
    val act = Seq((1L, 0L), (1L, 1L), (2L, 0L), (3L, 0L), (3L, 2L))
    val rows = act.zipWithIndex.map { case ((u, p), i) =>
      (i.toLong + 1, ts(p * per + 60), u, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_churn")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 3L, 2L, r6(2.0 / 3.0)), (1L, 1L, 1L, 1.0)),
      s"churn: $out")
  }

  test("ntile: five distinct prices in one flag land one per bin 1..5") {
    import spark.implicits._
    val dir = Tables.freshDir("a19_ntile")
    val rows = Seq(10.0, 20.0, 30.0, 40.0, 50.0).zipWithIndex.map {
      case (p, i) => (i.toLong, i + 1, i.toLong, i.toLong, 1.0, p, "A")
    }
    rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_agg_ntile")(spark, dir)
      .as[(String, Int, Long, Double, Double)].collect().toSeq
    assert(out == (1 to 5).map(b =>
      ("A", b, 1L, b * 10.0, b * 10.0)).toSeq, s"ntile: $out")
  }
}
