package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 ordinal-association wave: Somers' D on a perfectly
  * concordant grid, gamma on a perfectly discordant one, Kendall's W
  * on unanimous rankers — plus range sanity on real data. */
class Analytics68Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("somersd: perfectly concordant priority/price fixture gives " +
      "C = 10, D = 0, d_yx = d_xy = 1") {
    import spark.implicits._
    val dir = Tables.freshDir("a68_sd")
    (1 to 5).map(i => (s"$i-P", i * 50000.0 + 1.0))
      .toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q_agg_somersd")(spark, dir).head
    assert(r.getLong(0) == 10 && r.getLong(1) == 0)
    assert(r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("gkgamma: perfectly discordant quantity/discount fixture gives " +
      "gamma = -1; real data stays in [-1, 1]") {
    import spark.implicits._
    val dir = Tables.freshDir("a68_gk")
    (1 to 5).map(i => (i.toDouble, (6 - i) / 100.0))
      .toDF("l_quantity", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_agg_gkgamma")(spark, dir).head
    assert(r.getLong(0) == 0 && r.getLong(1) == 10)
    assert(r.getDouble(2) == -1.0)
    val real = SparkEntry.queries("q_agg_gkgamma")(spark, sf).head
    assert(math.abs(real.getDouble(2)) <= 1.0)
  }

  test("kendallw: two rankers with identical weekly shapes give W = 1; " +
      "real data stays in [0, 1]") {
    import spark.implicits._
    val dir = Tables.freshDir("a68_kw")
    val rows = for {
      t <- Seq("alpha", "beta")
      d <- 0 to 6
    } yield (new Timestamp(86400000L * (19723 + d)), t, (7 - d) * 10.0)
    rows.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_agg_kendallw")(spark, dir).head
    assert(r.getLong(0) == 2 && r.getLong(1) == 7)
    assert(r.getDouble(3) == 1.0, s"W: $r")
    val real = SparkEntry.queries("q_agg_kendallw")(spark, sf).head
    val w = real.getDouble(3)
    assert(w >= 0.0 && w <= 1.0, s"real W: $w")
  }

  test("degenerate inputs gate to NULL instead of ANSI divide-by-zero: " +
      "single-cell gamma, single-item kendallw") {
    import spark.implicits._
    val g = Tables.freshDir("a68_dg")
    Seq((1.0, 0.01), (1.0, 0.01)).toDF("l_quantity", "l_discount")
      .write.mode("overwrite").parquet(s"$g/lineitem.parquet")
    val gr = SparkEntry.queries("q_agg_gkgamma")(spark, g).head
    assert(gr.getLong(0) == 0 && gr.getLong(1) == 0 && gr.isNullAt(2))
    val k = Tables.freshDir("a68_dk")
    Seq((new Timestamp(86400000L * 19723), "alpha", 1.0),
      (new Timestamp(86400000L * 19723), "beta", 2.0))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$k/events.parquet")
    val kr = SparkEntry.queries("q_agg_kendallw")(spark, k).head
    assert(kr.getLong(1) == 1 && kr.isNullAt(3), s"kendallw: $kr")
  }
}
