package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Hill estimator contract: exact replay on a crafted fixture, and
  * tail-index recovery on an exact Pareto(α = 2) grid. */
class Analytics55Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hill: exact replay on a Pareto(2) grid, alpha recovered " +
      "near 2") {
    import spark.implicits._
    val dir = Tables.freshDir("a55_hill")
    // x_i = 1000 / sqrt(i): an exact Pareto(α=2) order-statistic grid
    val rows = (1 to 150).map(i =>
      (i.toLong, 1000.0 / math.sqrt(i.toDouble)))
    rows.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val sorted = rows.sortBy(r => (-r._2, r._1))
    val xk = sorted(100)._2
    val terms = sorted.take(100).map(r =>
      BigDecimal(r9(math.log(r._2 / xk))))
    val hill = terms.sum.toDouble / 100.0
    val alpha = 100.0 / terms.sum.toDouble
    val out = SparkEntry.queries("q_agg_hill")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq((100L, r6(xk), r6(hill), r6(alpha))),
      s"hill mismatch: ${out.toSeq} vs ${(r6(xk), r6(hill), r6(alpha))}")
    assert(out.head._4 > 1.8 && out.head._4 < 2.3,
      s"alpha ${out.head._4} not near 2")
  }
}
