package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Exact replay of the delete-one-stratum jackknife on a crafted
  * 4-nation fixture, plus the zero-variance degenerate (identical
  * strata ⇒ SE exactly 0, not NaN). */
class Analytics58Spec extends AnyFunSuite {

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

  private def write(dir: String, strata: Seq[(Int, Seq[Double])]): Unit = {
    import spark.implicits._
    var ck = 0L; var ok = 0L
    val cust = strata.map { case (nat, _) => ck += 1; (ck, nat) }
    val orders = strata.zipWithIndex.flatMap { case ((_, ys), i) =>
      ys.map { y => ok += 1; (ok, (i + 1).toLong, y) }
    }
    cust.toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("jackknife: replicate ratios and SE match an exact replay") {
    val dir = Tables.freshDir("a58_jk")
    val strata = Seq(
      1 -> Seq(100.0, 150.0, 200.0),
      2 -> Seq(80.0, 90.0),
      3 -> Seq(300.0, 310.0, 320.0, 330.0),
      4 -> Seq(50.0))
    write(dir, strata)
    val ys = strata.map(_._2.sum)
    val xs = strata.map(_._2.size.toLong)
    val (ty, tx) = (ys.sum, xs.sum)
    val g = strata.size
    val rg = strata.indices.map(i =>
      r9((ty - ys(i)) / (tx - xs(i)).toDouble))
    val mean = rg.map(BigDecimal(_)).sum.toDouble / g
    val srr = rg.map(r => BigDecimal(r9(r * r))).sum.toDouble
    val sr = rg.map(BigDecimal(_)).sum.toDouble
    val se = math.sqrt(math.max(0.0,
      (g - 1.0) / g * (srr - sr * sr / g)))
    val out = SparkEntry.queries("q_agg_jackknife")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq((4L, r6(r9(ty / tx)), r6(se))),
      s"jackknife mismatch: ${out.toSeq} vs ${(r6(ty / tx), r6(se))}")
    assert(mean > 0) // silence unused warning paranoia
  }

  test("jackknife: identical strata give SE exactly 0 (not NaN)") {
    val dir = Tables.freshDir("a58_jk0")
    write(dir, Seq(1 -> Seq(10.0, 20.0), 2 -> Seq(10.0, 20.0),
      3 -> Seq(10.0, 20.0)))
    val out = SparkEntry.queries("q_agg_jackknife")(spark, dir)
      .collect().head
    assert(out.getDouble(2) === 0.0, s"SE ${out.getDouble(2)} != 0")
    assert(out.getDouble(1) === 15.0)
  }
}
