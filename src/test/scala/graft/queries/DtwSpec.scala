package graft.queries

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contracts for the native dtw_band expression (identity, symmetry,
  * hand-computed L1 warp costs, lag alignment beating rigid pointwise
  * distance, band widening for unequal lengths, null/empty handling)
  * and the q_time_dtw query (scaled-identical series z-normalize to
  * DTW 0; deterministic across partitionings). */
class DtwSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  private def dtw(a: Seq[Double], b: Seq[Double], w: Int): Option[Double] = {
    import spark.implicits._
    val r = Seq((a, b)).toDF("a", "b")
      .select(expr(s"dtw_band(a, b, $w)")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("dtw_band: identity is 0, symmetric, and the lag-1 series " +
      "aligns at cost 1 where rigid L1 pays 4") {
    val x = Seq(0.0, 1.0, 2.0, 1.0, 0.0)
    val y = Seq(0.0, 0.0, 1.0, 2.0, 1.0)
    assert(dtw(x, x, 3) === Some(0.0))
    assert(dtw(x, y, 3) === dtw(y, x, 3))
    // warp path: x1→y1,y2 (0,0), x2→y3, x3→y4, x4→y5, x5→y5 (|0−1|=1)
    assert(dtw(x, y, 3) === Some(1.0))
    val rigid = x.zip(y).map { case (p, q) => math.abs(p - q) }.sum
    assert(rigid === 4.0)
  }

  test("dtw_band: hand-computed small case, band widening for " +
      "unequal lengths, and empty input → null") {
    // a=[0,1], b=[0,1,1]: path (1,1)(2,2)(2,3) costs 0.
    assert(dtw(Seq(0.0, 1.0), Seq(0.0, 1.0, 1.0), 1) === Some(0.0))
    // lengths 5 vs 1 with band 0: widened to |5−1|=4, path exists;
    // cost = sum |a_i − 7| = 7+6+5+6+7 = 31... with a constant b.
    assert(dtw(Seq(0.0, 1.0, 2.0, 1.0, 0.0), Seq(7.0), 0)
      === Some(31.0))
    assert(dtw(Seq.empty, Seq(1.0), 3) === None)
  }

  test("q_time_dtw: scaled-identical monthly curves z-normalize to " +
      "dtw 0; output is the single ordered pair") {
    import spark.implicits._
    val dir = Tables.freshDir("a45_dtw")
    Seq((1L, 1), (2L, 2)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // nation 1 counts [1,2,1] over 3 months; nation 2 = 2× that curve.
    def month(m: Int) = Date.valueOf(f"1995-0$m%d-15")
    val orders =
      (1 to 1).map(_ => (1L, month(1))) ++
        (1 to 2).map(_ => (1L, month(2))) ++
        (1 to 1).map(_ => (1L, month(3))) ++
        (1 to 2).map(_ => (2L, month(1))) ++
        (1 to 4).map(_ => (2L, month(2))) ++
        (1 to 2).map(_ => (2L, month(3)))
    orders.toDF("o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_time_dtw")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq((1, 2, 3L, 3L, 0.0, 0.0)),
      s"dtw pair wrong: ${out.toSeq}")
  }
}
