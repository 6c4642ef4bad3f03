package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture contracts for the round-10 wave: closeness derives
  * the exact integer centrality figures from the Analytics42Spec
  * landmark graph, and t-closeness flags exactly the distribution-
  * skewed classes — including the strict-inequality boundary at
  * tvd == t. */
class Analytics44Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("closeness: landmark field {1,3,4} reduces to exact integer " +
      "sums, floor-div harmonics, and the harm-desc ordering") {
    import spark.implicits._
    val dir = Tables.freshDir("a44_close")
    // Same graph as Analytics42Spec's sssp test: weights 1000000 div cn.
    val pairs = Seq(
      ((1L, 2L), 2), ((1L, 3L), 10), ((1L, 4L), 2), ((1L, 5L), 2),
      ((3L, 4L), 10), ((4L, 6L), 10))
    var ok = 1000L
    val rows = pairs.flatMap { case ((a, b), cn) =>
      (0 until cn).flatMap { _ => ok += 1; Seq((ok, a), (ok, b)) }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_closeness")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (3L, 3L, 200000L, 20000000L, 15.0),
      (6L, 3L, 600000L, 18333333L, 5.0),
      (1L, 3L, 300000L, 15000000L, 10.0),
      (4L, 3L, 300000L, 15000000L, 10.0),
      (2L, 3L, 1800000L, 5095237L, 1.666666667),
      (5L, 3L, 1800000L, 5095237L, 1.666666667)),
      s"closeness wrong: ${out.toSeq}")
  }

  test("tclose: all-A and all-B classes sit at tvd exactly 0.5 — " +
      "flagged for t in {0.20, 0.35}, NOT at t = 0.50 (strict >)") {
    import spark.implicits._
    val dir = Tables.freshDir("a44_tclose")
    // Class 1: 4×A; class 2: 2×A + 2×B; class 3: 4×B. Global A=6, B=6,
    // N=12 → tvd(1) = tvd(3) = 0.5, tvd(2) = 0.
    val rows =
      (1 to 4).map(i => (100L + i, 1, 500.0, "AUTOMOBILE")) ++
        Seq((201L, 2, 500.0, "AUTOMOBILE"), (202L, 2, 500.0, "AUTOMOBILE"),
          (203L, 2, 500.0, "BUILDING"), (204L, 2, 500.0, "BUILDING")) ++
        (1 to 4).map(i => (300L + i, 3, 500.0, "BUILDING"))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q_quality_tclose")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(
      ("0.20", 3L, 2L, 8L, 12L, 0.5, 0.666666667),
      ("0.35", 3L, 2L, 8L, 12L, 0.5, 0.666666667),
      ("0.50", 3L, 0L, 0L, 12L, 0.5, 0.0)),
      s"tclose sweep wrong: ${out.toSeq}")
  }
}
