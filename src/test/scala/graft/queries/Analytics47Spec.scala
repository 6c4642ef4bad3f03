package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** IPF/raking contracts: an already-balanced contingency table is a
  * fixed point (weights = counts, factor 1), and on a skewed table the
  * LAST-scaled margin (segments) matches the uniform target exactly
  * while total mass is conserved. */
class Analytics47Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def write(dir: String, cells: Seq[(Int, String, Int)]): Unit = {
    import spark.implicits._
    var ck = 0L
    cells.flatMap { case (nat, seg, n) =>
      (0 until n).map { _ => ck += 1; (ck, nat, seg) }
    }.toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  test("ipf: uniform-margin input is a fixed point (w = n, factor 1)") {
    val dir = Tables.freshDir("a47_fix")
    write(dir, Seq((1, "A", 3), (1, "B", 1), (2, "A", 1), (2, "B", 3)))
    val out = SparkEntry.queries("q_agg_ipf")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1, "A", 3L, 3.0, 1.0), (1, "B", 1L, 1.0, 1.0),
      (2, "A", 1L, 1.0, 1.0), (2, "B", 3L, 3.0, 1.0)),
      s"fixed point violated: ${out.toSeq}")
  }

  test("ipf: skewed table — last-scaled (segment) margins hit the " +
      "uniform target exactly, total mass conserved") {
    val dir = Tables.freshDir("a47_skew")
    write(dir, Seq((1, "A", 2), (1, "B", 2), (2, "A", 4), (2, "B", 8)))
    val out = SparkEntry.queries("q_agg_ipf")(spark, dir)
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getDouble(3)))
      .toMap
    val segA = out((1, "A")) + out((2, "A"))
    val segB = out((1, "B")) + out((2, "B"))
    assert(math.abs(segA - 8.0) < 1e-4, s"seg A margin $segA")
    assert(math.abs(segB - 8.0) < 1e-4, s"seg B margin $segB")
    assert(math.abs(out.values.sum - 16.0) < 1e-4)
    // raking moved mass toward the under-represented nation-1 cells
    assert(out((1, "A")) > 2.0 && out((2, "B")) < 8.0,
      s"raking direction wrong: $out")
  }
}
