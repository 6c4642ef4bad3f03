package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-9 sixth wave: a graph with
  * no support-≥2 edges must yield an EMPTY shortest-path table (not a
  * throw from the empty 1-row source subquery), and single-row groups
  * must collapse every t-digest estimate to the value itself (digest
  * and exact columns identical). */
class DegenerateInput4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sssp: every co-purchase pair below the support floor -> empty " +
      "distance table, no throw") {
    import spark.implicits._
    val dir = Tables.freshDir("degen4_sssp")
    // each order holds a unique pair -> every pair count is 1 < 2
    Seq((100L, 1L), (100L, 2L), (101L, 3L), (101L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_sssp")(spark, dir).collect()
    assert(out.isEmpty, s"expected empty sssp table: ${out.toSeq}")
  }

  test("t-digest on single-row groups: estimate == exact == the value " +
      "for every quantile, rollup included") {
    import spark.implicits._
    val dir = Tables.freshDir("degen4_td")
    Seq((1L, 1, 100.0, "A", java.sql.Date.valueOf("1995-03-15")),
        (2L, 1, 250.0, "R", java.sql.Date.valueOf("1995-07-02")))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_returnflag", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val td = SparkEntry.queries("q_agg_tdigest")(spark, dir).collect()
    assert(td.length == 2, s"tdigest rows: ${td.toSeq}")
    td.foreach { r =>
      val v = if (r.getString(0) == "A") 100.0 else 250.0
      (2 to 7).foreach(i => assert(r.getDouble(i) == v,
        s"column $i of ${r.getString(0)} != $v: $r"))
    }
    val roll = SparkEntry.queries("q_agg_tdigest_rollup")(spark, dir)
      .collect()
    assert(roll.length == 2, s"rollup rows: ${roll.toSeq}")
    roll.foreach { r =>
      val v = if (r.getString(0) == "A") 100.0 else 250.0
      (2 to 7).foreach(i => assert(r.getDouble(i) == v,
        s"rollup column $i of ${r.getString(0)} != $v: $r"))
    }
  }
}
