package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-graph contract for weighted single-source shortest paths:
  * the weighted distance field must beat a direct weak edge via a
  * 2-edge strong-tie path (proving the op is weighted, not hop-count
  * BFS), and reach a 3-edge-deep node with the exact integer sum. */
class Analytics42Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sssp: 2-edge strong-tie path (200000) beats the direct weak " +
      "edge (500000); 3-edge chain sums exactly") {
    import spark.implicits._
    val dir = Tables.freshDir("a42_sssp")
    // pair -> co-purchase count cn; weight = 1000000 div cn.
    // Source is node 1 (highest sym degree 4, tie-break min id).
    // Expected: d(3)=100000 direct strong; d(4)=200000 via 3 (beats
    // the direct 1-4 weak edge at 500000); d(6)=300000 (3 edges);
    // d(2)=d(5)=500000 (direct weak only).
    val pairs = Seq(
      ((1L, 2L), 2), ((1L, 3L), 10), ((1L, 4L), 2), ((1L, 5L), 2),
      ((3L, 4L), 10), ((4L, 6L), 10))
    var ok = 1000L
    val rows = pairs.flatMap { case ((a, b), cn) =>
      (0 until cn).flatMap { _ =>
        ok += 1; Seq((ok, a), (ok, b))
      }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_sssp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 0L), (3L, 100000L), (4L, 200000L),
      (6L, 300000L), (2L, 500000L), (5L, 500000L)),
      s"sssp distances wrong: ${out.toSeq}")
    // the tree variant carries the argmin parent: 4's parent is 3 (the
    // cheap 2-edge route), NOT the direct weak edge from 1
    val tree = SparkEntry.queries("q_graph_sssp_tree")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(tree.toSeq === Seq((1L, 0L, -1L), (3L, 100000L, 1L),
      (4L, 200000L, 3L), (6L, 300000L, 4L), (2L, 500000L, 1L),
      (5L, 500000L, 1L)),
      s"sssp tree wrong: ${tree.toSeq}")
    // landmarks = top-3 degree {1, 4, 3}; one relaxation run carries
    // all three sources — spot the full 18-row field
    val lm = SparkEntry.queries("q_graph_landmarks")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lm.toSeq === Seq(
      (1L, 1L, 0L), (1L, 3L, 100000L), (1L, 4L, 200000L),
      (1L, 6L, 300000L), (1L, 2L, 500000L), (1L, 5L, 500000L),
      (3L, 3L, 0L), (3L, 1L, 100000L), (3L, 4L, 100000L),
      (3L, 6L, 200000L), (3L, 2L, 600000L), (3L, 5L, 600000L),
      (4L, 4L, 0L), (4L, 3L, 100000L), (4L, 6L, 100000L),
      (4L, 1L, 200000L), (4L, 2L, 700000L), (4L, 5L, 700000L)),
      s"landmark distances wrong: ${lm.toSeq}")
  }

  test("cc: 10-node path (9 hops — past plain 4-round hash-min reach, " +
      "proving the pointer jump), triangle, and pair resolve to 3 " +
      "min-id components") {
    import spark.implicits._
    val dir = Tables.freshDir("a42_cc")
    val pathEdges = (101L to 109L).map(i => (i, i + 1))
    val edges = pathEdges ++ Seq((201L, 202L), (201L, 203L),
      (202L, 203L), (301L, 302L))
    var ok = 5000L
    val rows = edges.flatMap { case (a, b) =>
      (0 until 2).flatMap { _ => ok += 1; Seq((ok, a), (ok, b)) }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_cc")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((101L, 10L), (201L, 3L), (301L, 2L)),
      s"components wrong: ${out.toSeq}")
    // the fixpoint driver agrees on a graph the unroll covers
    val fp = SparkEntry.queries("q_graph_cc_fixpoint")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fp.toSeq === out.toSeq,
      s"fixpoint/unroll divergence on shallow graph: ${fp.toSeq}")
  }

  test("cc fixpoint: a 40-hop path the 4-round unroll cannot close " +
      "converges to ONE component via the accumulator-gated loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 41-node path 100-101-...-140 (40 hops), fed directly as the
    // symmetric edge list the driver iterates over
    val edges = (100L to 139L).map(i => (i, i + 1))
    val sym = edges.toDF("u", "v")
      .union(edges.map(_.swap).toDF("u", "v"))
    // the fixed 4-round unroll leaves the path fragmented...
    val (st4, r4) = Analytics42.ccFixpoint(sym, maxRounds = 4)
    val labels4 = st4.select(col("lbl")).distinct().count()
    assert(r4 == 4 && labels4 > 1,
      s"4 rounds should NOT close a 40-hop path (got $labels4 labels)")
    // ...the fixpoint driver converges: every node labeled min-id 100,
    // in more than 4 but O(log diameter)-ish rounds (well under the cap)
    val (fin, rounds) = Analytics42.ccFixpoint(sym)
    val labels = fin.select(col("lbl")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(labels == Seq(100L),
      s"fixpoint did not converge to one component: $labels")
    assert(fin.count() == 41)
    assert(rounds > 4 && rounds < 64,
      s"unexpected round count $rounds (cap would mean no convergence)")
  }
}
