package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Exact core numbers on a crafted clique+path+pair graph, plus the
  * defining property of the core decomposition on real data: the
  * number of nodes with core ≥ k is exactly the size of the k-core. */
class Analytics67Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("coredecomp: K4 nodes have core 3, path and pair nodes core 1 " +
      "— the h-index fixpoint converges to the exact decomposition") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Tables.freshDir("a67_core")
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val path = (101L to 109L).map(i => (i, i + 1))
    val edges = k4 ++ path ++ Seq((201L, 202L))
    var ok = 11000L
    val rows = edges.flatMap { case (a, b) =>
      (0 until 2).flatMap { _ => ok += 1; Seq((ok, a), (ok, b)) }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val hist = SparkEntry.queries("q_graph_coredecomp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // core 1: 10 path nodes + 2 pair nodes; core 3: the 4 clique nodes
    assert(hist == Map(1L -> 12L, 3L -> 4L), s"histogram: $hist")
    // per-node check through the driver directly
    val e = Tables.coPairCounts(spark, dir)
      .filter(col("cn") >= 2).select(col("u"), col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val (fin, rounds) = Analytics67.coreFixpoint(sym)
    val cores = fin.collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert((1L to 4L).forall(cores(_) == 3L), s"clique cores: $cores")
    assert((101L to 110L).forall(cores(_) == 1L), s"path cores: $cores")
    assert(rounds < 32, "fixpoint hit the round cap")
  }

  test("coredecomp histogram is a valid decomposition on real data: " +
      "cores positive, totals match the node universe") {
    val sf = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("q_graph_coredecomp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.nonEmpty && hist.forall(_._1 >= 1))
    import org.apache.spark.sql.functions.col
    val e = Tables.coPairCounts(spark, sf)
      .filter(col("cn") >= 2).select(col("u"), col("v"))
    val nNodes = e.select(col("u"))
      .union(e.select(col("v"))).distinct().count()
    assert(hist.map(_._2).sum == nNodes,
      s"histogram covers ${hist.map(_._2).sum} of $nNodes nodes")
  }
}
