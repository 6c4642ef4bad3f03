package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Double-sweep diameter: exact on the path fixture (double sweep is
  * exact on trees — the second sweep starts from a true peripheral
  * node), tight on the clique (diameter 1), and on real data the bound
  * is consistent with the reached component. */
class Analytics78Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Writes a lineitem fixture whose support-≥2 co-pair graph is the
    * given edge list (each edge repeated in 2 orders). */
  private def graphDir(tag: String, edges: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = Tables.freshDir(tag)
    var ok = 21000L
    edges.flatMap { case (a, b) =>
      (0 until 2).flatMap { _ => ok += 1; Seq((ok, a), (ok, b)) }
    }.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("path: double sweep reports the exact diameter from a mid seed") {
    // path 100-101-...-110 (diameter 10), plus a K3 at smaller ids so
    // the deterministic min-id seed starts OFF the path's periphery —
    // the clique is disconnected, so the sweep must stay in the seed's
    // component; use ids that keep the path in the seed component:
    // seed = min node = 100 (path end) — to test a NON-peripheral
    // seed, attach a stub 99-105 so the min node 99 hangs mid-path.
    val path = (100L to 109L).map(i => (i, i + 1))
    val dir = graphDir("a78_path", path :+ (99L, 105L))
    val r = SparkEntry.queries("q_graph_diameter")(spark, dir).head
    val (seed, ecc, root2, witness, diam, ub, mid, reached) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(seed == 99L)
    // ecc(99) = 1 + max(5 hops left, 5 hops right) = 6
    assert(ecc == 6L, s"seed ecc: $ecc")
    // sweep 1 lands on a path END (100 or 110, min-id tie-break 100);
    // sweep 2 from an end reaches the other end at the true diameter 10
    assert(Set(100L, 110L).contains(root2), s"sweep-2 root: $root2")
    assert(diam == 10L, s"diameter lb: $diam")
    // certified interval exact on trees: midpoint = path center 105,
    // ecc(105) = 5, so ub = 2*5 = 10 = lb
    assert(mid == 105L, s"midpoint: $mid")
    assert(ub == 10L, s"diameter ub: $ub")
    assert(Set(100L, 110L).contains(witness) && witness != root2,
      s"witness: $witness")
    assert(reached == 12L) // 11 path nodes + the stub
  }

  test("clique: diameter 1, all nodes reached") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val dir = graphDir("a78_k4", k4)
    val r = SparkEntry.queries("q_graph_diameter")(spark, dir).head
    assert(r.getLong(1) == 1L && r.getLong(4) == 1L)
    // interval contains the true diameter; 2·ecc on a clique gives 2
    assert(r.getLong(5) >= 1L && r.getLong(5) <= 2L,
      s"clique ub: ${r.getLong(5)}")
    assert(r.getLong(7) == 4L)
  }

  test("degenerate: no support->=2 edges returns empty, not a throw") {
    import spark.implicits._
    val dir = Tables.freshDir("a78_empty")
    // every (orderkey, partkey) pair occurs once -> no repeated co-pair
    Seq((1L, 10L), (2L, 11L), (3L, 12L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_diameter")(spark, dir)
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("seed", "ecc_seed", "sweep2_root",
      "witness", "diameter_lb", "diameter_ub", "midpoint", "n_reached"))
  }

  test("real data: bound positive, witness pair distinct, reach within " +
      "the node universe") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("q_graph_diameter")(spark, sf).head
    val (diam, ub, reached) = (r.getLong(4), r.getLong(5), r.getLong(7))
    assert(diam >= 1L)
    // certified interval: lb <= ub <= 2*lb (ub = 2*ecc(mid), and
    // ecc(mid) <= lb because lb is lifted to max(lb, ecc(mid)))
    assert(ub >= diam && ub <= 2L * diam, s"interval: [$diam, $ub]")
    assert(r.getLong(2) != r.getLong(3), "witness pair must be distinct")
    import org.apache.spark.sql.functions.col
    val e = Tables.coPairCounts(spark, sf).filter(col("cn") >= 2)
    val n = e.select(col("u"))
      .union(e.select(col("v").as("u"))).distinct().count()
    assert(reached >= 2L && reached <= n)
  }
}
