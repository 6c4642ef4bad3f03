package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-14 community/drift wave. Labelprop
  * fixpoint: a two-clique graph must converge (no cycle) to exactly
  * its two cliques; a single edge must DEMONSTRATE the sync-LPA
  * period-2 oscillation and terminate via the cycle detector, not the
  * round cap. Drift: metric identities on the real corpus. */
class Analytics100Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sym(edges: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val e = edges.toDF("u", "v", "cn")
    e.union(e.select(e("v").as("u"), e("u").as("v"), e("cn")))
  }

  private def clique(ids: Seq[Long], w: Long): Seq[(Long, Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b, w)

  test("labelprop fixpoint: two cliques with a weak bridge converge " +
      "to exactly the two cliques, no cycle") {
    val g = clique(Seq(1L, 2L, 3L), 5L) ++
      clique(Seq(4L, 5L, 6L), 5L) ++ Seq((3L, 4L, 1L))
    val (lab, rounds, cycled) = Analytics100.labelpropFixpoint(sym(g))
    assert(!cycled)
    assert(rounds < 64)
    val comms = lab.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(comms.values.toSet ===
      Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)))
  }

  test("labelprop fixpoint: a single edge oscillates u⇄v and the " +
      "period-2 cycle detector terminates it (not the round cap)") {
    val (_, rounds, cycled) =
      Analytics100.labelpropFixpoint(sym(Seq((1L, 2L, 1L))))
    assert(cycled)
    assert(rounds <= 3, s"cycle not caught early: $rounds rounds")
  }

  test("labelprop fixpoint: empty graph terminates immediately") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("u", "v", "cn")
    val (lab, rounds, _) = Analytics100.labelpropFixpoint(empty)
    assert(rounds === 0)
    assert(lab.count() === 0L)
  }

  test("q_graph_labelprop_fixpoint at sf0.001: communities cover the " +
      "graph, sizes descend, termination facts attached") {
    val rows = graft.SparkEntry.queries("q_graph_labelprop_fixpoint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val sizes = rows.map(_.getAs[Long]("sz"))
    sizes.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _           =>
    }
    assert(rows.map(_.getAs[Int]("rounds")).distinct.length === 1)
  }

  test("q_embed_drift at sf0.001: cosine ∈ [-1,1], shift ≥ 0, " +
      "norm ratio > 0, one row per label") {
    val rows = graft.SparkEntry.queries("q_embed_drift_label")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("label")).distinct.length === rows.length)
    rows.foreach { r =>
      val c = r.getAs[Double]("centroid_cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Double]("centroid_shift") >= 0.0)
      assert(r.getAs[Double]("norm_ratio") > 0.0)
      // the synthetic embeddings are near-isotropic (centroids sit
      // close to the origin), so the half-vs-half cosine is honest
      // noise around 0 — no sign assumption, only the metric bounds
    }
  }
}
