package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Convergence contracts for the round-13 fixpoint graph drivers:
  * PageRank must reach the analytically-known stationary distribution
  * on crafted star/cycle graphs (something no bounded unroll can
  * promise) and reproduce the oracled 3-round unroll bit-for-bit when
  * capped at 3 rounds; the truss peels must cascade through a
  * multi-round removal chain to the exact maximal 4-truss, with the
  * recount and decremental drivers agreeing edge-for-edge. */
class Analytics83Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sym(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val e = edges.toDF("u", "v")
    e.union(e.select(e("v").as("u"), e("u").as("v")))
  }

  test("pagerank fixpoint: 6-cycle converges to the uniform 1/6; " +
      "round count is data-driven, not 3") {
    val cyc = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1L))
    val (r, rounds) = Analytics83.pagerankFixpoint(sym(cyc))
    val got = r.collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(got.size === 6)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 6) < 1e-4,
      s"cycle rank $v != 1/6"))
    assert(rounds >= 1 && rounds < 128, s"rounds=$rounds")
  }

  test("pagerank fixpoint: 5-node star converges to the closed-form " +
      "stationary distribution (center 0.475676, leaf 0.131081)") {
    val star = (1L to 4L).map(l => (0L, l))
    val (r, _) = Analytics83.pagerankFixpoint(sym(star))
    val got = r.collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    // solve r_c = .03 + .85*4*r_l, r_l = .03 + .85*r_c/4:
    // r_c = 0.132/0.2775, r_l = (1 - r_c)/4
    val rc = 0.132 / 0.2775
    val rl = (1.0 - rc) / 4
    assert(math.abs(got(0L) - rc) < 1e-4, s"center ${got(0L)} != $rc")
    (1L to 4L).foreach(l => assert(math.abs(got(l) - rl) < 1e-4,
      s"leaf ${got(l)} != $rl"))
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("pagerank fixpoint capped at 3 rounds reproduces the oracled " +
      "unroll's top-100 bit-for-bit on sf0.001") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val e0 = Tables.t(spark, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.t(spark, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"),
        (col("l_partkey") * 2 + 1).as("v"))
      .distinct()
    val se = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val (r, rounds) = Analytics83.pagerankFixpoint(se, tol = 0.0,
      maxRounds = 3)
    assert(rounds === 3)
    val capped = r
      .select(col("u").as("node"), round(col("r"), 12).as("rank"))
      .orderBy(desc("rank"), col("node")).limit(100)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    val unroll = SparkEntry.queries("q_graph_pagerank")(spark, d)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(capped === unroll)
  }

  test("ktruss fixpoint: multi-round cascade (K5 + pendant triangle " +
      "chain) peels to exactly the K5 edges under BOTH drivers") {
    // K5 on 1..5 (each edge closes 3 triangles inside the clique);
    // pendant structure: (4,6),(5,6),(5,7),(6,7). sup(5,6)=2 initially
    // (triangles 4-5-6 and 5-6-7) so it SURVIVES round 1 and only
    // falls in round 2 after its two triangles lose their other edges
    // — a genuine cascade no 1-round peel can close.
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = k5 ++ Seq((4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L))
    import spark.implicits._
    val e0 = edges.toDF("u", "v")
    val expect = k5.toSet
    val (fr, roundsR) = Analytics83.ktrussRecount(e0)
    val gotR = fr.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(gotR === expect, s"recount truss wrong: $gotR")
    assert(roundsR >= 2, s"cascade must take >=2 removal rounds " +
      s"(got $roundsR)")
    val (fd, roundsD) = Analytics83.ktrussDecremental(e0)
    val gotD = fd.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(gotD === expect, s"decremental truss wrong: $gotD")
    assert(roundsD >= 2, s"decremental rounds=$roundsD")
  }

  test("ktruss fixpoint: triangle-free path graph peels to empty; " +
      "pure K4 converges with zero removals") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val (fp, _) = Analytics83.ktrussRecount(path)
    assert(fp.count() === 0L)
    val (fpd, _) = Analytics83.ktrussDecremental(path)
    assert(fpd.count() === 0L)
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("u", "v")
    val (fk, _) = Analytics83.ktrussRecount(k4)
    assert(fk.count() === 6L)
    val (fkd, rD) = Analytics83.ktrussDecremental(k4)
    assert(fkd.count() === 6L && rD === 0,
      "stable graph must converge with zero decremental rounds")
  }

  test("end-to-end queries run on sf0.001 (rank mass sums to ~1 over " +
      "the full node set; truss edge list is canonical u<v)") {
    val d = "/root/testdata/sf0.001"
    val pr = SparkEntry.queries("q_graph_pagerank_fixpoint")(spark, d)
    assert(pr.count() > 0)
    val kt = SparkEntry.queries("q_graph_ktruss_fixpoint")(spark, d)
    kt.collect().foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }
}
