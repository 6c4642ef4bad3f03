package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Convergence contracts for the round-14 centrality fixpoints.
  * Eigen: the shifted (A+I) iteration must reach closed-form Perron
  * vectors on star/cycle/pendant-triangle fixtures, and the spec
  * DEMONSTRATES the pure-A period-2 limit cycle on the bipartite star
  * that makes the shift load-bearing. HITS: exact normalized-lattice
  * values on complete-bipartite and hub fixtures, and the 1-round cap
  * must equal the normalized in-degree vector. Katz-adaptive: the
  * monotone lattice fixpoint must land on the closed-form
  * (I − A/(2·dmax))⁻¹·1 values on star and cycle. */
class Analytics94Spec extends AnyFunSuite {

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

  // ------------------------------------------------------------ //
  // eigenvector fixpoint
  // ------------------------------------------------------------ //

  test("eigen fixpoint: 4-leaf star converges to the closed-form " +
      "Perron vector (center 1e6, leaf 5e5) despite bipartiteness") {
    val star = (1L to 4L).map(l => (0L, l))
    val (r, rounds) = Analytics94.eigenFixpoint(sym(star))
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got(0L) === 1000000L)
    // floor-lattice approximation of the exact 1/2 ratio
    (1L to 4L).foreach(l => assert(math.abs(got(l) - 500000L) <= 2L,
      s"leaf ${got(l)} != 500000±2"))
    assert(rounds > 1 && rounds < 128, s"rounds=$rounds")
  }

  test("eigen fixpoint: pure-A iteration (shift=false) period-2 " +
      "limit-cycles on the same star — the shift is load-bearing") {
    val star = (1L to 4L).map(l => (0L, l))
    val (r, rounds) = Analytics94.eigenFixpoint(sym(star),
      shift = false, maxRounds = 10)
    // never converges: burns the full round budget
    assert(rounds === 10)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // the two cycle phases are (leaf=1e6) and (leaf=25e4), never 5e5
    assert(got(1L) === 1000000L || got(1L) === 250000L)
    assert(math.abs(got(1L) - 500000L) > 100000L)
  }

  test("eigen fixpoint: 6-cycle is exactly uniform and converges " +
      "immediately on the lattice") {
    val cyc = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1L))
    val (r, rounds) = Analytics94.eigenFixpoint(sym(cyc))
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got.size === 6)
    got.values.foreach(v => assert(v === 1000000L))
    assert(rounds <= 3, s"rounds=$rounds")
  }

  test("eigen fixpoint: pendant triangle — symmetry holds and the " +
      "triangle-interior nodes outrank the pendant") {
    // triangle {1,2,3} with pendant 4 attached to 1:
    // Perron vector x1 > x2 = x3 > x4 (x1 carries the pendant mass)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val (r, rounds) = Analytics94.eigenFixpoint(sym(g))
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got(1L) === 1000000L)
    assert(math.abs(got(2L) - got(3L)) <= 1L, s"asym ${got(2L)} ${got(3L)}")
    assert(got(2L) < got(1L) && got(4L) < got(2L),
      s"order ${got(1L)} ${got(2L)} ${got(4L)}")
    // closed-form check: λ³−λ²−3λ+1=0 ⇒ λ≈2.17008649, with the
    // shifted normalization x2/x1 = (λ−1)⁻¹... computed directly:
    // x2 = x1·(λ−1)⁻¹·... solve λx2 = x1 + x2 ⇒ x2 = x1/(λ−1)
    val lam = 2.170086486626034
    val exp2 = math.floor(1000000.0 / (lam - 1.0)).toLong
    assert(math.abs(got(2L) - exp2) <= 3L, s"${got(2L)} != $exp2±3")
    val exp4 = math.floor(1000000.0 / lam).toLong
    assert(math.abs(got(4L) - exp4) <= 3L, s"${got(4L)} != $exp4±3")
    assert(rounds < 128)
  }

  // ------------------------------------------------------------ //
  // HITS fixpoint
  // ------------------------------------------------------------ //

  private def cp(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("c", "p")
  }

  test("hits fixpoint: complete bipartite K2x3 — all authorities and " +
      "all hubs exactly 1e6, immediate convergence") {
    val e = for (c <- 1L to 2L; p <- 10L to 12L) yield (c, p)
    val (a, h, rounds) = Analytics94.hitsFixpoint(cp(e))
    a.collect().foreach(r => assert(r.getLong(1) === 1000000L))
    h.collect().foreach(r => assert(r.getLong(1) === 1000000L))
    assert(rounds <= 3, s"rounds=$rounds")
  }

  test("hits fixpoint: 1-round cap equals the normalized in-degree " +
      "vector exactly") {
    // p10 indeg 3, p11 indeg 2, p12 indeg 1 -> 1e6, 666666, 333333
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L), (2L, 11L),
      (3L, 12L))
    val (a, _, rounds) = Analytics94.hitsFixpoint(cp(e), maxRounds = 1)
    assert(rounds === 1)
    val got = a.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(10L -> 1000000L, 11L -> 666666L, 12L -> 333333L))
  }

  test("hits fixpoint: dominant hub/authority pair on a hub fixture " +
      "converges with the expected ordering") {
    // c1 buys p1..p4; c2 buys p1 only: c1 is the stronger hub,
    // p1 the strongest authority (two buyers incl. the top hub)
    val e = Seq((1L, 101L), (1L, 102L), (1L, 103L), (1L, 104L),
      (2L, 101L))
    val (a, h, rounds) = Analytics94.hitsFixpoint(cp(e))
    val ga = a.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val gh = h.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ga(101L) === 1000000L)
    assert(ga(102L) === ga(103L) && ga(103L) === ga(104L))
    assert(ga(102L) < ga(101L))
    assert(gh(1L) === 1000000L && gh(2L) < gh(1L))
    // closed-form: AᵀA fixpoint has a(102)/a(101) = λ-dependent;
    // iterate the 2x2 reduced system to machine precision here
    var (x1, x2) = (1.0, 1.0) // a(101), a(102)
    for (_ <- 1 to 200) {
      val h1 = x1 + 3 * x2 // hub c1
      val h2 = x1          // hub c2
      val hm = math.max(h1, h2)
      val (n1, n2) = (h1 / hm, h2 / hm)
      val a1 = n1 + n2
      val a2 = n1
      val am = math.max(a1, a2)
      x1 = a1 / am; x2 = a2 / am
    }
    assert(math.abs(ga(102L) - math.floor(x2 * 1000000).toLong) <= 3L,
      s"${ga(102L)} != ${math.floor(x2 * 1000000).toLong}±3")
    assert(rounds < 128)
  }

  // ------------------------------------------------------------ //
  // adaptive Katz
  // ------------------------------------------------------------ //

  test("katz adaptive: 4-leaf star lands EXACTLY on the closed-form " +
      "(I − A/8)⁻¹·1 integer fixpoint — center 1.6e12, leaf 1.2e12") {
    val star = (1L to 4L).map(l => (0L, l))
    val (x, dmax, rounds) = Analytics94.katzAdaptive(sym(star))
    assert(dmax === 4L)
    val got = x.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the monotone iteration reaches the LEAST fixpoint of the floor
    // map, 1 lattice ulp under the real-valued 1.6e12/1.2e12
    // (x_c = 1e12 + ⌊4·x_l/8⌋ is stable at 1599999999999)
    assert(got(0L) === 1599999999999L, s"center ${got(0L)}")
    (1L to 4L).foreach(l =>
      assert(got(l) === 1199999999999L, s"leaf ${got(l)}"))
    assert(rounds > 1 && rounds < 64, s"rounds=$rounds")
  }

  test("katz adaptive: cycle — exactly uniform x = 2e12 " +
      "(α·deg = 1/2 exactly)") {
    val cyc = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1L))
    val (x, dmax, rounds) = Analytics94.katzAdaptive(sym(cyc))
    assert(dmax === 2L)
    // least floor-map fixpoint: y = 1e12 + ⌊2y/4⌋ stalls at
    // 1999999999999 (2e12 is also fixed, but unreachable from below)
    x.collect().foreach(r =>
      assert(r.getLong(1) === 1999999999999L, s"${r.getLong(1)}"))
    assert(rounds < 64)
  }

  test("katz adaptive: empty graph returns cleanly with 0 rounds") {
    import spark.implicits._
    val (x, dmax, rounds) = Analytics94.katzAdaptive(
      Seq.empty[(Long, Long)].toDF("u", "v"))
    assert(dmax === 0L && rounds === 0 && x.count() === 0L)
  }

  // ------------------------------------------------------------ //
  // full queries run on real data
  // ------------------------------------------------------------ //

  test("round-14 fixpoint queries produce ranked non-empty output " +
      "on sf0.001 with data-driven round counts") {
    val d = "/root/testdata/sf0.001"
    for (id <- Seq("q_graph_eigen_fixpoint", "q_graph_hits_fixpoint",
        "q_graph_katz_adaptive", "q_graph_ppr_multiseed")) {
      val out = graft.SparkEntry.queries(id)(spark, d).collect()
      assert(out.nonEmpty, id)
    }
  }
}
