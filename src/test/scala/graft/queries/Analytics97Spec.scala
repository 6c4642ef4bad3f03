package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-14 series/stylometry/density wave.
  * Motif: an exactly repeated 7-day window must surface as the top
  * pair at z-distance 0, and z-normalization must make the match
  * affine-invariant (2·p + c matches p). Yule–Walker: closed-form
  * autocorrelations and AR(2) coefficients on the alternating
  * fixture. KDE/Burrows: structural invariants on the real corpus. */
class Analytics97Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf01 = "/root/testdata/sf0.01"

  private def series(vs: Seq[Long]) = {
    import spark.implicits._
    vs.zipWithIndex
      .map { case (v, i) => (i + 1L, v, i + 1L) }
      .toDF("day", "v", "t")
  }

  // ------------------------------------------------------------ //
  // motif
  // ------------------------------------------------------------ //

  private val p = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L)

  test("motif: an exactly repeated 7-day pattern is the top pair at " +
      "z-distance 0") {
    val vs = p ++ Seq(20L, 30L, 40L) ++ p ++ Seq(50L, 60L, 70L)
    val top = Analytics97.motifPairs(series(vs)).collect()
    assert(top.nonEmpty)
    val h = top.head
    assert(h.getAs[Long]("a") === 1L)
    assert(h.getAs[Long]("b") === 11L)
    assert(h.getAs[Double]("zdist") === 0.0)
  }

  test("motif: z-normalization makes the match affine-invariant " +
      "(2·p + 3 at distance 0 from p)") {
    val scaled = p.map(v => 2L * v + 3L)
    val vs = p ++ Seq(100L, 90L, 80L) ++ scaled
    val top = Analytics97.motifPairs(series(vs)).collect()
    val h = top.head
    assert((h.getAs[Long]("a"), h.getAs[Long]("b")) === ((1L, 11L)))
    assert(h.getAs[Double]("zdist") === 0.0)
  }

  test("motif: the exclusion zone suppresses trivial overlapping " +
      "matches (no pair closer than 7 days)") {
    val vs = (1L to 25L).map(i => (i % 6) + 1)
    val pairs = Analytics97.motifPairs(series(vs)).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("b") - r.getAs[Long]("a") >= 7L)
    }
  }

  test("q_time_motif at sf0.01: ≤5 rows, ordered by distance, " +
      "exclusion respected") {
    val rows = graft.SparkEntry.queries("q_time_motif")(spark, sf01)
      .collect()
    assert(rows.length <= 5 && rows.nonEmpty)
    val ds = rows.map(_.getAs[Double]("zdist"))
    ds.sliding(2).foreach {
      case Array(x, y) => assert(x <= y)
      case _           =>
    }
    rows.foreach(r => assert(
      r.getAs[Number]("b_idx").longValue
        - r.getAs[Number]("a_idx").longValue >= 7L))
  }

  // ------------------------------------------------------------ //
  // Yule–Walker
  // ------------------------------------------------------------ //

  test("yulewalker: alternating series has the closed-form r1=-0.9, " +
      "r2=0.8 (n=10) and the matching AR(2) solve") {
    val vs = Seq.tabulate(10)(i => if (i % 2 == 0) 10L else 0L)
    val r = Analytics97.yuleWalker(series(vs)).collect()(0)
    assert(r.getAs[Double]("r1") === -0.9)
    assert(r.getAs[Double]("r2") === 0.8)
    // phi1 = r1(1-r2)/(1-r1²) = -0.18/0.19; phi2 = (r2-r1²)/(1-r1²)
    assert(math.abs(r.getAs[Double]("phi1") - (-0.18 / 0.19)) < 1e-5)
    assert(math.abs(r.getAs[Double]("phi2") - (-0.01 / 0.19)) < 1e-5)
  }

  test("yulewalker: constant series gates to NULL (zero variance)") {
    val vs = Seq.fill(8)(5L)
    val r = Analytics97.yuleWalker(series(vs)).collect()(0)
    assert(r.isNullAt(r.fieldIndex("phi1")))
  }

  test("yulewalker: white-ish forecast stays near the mean when " +
      "autocorrelation is weak") {
    val r = graft.SparkEntry.queries("q_time_yulewalker")(spark, sf01)
      .collect()(0)
    assert(r.getAs[Long]("n_days") >= 10L)
    val ir = r.getAs[Double]("innov_ratio")
    assert(ir >= -0.01 && ir <= 1.01, s"innov_ratio $ir")
  }

  // ------------------------------------------------------------ //
  // Burrows / KDE corpus invariants
  // ------------------------------------------------------------ //

  test("q_text_burrows at sf0.01: one row per unordered source pair, " +
      "deltas non-negative, ≤30 tokens used") {
    val rows = graft.SparkEntry.queries("q_text_burrows")(spark, sf01)
      .collect()
    val nSources = rows.flatMap(r =>
      Seq(r.getAs[String]("s1"), r.getAs[String]("s2"))).distinct.length
    assert(rows.length === nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("delta") >= 0.0)
      assert(r.getAs[Long]("n_tokens") <= 30L)
      assert(r.getAs[String]("s1") < r.getAs[String]("s2"))
    }
  }

  test("q_agg_kde at sf0.01: 21 grid points, non-negative density, " +
      "unit mass within truncation tolerance") {
    val rows = graft.SparkEntry.queries("q_agg_kde")(spark, sf01)
      .collect()
    assert(rows.length === 21)
    val prices = rows.map(_.getAs[Double]("price"))
    val dens = rows.map(_.getAs[Double]("density"))
    dens.foreach(d => assert(d >= 0.0))
    // trapezoid mass over the evaluation range ≈ 1 (edges truncated)
    val step = (prices.max - prices.min) / 20.0
    val mass = dens.sum * step
    assert(mass > 0.5 && mass < 1.5, s"KDE mass $mass")
  }
}
