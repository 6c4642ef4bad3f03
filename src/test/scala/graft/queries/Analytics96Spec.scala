package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-14 causal/calibration wave.
  * Isotonic: the minimax closed form must reproduce hand-computed PAVA
  * pools (violator pooling, monotone output, identity on already-
  * monotone input). IPW: exact hand-computed Hájek ATE on a two-stratum
  * fixture, positivity exclusion counted. Logistic: the one-step Newton
  * closed form on a 2-point exact fixture. HT: design identities —
  * π=1 units are always included and a census (all π=1) reproduces the
  * true total exactly. */
class Analytics96Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ //
  // isotonic (minimax == PAVA)
  // ------------------------------------------------------------ //

  private def grid(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("q", "cnt", "sy")
  }

  test("isotonic: already-monotone means are returned unchanged") {
    // means 10, 20, 30 (unit weights)
    val g = grid(Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 30L)))
    val got = Analytics96.isotonicFit(g).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("isotonic: a single violator pools with its neighbor (PAVA)") {
    // means 10, 30, 20 → PAVA pools {30,20} → 10, 25, 25
    val g = grid(Seq((1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 20L)))
    val got = Analytics96.isotonicFit(g).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1L -> 10.0, 2L -> 25.0, 3L -> 25.0))
  }

  test("isotonic: weighted pooling uses weighted means") {
    // (mean 30, w 3) then (mean 10, w 1): pooled = (90+10)/4 = 25
    val g = grid(Seq((1L, 3L, 90L), (2L, 1L, 10L)))
    val got = Analytics96.isotonicFit(g).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1L -> 25.0, 2L -> 25.0))
  }

  test("isotonic: decreasing input pools to the global mean") {
    val g = grid(Seq((1L, 1L, 50L), (2L, 1L, 30L), (3L, 1L, 10L)))
    val got = Analytics96.isotonicFit(g).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1L -> 30.0, 2L -> 30.0, 3L -> 30.0))
  }

  test("q_agg_isotonic: fit is monotone non-decreasing over the " +
      "quantity grid and covers every grid point") {
    val rows = graft.SparkEntry.queries("q_agg_isotonic")(spark, sf)
      .collect()
    assert(rows.length >= 10)
    val fits = rows.map(_.getAs[Double]("iso_fit"))
    fits.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-9, s"non-monotone fit: $a > $b")
    }
  }

  // ------------------------------------------------------------ //
  // IPW
  // ------------------------------------------------------------ //

  test("ipw: hand-computed two-stratum Hájek ATE with a positivity " +
      "exclusion counted") {
    import spark.implicits._
    // stratum 0: e = 1/2; treated y=10, control y=4.
    // stratum 1: e = 1/3; treated y=9, controls y=5,7.
    // stratum 2: all treated (positivity violation → excluded, 1 user).
    val u = Seq(
      (1L, 1L, "10.0", 0L), (2L, 0L, "4.0", 0L),
      (3L, 1L, "9.0", 1L), (4L, 0L, "5.0", 1L), (5L, 0L, "7.0", 1L),
      (6L, 1L, "3.0", 2L),
    ).toDF("user_id", "tr", "ys", "st")
      .select(col("user_id"), col("tr"),
        col("ys").cast("decimal(28,9)").as("y"), col("st"))
    val r = Analytics96.ipwEstimate(u).collect()(0)
    assert(r.getAs[Long]("n_users") === 6L)
    assert(r.getAs[Long]("n_treated") === 3L)
    assert(r.getAs[Long]("n_excluded") === 1L)
    // mu1 = (10/.5 + 9/(1/3)) / (1/.5 + 1/(1/3)) = (20+27)/(2+3) = 9.4
    // mu0 = (4/.5 + 5/(2/3) + 7/(2/3)) / (2 + 1.5 + 1.5) = 26/5 = 5.2
    assert(math.abs(r.getAs[Double]("mu_treated") - 9.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("mu_control") - 5.2) < 1e-9)
    assert(math.abs(r.getAs[Double]("ate_ipw") - 4.2) < 1e-9)
  }

  test("ipw: all strata degenerate → NULL estimate, everyone excluded") {
    import spark.implicits._
    val u = Seq((1L, 1L, "1.0", 0L), (2L, 1L, "2.0", 0L))
      .toDF("user_id", "tr", "ys", "st")
      .select(col("user_id"), col("tr"),
        col("ys").cast("decimal(28,9)").as("y"), col("st"))
    val r = Analytics96.ipwEstimate(u).collect()(0)
    assert(r.getAs[Long]("n_excluded") === 2L)
    assert(r.isNullAt(r.fieldIndex("ate_ipw")))
  }

  // ------------------------------------------------------------ //
  // logistic one-step Newton
  // ------------------------------------------------------------ //

  test("logistic: exact closed form on the 2-point fixture " +
      "(x=0→y=0, x=1→y=1 ⇒ b0=-2, b1=4)") {
    import spark.implicits._
    val xy = Seq((0L, 0L), (1L, 1L)).toDF("x", "y")
    val r = Analytics96.logisticNewton(xy).collect()(0)
    assert(r.getAs[Double]("b0") === -2.0)
    assert(r.getAs[Double]("b1") === 4.0)
    // p at mean x=0.5: sigmoid(-2 + 4·0.5) = 0.5
    assert(math.abs(r.getAs[Double]("p_at_mean_qty") - 0.5) < 1e-9)
  }

  test("logistic: constant x gates to NULL (singular design)") {
    import spark.implicits._
    val xy = Seq((5L, 0L), (5L, 1L)).toDF("x", "y")
    val r = Analytics96.logisticNewton(xy).collect()(0)
    assert(r.isNullAt(r.fieldIndex("b0")))
    assert(r.isNullAt(r.fieldIndex("b1")))
  }

  // ------------------------------------------------------------ //
  // Horvitz–Thompson
  // ------------------------------------------------------------ //

  test("ht: a census (every π = 1) reproduces the true total exactly") {
    import spark.implicits._
    // 4 equal customers, n=100 target ⇒ π = min(1, 100/4) = 1 for all
    val rev = Seq((1L, 250L), (2L, 250L), (3L, 250L), (4L, 250L))
      .toDF("c", "r")
    val r = Analytics96.htEstimate(rev).collect()(0)
    assert(r.getAs[Long]("n_sample") === 4L)
    assert(r.getAs[Double]("ht_ratio") === 1.0)
    assert(r.getAs[Double]("expected_n") === 4.0)
  }

  test("q_sample_ht at sf0.001: deterministic, near-truth, and the " +
      "expected sample size tracks the realized one") {
    val r = graft.SparkEntry.queries("q_sample_ht")(spark, sf)
      .collect()(0)
    val ratio = r.getAs[Double]("ht_ratio")
    assert(ratio > 0.5 && ratio < 1.5, s"ht_ratio $ratio")
    val nS = r.getAs[Long]("n_sample").toDouble
    val eN = r.getAs[Double]("expected_n")
    assert(math.abs(nS - eN) < 0.5 * eN + 10,
      s"realized $nS vs expected $eN")
    // determinism: second run bit-identical
    val r2 = graft.SparkEntry.queries("q_sample_ht")(spark, sf)
      .collect()(0)
    assert(r.toString === r2.toString)
  }

  // ------------------------------------------------------------ //
  // ridge (shrinkage visible on the real corpus)
  // ------------------------------------------------------------ //

  test("q_agg_ridge at sf0.001: ridge coefficients exist and are " +
      "shrunk relative to OLS in L2 norm") {
    val r = graft.SparkEntry.queries("q_agg_ridge")(spark, sf)
      .collect()(0)
    val (r1, r2) = (r.getAs[Double]("b1_ridge"), r.getAs[Double]("b2_ridge"))
    val (o1, o2) = (r.getAs[Double]("b1_ols"), r.getAs[Double]("b2_ols"))
    val ridgeNorm = r1 * r1 + r2 * r2
    val olsNorm = o1 * o1 + o2 * o2
    // 6dp report rounding can perturb each coefficient by 5e-7
    assert(ridgeNorm <= olsNorm + 1e-3 * (olsNorm + 1.0),
      s"ridge L2 $ridgeNorm > OLS L2 $olsNorm")
  }

  test("q_agg_ipw at sf0.001: estimator well-defined on the corpus") {
    val r = graft.SparkEntry.queries("q_agg_ipw")(spark, sf)
      .collect()(0)
    assert(r.getAs[Long]("n_users") > 0)
    assert(r.getAs[Long]("n_excluded") >= 0)
  }
}
