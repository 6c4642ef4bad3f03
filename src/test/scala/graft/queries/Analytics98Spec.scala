package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-14 causal/robust-regression wave.
  * psmatch: hand-computed nearest-neighbor ATT on a 4-unit fixture
  * (the logistic score is monotone in activity, so the match targets
  * are checkable by hand), plus the no-controls degenerate path.
  * Sobel: the OLS decomposition identity total = direct + indirect
  * must hold to rounding. ANCOVA/Huber/WLS: structural invariants on
  * the real corpus. */
class Analytics98Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def units(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "tr", "ys", "x")
      .select(col("user_id"), col("tr"),
        col("ys").cast("decimal(28,9)").as("y"), col("x"))
  }

  test("psmatch: hand-computed ATT on the 4-unit fixture — each " +
      "treated matches its score-nearest control") {
    // controls x=1 (y=10), x=5 (y=20); treated x=2 (y=30), x=6 (y=50)
    // score is monotone in x ⇒ matches are (2→1) and (6→5): ATT = 25
    val u = units(Seq(
      (1L, 0L, "10.0", 1L), (2L, 0L, "20.0", 5L),
      (3L, 1L, "30.0", 2L), (4L, 1L, "50.0", 6L)))
    val r = Analytics98.psmatchAtt(u).collect()(0)
    assert(r.getAs[Long]("n_matched") === 2L)
    assert(math.abs(r.getAs[Double]("att") - 25.0) < 1e-9)
  }

  test("psmatch: no controls → zero matches, NULL ATT") {
    val u = units(Seq((1L, 1L, "1.0", 1L), (2L, 1L, "2.0", 3L)))
    val r = Analytics98.psmatchAtt(u).collect()(0)
    assert(r.getAs[Long]("n_matched") === 0L)
    assert(r.isNullAt(r.fieldIndex("att")))
  }

  test("psmatch: with-replacement — one control can serve several " +
      "treated units") {
    // single control between two treated: both must match it
    val u = units(Seq(
      (1L, 0L, "10.0", 4L),
      (2L, 1L, "30.0", 2L), (3L, 1L, "50.0", 6L)))
    val r = Analytics98.psmatchAtt(u).collect()(0)
    assert(r.getAs[Long]("n_matched") === 2L)
    // ATT = ((30-10)+(50-10))/2 = 30
    assert(math.abs(r.getAs[Double]("att") - 30.0) < 1e-9)
  }

  test("q_agg_sobel: the OLS decomposition identity " +
      "total = direct + indirect holds to rounding") {
    val r = graft.SparkEntry.queries("q_agg_sobel")(spark, sf)
      .collect()(0)
    val tot = r.getAs[Double]("total_effect")
    val dir = r.getAs[Double]("direct_effect")
    val ind = r.getAs[Double]("indirect_effect")
    assert(math.abs(tot - (dir + ind)) < 1e-6,
      s"decomposition broken: $tot vs ${dir + ind}")
    val pm = r.getAs[Double]("prop_mediated")
    assert(math.abs(pm - ind / tot) < 1e-4)
  }

  test("q_agg_ancova at sf0.001: one row per returnflag group, a " +
      "shared pooled slope, and a defined group F") {
    val rows = graft.SparkEntry.queries("q_agg_ancova")(spark, sf)
      .collect()
    assert(rows.length === 3)
    val slopes = rows.map(_.getAs[Double]("pooled_slope")).distinct
    assert(slopes.length === 1, s"pooled slope differs: ${slopes.toSeq}")
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("f_group")))
      assert(r.getAs[Double]("adj_mean") > 0)
    }
  }

  test("q_agg_huber at sf0.001: robust location lies inside the " +
      "data hull with sub-unit effective weight") {
    val r = graft.SparkEntry.queries("q_agg_huber")(spark, sf)
      .collect()(0)
    val hm = r.getAs[Double]("huber_mean")
    val m = r.getAs[Double]("mean")
    assert(hm > 0 && hm < 100.0)
    val ew = r.getAs[Double]("effective_weight")
    assert(ew > 0 && ew <= 1.0)
    // value is ~symmetric: robust and plain means agree loosely
    assert(math.abs(hm - m) < 0.5 * m)
  }

  test("q_agg_wls at sf0.001: both fits defined and the 1/x " +
      "weighting visibly moves the slope (low-quantity rows dominate)") {
    val r = graft.SparkEntry.queries("q_agg_wls")(spark, sf)
      .collect()(0)
    val wls = r.getAs[Double]("b1_wls")
    val ols = r.getAs[Double]("b1_ols")
    // this corpus has price ⟂ quantity (corr ≈ −0.01), so no sign
    // assumption — just that both fits are defined and the 1/x
    // re-weighting produces a materially different slope
    assert(!ols.isNaN && !wls.isNaN)
    assert(math.abs(wls - ols) > 1e-6)
    assert(!r.isNullAt(r.fieldIndex("b0_wls")))
  }

  test("q_agg_psmatch at sf0.001: estimator well-defined") {
    val r = graft.SparkEntry.queries("q_agg_psmatch")(spark, sf)
      .collect()(0)
    assert(r.getAs[Long]("n_matched") >= 0L)
  }
}
