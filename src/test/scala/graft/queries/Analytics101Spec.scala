package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the r14 measurement-agreement wave. The paired
  * measures are the stated order total vs the lineitem-recomputed
  * total — near-identical by construction (the crossfield identity
  * holds for most orders), so: Deming slope ≈ OLS slope ≈ 1 with
  * r ≈ 1, Bland–Altman bias ≈ 0 with the outside share ≤ ~5%-ish by
  * the LoA construction, and the OLS-attenuation ordering
  * |OLS| ≤ |Deming| must hold (errors-in-x shrink OLS toward zero).
  * Fleiss: κ is a proper chance-corrected value in [-1, 1]. */
class Analytics101Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("deming: slope ≈ 1 against the recomputed total, OLS " +
      "attenuated at or below Deming, r near 1") {
    val r = graft.SparkEntry.queries("q_agg_deming")(spark, sf)
      .collect()(0)
    val dem = r.getAs[Double]("slope_deming")
    val ols = r.getAs[Double]("slope_ols")
    assert(dem > 0.9 && dem < 1.1, s"deming slope $dem")
    assert(ols <= dem + 1e-9, s"attenuation violated: ols $ols > $dem")
    assert(r.getAs[Double]("pearson_r") > 0.99)
  }

  test("blandaltman: limits bracket the bias, outside share small " +
      "and consistent with its own count") {
    val r = graft.SparkEntry.queries("q_agg_blandaltman")(spark, sf)
      .collect()(0)
    val bias = r.getAs[Double]("bias_dollars")
    val lo = r.getAs[Double]("loa_lo_dollars")
    val hi = r.getAs[Double]("loa_hi_dollars")
    assert(lo <= bias && bias <= hi)
    val n = r.getAs[Long]("n")
    val out = r.getAs[Long]("n_outside")
    val pct = r.getAs[Double]("pct_outside")
    assert(math.abs(pct - out.toDouble / n) < 1e-6)
    assert(pct < 0.2, s"outside share $pct")
  }

  test("fleiss: κ defined, in [-1, 1], with proper agreement terms") {
    val r = graft.SparkEntry.queries("q_agg_fleiss")(spark, sf)
      .collect()(0)
    assert(r.getAs[Long]("n_items") > 0)
    val pbar = r.getAs[Double]("pbar")
    val pe = r.getAs[Double]("pbar_e")
    assert(pbar >= 0 && pbar <= 1)
    assert(pe > 0 && pe < 1)
    val k = r.getAs[Double]("fleiss_kappa")
    assert(k >= -1.0 && k <= 1.0)
  }
}
