package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the round-14 rules/distance wave: rule algebra
  * identities (confidence bounds, lift symmetry), the metric axioms
  * the distances must satisfy on the real corpus, and the known
  * relationships between them (H² ≤ 1, BC ≤ 1, W₁ in value units
  * bounded by the domain span). */
class Analytics99Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("assocrules: confidence ∈ (0,1], support ≥ floor, lift " +
      "symmetric across the two directions of a pair") {
    val rows = graft.SparkEntry.queries("q_agg_assocrules")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0 && conf <= 1.0)
      assert(r.getAs[Long]("support_orders") >= 5L)
      assert(r.getAs[Double]("lift") > 0)
    }
    // lift(a→b) = lift(b→a): any pair present in both directions in
    // the top-20 must carry the same lift
    val byPair = rows.groupBy(r => {
      val a = r.getAs[Long]("antecedent"); val b = r.getAs[Long]("consequent")
      (math.min(a, b), math.max(a, b))
    })
    byPair.values.filter(_.length == 2).foreach { pr =>
      assert(pr(0).getAs[Double]("lift") === pr(1).getAs[Double]("lift"))
    }
  }

  test("mmd: non-negative, zero iff both moment gaps vanish") {
    val r = graft.SparkEntry.queries("q_agg_mmd")(spark, sf).collect()(0)
    val mmd2 = r.getAs[Double]("mmd2")
    assert(mmd2 >= 0.0)
    val mg = r.getAs[Double]("mean_gap")
    val qg = r.getAs[Double]("second_moment_gap")
    if (mmd2 == 0.0) assert(math.abs(mg) < 1e-3 && math.abs(qg) < 1e-3)
  }

  test("wasserstein: non-negative, bounded by the value-domain span") {
    val r = graft.SparkEntry.queries("q_agg_wasserstein")(spark, sf)
      .collect()(0)
    val w = r.getAs[Double]("wasserstein1")
    assert(w >= 0.0)
    assert(w <= 100.0, s"W1 $w exceeds the value span")
    assert(r.getAs[Long]("n_view") > 0)
  }

  test("hellinger: BC ∈ (0,1], H ∈ [0,1), and H² = 1 − BC to rounding") {
    val r = graft.SparkEntry.queries("q_agg_hellinger")(spark, sf)
      .collect()(0)
    val bc = r.getAs[Double]("bhattacharyya")
    val h = r.getAs[Double]("hellinger")
    assert(bc > 0 && bc <= 1.0)
    assert(h >= 0 && h < 1.0)
    assert(math.abs(h * h - (1.0 - bc)) < 1e-4)
  }
}
