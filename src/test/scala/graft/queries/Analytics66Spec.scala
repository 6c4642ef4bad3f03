package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 split/mixture wave: the group k-fold leakage
  * guarantee, exact stratified proportions, and the EM fit separating
  * a crafted bimodal histogram. */
class Analytics66Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("groupkfold: every source lands in exactly one fold and doc " +
      "totals are preserved") {
    val rows = SparkEntry.queries("q_split_groupkfold")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getLong(4) == 1),
      "a source leaked across folds")
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
  }

  test("stratified holdout: exactly floor(4n/5) train docs per " +
      "language, partition totals preserved") {
    val rows = SparkEntry.queries("q_split_stratified_lang")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tr, te) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tr == 4 * n / 5, s"lang ${r.getString(0)}: $tr != 4*$n/5")
      assert(tr + te == n)
    }
  }

  test("mixture: a crafted 1-vs-9 bimodal histogram separates into " +
      "two components near the true modes, deterministically") {
    import spark.implicits._
    val dir = Tables.freshDir("a66_mx")
    val rows = (1 to 50).map(i => (i.toLong, 1.0)) ++
      (51 to 100).map(i => (i.toLong, 9.0))
    rows.toDF("event_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_agg_mixture")(spark, dir).head
    assert(r.getLong(0) == 100)
    val (w1, mu1, w2, mu2) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(4), r.getDouble(5))
    assert(math.abs(w1 + w2 - 1.0) < 1e-6, s"weights: $r")
    assert(mu1 < mu2, s"component order: $r")
    assert(mu1 > 0.5 && mu1 < 3.0 && mu2 > 7.0 && mu2 < 9.5,
      s"modes: mu1=$mu1 mu2=$mu2")
    val again = SparkEntry.queries("q_agg_mixture")(spark, dir).head
    assert(r == again, "EM fit not deterministic")
  }
}
