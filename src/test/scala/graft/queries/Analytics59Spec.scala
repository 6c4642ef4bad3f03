package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture gates for the r11 rank/categorical tests: a
  * hand-computable two-group Kruskal–Wallis (H_adj lands on exactly 9),
  * Brown–Forsythe's zero-between-spread fixture, and McNemar's
  * concordant-only degenerate NULL. */
class Analytics59Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  private def writeEvents(dir: String,
      rows: Seq[(Long, Int, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (id, dayOff, uid, typ, v) =>
      (id, base.plusDays(dayOff.toLong), uid, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("kruskal: two clean-separated tied-within groups give the exact " +
      "closed-form H_adj = 9") {
    val dir = Tables.freshDir("a59_kw")
    // 5 clicks at value 1.0, 5 views at value 2.0: ranks 1-5 vs 6-10,
    // within-group full ties; H = 75/11, C = 25/33, H/C = 9 exactly
    writeEvents(dir,
      (1 to 5).map(i => (i.toLong, i, i.toLong, "click", 1.0)) ++
        (6 to 10).map(i => (i.toLong, i, i.toLong, "view", 2.0)))
    val r = SparkEntry.queries("q_agg_kruskal")(spark, dir).head
    assert(r.getLong(0) == 2 && r.getLong(1) == 10)
    assert(math.abs(r.getDouble(2) - 75.0 / 11.0) < 1e-5,
      s"H: ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(4) - 9.0) < 1e-9,
      s"H_adj: ${r.getDouble(4)}")
  }

  test("levene/brown-forsythe: identical group spreads give SSB = 0 and " +
      "F = 0; widened spread in one group gives F > 0") {
    val dir = Tables.freshDir("a59_bf")
    // both groups have spreads {1,0,1} around their (different) medians
    writeEvents(dir, Seq(
      (1L, 1, 1L, "click", 1.0), (2L, 2, 2L, "click", 2.0),
      (3L, 3, 3L, "click", 3.0),
      (4L, 4, 4L, "view", 10.0), (5L, 5, 5L, "view", 11.0),
      (6L, 6, 6L, "view", 12.0)))
    val same = SparkEntry.queries("q_agg_levene")(spark, dir).head
    assert(same.getDouble(2) == 0.0, s"SSB: ${same.getDouble(2)}")
    assert(same.getDouble(4) == 0.0, s"F: ${same.getDouble(4)}")
    // widen group B: spreads {4,0,4} — between-variance appears
    writeEvents(dir, Seq(
      (1L, 1, 1L, "click", 1.0), (2L, 2, 2L, "click", 2.0),
      (3L, 3, 3L, "click", 3.0),
      (4L, 4, 4L, "view", 7.0), (5L, 5, 5L, "view", 11.0),
      (6L, 6, 6L, "view", 15.0)))
    val diff = SparkEntry.queries("q_agg_levene")(spark, dir).head
    assert(diff.getDouble(4) > 0.0, s"F: ${diff.getDouble(4)}")
  }

  test("mcnemar: crafted discordants give the closed-form corrected " +
      "chi2; concordant-only data gates to NULL") {
    val dir = Tables.freshDir("a59_mc")
    // days 0..9, midpoint day 5. u1: before-only (1,0); u2/u3:
    // after-only (0,1); u4 both; u5 neither → n01=2, n10=1, cc-chi2 =
    // (|2-1|-1)²/3 = 0
    writeEvents(dir, Seq(
      (1L, 1, 1L, "purchase", 1.0), (2L, 8, 1L, "view", 1.0),
      (3L, 8, 2L, "purchase", 1.0), (4L, 1, 2L, "view", 1.0),
      (5L, 9, 3L, "purchase", 1.0), (6L, 0, 3L, "view", 1.0),
      (7L, 1, 4L, "purchase", 1.0), (8L, 9, 4L, "purchase", 1.0),
      (9L, 2, 5L, "view", 1.0), (10L, 0, 5L, "view", 1.0)))
    val r = SparkEntry.queries("q_agg_mcnemar")(spark, dir).head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((1L, 2L, 1L, 1L)), s"cells: $r")
    assert(r.getDouble(5) == 0.0, s"chi2_cc: ${r.getDouble(5)}")
    // concordant-only: every purchaser purchases in both halves
    writeEvents(dir, Seq(
      (1L, 1, 1L, "purchase", 1.0), (2L, 9, 1L, "purchase", 1.0),
      (3L, 2, 2L, "view", 1.0), (4L, 8, 2L, "view", 1.0)))
    val deg = SparkEntry.queries("q_agg_mcnemar")(spark, dir).head
    assert(deg.isNullAt(5), "chi2 must be NULL with no discordant pairs")
  }

  test("cochranq + friedman: deterministic across runs on real data, " +
      "internally consistent") {
    val sf = "/root/testdata/sf0.001"
    val q1 = SparkEntry.queries("q_agg_cochranq")(spark, sf).collect()
    val q2 = SparkEntry.queries("q_agg_cochranq")(spark, sf).collect()
    assert(q1.toSeq == q2.toSeq && q1.length == 1)
    val f1 = SparkEntry.queries("q_agg_friedman")(spark, sf).head
    assert(f1.getLong(0) == 5, s"k: ${f1.getLong(0)}") // 5 event types
    assert(f1.getDouble(2) <= 1.0, s"tie_c: ${f1.getDouble(2)}")
  }
}
