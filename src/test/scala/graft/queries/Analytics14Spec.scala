package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the Spearman/ANOVA/nearest-join wave:
  * Spearman hits the closed-form 1 − 6Σd²/(n(n²−1)) on a permuted
  * series and ±1 on monotone ones, ANOVA reproduces a hand-computed F,
  * and the nearest join picks the correct side with the tie going to
  * the earlier click. */
class Analytics14Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  private def writeLineitem(dir: String, rows: Seq[(String, Double, Double)])
      : Unit = {
    import spark.implicits._
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("spearman: permuted ranks hit 1 - 6*sum(d^2)/(n(n^2-1)); " +
      "monotone series hit +/-1") {
    import spark.implicits._
    val dir = Tables.freshDir("a14_spearman")
    // group A: y-rank permutation (1,4,2,3) of x-ranks (1,2,3,4):
    //   d² = 0+4+1+1 = 6 → rho = 1 − 36/60 = 0.4
    // group B: strictly decreasing → −1; group C: increasing → +1
    writeLineitem(dir,
      Seq(("A", 1.0, 10.0), ("A", 2.0, 40.0), ("A", 3.0, 20.0),
        ("A", 4.0, 30.0),
        ("B", 1.0, 3.0), ("B", 2.0, 2.0), ("B", 3.0, 1.0),
        ("C", 1.0, 5.0), ("C", 2.0, 6.0), ("C", 3.0, 7.0)))
    val out = SparkEntry.queries("q_agg_spearman")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("A", 4L, 0.4), ("B", 3L, -1.0), ("C", 3L, 1.0)),
      s"rho: $out")
  }

  test("spearman ties: tie-averaged ranks keep a tied-but-aligned " +
      "series at rho 1.0") {
    import spark.implicits._
    val dir = Tables.freshDir("a14_spearman_ties")
    // x = (1,2,2,3) and y = (10,20,20,40): identical tie structure and
    // order → doubled ranks equal pairwise → rho exactly 1
    writeLineitem(dir,
      Seq(("A", 1.0, 10.0), ("A", 2.0, 20.0), ("A", 2.0, 20.0),
        ("A", 3.0, 40.0)))
    val out = SparkEntry.queries("q_agg_spearman")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("A", 4L, 1.0)), s"rho: $out")
  }

  test("anova: two 3-value groups reproduce the hand-computed " +
      "SSB=13.5, SSW=4, F=13.5 (SS surfaced in thousands since r15 — " +
      "the sf1 round-midpoint fix)") {
    import spark.implicits._
    val dir = Tables.freshDir("a14_anova")
    writeLineitem(dir,
      Seq(("A", 1.0, 0.0), ("A", 2.0, 0.0), ("A", 3.0, 0.0),
        ("B", 4.0, 0.0), ("B", 5.0, 0.0), ("B", 6.0, 0.0)))
    val out = SparkEntry.queries("q_agg_anova")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((2L, 6L, 0.0135, 0.004, 13.5)), s"anova: $out")
  }

  test("nearest join: picks the closer side, breaks exact-distance " +
      "ties toward the earlier click, and skips clickless users") {
    import spark.implicits._
    val dir = Tables.freshDir("a14_nearest")
    val rows = Seq(
      // user 1: click at 90, signup at 100, click at 105 → next (105)
      (1L, ts(90), 1L, "click"), (2L, ts(100), 1L, "signup"),
      (3L, ts(105), 1L, "click"),
      // user 2: clicks equidistant at ±10 → tie → earlier (id 4)
      (4L, ts(190), 2L, "click"), (5L, ts(200), 2L, "signup"),
      (6L, ts(210), 2L, "click"),
      // user 3: only a preceding click
      (7L, ts(290), 3L, "click"), (8L, ts(300), 3L, "signup"),
      // user 4: signup with no clicks at all → excluded
      (9L, ts(400), 4L, "signup")
    ).map { case (e, t, u, ty) => (e, t, u, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_join_nearest")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 3L, 5000000L),
      (2L, 5L, 4L, -10000000L),
      (3L, 8L, 7L, -10000000L)), s"nearest: $out")
  }
}
