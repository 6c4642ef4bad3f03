package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the round-7 fourth wave: winsorization
  * clamps a planted outlier, skew/kurtosis closed forms on symmetric
  * two-point data, readability counts on a hand-counted document, and
  * the event-pattern regex's error-exclusion semantics. */
class Analytics5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("winsorize: a planted outlier moves the mean but not the " +
      "winsorized mean beyond the p95 clamp") {
    import spark.implicits._
    val dir = Tables.freshDir("a5_winsor")
    // 99 values of 10 and one outlier 10000: p5 = p95 = 10, so the
    // winsorized mean is exactly 10 while the plain mean is 109.9
    val rows = Seq.fill(99)(("A", 10.0)) :+ (("A", 10000.0))
    rows.toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((flag, n, p5, p95, mean, wmean)) =
      SparkEntry.queries("q_agg_winsorize")(spark, dir)
        .as[(String, Long, Double, Double, Double, Double)].collect()
    assert((flag, n, p5, p95) == (("A", 100L, 10.0, 10.0)))
    assert(wmean == 10.0, s"winsorized mean: $wmean")
    assert(mean == 109.9, s"plain mean: $mean")
  }

  test("skewkurt: symmetric ±1 data has skew 0 and excess kurtosis -2") {
    import spark.implicits._
    val dir = Tables.freshDir("a5_skew")
    val rows = Seq.fill(50)(("A", 1.0)) ++ Seq.fill(50)(("A", -1.0))
    rows.toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((_, n, skew, kurt)) =
      SparkEntry.queries("q_agg_skewkurt")(spark, dir)
        .as[(String, Long, Double, Double)].collect()
    assert(n == 100L)
    assert(skew == 0.0, s"skew: $skew")
    assert(kurt == -2.0, s"kurt: $kurt")
  }

  test("readability: hand-counted words / vowel runs / sentence chunks") {
    import spark.implicits._
    val dir = Tables.freshDir("a5_read")
    // 4 words; vowel runs: bread(ea) roll(o) quite(ui, e) demo(e, o)
    // = 6; sentence chunks of 15 words -> 1
    Seq((1L, "bread roll quite demo", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val Array((_, w, syl, sent, fk)) =
      SparkEntry.queries("q_text_readability")(spark, dir)
        .as[(Long, Int, Long, Long, Double)].collect()
    assert((w, syl, sent) == ((4, 6L, 1L)), s"counts: $w $syl $sent")
    val expected = 0.39 * (4.0 / 1.0) + 11.8 * (6.0 / 4.0) - 15.59
    assert(fk == expected, s"fk: $fk vs $expected")
  }

  test("pattern: v..c..p matches only when no error intervenes") {
    import spark.implicits._
    val dir = Tables.freshDir("a5_pattern")
    val base = java.time.LocalDateTime.of(2024, 5, 1, 9, 0, 0)
    def ev(id: Long, u: Long, i: Int, t: String) =
      (id, base.plusMinutes(i.toLong), u, t, 1.0, "{}")
    val rows = Seq(
      // user 1: view, click, purchase -> match
      ev(1, 1, 0, "view"), ev(2, 1, 1, "click"), ev(3, 1, 2, "purchase"),
      // user 2: view, ERROR, click, purchase -> error between v and c
      ev(4, 2, 0, "view"), ev(5, 2, 1, "error"), ev(6, 2, 2, "click"),
      ev(7, 2, 3, "purchase"),
      // user 3: click, purchase, view -> wrong order, no match
      ev(8, 3, 0, "click"), ev(9, 3, 1, "purchase"), ev(10, 3, 2, "view"),
      // user 4: signup, view, signup, click, view, purchase -> match
      // (signup/view between stages are allowed, only error breaks it)
      ev(11, 4, 0, "signup"), ev(12, 4, 1, "view"), ev(13, 4, 2, "signup"),
      ev(14, 4, 3, "click"), ev(15, 4, 4, "view"), ev(16, 4, 5, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_pattern")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 4L), s"matched users: $out")
    assert(out == Seq((1L, 3L, 3), (4L, 6L, 6)), s"rows: $out")
  }
}
