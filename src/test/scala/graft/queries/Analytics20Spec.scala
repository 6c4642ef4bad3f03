package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the survival/novelty/effect-size wave:
  * a hand-built cohort reproduces the exact KM staircase with
  * censoring, gram novelty splits a copied doc 1.0 / 0.0, and Cohen's
  * d hits the closed form on two tiny samples. */
class Analytics20Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kaplan-meier: 4 signups, purchases at day 1 (x2) and day 3, " +
      "one censored at the horizon → the textbook staircase") {
    import spark.implicits._
    val dir = Tables.freshDir("a20_km")
    val day = 86400L
    // u1, u2 purchase on day 1; u3 never purchases (censored at the
    // corpus max event = u4's purchase on day 3); u4 purchases day 3.
    // at t=1: n=4, d=2 → S = 0.5; at t=3: n at risk = 4-2-... u3
    // censored at t = (3d - 0) div 1d = 3?? u3's censor time = mx - t0:
    // mx = day3 purchase → (3d − 0) = 3 days → censored AT t=3 (counted
    // at risk at t=3). So at t=3: gone = 2 (the two day-1 events),
    // n_risk = 2, d = 1, c = 1 → S = 0.5 × (1 − 1/2) = 0.25
    val rows = Seq(
      (1L, ts(0), 1L, "signup"), (2L, ts(0), 2L, "signup"),
      (3L, ts(0), 3L, "signup"), (4L, ts(0), 4L, "signup"),
      (5L, ts(1 * day), 1L, "purchase"), (6L, ts(1 * day), 2L, "purchase"),
      (7L, ts(3 * day), 4L, "purchase")
    ).map { case (e, t, u, ty) => (e, t, u, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_survival")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val s1 = r9(math.log(0.5))
    val s3 = r6(math.exp(s1 + r9(math.log(0.5))))
    assert(out == Seq((1L, 4L, 2L, 0L, r6(math.exp(s1))),
      (3L, 2L, 1L, 1L, s3)), s"km: $out")
  }

  test("kaplan-meier absorbed: when every at-risk user converts, " +
      "survival is exactly 0, not a log blow-up") {
    import spark.implicits._
    val dir = Tables.freshDir("a20_km0")
    val day = 86400L
    val rows = Seq(
      (1L, ts(0), 1L, "signup"), (2L, ts(0), 2L, "signup"),
      (3L, ts(1 * day), 1L, "purchase"), (4L, ts(1 * day), 2L, "purchase")
    ).map { case (e, t, u, ty) => (e, t, u, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_survival")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 0L, 0.0)), s"km absorbed: $out")
  }

  test("novelty: an original doc scores 1.0 and its verbatim copy 0.0") {
    import spark.implicits._
    val dir = Tables.freshDir("a20_novelty")
    val text = (1 to 12).map(i => s"w$i").mkString(" ") // 5 8-grams
    Seq((0L, text, "en", "src0", 0L), (1L, text, "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_novelty")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 5L, 5L, 1.0), (1L, 5L, 0L, 0.0)),
      s"novelty: $out")
  }

  test("cohen's d: click (2,4) vs view (1,1,1,3) hits the closed form") {
    import spark.implicits._
    val dir = Tables.freshDir("a20_cohend")
    val rows = Seq(("click", 2.0), ("click", 4.0), ("view", 1.0),
      ("view", 1.0), ("view", 1.0), ("view", 3.0)).zipWithIndex.map {
      case ((ty, v), i) => (i.toLong, ts(1000 + i), 1L, ty, v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_cohend")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // means 3 and 1.5; SS: (4+16)-18=2, (1+1+1+9)-9=3 → pooled
    // var (2+3)/4 = 1.25 → d = 1.5/sqrt(1.25)
    assert(out == Seq((2L, 4L, r6(1.5 / math.sqrt(1.25)))), s"d: $out")
  }
}
