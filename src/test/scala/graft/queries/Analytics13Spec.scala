package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the cohort/funnel-latency/negatives
  * wave: a hand-built activity matrix reproduces exact retention
  * shares, hand-timed funnels hit their exact median/p90 buckets, and
  * negative sampling returns exactly k cross-label rows per probe. */
class Analytics13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("cohort: a hand-built activity matrix yields exact per-offset " +
      "retention shares") {
    import spark.implicits._
    val dir = Tables.freshDir("a13_cohort")
    val wk = 604800L
    // user 1: weeks 0,1,2; user 2: weeks 0,2; user 3: weeks 1,2
    val act = Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 2L),
      (3L, 1L), (3L, 2L))
    val rows = act.zipWithIndex.map { case ((u, w), i) =>
      (i.toLong, ts(w * wk + u * 60), u, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_cohort")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5),
      (0L, 2L, 2L, 1.0), (1L, 0L, 1L, 1.0), (1L, 1L, 1L, 1.0)),
      s"matrix: $out")
  }

  test("funnel latency: hand-timed conversions hit their exact " +
      "median and p90 second buckets") {
    import spark.implicits._
    val dir = Tables.freshDir("a13_funnel")
    // signup at t0; clicks at +10/+20/+30 s; one purchase at click+100 s
    val rows = Seq(
      (1L, ts(1000), 1L, "signup"), (2L, ts(1010), 1L, "click"),
      (3L, ts(1110), 1L, "purchase"),
      (4L, ts(2000), 2L, "signup"), (5L, ts(2020), 2L, "click"),
      (6L, ts(3000), 3L, "signup"), (7L, ts(3030), 3L, "click"),
      // pre-signup purchase must NOT count (ordering constraint)
      (8L, ts(900), 1L, "purchase")
    ).map { case (e, t, u, ty) => (e, t, u, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_funnel_latency")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("1_signup_to_click", 3L, 20L, 30L),
      ("2_click_to_purchase", 1L, 100L, 100L)), s"steps: $out")
  }

  test("negatives: every probe draws exactly 4 deterministic " +
      "cross-label negatives") {
    import spark.implicits._
    val dir = Tables.freshDir("a13_neg")
    val emb = (0L until 13L).map(i =>
      (i, if (i < 5) "a" else "b"))
    emb.toDF("vec_id", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_sample_negatives")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.size == 13 * 4)
    val lab = emb.toMap
    out.groupBy(_._1).foreach { case (p, negs) =>
      assert(negs.map(_._3).sorted == Seq(1, 2, 3, 4), s"ranks for $p")
      assert(negs.forall { case (_, c, _) => lab(c) != lab(p) },
        s"same-label negative for probe $p")
    }
    val again = SparkEntry.queries("q_sample_negatives")(spark, dir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == again)
  }
}
