package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the DiD/calendar/recall wave: a 2×2
  * hand-built panel hits DiD = 2.0 exactly, epoch day 0 lands on
  * Thursday (dow 3, Mon=0), and the IVF recall report is complete,
  * bounded, deterministic, and high at the nprobe=6/8 operating
  * point on the synthetic corpus. */
class Analytics23Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("did: treated 1→3 vs control 2→2 estimates exactly +2.0") {
    import spark.implicits._
    val dir = Tables.freshDir("a23_did")
    val rows = Seq(
      (1L, ts(0), 1L, "signup", 0.0),
      (2L, ts(0), 1L, "click", 1.0), (3L, ts(1000), 1L, "click", 3.0),
      (4L, ts(0), 2L, "click", 2.0), (5L, ts(1000), 2L, "click", 2.0)
    ).map { case (e, t, u, ty, v) => (e, t, u, ty, v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_did")(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L, 1L, 2.0)), s"did: $out")
  }

  test("calendar: epoch day 0 at 10:00 lands on Thursday (dow 3) " +
      "with the right share") {
    import spark.implicits._
    val dir = Tables.freshDir("a23_cal")
    val rows = Seq(
      (1L, ts(10 * 3600L)),           // Thu 10:00
      (2L, ts(10 * 3600L)),           // Thu 10:00
      (3L, ts(86400L + 10 * 3600L))   // Fri 10:00
    ).map { case (e, t) => (e, t, 1L, "view", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_calendar")(spark, dir)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(out == Seq((3, 10, 2L, 0.666667), (4, 10, 1L, 0.333333)),
      s"calendar: $out")
  }

  test("recall: complete per-label report, bounded hits, " +
      "deterministic, and ≥0.5 mean at nprobe=6/8") {
    val d = "/root/testdata/sf0.001"
    import spark.implicits._
    def run() = SparkEntry.queries("q_sim_recall")(spark, d)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val r1 = run()
    assert(r1.map(_._1).distinct.size == 10, s"labels: $r1")
    assert(r1.forall(r => r._2 == 3L && r._3 >= 0 && r._3 <= 3), s"$r1")
    val mean = r1.map(_._4).sum / r1.size
    assert(mean >= 0.5, s"mean recall $mean: $r1")
    assert(run() == r1, "recall report not deterministic")
  }
}
