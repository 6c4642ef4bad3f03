package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the Holt/Theil–Sen/logreg wave: a
  * constant series smooths to (level = const, trend = 0), a perfectly
  * linear hourly series has exactly its slope as the pairwise median,
  * and a single-class corpus produces the closed-form first
  * gradient-descent step. */
class Analytics11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  test("holt: a constant-value series smooths to level = const, " +
      "trend = 0") {
    import spark.implicits._
    val dir = Tables.freshDir("a11_holt")
    val rows = (0 until 12).map(i =>
      (i.toLong, base.plusMinutes(i.toLong), 7L, "click", 5.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((uid, n, level, trend)) =
      SparkEntry.queries("q_time_holt")(spark, dir)
        .as[(Long, Long, Double, Double)].collect()
    assert(uid == 7L && n == 12L)
    assert(level == 5.0 && trend == 0.0, s"level=$level trend=$trend")
  }

  test("theilsen: hourly counts c = h + 1 give median pairwise slope " +
      "exactly 1.0 over all 45 pairs") {
    import spark.implicits._
    val dir = Tables.freshDir("a11_ts")
    val rows = (0 until 10).flatMap { h =>
      (0 to h).map { i =>
        (h.toLong * 100 + i, base.plusHours(h.toLong).plusMinutes(i.toLong),
          1L, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((et, np, slope)) =
      SparkEntry.queries("q_time_theilsen")(spark, dir)
        .as[(String, Long, Double)].collect()
    assert(et == "click" && np == 45L, s"np=$np")
    assert(slope == 1.0, s"slope=$slope")
  }

  test("logreg: an all-positive corpus yields the closed-form step-1 " +
      "bias 0.05, positive feature weights, and a larger step 2") {
    import spark.implicits._
    val dir = Tables.freshDir("a11_lr")
    val docs = (0 until 10).map(i =>
      (i.toLong, s"alpha bravo charlie d$i", "en", "s", 20L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_logreg")(spark, dir)
      .as[(Long, Double, Double)].collect().toSeq
    val bias = out.filter(_._1 == -1L)
    assert(bias.size == 1 && bias.head._2 == 0.05,
      s"bias step 1: $bias")
    assert(out.forall { case (_, w1, w2) => w1 > 0.0 && w2 > w1 },
      s"weights should grow while p < 1: $out")
  }
}
