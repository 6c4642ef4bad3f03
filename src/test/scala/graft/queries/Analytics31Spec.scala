package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the periodogram/Tukey/q-error wave: a
  * planted period-3 hourly cycle is found at lag 3, a planted extreme
  * value trips the IQR fence, and an exactly-representable embedding
  * round-trips with zero quantization error. */
class Analytics31Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("periodogram: a 1,1,5 repeating hourly pattern is dominant at " +
      "lag 3") {
    import spark.implicits._
    val dir = Tables.freshDir("a31_period")
    val pattern = Seq(1, 1, 5)
    var id = 0L
    val rows = for (h <- 0 until 12; _ <- 1 to pattern(h % 3)) yield {
      id += 1
      (id, ts(h * 3600L + 60), 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_periodogram")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.size == 1 && out.head._1 == "view" && out.head._2 == 3L
      && out.head._4 == 1.0, s"periodogram: $out")
  }

  test("tukey: one extreme value among tight ones is the only fence " +
      "breaker") {
    import spark.implicits._
    val dir = Tables.freshDir("a31_tukey")
    val vals = Seq(10.0, 10.1, 10.2, 10.3, 10.4, 10.5, 10.6, 99.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, ts(1000 + i * 60), 1L, "click", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_tukey")(spark, dir)
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out.size == 1 && out.head._5 == 1L, s"tukey: $out")
  }

  test("qerror: values on the exact uint8 lattice round-trip with " +
      "zero error; off-lattice values don't") {
    import spark.implicits._
    val dir = Tables.freshDir("a31_qerror")
    // 0.0 and 1.0 are exactly representable (q = 127.5·(x+1) integral
    // at x ∈ {-1, 1}); 0.0 → q=127.5 rounds to 128 → error ≠ 0,
    // so use x = 1.0 and -1.0 for the zero-error vector
    Seq((0L, Array(1.0f, -1.0f), 0), (1L, Array(0.3f, 0.4f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_qerror")(spark, dir)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(out.size == 1 && out.head._1 == 2L, s"qerror rows: $out")
    assert(out.head._3 > 0.0 && out.head._3 < 0.01,
      s"max err should be small but nonzero: $out")
  }
}
