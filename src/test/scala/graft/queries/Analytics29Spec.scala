package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the confusion/LTV/basket wave: a
  * Spanish doc full of English stopwords lands in the en column of
  * the es row, a two-week purchase series accumulates into the exact
  * per-user LTV staircase, and 1-vs-3-item orders hit their histogram
  * shares. */
class Analytics29Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("confusion: an es-labeled doc written in English stopwords " +
      "shows up as (es → en)") {
    import spark.implicits._
    val dir = Tables.freshDir("a29_conf")
    Seq(
      (0L, "the of and cat", "en", "src0", 1L),   // en → en
      (1L, "the of and dog", "es", "src0", 1L),   // es → en (confused)
      (2L, "el la que gato", "es", "src0", 1L))   // es → es
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_langid_confusion")(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("en", "en", 1L, 1.0), ("es", "en", 1L, 0.5),
      ("es", "es", 1L, 0.5)), s"confusion: $out")
  }

  test("ltv: purchases of 10 then 5 accumulate to 10 and 15 per user " +
      "across cohort ages") {
    import spark.implicits._
    val dir = Tables.freshDir("a29_ltv")
    val wk = 604800L
    val rows = Seq(
      (1L, 0L, "signup", 0.0), (2L, 60L, "purchase", 10.0),
      (3L, wk + 60L, "purchase", 5.0)
    ).map { case (e, t, ty, v) => (e, ts(t), 1L, ty, v, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_ltv")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 0L, 1L, 10.0), (0L, 1L, 1L, 15.0)),
      s"ltv: $out")
  }

  test("basket: one 1-item and one 3-item order split shares 50/50 " +
      "with avg basket 2") {
    import spark.implicits._
    val dir = Tables.freshDir("a29_basket")
    Seq((1L, 10L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_win_basket")(spark, dir)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 0.5, 2.0), (3L, 1L, 0.5, 2.0)),
      s"basket: $out")
  }
}
