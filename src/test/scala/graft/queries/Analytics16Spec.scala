package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the lexdiv/kfold/attribution wave:
  * hand-counted token/type/hapax stats, whitespace-normalized
  * duplicates landing in one fold group, and a purchase crediting
  * exactly its in-window clicks (7-day lookback, exclusive instant). */
class Analytics16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("lexdiv: 'a b a c' counts 4 tokens, 3 types, 2 hapax, " +
      "TTR 0.75, Herdan ln3/ln4") {
    import spark.implicits._
    val dir = Tables.freshDir("a16_lexdiv")
    Seq((0L, "a b a c", "en", "src0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_lexdiv")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    val herdan = BigDecimal(math.log(3.0) / math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq((0L, 4L, 3L, 2L, 0.75, herdan)), s"lexdiv: $out")
  }

  test("kfold: whitespace-variant duplicates share a fold (one group), " +
      "and every doc lands in exactly one fold") {
    import spark.implicits._
    val dir = Tables.freshDir("a16_kfold")
    val docs = Seq(
      (0L, "hello  world", "en", "src0", 12L),
      (1L, "hello world", "en", "src0", 11L)) ++
      (2L to 40L).map(i => (i, s"doc number $i words", "en", "src0", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_split_kfold")(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out.map(_._3).sum == 41L, s"docs conserved: $out")
    assert(out.forall(r => r._1 >= 0 && r._1 <= 4), s"fold range: $out")
    // the two whitespace variants are one content group: total groups
    // across folds = 40 (41 docs − 1 duplicate)
    assert(out.map(_._4).sum == 40L, s"groups: $out")
  }

  test("attribution: a purchase credits its two in-window clicks " +
      "(first/last ids, 0.5 credit); 8-day-old and same-instant " +
      "clicks are excluded") {
    import spark.implicits._
    val dir = Tables.freshDir("a16_attr")
    val day = 86400L
    val t0 = 30L * day
    val rows = Seq(
      // user 1: clicks at −2d (id 1), −1d (id 2); purchase at t0 (id 3)
      (1L, ts(t0 - 2 * day), 1L, "click"),
      (2L, ts(t0 - 1 * day), 1L, "click"),
      (3L, ts(t0), 1L, "purchase"),
      // user 2: click 8 days before → out of window → purchase dropped
      (4L, ts(t0 - 8 * day), 2L, "click"),
      (5L, ts(t0), 2L, "purchase"),
      // user 3: click at the exact purchase instant → excluded → dropped
      (6L, ts(t0), 3L, "click"),
      (7L, ts(t0), 3L, "purchase")
    ).map { case (e, t, u, ty) => (e, t, u, ty, 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_attribution")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 1L, 2L, 0.5)), s"attribution: $out")
  }
}
