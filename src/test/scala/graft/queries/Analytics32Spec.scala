package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the new-vs-returning / OOV wave: a
  * two-week roster splits exactly into new and returning, and tokens
  * outside a hand-frozen vocabulary are counted per language. */
class Analytics32Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("new vs returning: week 0 all-new, week 1 splits 1 new / " +
      "2 returning") {
    import spark.implicits._
    val dir = Tables.freshDir("a32_nr")
    val wk = 604800L
    // u1, u2 active wk0; u1, u2, u3 active wk1
    val act = Seq((1L, 0L), (2L, 0L), (1L, 1L), (2L, 1L), (3L, 1L))
    val rows = act.zipWithIndex.map { case ((u, w), i) =>
      (i.toLong + 1, ts(w * wk + 60), u, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_newreturning")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 0L, 1.0), (1L, 1L, 2L, 0.333333)),
      s"nr: $out")
  }

  test("oov: tokens outside the top-20 vocabulary are counted per " +
      "language") {
    import spark.implicits._
    val dir = Tables.freshDir("a32_oov")
    // 21 distinct words w00..w20; rarest (w20, count 1) falls out of
    // the top-20 vocab. Give en the common words and zz the rare one.
    val common = (0 until 20).map(i => f"w$i%02d")
    val enText = (common ++ common).mkString(" ") // 40 tokens, all in-vocab
    val zzText = "w00 w20"                        // 1 in-vocab + 1 oov
    Seq((0L, enText, "en", "src0", 1L), (1L, zzText, "zz", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_oov")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("en", 40L, 0L, 0.0), ("zz", 2L, 1L, 0.5)),
      s"oov: $out")
  }
}
