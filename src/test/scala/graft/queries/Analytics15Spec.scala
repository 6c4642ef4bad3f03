package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the substring-span/Adamic–Adar/SAX wave:
  * a shared 10-word run merges into exactly one maximal span per doc
  * (and within-doc repeats do NOT count as duplication), a 3-clique
  * co-purchase graph hits the closed-form 1/ln 2 per edge, and a
  * 1-2-3-4 hourly staircase symbolizes to "abcd". */
class Analytics15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("substring spans: a cross-doc shared 10-word run yields ONE " +
      "maximal span per doc; a within-doc repeat alone does not count") {
    import spark.implicits._
    val dir = Tables.freshDir("a15_substr")
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // 10 shared words
    val noise1 = (1 to 6).map(i => s"x$i").mkString(" ")
    val noise2 = (1 to 6).map(i => s"y$i").mkString(" ")
    // doc 3: an 8-gram repeated INSIDE the doc only — must not match
    val selfrep = (1 to 8).map(i => s"z$i").mkString(" ")
    Seq(
      (0L, s"$noise1 $shared", "en", "src0", 0L),
      (1L, s"$shared $noise2", "en", "src0", 0L),
      (2L, s"$selfrep q1 $selfrep", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_substring")(spark, dir)
      .as[(Long, Int, Int, Int)].collect().toSeq
    // doc 0: words 6..15 shared → gram starts 6..8 → span [6, 15], 10 words
    // doc 1: words 0..9 shared → starts 0..2 → span [0, 9], 10 words
    assert(out == Seq((0L, 6, 15, 10), (1L, 0, 9, 10)), s"spans: $out")
  }

  test("adamic-adar: a part 3-clique from two shared orders scores " +
      "every edge 1/ln(2) with one common neighbor") {
    import spark.implicits._
    val dir = Tables.freshDir("a15_aa")
    // orders 1 and 2 both contain parts 1,2,3 → all three edges have
    // support 2; each pair's only common neighbor has degree 2
    val rows = for (ok <- Seq(1L, 2L); pk <- Seq(1L, 2L, 3L))
      yield (ok, pk)
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_adamicadar")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val aa = BigDecimal(1.0 / math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq((1L, 2L, 1L, aa), (1L, 3L, 1L, aa),
      (2L, 3L, 1L, aa)), s"aa: $out")
  }

  test("sax: a 1-2-3-4 hourly staircase z-normalizes across the " +
      "quartile breakpoints to the word 'abcd'") {
    import spark.implicits._
    val dir = Tables.freshDir("a15_sax")
    // hour h gets h+1 events → counts (1,2,3,4): mu=2.5, sigma=1.118 →
    // z ≈ (−1.34, −0.45, +0.45, +1.34) → a b c d
    var id = 0L
    val rows = for (h <- 0 to 3; _ <- 0 to h) yield {
      id += 1
      (id, ts(h * 3600L + 60), 1L, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_sax")(spark, dir)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out == Seq(("click", 0L, 4L, "abcd")), s"sax: $out")
  }
}
