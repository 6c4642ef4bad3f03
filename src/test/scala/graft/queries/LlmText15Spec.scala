package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 pipeline-guard wave: leakage split keeps whole
  * clusters on one side (zero straddling, totals preserved) and the
  * gibberish screen ranks consonant garbage above clean prose. */
class LlmText15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("leakage split: a 4-doc near-dup chain lands wholly in one " +
      "split, totals preserved, zero straddling; real data too") {
    import spark.implicits._
    val dir = Tables.freshDir("lt15_lk")
    // docs 1-4: one chain (n_chars 100,101,102,103, same lang/source);
    // docs 10, 20: isolated (far n_chars, different source)
    Seq((1L, "a", "en", "s1", 100L), (2L, "a", "en", "s1", 101L),
      (3L, "a", "en", "s1", 102L), (4L, "a", "en", "s1", 103L),
      (10L, "a", "en", "s2", 500L), (20L, "a", "de", "s1", 900L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_split_leakage")(spark, dir).collect()
    assert(rows.forall(_.getLong(4) == 0), s"straddling: ${rows.toSeq}")
    assert(rows.map(_.getLong(1)).sum == 6, s"doc total: ${rows.toSeq}")
    assert(rows.map(_.getLong(2)).sum == 3, s"cluster total: ${rows.toSeq}")
    // the 4-doc chain is one cluster on exactly one side
    assert(rows.map(_.getLong(3)).max == 4)
    val real = SparkEntry.queries("q_split_leakage")(spark, sf).collect()
    assert(real.forall(_.getLong(4) == 0))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(real.map(_.getLong(1)).sum == total)
  }

  test("gibberish: consonant-run garbage outranks clean prose; " +
      "digit-heavy text scores above clean prose") {
    import spark.implicits._
    val dir = Tables.freshDir("lt15_gb")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again",
        "en"),
      (2L, "bcdfghjklmnp qrstvwxzbcdf ghjklmnpqrst vwxzbcdfghjk", "en"),
      (3L, "order 12345 shipped 20240101 tracking 998877665544 code 42",
        "en"),
      (4L, "texto espanol suficientemente largo para el filtro", "es"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_text_gibberish")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      s"non-en doc leaked or doc dropped: ${rows.toSeq}")
    assert(rows.head.getLong(0) == 2L, s"garbage not first: ${rows.toSeq}")
    assert(rows.head.getInt(1) >= 10, s"max_run: ${rows.head}")
    val score = rows.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(score(2L) > score(1L) && score(3L) > score(1L), s"$score")
  }
}
