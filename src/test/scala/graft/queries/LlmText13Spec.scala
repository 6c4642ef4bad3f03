package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-corpus contract for RAKE: stopword-delimited phrase runs,
  * degree/frequency word scores, exact 9-dp decimal phrase sums, and
  * the (score desc, phrase) top ordering. */
class LlmText13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rake: hand-scored phrases — quick brown fox 8.666667, " +
      "quick test 4.666667, test suite 4.0") {
    import spark.implicits._
    val dir = Tables.freshDir("t13_rake")
    Seq(
      (1L, "the quick brown fox and the quick brown fox"),
      (2L, "a quick test of the test suite"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // word scores (deg/freq): quick 8/3, brown 6/2, fox 6/2, test 4/2,
    // suite 2/1 → phrase sums 8.666666667, 4.666666667, 4.0.
    val out = SparkEntry.queries("q_text_rake")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("quick brown fox", 3L, 2L, 8.666667),
      ("quick test", 2L, 1L, 4.666667),
      ("test suite", 2L, 1L, 4.0)),
      s"rake phrases wrong: ${out.toSeq}")
  }

  test("rake: an all-stopword document yields no phrases; uppercase " +
      "folds in") {
    import spark.implicits._
    val dir = Tables.freshDir("t13_rake2")
    Seq((1L, "the of and a"), (2L, "Deep Learning")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_rake")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // deep and learning each score deg/freq = 2/1 → phrase 4.0
    assert(out.toSeq === Seq(("deep learning", 2L, 1L, 4.0)),
      s"rake degenerate wrong: ${out.toSeq}")
  }
}
