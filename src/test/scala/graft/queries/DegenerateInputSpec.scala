package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior that sf0.01 never exercises: the CASE
  * gates added for sparse t-test halves and wordless documents must
  * actually fire (emit NULL, keep the row, not throw) when such data
  * appears — otherwise the guards are untested text. Inputs are
  * crafted parquet tables under a temp dir, driven through the SAME
  * registered queries the driver verifies. */
class DegenerateInputSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("t-test emits NULL t/df for event types with n<=1 in a half") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-degen-ev").toString
    // us-day < 19738 → half 'a'; day 19740 → half 'b'
    def ns(day: Long): Long = day * 86400L * 1000000000L
    val rows = Seq(
      // healthy: 3 in each half, varied values → defined t/df
      ("ok", ns(19730), 1.0), ("ok", ns(19731), 2.0), ("ok", ns(19732), 4.0),
      ("ok", ns(19740), 3.0), ("ok", ns(19741), 5.0), ("ok", ns(19742), 8.0),
      // na = 1: variance of half a undefined → NULL t/df, mean_a defined
      ("sparse_a", ns(19730), 7.0),
      ("sparse_a", ns(19740), 1.0), ("sparse_a", ns(19741), 2.0),
      // all events in one half: nb = 0 → NULL mean_b as well
      ("one_sided", ns(19730), 1.0), ("one_sided", ns(19731), 5.0),
      // identical values in both halves: va = vb = 0 → pooled term not
      // > 0 → NULL t/df (no divide-by-zero inf)
      ("constant", ns(19730), 3.0), ("constant", ns(19731), 3.0),
      ("constant", ns(19740), 3.0), ("constant", ns(19741), 3.0))
    rows.toDF("event_type", "tsl", "value")
      .selectExpr("monotonically_increasing_id() AS event_id",
        "tsl AS ts", "0L AS user_id", "event_type", "value",
        "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_ttest")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("ok", "sparse_a", "one_sided", "constant"),
      s"degenerate types must keep their rows: ${out.keySet}")
    val ok = out("ok")
    assert(!ok.isNullAt(5) && !ok.isNullAt(6), s"healthy type lost t/df: $ok")
    for (t <- Seq("sparse_a", "one_sided", "constant")) {
      assert(out(t).isNullAt(5) && out(t).isNullAt(6),
        s"$t must gate t/df to NULL: ${out(t)}")
    }
    assert(out("one_sided").isNullAt(4), // mean_b with nb = 0
      s"one_sided must gate mean_b to NULL: ${out("one_sided")}")
    assert(!out("sparse_a").isNullAt(3), // mean_a with na = 1 is defined
      s"sparse_a mean_a should survive: ${out("sparse_a")}")
  }

  test("entropy keeps wordless docs as rows with NULL word_entropy") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-degen-doc").toString
    Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "   "), // whitespace-only: chars exist, words don't
      (3L, "aaaa")) // single run: char entropy exactly 0
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_entropy")(spark, dir).collect()
    assert(out.length == 3, s"wordless doc must not vanish: ${out.toSeq}")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(!byId(1L).isNullAt(1) && !byId(1L).isNullAt(2))
    assert(!byId(2L).isNullAt(1), "whitespace doc still has char entropy")
    assert(byId(2L).isNullAt(2), "no words → word_entropy must be NULL")
    assert(byId(3L).getDouble(1) == 0.0, "single-run char entropy is 0")
  }
}
