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

  /** events fixture: (event_type, day, value) rows for one-user funnels. */
  private def writeEvents(rows: Seq[(Long, String, Long, Double)],
      dir: String): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "tsl", "value")
      .selectExpr("monotonically_increasing_id() AS event_id", "tsl AS ts",
        "user_id", "event_type", "value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("funnel gates conversions on empty upstream stages, not div-zero") {
    val dir = Files.createTempDirectory("graft-degen-fun").toString
    def ns(h: Long): Long = h * 3600L * 1000000000L
    // u1: view → click (click strictly after); u2: click BEFORE its
    // first view (must not count); u3: purchase with no view/click path.
    // Net: nv = 2 (u1, u2), nc = 1 (u1), np = 0.
    writeEvents(Seq(
      (1L, "view", ns(1), 1.0), (1L, "click", ns(2), 1.0),
      (2L, "click", ns(1), 1.0), (2L, "view", ns(2), 1.0),
      (3L, "purchase", ns(1), 1.0)), dir)
    val out = SparkEntry.queries("q_win_funnel")(spark, dir).collect()
    assert(out.length == 3)
    val byStage = out.map(r => r.getInt(0) -> r).toMap
    assert(byStage(1).getLong(2) == 2 && byStage(1).getDouble(3) == 1.0)
    assert(byStage(2).getLong(2) == 1 &&
      byStage(2).getDouble(3) == 0.5, s"click stage: ${byStage(2)}")
    assert(byStage(3).getLong(2) == 0 &&
      byStage(3).getDouble(3) == 0.0, s"purchase stage: ${byStage(3)}")
    // No clicks at all → nc = 0 → the purchase rate must gate to NULL
    // (not inf/NaN): both engines agree only through the CASE guard.
    val dir2 = Files.createTempDirectory("graft-degen-fun2").toString
    writeEvents(Seq((1L, "view", ns(1), 1.0)), dir2)
    val out2 = SparkEntry.queries("q_win_funnel")(spark, dir2).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out2(2).getLong(2) == 0 && out2(2).getDouble(3) == 0.0)
    assert(out2(3).getLong(2) == 0 && out2(3).isNullAt(3),
      s"nc=0 must gate purchase conv to NULL: ${out2(3)}")
  }

  test("EMA head normalization: first row is the raw value") {
    val dir = Files.createTempDirectory("graft-degen-ema").toString
    def ns(h: Long): Long = h * 3600L * 1000000000L
    writeEvents(Seq(
      (1L, "view", ns(1), 8.0), (1L, "view", ns(2), 4.0),
      (1L, "view", ns(3), 2.0)), dir)
    val out = SparkEntry.queries("q_time_ema")(spark, dir).collect()
    assert(out.length == 3)
    assert(out(0).getDouble(3) == 8.0, s"head must be raw: ${out(0)}")
    // second: (4 + 0.5·8) / 1.5 = 16/3 ≈ 5.333333 (6-dp round)
    assert(out(1).getDouble(3) == 5.333333, s"${out(1)}")
    // third: (2 + 0.5·4 + 0.25·8) / 1.75 = 6/1.75 ≈ 3.428571
    assert(out(2).getDouble(3) == 3.428571, s"${out(2)}")
  }

  test("resample flags interior gaps and forward-fills across them") {
    val dir = Files.createTempDirectory("graft-degen-res").toString
    def ns(h: Long): Long = h * 3600L * 1000000000L
    // u1 active at hours 10 and 13 (gap 11, 12); u2 single hour (no gap
    // rows at all — the grid is exactly one row).
    writeEvents(Seq(
      (1L, "view", ns(10), 5.0), (1L, "view", ns(13), 9.0),
      (2L, "view", ns(7), 3.0)), dir)
    val out = SparkEntry.queries("q_time_resample")(spark, dir).collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u1.length == 4 && u2.length == 1,
      s"grid must span [h0, h1] exactly: ${out.toSeq}")
    assert(u1.map(_.getBoolean(2)).toSeq == Seq(false, true, true, false))
    // forward fill carries hour-10's value across the gap
    assert(u1.map(_.getDouble(4)).toSeq == Seq(5.0, 5.0, 5.0, 9.0))
    assert(!u2.head.getBoolean(2) && u2.head.getDouble(4) == 3.0)
  }

  test("temperature sampling clamps tiny languages to keep-everything") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-degen-temp").toString
    // 400 docs in 'big', 1 doc in 'tiny': tiny's rate = min(1, 200·w/1)
    // clamps to 1.0 → the doc must ALWAYS be kept, whatever its md5.
    val docs = (1L to 400L).map(i => (i, "word soup", "big")) :+
      (900L, "rare text", "tiny")
    docs.toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'t' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_sample_temperature")(spark, dir).collect()
    val tiny = out.filter(_.getString(1) == "tiny")
    assert(tiny.length == 1 && tiny.head.getDouble(2) == 1.0,
      s"tiny lang must clamp to rate 1.0: ${tiny.toSeq}")
    val big = out.filter(_.getString(1) == "big")
    assert(big.nonEmpty && big.length < 400,
      s"big lang must downsample: kept ${big.length} of 400")
  }

  test("BM25/BPE/collocations survive empty and matchless corpora") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-degen-txt").toString
    // No document contains a query term; words are single chars (BPE
    // filters len >= 2); docs are one word (no bigrams). Every operator
    // must return an EMPTY result — not throw, not fabricate rows.
    Seq((1L, "a"), (2L, "b"), (3L, ""))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "length(text) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (q <- Seq("q_text_bm25", "q_text_bpe_pairs", "q_text_collocations")) {
      val out = SparkEntry.queries(q)(spark, dir).collect()
      assert(out.isEmpty, s"$q on matchless corpus: ${out.toSeq}")
    }
  }

  test("change-compressed SCD2: single-order customers get one open era") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-degen-scd").toString
    Seq(
      (10L, 1L, "1-URGENT", "1995-01-01"),
      (11L, 2L, "5-LOW", "1995-01-01"),
      (12L, 2L, "5-LOW", "1995-02-01"),   // same priority → compressed
      (13L, 2L, "1-URGENT", "1995-03-01")) // change → new era
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "d")
      .selectExpr("o_orderkey", "o_custkey", "'O' AS o_orderstatus",
        "100.0D AS o_totalprice",
        "CAST(d AS TIMESTAMP_NTZ) AS o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_scd2_compress")(spark, dir).collect()
    val c1 = out.filter(_.getLong(0) == 1L)
    val c2 = out.filter(_.getLong(0) == 2L)
    assert(c1.length == 1 && c1.head.isNullAt(3) && c1.head.getInt(4) == 1,
      s"single order → one open era: ${c1.toSeq}")
    assert(c2.length == 2, s"same-priority rerun must compress: ${c2.toSeq}")
    assert(c2(0).getString(1) == "5-LOW" && !c2(0).isNullAt(3) &&
      c2(1).getString(1) == "1-URGENT" && c2(1).isNullAt(3),
      s"era chain wrong: ${c2.toSeq}")
  }
}
