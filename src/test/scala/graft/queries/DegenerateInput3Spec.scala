package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-8 waves: single-row groups,
  * constant series, single-language corpora, and shingle-free documents
  * must degrade to NULL/empty/identity results — never throw (Spark 4
  * ANSI mode turns an unguarded 0/0 into a query failure, and sf0.01
  * never exercises these shapes). */
class DegenerateInput3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("order statistics on a single-row group: percentiles collapse " +
      "to the value, IQR is zero-width, trimmed mean is the value") {
    import spark.implicits._
    val dir = Tables.freshDir("degen3_li")
    Seq((1L, 1, 1L, 1L, 5.0, 100.0, "A"))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val p = SparkEntry.queries("q_agg_pctl_cont")(spark, dir).collect()
    assert(p.length == 1 && (2 to 5).forall(p(0).getDouble(_) == 100.0),
      s"pctl_cont: ${p.toSeq}")
    val i = SparkEntry.queries("q_agg_iqr")(spark, dir).collect()
    assert(i.length == 1 && i(0).getDouble(4) == 0.0 &&
      i(0).getLong(7) == 0L && i(0).getLong(8) == 0L, s"iqr: ${i.toSeq}")
    val t = SparkEntry.queries("q_agg_trimmed")(spark, dir).collect()
    assert(t.length == 1 && t(0).getDouble(4) == 100.0,
      s"trimmed: ${t.toSeq}")
  }

  test("constant daily series gates correlation to NULL; fewer than 14 " +
      "days yields an empty rolling table") {
    import spark.implicits._
    val dir = Tables.freshDir("degen3_ev")
    // 3 days, exactly one click and one purchase per day → zero variance
    val rows = (0 until 3).flatMap { d =>
      Seq((d * 2L, ts(d * 86400L + 10), 1L, "click", 1.0, "{}"),
        (d * 2L + 1, ts(d * 86400L + 20), 1L, "purchase", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val lc = SparkEntry.queries("q_time_lag_corr")(spark, dir).collect()
    assert(lc.nonEmpty && lc.forall(_.isNullAt(2)),
      s"constant series must gate corr to NULL: ${lc.toSeq}")
    val rc = SparkEntry.queries("q_time_rolling_corr")(spark, dir).collect()
    assert(rc.isEmpty, s"3 days cannot fill a 14-day window: ${rc.toSeq}")
  }

  test("single event type: Cramér's V gates to NULL at min(r,c)=1, " +
      "G-test keeps dof 0; all-view gains gate gain/lift to NULL") {
    import spark.implicits._
    val dir = Tables.freshDir("degen3_ct")
    val rows = (0 until 4).map { i =>
      (i.toLong, ts(i * 3600L), 1L, "view", 10.0 * i, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val cv = SparkEntry.queries("q_agg_cramersv")(spark, dir).collect()
    assert(cv.length == 1 && cv(0).isNullAt(4), s"cramersv: ${cv.toSeq}")
    val gt = SparkEntry.queries("q_agg_gtest")(spark, dir).collect()
    assert(gt.length == 1 && gt(0).getLong(3) == 0L, s"gtest: ${gt.toSeq}")
    val ga = SparkEntry.queries("q_agg_gains")(spark, dir).collect()
    assert(ga.nonEmpty && ga.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      s"zero positives must gate gain/lift: ${ga.toSeq}")
  }

  test("single-language corpus: JSD emits one row with a NULL second " +
      "language instead of an ANSI divide-by-zero; shingle-free docs " +
      "yield an empty containment table") {
    import spark.implicits._
    val dir = Tables.freshDir("degen3_docs")
    Seq((1L, "alpha beta gamma", "en", "src0", 16L),
      (2L, "alpha beta delta", "en", "src0", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val j = SparkEntry.queries("q_text_jsd")(spark, dir).collect()
    assert(j.length == 1 && j(0).getString(0) == "en" && j(0).isNullAt(1),
      s"jsd: ${j.toSeq}")
    // 3-word docs cannot form a 5-word shingle → no candidates
    val c = SparkEntry.queries("q_dedup_containment")(spark, dir).collect()
    assert(c.isEmpty, s"containment: ${c.toSeq}")
  }

  test("temporal split with a single event lands everything in test " +
      "and reports zero leakage") {
    import spark.implicits._
    val dir = Tables.freshDir("degen3_split")
    Seq((1L, ts(100), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_split_temporal")(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(1) == 0L && r(0).getLong(2) == 0L
      && r(0).getLong(3) == 1L && r(0).getLong(4) == 0L,
      s"split: ${r.toSeq}")
  }
}
