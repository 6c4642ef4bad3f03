package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-7 statistics waves: the
  * denominators that are never zero at sf0.01 (constant columns,
  * single groups, all-censored cohorts, one-event types) must degrade
  * to empty/NaN/NULL rows — never throw — because the driver's data
  * generator has changed shape mid-stream before. */
class DegenerateInput2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("spearman/anova/kendall survive constant columns and a single " +
      "group without throwing") {
    import spark.implicits._
    val dir = Tables.freshDir("degen2_li")
    // one group, constant quantity AND constant price: every rank-
    // statistic denominator is zero
    Seq.fill(4)(("A", 5.0, 100.0)).zipWithIndex.map { case ((g, q, p), i) =>
      (i.toLong, i + 1, i.toLong, i.toLong, q, p, g)
    }.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val sp = SparkEntry.queries("q_agg_spearman")(spark, dir).collect()
    assert(sp.length == 1 && (sp(0).isNullAt(2) ||
      sp(0).getDouble(2).isNaN), s"spearman: ${sp.toSeq}")
    val an = SparkEntry.queries("q_agg_anova")(spark, dir).collect()
    assert(an.length == 1, s"anova must keep its row: ${an.toSeq}")
    val ke = SparkEntry.queries("q_agg_kendall")(spark, dir).collect()
    assert(ke.length <= 1, s"kendall: ${ke.toSeq}") // no pairs → 0 rows ok
  }

  test("survival with zero purchases emits an empty curve, not a " +
      "failure; mde with one event gates sd to NaN/NULL, not a throw") {
    import spark.implicits._
    val dir = Tables.freshDir("degen2_ev")
    val rows = Seq(
      (1L, ts(0), 1L, "signup", 1.0, "{}"),
      (2L, ts(10), 2L, "signup", 1.0, "{}"),
      (3L, ts(20), 3L, "error", 4.0, "{}")) // one 'error' event: n=1
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val km = SparkEntry.queries("q_agg_survival")(spark, dir).collect()
    assert(km.isEmpty, s"all-censored cohort must yield no steps: " +
      s"${km.toSeq}")
    val mde = SparkEntry.queries("q_agg_mde")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(mde.contains("error"), s"n=1 type must keep its row: $mde")
    val e = mde("error")
    assert(e.isNullAt(3) || e.getDouble(3).isNaN,
      s"sd at n=1 must be NULL/NaN: $e")
  }

  test("sax with a constant series symbolizes to all-'c' (sigma-zero " +
      "guard) instead of dividing by zero") {
    import spark.implicits._
    val dir = Tables.freshDir("degen2_sax")
    val rows = (0 to 3).map { h =>
      (h.toLong + 1, ts(h * 3600L + 60), 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_sax")(spark, dir)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out == Seq(("view", 0L, 4L, "cccc")), s"sax: $out")
  }
}
