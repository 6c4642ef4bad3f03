package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-14 diagnostics wave:
  * constant regressors, single-era shipdates, zero revenue, and
  * constant group values must degrade to NULL-stat rows or empty
  * tables — never an ANSI DIVIDE_BY_ZERO throw (sf0.01 exercises
  * none of these paths; this spec does). */
class DegenerateInput7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"1996-01-${day}%02d 00:00:00")

  /** lineitem with CONSTANT quantity (zero x-variance) and all
    * shipdates in one era (the g=1 Chow group is empty). */
  private lazy val constantXDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen7_li")
    (1 to 10).map(i => (i.toLong, 1, 5.0, 1000.0 + i * 10, 0.05, 0.03,
        ts(i % 9 + 1)))
      .toDF("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** orders with all-zero totals (PPS total = 0). */
  private lazy val zeroRevDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen7_ord")
    (1 to 6).map(i => (i.toLong, i.toLong % 3, "O", 0.0, ts(i), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** events where every value is the SAME constant per type (zero
    * within-group variance — every Welch weight undefined). */
  private lazy val constantVDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen7_ev")
    (1 to 12).map(i => (i.toLong,
        new java.sql.Timestamp(3600_000L * i), i.toLong % 4,
        if (i % 2 == 0) "view" else "click", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("breuschpagan on constant quantity: NULL lm, no throw") {
    val r = SparkEntry.queries("q_agg_breuschpagan")(spark, constantXDir)
      .collect()
    assert(r.length == 1 && r(0).isNullAt(r(0).fieldIndex("lm")),
      s"lm must be NULL with zero x-variance: ${r.toSeq}")
  }

  test("chow with constant x and an empty post-pivot era: NULL SSRs " +
      "and NULL F, no throw") {
    val r = SparkEntry.queries("q_agg_chow")(spark, constantXDir)
      .collect()
    assert(r.length == 1, r.toSeq.toString)
    assert(r(0).isNullAt(r(0).fieldIndex("f_chow")),
      s"f_chow must be NULL: ${r.toSeq}")
  }

  test("welch on constant per-group values: NULL F (all weights " +
      "undefined), no throw") {
    val r = SparkEntry.queries("q_agg_welch")(spark, constantVDir)
      .collect()
    assert(r.length == 1, r.toSeq.toString)
    assert(r(0).isNullAt(r(0).fieldIndex("f_welch")),
      s"f_welch must be NULL with zero variances: ${r.toSeq}")
  }

  test("systematic PPS over zero total revenue: empty sample, no " +
      "integer-div throw") {
    val r = SparkEntry.queries("q_sample_systematic")(spark, zeroRevDir)
      .collect()
    assert(r.isEmpty, r.toSeq.toString)
  }

  test("crossfield with no lineitems at all: every order lands in " +
      "the no_lineitems bucket") {
    import spark.implicits._
    val dir = Tables.freshDir("degen7_cf")
    (1 to 6).map(i => (i.toLong, i.toLong % 3, "O", 100.0 + i, ts(i),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq.empty[(Long, Int, Double, Double, Double, Double,
        java.sql.Timestamp)]
      .toDF("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_quality_crossfield")(spark, dir)
      .collect()
    assert(r.length == 1 && r(0).getString(0) == "no_lineitems" &&
      r(0).getLong(1) == 6L, r.toSeq.toString)
  }
}
