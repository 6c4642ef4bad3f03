package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-14 causal / series /
  * distance waves: constant regressors, zero revenue, one-sided event
  * types, single-point grids, and too-short series must degrade to
  * NULL-stat rows or empty tables — never an ANSI DIVIDE_BY_ZERO
  * throw and never an engine/oracle asymmetry (sf0.01 exercises none
  * of these paths; this spec does). */
class DegenerateInput8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"1996-01-${day}%02d 00:00:00")

  /** lineitem with CONSTANT quantity AND discount: every centered
    * regressor moment is zero. */
  private lazy val constDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen8_li")
    (1 to 12).map(i => (i.toLong, 1, i.toLong, i.toLong, 5.0,
        1000.0 + i * 10, 0.05, 0.03, ts(i % 9 + 1), "R"))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_shipdate", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** orders with all-zero totals (PPS total T = 0). */
  private lazy val zeroRevDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen8_ord")
    (1 to 6).map(i => (i.toLong, i.toLong % 3, "O", 0.0, ts(i),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** orders with one CONSTANT price (zero sd — no KDE bandwidth). */
  private lazy val constPriceDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen8_ordc")
    (1 to 6).map(i => (i.toLong, i.toLong % 3, "O", 500.0, ts(i),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** events: only `view`s (one-sided two-sample tests), constant
    * value (zero Huber scale), and only 3 distinct days (series
    * shorter than the motif window). */
  private lazy val oneSidedDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen8_ev")
    (1 to 12).map(i => (i.toLong,
        new java.sql.Timestamp(86400_000L * (i % 3) + 1000L * i),
        i.toLong % 4, "view", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(id: String, dir: String) =
    SparkEntry.queries(id)(spark, dir).collect()

  test("isotonic: single-point quantity grid returns that point's " +
      "mean unchanged") {
    val rows = run("q_agg_isotonic", constDir)
    assert(rows.length === 1)
    assert(rows(0).getAs[Double]("iso_fit")
      === rows(0).getAs[Double]("raw_mean"))
  }

  test("ridge: all-constant regressors — ridge stays defined " +
      "(λ makes the system PD), OLS gates to NULL") {
    val r = run("q_agg_ridge", constDir)(0)
    assert(!r.isNullAt(r.fieldIndex("b1_ridge")))
    assert(r.isNullAt(r.fieldIndex("b1_ols")))
  }

  test("logistic / sobel / ancova / wls: constant regressors yield " +
      "NULL-stat or empty results, never a throw") {
    val lg = run("q_agg_logistic", constDir)(0)
    assert(lg.isNullAt(lg.fieldIndex("b1")))
    assert(run("q_agg_sobel", constDir).isEmpty)
    assert(run("q_agg_ancova", constDir).isEmpty)
    val wls = run("q_agg_wls", constDir)(0)
    assert(wls.isNullAt(wls.fieldIndex("b1_wls")))
  }

  test("ht: zero total revenue → NULL-stat row (no PPS design exists)") {
    val r = run("q_sample_ht", zeroRevDir)(0)
    assert(r.isNullAt(r.fieldIndex("ht_total")))
    assert(r.isNullAt(r.fieldIndex("ht_ratio")))
  }

  test("kde: constant price (zero bandwidth) → empty grid") {
    assert(run("q_agg_kde", constPriceDir).isEmpty)
  }

  test("huber: constant value (zero scale) → NULL robust mean") {
    val r = run("q_agg_huber", oneSidedDir)(0)
    assert(r.isNullAt(r.fieldIndex("huber_mean")))
  }

  test("two-sample distances: one-sided corpus (views only) → empty " +
      "or NULL-stat, never a zero-division") {
    assert(run("q_agg_mmd", oneSidedDir).isEmpty)
    val w = run("q_agg_wasserstein", oneSidedDir)
    assert(w.isEmpty || w(0).isNullAt(w(0).fieldIndex("wasserstein1")))
    val h = run("q_agg_hellinger", oneSidedDir)
    assert(h.isEmpty || h(0).isNullAt(h(0).fieldIndex("hellinger")))
  }

  test("motif / yulewalker: a 3-day series (shorter than the window " +
      "and the AR depth) degrades to empty / NULL") {
    assert(run("q_time_motif", oneSidedDir).isEmpty)
    val y = run("q_time_yulewalker", oneSidedDir)(0)
    // 3 constant-count days: zero variance gates the AR solve
    assert(y.isNullAt(y.fieldIndex("phi1")))
  }

  test("ipw / psmatch: a corpus with no signups (no treated units) " +
      "yields NULL estimates, not a throw") {
    val i = run("q_agg_ipw", oneSidedDir)(0)
    assert(i.getAs[Long]("n_treated") === 0L)
    assert(i.isNullAt(i.fieldIndex("ate_ipw")))
    val p = run("q_agg_psmatch", oneSidedDir)(0)
    assert(p.getAs[Long]("n_matched") === 0L)
  }

  test("assocrules: no pair reaches the support floor → empty") {
    // constDir has 12 single-line orders — no co-purchase pairs at all
    assert(run("q_agg_assocrules", constDir).isEmpty)
  }
}
