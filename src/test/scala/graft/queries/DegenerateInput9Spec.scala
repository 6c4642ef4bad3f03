package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-15 waves: missing treatment
  * arms, single-group trend tests, empty dispersion samples, all-zero
  * relevance, sub-window documents, and tiny identical embedding sets
  * must degrade to NULL-stat rows, zeros, or empty tables — never an
  * ANSI DIVIDE_BY_ZERO throw and never an engine/oracle asymmetry
  * (sf0.01 exercises none of these paths; this spec does). */
class DegenerateInput9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"1996-01-${day}%02d 00:00:00")

  /** lineitem: CONSTANT quantity 4 (rel = 4 % 4 = 0 everywhere) and
    * constant 5% discount (NO deep-discount sample); orders: ONE
    * priority group. */
  private lazy val flatDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen9")
    (1 to 12).map(i => (i.toLong, 1, i.toLong, i.toLong, 4.0,
        1000.0 + i * 10, 0.05, 0.03, ts(i % 9 + 1), "R"))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_shipdate", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1 to 12).map(i => (i.toLong, i.toLong % 3, "O", 100.0, ts(i % 9 + 1),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // documents: all shorter than the 25-token MATTR window
    (1 to 5).map(i => (i.toLong, "alpha beta gamma", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: four IDENTICAL vectors (pure-tie kNN)
    (1 to 4).map(i => (i.toLong, Array.fill(64)(0.5f), i % 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events: views only — no signup ⇒ no treated arm for AIPW
    (1 to 12).map(i => (i.toLong,
        new java.sql.Timestamp(86400_000L * (i % 3) + 1000L * i),
        i.toLong % 4, "view", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(id: String) =
    SparkEntry.queries(id)(spark, flatDir).collect()

  test("aipw: no treated units → missing outcome model, NULL ATEs, " +
      "everything counted excluded") {
    val r = run("q_agg_aipw")(0)
    assert(r.getAs[Long]("n_treated") === 0L)
    assert(r.isNullAt(r.fieldIndex("ate_aipw")))
    assert(r.isNullAt(r.fieldIndex("ate_model")))
  }

  test("jonckheere: a single priority group has no ordered pairs — " +
      "U = 0, z gates to NULL") {
    val r = run("q_agg_jonckheere")(0)
    assert(r.getAs[Long]("n_groups") === 1L)
    assert(r.getAs[Double]("u_stat") === 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("ansari: empty deep-discount sample AND a single-cell grid — " +
      "W = 0, permutation variance 0, z NULL") {
    val r = run("q_agg_ansari")(0)
    assert(r.getAs[Long]("n_x") === 0L)
    assert(r.getAs[Double]("w_stat") === 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("err / rbp: all-zero relevance (quantity ≡ 0 mod 4) gives " +
      "exactly-zero metrics, not NULL and not a throw") {
    val e = run("q_win_err")
    assert(e.length === 1 && e(0).getAs[Double]("err10") === 0.0)
    val b = run("q_win_rbp")
    assert(b.length === 1 && b(0).getAs[Double]("rbp10") === 0.0)
  }

  test("mattr: every document shorter than the window → empty result") {
    assert(run("q_text_mattr").isEmpty)
  }

  test("hubness: four identical vectors (pure-tie kNN) stays defined — " +
      "mean in-degree is exactly k, no throw") {
    val r = run("q_embed_hubness")(0)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Double]("mean_in") === 3.0)
  }

  test("quade: a single week-block makes A = B exactly — T3 gates NULL") {
    val r = run("q_agg_quade")(0)
    assert(r.getAs[Long]("n_blocks") === 1L)
    assert(r.isNullAt(r.fieldIndex("t3")))
  }

  test("cuzick: one priority group has zero grade variance — z NULL") {
    val r = run("q_agg_cuzick")(0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("brunnermunzel: views-only corpus (empty click sample) yields " +
      "NULL statistics, never an ANSI divide-by-zero") {
    val r = run("q_agg_brunnermunzel")(0)
    assert(r.getAs[Long]("n1") === 0L)
    assert(r.isNullAt(r.fieldIndex("p_hat")))
    assert(r.isNullAt(r.fieldIndex("w_stat")))
    assert(r.isNullAt(r.fieldIndex("df")))
  }

  test("pagetrend: a single 3-day window means one block — z stays " +
      "finite (classical Var > 0 for n = 1), no throw") {
    val r = run("q_agg_pagetrend")(0)
    assert(r.getAs[Long]("n_blocks") >= 1L)
    assert(!r.isNullAt(r.fieldIndex("z")))
  }

  test("welchanova: constant totalprice (zero variance in every group) " +
      "drops all groups — empty result, no throw") {
    assert(run("q_agg_welchanova").isEmpty)
  }

  test("twonn: identical vectors (all pair distances zero) leave no " +
      "usable ratio — n_used 0 and NULL estimate, no throw") {
    val r = run("q_embed_twonn")(0)
    assert(r.getAs[Long]("n_used") === 0L)
    assert(r.isNullAt(r.fieldIndex("id_twonn")))
  }

  test("effrank: identical vectors have an all-zero covariance — " +
      "tr(C²) = 0 gates the estimate to NULL") {
    val r = run("q_embed_effrank")(0)
    assert(r.isNullAt(r.fieldIndex("eff_rank")))
  }

  test("seasonalmk: one day per weekday season means zero comparable " +
      "pairs — empty result (the mannkendall inner-join precedent), " +
      "no throw") {
    assert(run("q_time_seasonalmk").isEmpty)
  }

  test("cvar: constant totals — VaR equals ES equals the constant") {
    val r = run("q_agg_cvar")(0)
    assert(r.getAs[Double]("var95") === 100.0)
    assert(r.getAs[Double]("es95") === 100.0)
  }

  test("uniqueness: every row unique under the full QI → share 1.0 " +
      "for it, drop-one subsets still report") {
    // flatDir has no customer table; the audit runs on the standard one
    val rows = SparkEntry.queries("q_quality_uniqueness")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 4)
    assert(rows.forall(!_.isNullAt(rows(0).fieldIndex("uniq_share"))))
  }
}
