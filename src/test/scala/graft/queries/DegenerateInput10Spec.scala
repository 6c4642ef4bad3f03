package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-15 sixth–ninth waves:
  * identical embeddings (zero scatter, coincident centroids), a
  * single order-priority group, an all-open order book, one-sided
  * strata, flat daily series, and a hapax-free corpus must degrade to
  * NULL-stat rows, zeros, or empty tables — never an ANSI
  * DIVIDE_BY_ZERO throw and never an engine/oracle asymmetry
  * (sf0.01 exercises none of these paths; this spec does). */
class DegenerateInput10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"1996-01-${day}%02d 00:00:00")

  /** orders: ONE priority group, every order still open ('O');
    * customer: every row BUILDING (one-sided strata);
    * embeddings: four IDENTICAL vectors (zero scatter, coincident
    * seed centroids); events: constant value, three equal days;
    * documents: every token repeated (no hapax). */
  private lazy val flatDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen10")
    (1 to 12).map(i => (i.toLong, i.toLong % 3, "O", 100.0, ts(i % 9 + 1),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1 to 10).map(i => (i.toLong, i.toLong % 2, "BUILDING",
        1000.0 * i))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (1 to 4).map(i => (i.toLong, Array.fill(64)(0.5f), i % 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (1 to 12).map(i => (i.toLong,
        new java.sql.Timestamp(86400_000L * (i % 3) + 1000L * i),
        i.toLong % 4, "view", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (1 to 5).map(i => (i.toLong, "alpha beta gamma", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // lineitem: CONSTANT quantity → zero x-variance for the OLS family
    (1 to 12).map(i => (i.toLong, 1, i.toLong, i.toLong, 4.0,
        1000.0 + i * 10, 0.05, 0.03, ts(i % 9 + 1), "R"))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_shipdate", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(id: String) =
    SparkEntry.queries(id)(spark, flatDir).collect()

  test("silhouette: identical vectors — every point IS its centroid, " +
      "s ≡ 0 by the max(a,b) = 0 gate, one cluster of all four") {
    val r = run("q_embed_silhouette")
    assert(r.length === 1)
    assert(r(0).getAs[Long]("cluster") === 1L)
    assert(r(0).getAs[Long]("size") === 4L)
    assert(r(0).getAs[Double]("mean_sil") === 0.0)
  }

  test("calinski: zero scatter AND n ≤ k — WSS = TSS = 0 exactly, " +
      "CH gates to NULL instead of 0/0") {
    val r = run("q_embed_calinski")(0)
    assert(r.getAs[Double]("wss") === 0.0)
    assert(r.getAs[Double]("tss") === 0.0)
    assert(r.isNullAt(r.fieldIndex("ch")))
  }

  test("daviesbouldin: coincident centroids (every pair distance 0) " +
      "filter away — empty result, never a division by M = 0") {
    assert(run("q_embed_daviesbouldin").isEmpty)
  }

  test("cochranarmitage: zero cases (all orders open) → z NULL; the " +
      "single priority group leaves the moments consistent") {
    val r = run("q_agg_cochranarmitage")(0)
    assert(r.getAs[Long]("cases") === 0L)
    assert(r.getAs[Long]("k") === 1L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("gameshowell: a single priority group has no pairs — empty") {
    assert(run("q_agg_gameshowell").isEmpty)
  }

  test("breslowday: one-sided strata (everyone BUILDING) fail the " +
      "margin box — empty result, no quadratic ever evaluated") {
    assert(run("q_agg_breslowday").isEmpty)
  }

  test("kpss: a flat daily series has ẽ ≡ 0 — long-run variance 0, " +
      "η gates to NULL") {
    val r = run("q_time_kpss")(0)
    assert(r.getAs[Long]("n") === 3L)
    assert(r.isNullAt(r.fieldIndex("kpss_eta")))
  }

  test("bartels: all-tied ranks make the denominator exactly 0 — " +
      "RVN and z both NULL") {
    val r = run("q_time_bartels")(0)
    assert(r.isNullAt(r.fieldIndex("rvn")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("coxstuart: flat series — no rises, no falls, z NULL") {
    val r = run("q_time_coxstuart")(0)
    assert(r.getAs[Long]("pairs") === 1L)
    assert(r.getAs[Long]("s_plus") === 0L)
    assert(r.getAs[Long]("s_minus") === 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("white / reset: constant quantity (zero x-variance) propagates " +
      "a NULL slope through the residual lattice — statistics NULL, " +
      "never a singular normal-equation division") {
    val w = run("q_agg_white")(0)
    assert(w.isNullAt(w.fieldIndex("lm")))
    val r = run("q_agg_reset")(0)
    assert(r.isNullAt(r.fieldIndex("f_reset")))
  }

  test("neweywest: a flat daily series has zero residuals — se_ols is " +
      "exactly 0, se_hac and the ratio gate to NULL") {
    val r = run("q_agg_neweywest")(0)
    assert(r.getAs[Double]("se_ols") === 0.0)
    assert(r.isNullAt(r.fieldIndex("se_hac")))
    assert(r.isNullAt(r.fieldIndex("hac_over_ols")))
  }

  test("gehan: views-only corpus (no purchase events anywhere) leaves " +
      "no event times — U and z NULL over the empty term table") {
    val r = run("q_agg_gehan")(0)
    assert(r.getAs[Long]("n_times") === 0L)
    assert(r.isNullAt(r.fieldIndex("u_gehan")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("wkappa: every document in one ordinal cell — zero expected " +
      "disagreement, both kappas gate to NULL") {
    val r = run("q_agg_wkappa")(0)
    assert(r.isNullAt(r.fieldIndex("kappa_linear")))
    assert(r.isNullAt(r.fieldIndex("kappa_quadratic")))
  }

  test("cindex: no conversions → no usable pairs — NULL, not 0/0") {
    val r = run("q_agg_cindex")(0)
    assert(r.isNullAt(r.fieldIndex("pairs")))
    assert(r.isNullAt(r.fieldIndex("c_index")))
  }

  test("haar: a 3-day flat series has one full scale-2 block with a " +
      "zero detail — zero total energy, share gates to NULL") {
    val r = run("q_time_haar")
    assert(r.length === 1)
    assert(r(0).getAs[Long]("scale_days") === 2L)
    assert(r(0).getAs[Long]("energy") === 0L)
    assert(r(0).isNullAt(r(0).fieldIndex("share")))
  }

  test("keyness: a single-source corpus (rest side empty) gives " +
      "G² ≡ 0 for every token — no ln(0), no division throw") {
    val r = run("q_text_keyness")
    assert(r.length === 3)
    assert(r.forall(_.getAs[Double]("g2") === 0.0))
  }

  test("blomqvist: no clicks or purchases — every day sits ON both " +
      "medians, beta gates to NULL") {
    val r = run("q_agg_blomqvist")(0)
    assert(r.getAs[Long]("conc") === 0L)
    assert(r.getAs[Long]("disc") === 0L)
    assert(r.isNullAt(r.fieldIndex("beta")))
  }

  test("yulek: closed 3-type vocabulary — exact spectrum constants " +
      "(K from m = 5 types only, no hapax, Honoré still defined)") {
    val r = run("q_text_yulek")(0)
    assert(r.getAs[Long]("n_tokens") === 15L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Long]("v1") === 0L)
    assert(r.getAs[Double]("yule_k") === 2666.666667)
  }
}
