package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-13 waves: single-class
  * label columns, single-day series, one-order-per-customer groups,
  * constant measures, and duplicate-free corpora must degrade to
  * NULL-stat rows or empty tables — never an ANSI DIVIDE_BY_ZERO
  * throw (sf0.01 exercises none of these paths; this spec does). */
class DegenerateInput6Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000L)

  /** events with ONLY view rows (single class), all on one day. */
  private lazy val singleClassDir: String = {
    import spark.implicits._
    val dir = Tables.freshDir("degen6_events")
    (1 to 8).map(i => (i.toLong, ts(3600L * i), i.toLong % 3, "view",
        25.0 + i, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("youden / confusion / prauc / logloss on a single-class feed: " +
      "NULL-gated stats, no divide-by-zero throw") {
    val y = SparkEntry.queries("q_agg_youden")(spark, singleClassDir)
      .collect()
    assert(y.length <= 1)
    val c = SparkEntry.queries("q_agg_confusion")(spark, singleClassDir)
      .collect()
    assert(c.length == 1 && c(0).isNullAt(c(0).fieldIndex("recall")),
      s"recall must be NULL with zero positives: ${c.toSeq}")
    val p = SparkEntry.queries("q_agg_prauc")(spark, singleClassDir)
      .collect()
    assert(p.length == 1 && p(0).isNullAt(p(0).fieldIndex("pr_auc")),
      s"pr_auc must be NULL with zero positives: ${p.toSeq}")
    val l = SparkEntry.queries("q_agg_logloss")(spark, singleClassDir)
      .collect()
    assert(l.length == 1 && l(0).isNullAt(l(0).fieldIndex("skill")),
      s"skill must be NULL with a degenerate prevalence: ${l.toSeq}")
  }

  test("mase / coint / rollbeta on a single-day single-type feed: " +
      "NULL metrics or empty tables, no throw") {
    val m = SparkEntry.queries("q_time_mase")(spark, singleClassDir)
      .collect()
    // one type, one day: no lag-7 or lag-1 pairs -> NULL metrics
    assert(m.length == 1 && m(0).isNullAt(m(0).fieldIndex("mase")),
      s"mase must be NULL without naive pairs: ${m.toSeq}")
    // no purchase series at all -> the day-aligned pair table is empty
    val co = SparkEntry.queries("q_time_coint")(spark, singleClassDir)
      .collect()
    assert(co.isEmpty || co(0).isNullAt(co(0).fieldIndex("adf_t")),
      s"coint on a missing series: ${co.toSeq}")
    val rb = SparkEntry.queries("q_time_rollbeta")(spark, singleClassDir)
      .collect()
    assert(rb.isEmpty, s"rollbeta needs 14 aligned days: ${rb.toSeq}")
    val mm = SparkEntry.queries("q_agg_moodmedian")(spark, singleClassDir)
      .collect()
    assert(mm.length == 1 && mm(0).getLong(mm(0).fieldIndex("df")) == 0L,
      s"one group -> df 0: ${mm.toSeq}")
  }

  test("icc with one order per customer (N = k) and ccc/corrmatrix/vif/" +
      "mahalanobis on constant measures: NULL-gated, no throw") {
    import spark.implicits._
    val dir = Tables.freshDir("degen6_orders")
    (1 to 6).map(i => (i.toLong, i.toLong, "O", 100.0, ts(86400L * i),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // constant quantity/price/discount/tax -> every variance is zero
    (1 to 6).map(i => (i.toLong, 1L, 1L, 1, 5.0, 100.0, 0.05, 0.02,
        "N", "O", ts(86400L * i)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val icc = SparkEntry.queries("q_agg_icc")(spark, dir).collect()
    assert(icc.length == 1 && icc(0).isNullAt(icc(0).fieldIndex("icc1")),
      s"icc with N = k must be NULL: ${icc.toSeq}")
    val ccc = SparkEntry.queries("q_agg_ccc")(spark, dir).collect()
    assert(ccc.length == 1 &&
      ccc(0).isNullAt(ccc(0).fieldIndex("pearson_r")),
      s"ccc pearson on constant columns must be NULL: ${ccc.toSeq}")
    val cm = SparkEntry.queries("q_agg_corrmatrix")(spark, dir).collect()
    assert(cm.length == 6 &&
      cm.forall(r => r.isNullAt(r.fieldIndex("pearson_r"))),
      s"corrmatrix on constants must be all-NULL: ${cm.toSeq}")
    val vif = SparkEntry.queries("q_agg_vif")(spark, dir).collect()
    assert(vif.length == 3 &&
      vif.forall(r => r.isNullAt(r.fieldIndex("vif"))),
      s"vif on constants must be NULL: ${vif.toSeq}")
    val mh = SparkEntry.queries("q_agg_mahalanobis")(spark, dir)
      .collect()
    assert(mh.forall(r => r.isNullAt(r.fieldIndex("d2"))),
      s"mahalanobis d2 on constants must be NULL: ${mh.toSeq}")
    // inequality family on the same spend table: equal spends -> 0
    val hv = SparkEntry.queries("q_agg_hoover")(spark, dir).collect()
    assert(hv.length == 1 &&
      hv(0).getDouble(hv(0).fieldIndex("hoover")) == 0.0, s"${hv.toSeq}")
    val at = SparkEntry.queries("q_agg_atkinson")(spark, dir).collect()
    assert(at.length == 1 &&
      at(0).getDouble(at(0).fieldIndex("atkinson_1")) == 0.0,
      s"${at.toSeq}")
  }

  test("softweight on a duplicate-free corpus: dedup_mass 0, effective " +
      "size = n; powerlaw on an all-equal-degree graph: NULL alpha") {
    import spark.implicits._
    val ddir = Tables.freshDir("degen6_docs")
    (1 to 5).map(i => (i.toLong, s"unique text $i", "en", "srcA",
        14L + i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$ddir/documents.parquet")
    val sw = SparkEntry.queries("q_dedup_softweight")(spark, ddir)
      .collect()
    assert(sw.length == 1 &&
      sw(0).getDouble(sw(0).fieldIndex("dedup_mass")) == 0.0 &&
      sw(0).getDouble(sw(0).fieldIndex("effective_docs")) == 5.0,
      s"${sw.toSeq}")
    // a single co-purchase pair: both nodes have degree 1 = dmin, so
    // every ln(d/(dmin-0.5)) = ln 2 > 0 -> alpha defined; the NULL
    // case needs slt = 0, impossible with the -0.5 offset -> assert
    // the defined value instead (alpha = 1 + n/(n ln 2))
    val gdir = Tables.freshDir("degen6_graph")
    Seq((100L, 1L), (100L, 2L), (101L, 1L), (101L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$gdir/lineitem.parquet")
    val pl = SparkEntry.queries("q_graph_powerlaw")(spark, gdir)
      .collect()
    assert(pl.length == 1 &&
      math.abs(pl(0).getDouble(pl(0).fieldIndex("alpha_mle"))
        - (1.0 + 1.0 / math.log(2.0))) < 1e-5, s"${pl.toSeq}")
  }
}
