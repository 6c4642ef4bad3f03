package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Layout / scale-pattern assertions: the z-order clustering actually
  * buys multi-dimensional file skipping, and the HLL sketch pipeline is
  * genuinely reaggregable (merge-of-shards ≡ direct build). */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  /** Rows actually read by a scan under `pred`, from the executed plan's
    * scan metrics — the physical row-skipping measurement. */
  private def rowsScanned(dir: String, pred: String): Long = {
    val df = spark.read.parquet(dir).filter(pred)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    scan.metrics("numOutputRows").value
  }

  test("z-order layout prunes row groups on BOTH key dimensions") {
    // AQE wraps the plan and hides scan metrics from collectLeaves — the
    // skip measurement needs the raw executed plan. Scoped + restored:
    // suites share one session, and later plan assertions must validate
    // the AQE regime Bench and the driver actually run with.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try zorderSkipCheck()
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def zorderSkipCheck(): Unit = {
    val dir = ScalePatterns.zorderDir(spark, sf)
    val total = spark.read.parquet(dir).count()
    // box predicate on px alone, py alone, and both: a z-ordered layout
    // must skip most rows for each (single-key sort only helps one).
    // Parquet row-group stats drive the skip, surfaced by the scan's
    // numOutputRows after predicate pushdown.
    val px = rowsScanned(dir, "px BETWEEN 0 AND 31")
    val py = rowsScanned(dir, "py BETWEEN 0 AND 31")
    val both = rowsScanned(dir, "px BETWEEN 0 AND 31 AND py BETWEEN 0 AND 31")
    assert(px < total / 2, s"px box read $px of $total")
    assert(py < total / 2, s"py box read $py of $total")
    assert(both <= px && both <= py)
  }

  test("_metadata lineage scan: row_index spans the file exactly once") {
    val rows = graft.SparkEntry.queries("q_scan_metadata")(spark, sf)
      .collect()
    assert(rows.length == 1, s"expected one source file, got ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[String]("file_name") == "orders.parquet")
    val n = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(r.getAs[Long]("n_rows") == n)
    assert(r.getAs[Long]("ri_min") == 0L &&
      r.getAs[Long]("ri_max") == n - 1,
      s"row_index not a 0-based dense file position: $r")
    assert(r.getAs[Long]("file_size") ==
      new java.io.File(s"$sf/orders.parquet").length())
  }

  test("HLL sketch merge-of-months tracks direct build, near exact") {
    val rows = SparkEntry.queries("q_agg_sketch")(spark, sf).collect()
    assert(rows.length == 5) // one per order priority
    rows.foreach { r =>
      val exact = r.getLong(1)
      val direct = r.getLong(2)
      val merged = r.getLong(3)
      // union invalidates the HIP estimator (composite fallback), so
      // merged tracks direct closely but not bit-exactly
      assert(math.abs(merged - direct).toDouble / exact < 0.03,
        s"${r.getString(0)}: merged $merged vs direct $direct")
      assert(math.abs(direct - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: estimate $direct vs exact $exact")
      assert(math.abs(merged - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: merged estimate $merged vs exact $exact")
    }
  }

  test("reaggregated partials match the direct aggregate") {
    import org.apache.spark.sql.functions._
    val reagg = SparkEntry.queries("q_agg_reagg")(spark, sf)
    val direct = Tables.t(spark, sf, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        Tables.dbl(sum(Tables.dec(col("o_totalprice")))).as("sum_price"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
      .orderBy("o_orderpriority")
    assert(reagg.collect().toSeq == direct.collect().toSeq)
  }
}
