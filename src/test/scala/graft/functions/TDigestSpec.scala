package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the native mergeable t-digest aggregate: rank-error
  * bound on a heavy-tailed distribution, invariance of that bound
  * across shuffle partitionings (the mergeable-partial proof the
  * sketch family's SketchInvarianceSpec applies to the built-ins),
  * serialization round-trip, split-vs-whole merge agreement, and
  * null/empty semantics. */
class TDigestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic heavy-tailed sample: x_i = -ln(u_i) with u_i a
    * fixed-seed md5-derived uniform (the repo's md5-uniform idiom,
    * driver-side here since this is test data generation). */
  private def sample(n: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      val h = md.digest(s"tdigest-$i".getBytes("UTF-8"))
      val bits = java.nio.ByteBuffer.wrap(h).getLong(0) >>> 11
      val u = (bits.toDouble + 0.5) / (1L << 53).toDouble
      -math.log(u)
    }.toArray
  }

  /** Fraction of xs strictly below v, as the achieved rank of v. */
  private def rankOf(xs: Array[Double], v: Double): Double =
    xs.count(_ < v).toDouble / xs.length

  test("rank-error bound: exponential sample, q in {0.5, 0.95, 0.99} " +
      "within 0.015 rank error at compression 200") {
    val xs = sample(20000)
    val d = new TDigest(200.0)
    xs.foreach(d.add)
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val est = d.quantile(q)
      val r = rankOf(xs, est)
      assert(math.abs(r - q) <= 0.015,
        s"q=$q est=$est achieved rank $r (err ${math.abs(r - q)})")
    }
    // exact endpoints
    assert(d.quantile(0.0) == xs.min && d.quantile(1.0) == xs.max)
  }

  test("serialization round-trip preserves every quantile") {
    val xs = sample(5000)
    val d = new TDigest(100.0)
    xs.foreach(d.add)
    val d2 = TDigest.deserialize(d.serialize())
    for (q <- (0 to 14).map(i => 0.01 + 0.07 * i))
      assert(d.quantile(q) == d2.quantile(q), s"round-trip drift at q=$q")
    assert(d2.totalWeight == 5000L)
  }

  test("split-vs-whole merge: digests over halves merged agree with " +
      "the whole within the rank bound") {
    val xs = sample(20000)
    val whole = new TDigest(200.0); xs.foreach(whole.add)
    val a = new TDigest(200.0); xs.take(10000).foreach(a.add)
    val b = new TDigest(200.0); xs.drop(10000).foreach(b.add)
    val merged = a.mergeWith(b)
    assert(merged.totalWeight == 20000L)
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val r = rankOf(xs, merged.quantile(q))
      assert(math.abs(r - q) <= 0.015,
        s"merged digest q=$q achieved rank $r")
    }
  }

  test("SQL aggregate: rank bound holds across shuffle partitionings " +
      "{1, 4, 13} (mergeable-partial proof through a real exchange)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val xs = sample(20000)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (p <- Seq(1, 4, 13)) {
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        val est = xs.toSeq.toDF("x")
          .repartition(p)
          .selectExpr(
            "tdigest_quantiles(x, array(0.5D, 0.95D, 0.99D), 200) AS e")
          .head.getSeq[Double](0)
        for ((q, v) <- Seq(0.5, 0.95, 0.99).zip(est)) {
          val r = rankOf(xs, v)
          assert(math.abs(r - q) <= 0.015,
            s"partitions=$p q=$q est=$v achieved rank $r")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sketch-table rollup: quantiles from 13 merged STORED digests " +
      "(tdigest_agg -> binary -> tdigest_merge_quantiles) hold the " +
      "rank bound with no re-scan of the raw values") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val xs = sample(20000)
    val est = xs.toSeq.zipWithIndex.map { case (x, i) => (i % 13, x) }
      .toDF("g", "x")
      .createOrReplaceTempView("tdr_raw")
    val rows = spark.sql(
      """SELECT tdigest_merge_quantiles(dg, array(0.5D, 0.95D, 0.99D), 200)
        |  AS e
        |FROM (SELECT g, tdigest_agg(x, 200) AS dg
        |      FROM tdr_raw GROUP BY g)""".stripMargin)
      .head.getSeq[Double](0)
    for ((q, v) <- Seq(0.5, 0.95, 0.99).zip(rows)) {
      val r = rankOf(xs, v)
      assert(math.abs(r - q) <= 0.02,
        s"rollup q=$q est=$v achieved rank $r")
    }
  }

  test("non-finite inputs are skipped: NaN and ±Inf cannot poison the " +
      "group's quantiles") {
    GraftFunctions.register(spark)
    val est = spark.sql(
      """SELECT tdigest_quantiles(x, array(0.5D), 100) AS e
        |FROM VALUES (1.0D), (double('NaN')), (3.0D),
        |            (double('Infinity')), (double('-Infinity'))
        |  AS t(x)""".stripMargin).head.getSeq[Double](0)
    assert(est.head == 2.0, s"non-finite leak into the digest: $est")
  }

  test("nulls are skipped; an all-null group evaluates to NULL") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT g, tdigest_quantiles(x, array(0.5D), 100) AS e
        |FROM VALUES ('a', 1.0D), ('a', CAST(NULL AS DOUBLE)),
        |            ('a', 3.0D), ('b', CAST(NULL AS DOUBLE))
        |  AS t(g, x)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows(0).getSeq[Double](1).head == 2.0,
      s"null-skipping mean wrong: ${rows(0)}")
    assert(rows(1).isNullAt(1), "all-null group must evaluate to NULL")
  }
}
