package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the SRM/coverage/integrity wave: a
  * deliberately skewed assignment trips the 3.841 flag, a hand-built
  * frequency ladder hits exact coverage shares, and planted orphans
  * are counted relation by relation. */
class Analytics27Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("srm: the md5-parity split flags an impossible skew and " +
      "passes a balanced one") {
    import spark.implicits._
    val dir = Tables.freshDir("a27_srm")
    // find user ids whose md5 parity is 'A' (arm computed the same
    // way the query does) and feed 40 A's and 2 B's → chi2 ≈ 34.4
    import java.security.MessageDigest
    def arm(u: Long): String = {
      val md = MessageDigest.getInstance("MD5")
      val h = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(h.substring(0, 6), 16) % 2 == 0) "A"
      else "B"
    }
    val as = (1L to 500L).filter(u => arm(u) == "A").take(40)
    val bs = (1L to 500L).filter(u => arm(u) == "B").take(2)
    val rows = (as ++ bs).zipWithIndex.map { case (u, i) =>
      (i.toLong + 1, ts(1000 + i), u, "click", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_srm")(spark, dir)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    val chi2 = BigDecimal((40.0 - 2.0) * (40.0 - 2.0) / 42.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq((40L, 2L, chi2, true)), s"srm: $out")
  }

  test("coverage: frequencies 4,3,2,1 put the top-1 word at 40% of " +
      "tokens") {
    import spark.implicits._
    val dir = Tables.freshDir("a27_cov")
    // w1×4, w2×3, w3×2, w4×1 → 10 tokens
    Seq((0L, "w1 w1 w1 w1 w2 w2 w2 w3 w3 w4", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_coverage")(spark, dir)
      .as[(Int, String, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1, "w1", 4L, 10L, 0.4)), s"coverage: $out")
  }

  test("integrity: one planted orphan per relation is counted") {
    import spark.implicits._
    val dir = Tables.freshDir("a27_fk")
    Seq((1L, 1L, 1L), (2L, 1L, 1L), (99L, 1L, 2L)) // orderkey 99 orphan
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 77L)) // custkey 77 orphan
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "c1")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, "s1"), (5L, "s5")) // suppkey 5 never ships
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = SparkEntry.queries("q_quality_integrity")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("lineitem_without_order", 1L, 3L),
      ("order_without_customer", 1L, 2L),
      ("supplier_without_lineitem", 1L, 2L)), s"fk: $out")
  }
}
