package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the surrogate-key / corrupt-CSV wave:
  * minted keys equal the reference md5-UUID computed in plain Java,
  * the audit proves zero collisions, and the PERMISSIVE read
  * classifies exactly one short row and one type-corrupt row. */
class Formats2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("surrogate: the minted uuid equals the reference md5 " +
      "formatting and the audit shows zero collisions") {
    import spark.implicits._
    val dir = Tables.freshDir("f2_surrogate")
    Seq(1L, 2L, 3L).map(k => (k, k, 1.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_fn_surrogate")(spark, dir)
      .as[(Long, String, Long, Long)].collect().toSeq
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest("orders|1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected1 = Seq(h.substring(0, 8), h.substring(8, 12),
      h.substring(12, 16), h.substring(16, 20), h.substring(20, 32))
      .mkString("-")
    assert(out.size == 3 && out.head == (1L, expected1, 3L, 3L),
      s"surrogate: $out")
    assert(out.map(_._2).distinct.size == 3, s"collision: $out")
  }

  test("corrupt csv: one short row null-fills silently, one type " +
      "error lands in _corrupt_record, the rest sum their chars") {
    import spark.implicits._
    val dir = Tables.freshDir("f2_csv")
    (0L to 9L).map(i => (i, s"t$i", "en", "src0", i * 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_source_csv_corrupt")(spark, dir)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(out == Seq(("corrupt", 1L, None), ("good", 8L, Some(350L)),
      ("short_row", 1L, None)), s"csv: $out")
  }
}
