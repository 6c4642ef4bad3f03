package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contracts for the native unicode_norm expression and the
  * q_fn_unicode hygiene report: NFC composition (combining accent,
  * compatibility ANGSTROM SIGN), NFKC ligature folding, null
  * propagation, and the crafted-corpus length/changed ledger. */
class Functions3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  test("unicode_norm: NFC composes e+U+0301 and maps U+212B to U+00C5; " +
      "NFKC additionally folds the fi ligature; null propagates") {
    import spark.implicits._
    val df = Seq(
      (1L, "Café"),        // decomposed accent
      (2L, "Å"),            // ANGSTROM SIGN
      (3L, "ﬁn"),           // fi ligature + n
      (4L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = df.select(col("id"),
        expr("unicode_norm(s, 'NFC')").as("nfc"),
        expr("unicode_norm(s, 'NFKC')").as("nfkc"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "Café")
    assert(out(0).getString(2) === "Café")
    assert(out(1).getString(1) === "Å")
    assert(out(2).getString(1) === "ﬁn", "NFC must keep the ligature")
    assert(out(2).getString(2) === "fin", "NFKC must fold the ligature")
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
  }

  test("unicode_norm: already-NFC input round-trips unchanged " +
      "(fast path) and an invalid form fails analysis") {
    import spark.implicits._
    val df = Seq("plain ascii", "Café Å").toDF("s")
    val out = df.select(col("s"), expr("unicode_norm(s, 'NFC')").as("n"))
      .filter(col("s") =!= col("n")).count()
    assert(out === 0L)
    val err = intercept[Exception] {
      df.select(expr("unicode_norm(s, 'NFX')")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("nfx")
      || err.getMessage.contains("unicode_norm"))
  }

  test("q_fn_unicode: dirty prefix yields l_raw 10+len, NFC drops one " +
      "(composition), clean drops two more (BEL + ZWSP)") {
    import spark.implicits._
    val dir = Tables.freshDir("f3_unicode")
    Seq((1L, "hello"), (2L, "ok")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_fn_unicode")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    // prefix = "Cafe"+U+0301+" "+U+212B+" "+BEL+U+200B = 10 chars raw;
    // NFC: e+accent compose → 9; strip: BEL and ZWSP go → 7.
    assert(out.toSeq === Seq(
      (1L, 15, 14, 12, 1),
      (2L, 12, 11, 9, 1)),
      s"unicode ledger wrong: ${out.toSeq}")
  }
}
