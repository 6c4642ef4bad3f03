package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture contracts for the governance reports: the
  * k-anonymity sweep must count exactly the sub-k classes (including a
  * negative-balance band), and the dataset card's dominant-language
  * argmax, short-doc share, and exact-dup share must match hand
  * computation. */
class Analytics43Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kanon: classes (1,A,0)=3, (1,B,-1)=1, (2,A,0)=10 sweep " +
      "across k in {2,5,10,25}") {
    import spark.implicits._
    val dir = Tables.freshDir("a43_kanon")
    val rows =
      (1 to 3).map(i => (100L + i, 1, 500.0, "AUTOMOBILE")) ++
        Seq((200L, 1, -50.0, "BUILDING")) ++
        (1 to 10).map(i => (300L + i, 2, 999.0, "AUTOMOBILE"))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .withColumn("c_name", org.apache.spark.sql.functions.lit("x"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q_quality_kanon")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    assert(out.toSeq === Seq(
      (2, 3L, 1L, 1L, 14L, 1L, 10L, 0.071428571),
      (5, 3L, 2L, 4L, 14L, 1L, 10L, 0.285714286),
      (10, 3L, 2L, 4L, 14L, 1L, 10L, 0.285714286),
      (25, 3L, 3L, 14L, 14L, 1L, 10L, 1.0)),
      s"kanon sweep wrong: ${out.toSeq}")
  }

  test("ldiv: a k-anonymous single-segment class still fails l=2; a " +
      "two-segment class fails only l=3") {
    import spark.implicits._
    val dir = Tables.freshDir("a43_ldiv")
    val rows =
      (1 to 3).map(i => (100L + i, 1, 500.0, "AUTOMOBILE")) ++ // ldiv 1
        Seq((201L, 2, 500.0, "AUTOMOBILE"), (202L, 2, 600.0, "AUTOMOBILE"),
          (203L, 2, 700.0, "BUILDING"), (204L, 2, 800.0, "BUILDING")) ++ // 2
        Seq((301L, 3, 500.0, "AUTOMOBILE"), (302L, 3, 600.0, "BUILDING"),
          (303L, 3, 700.0, "FURNITURE")) // ldiv 3
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .withColumn("c_name", org.apache.spark.sql.functions.lit("x"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q_quality_ldiv")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.toSeq === Seq(
      (2, 3L, 1L, 3L, 10L, 1L, 0.3),
      (3, 3L, 2L, 7L, 10L, 1L, 0.7)),
      s"ldiv sweep wrong: ${out.toSeq}")
  }

  test("datacard: dominant-lang argmax, short share, exact-dup share") {
    import spark.implicits._
    val dir = Tables.freshDir("a43_card")
    val long21 = (1 to 21).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, "a b c", "en", "s1"),
      (2L, "a b c", "en", "s1"),
      (3L, "d e", "fr", "s1"),
      (4L, long21, "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_quality_datacard")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getString(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8)))
    assert(out.toSeq === Seq(
      ("s1", 3L, 8L, 2.666667, 2L, "en", 0.666666667, 1.0, 0.333333333),
      ("s2", 1L, 21L, 21.0, 1L, "de", 1.0, 0.0, 0.0)),
      s"datacard wrong: ${out.toSeq}")
  }

  test("dedup sweep: pair/doc counts step down across the threshold " +
      "grid exactly at the crafted Jaccards (1.0 and 0.625)") {
    import spark.implicits._
    val dir = Tables.freshDir("a43_sweep")
    val block = (1 to 9).map(i => s"c$i").mkString(" ")
    Seq(
      (1L, s"$block a1 a2 a3"), // A
      (2L, s"$block a1 a2 a3"), // B = A (jac 1.0)
      (3L, s"$block b1 b2 b3"), // C: shares the 5 block shingles
      (4L, "z1 z2 z3 z4 z5 z6")) // unrelated, all shingles df=1
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // capped sets: A=B have 8 shingles (df>=2 via each other), C keeps
    // only the 5 block shingles. Pairs: (A,B) jac 8/8=1.0;
    // (A,C),(B,C) jac 5/(8+5-5)=0.625.
    val out = SparkEntry.queries("q_dedup_sweep")(spark, dir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      (0.2, 3L, 3L, 0.75), (0.3, 3L, 3L, 0.75), (0.4, 3L, 3L, 0.75),
      (0.5, 3L, 3L, 0.75), (0.7, 1L, 2L, 0.5)),
      s"sweep wrong: ${out.toSeq}")
  }
}
