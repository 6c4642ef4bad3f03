package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contracts for the compressibility/rowhash wave: a pathologically
  * repetitive doc lands in a strictly lower ratio bucket than a
  * high-entropy one, the histogram conserves docs and bytes, the
  * report is run-to-run deterministic, and the rowhash diff counts
  * exactly the planted mutations. */
class LlmText9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("compressibility: repetition compresses into a lower bucket " +
      "than near-random text; docs and bytes are conserved; " +
      "deterministic") {
    import spark.implicits._
    val dir = Tables.freshDir("lt9_comp")
    val repetitive = Seq.fill(200)("spam").mkString(" ")
    val rnd = new scala.util.Random(42)
    val noisy = Seq.fill(200)(rnd.alphanumeric.take(4).mkString)
      .mkString(" ")
    Seq((0L, repetitive, "en", "src0", 0L), (1L, noisy, "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run() = SparkEntry.queries("q_text_compressibility")(spark, dir)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val out = run()
    assert(out.map(_._2).sum == 2L, s"docs conserved: $out")
    assert(out.map(_._3).sum == (repetitive.length + noisy.length).toLong,
      s"raw bytes conserved: $out")
    // the repetitive doc's bucket must be strictly below the noisy one's
    assert(out.size == 2 && out.head._1 < out.last._1, s"ordering: $out")
    assert(run() == out, "compressibility not deterministic")
  }

  test("rowhash diff: planted mutations on every 97th key are the " +
      "only changed rows") {
    import spark.implicits._
    val dir = Tables.freshDir("lt9_diff")
    (1L to 300L).map(k => (k, k, k * 1.5))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_fn_rowhash_diff")(spark, dir)
      .as[(String, Long)].collect().toSeq
    // keys 97, 194, 291 → 3 changed
    assert(out == Seq(("changed", 3L), ("unchanged", 297L)), s"diff: $out")
  }
}
