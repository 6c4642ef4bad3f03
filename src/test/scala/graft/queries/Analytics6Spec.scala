package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the round-7 fifth wave: BFS frontier
  * sizes on a hand-built chain graph, the MAD closed form, and the
  * streaming signature-dedup semantics (exact + same-shingle-set dups
  * suppressed across micro-batches, novel content kept). */
class Analytics6Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("khop: chain graph A-B-C-D-E from the hub gives frontiers " +
      "1/2/1/1 and cumulative 1/3/4/5") {
    import spark.implicits._
    val dir = Tables.freshDir("a6_khop")
    // support->=2 edges: each pair appears in TWO orders; chain
    // 1-2-3-4-5; hub tie (nodes 2,3,4 all deg 2) breaks to min id = 2
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2 + 100L, a), (i * 2 + 100L, b),
        (i * 2 + 101L, a), (i * 2 + 101L, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_khop")(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 1L, 1L), (1, 2L, 3L), (2, 1L, 4L),
      (3, 1L, 5L)), s"got $out")
  }

  test("mad: values 1..5 give median 3, MAD 1") {
    import spark.implicits._
    val dir = Tables.freshDir("a6_mad")
    (1 to 5).map(v => ("A", v.toDouble))
      .toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((flag, n, med, mad)) =
      SparkEntry.queries("q_agg_mad")(spark, dir)
        .as[(String, Long, Double, Double)].collect()
    assert((flag, n, med, mad) == (("A", 5L, 3.0, 1.0)),
      s"got ($flag, $n, $med, $mad)")
  }

  test("streaming minhash dedup: signature-identical docs suppressed " +
      "across micro-batches, novel content kept") {
    import spark.implicits._
    val out = SparkEntry.queries("q_stream_dedup_minhash")(spark, "")
      .as[Long].collect().toSeq
    // doc 3 repeats doc 1's text (same batch); doc 4 repeats doc 2's
    // (next batch, inside the watermark); doc 5 is novel
    assert(out == Seq(1L, 2L, 5L), s"survivors: $out")
  }
}
