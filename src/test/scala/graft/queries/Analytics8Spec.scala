package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the round-7 seventh wave: exact ±1
  * autocorrelation on an alternating series, K4-plus-pendant k-core
  * peeling, and the outlier ranking contract. */
class Analytics8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("autocorr: an alternating 2/4 hourly series gives r_lag1 = -1 " +
      "and r_lag24 = +1 (period 2 divides 24)") {
    import spark.implicits._
    val dir = Tables.freshDir("a8_autocorr")
    val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)
    val rows = (0 until 30).flatMap { h =>
      val c = if (h % 2 == 0) 2 else 4
      (0 until c).map { i =>
        (h.toLong * 10 + i, base.plusHours(h.toLong).plusMinutes(i.toLong),
          1L, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((et, n1, r1, n24, r24)) =
      SparkEntry.queries("q_time_autocorr")(spark, dir)
        .as[(String, Long, Double, Long, Double)].collect()
    assert(et == "click" && n1 == 29L && n24 == 6L,
      s"counts: $et $n1 $n24")
    assert(r1 == -1.0, s"r_lag1: $r1")
    assert(r24 == 1.0, s"r_lag24: $r24")
  }

  test("kcore: K4 plus a pendant node peels to the K4 and stays stable") {
    import spark.implicits._
    val dir = Tables.freshDir("a8_kcore")
    // support->=2 edges: K4 on nodes 1..4 (6 edges) + pendant 5-1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2 + 100L, a), (i * 2 + 100L, b),
        (i * 2 + 101L, a), (i * 2 + 101L, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_kcore")(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 5L, 7L), (1, 4L, 6L), (2, 4L, 6L),
      (3, 4L, 6L)), s"got $out")
  }

  test("langid-ngram: disjoint-script languages classify to a perfect " +
      "diagonal confusion matrix") {
    import spark.implicits._
    val dir = Tables.freshDir("a8_langid")
    val docs = (0 until 6).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha bravo charlie delta echo $i",
        "lat", "s", 0L)
      else (i.toLong, s"12345 67890 24680 13579 11111 $i", "num", "s", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_langid_ngram")(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("lat", "lat", 3L), ("num", "num", 3L)),
      s"confusion: $out")
  }

  test("outlier: 20 rows, distances non-increasing, clusters in 0..7, " +
      "deterministic") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_embed_outlier")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.size == 20)
    assert(out.forall { case (_, c, _) => c >= 0 && c < 8 })
    val ds = out.map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"distances not sorted: $ds")
    assert(ds.last > 0.0)
    val again = SparkEntry.queries("q_embed_outlier")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == again)
  }
}
