package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the round-7 sixth wave: bootstrap CI
  * bracketing + determinism, the CUSUM argmax on a planted rate shift,
  * and the chain-graph assortativity closed form. */
class Analytics7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bootstrap: 20 replicas, CI brackets the point estimate, " +
      "deterministic across runs") {
    import spark.implicits._
    val out = SparkEntry.queries("q_agg_bootstrap")(spark, sf)
      .as[(String, Long, Double, Long, Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (flag, n, mean, reps, lo, hi) =>
      assert(reps == 20L, s"$flag replicas: $reps")
      assert(lo <= hi, s"$flag: lo $lo > hi $hi")
      assert(lo <= mean && mean <= hi,
        s"$flag: CI [$lo, $hi] should bracket mean $mean with n=$n")
    }
    val again = SparkEntry.queries("q_agg_bootstrap")(spark, sf)
      .as[(String, Long, Double, Long, Double, Double)].collect().toSeq
    assert(out == again)
  }

  test("cusum: a 2/hr -> 10/hr rate shift is located at the last " +
      "low-rate hour") {
    import spark.implicits._
    val dir = Tables.freshDir("a7_cusum")
    val base = java.time.LocalDateTime.of(2024, 6, 1, 0, 0, 0)
    // 10 hours at 2 events/hour, then 10 hours at 10 events/hour
    val rows = (0 until 20).flatMap { h =>
      val c = if (h < 10) 2 else 10
      (0 until c).map { i =>
        (h.toLong * 100 + i, base.plusHours(h.toLong).plusMinutes(i.toLong),
          1L, "view", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((et, cpHr, dabs, stat)) =
      SparkEntry.queries("q_time_cusum")(spark, dir)
        .as[(String, Long, Long, Double)].collect()
    val baseHr = rows.head._2.toEpochSecond(java.time.ZoneOffset.UTC) /
      3600L
    // T=20, C=120; |D| peaks at t=10 (the 10th observed hour,
    // zero-based offset 9): |20*20 - 10*120| = 800
    assert(et == "view")
    assert(cpHr == baseHr + 9, s"changepoint hour: $cpHr vs base $baseHr")
    assert(dabs == 800L, s"dabs: $dabs")
    assert(stat == 40.0, s"stat: $stat")
  }

  test("assortativity: the 5-node chain closes at -1/3") {
    import spark.implicits._
    val dir = Tables.freshDir("a7_assort")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2 + 100L, a), (i * 2 + 100L, b),
        (i * 2 + 101L, a), (i * 2 + 101L, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((n, r)) = SparkEntry.queries("q_graph_assortativity")(
      spark, dir).as[(Long, Double)].collect()
    assert(n == 8L, s"sym edges: $n")
    assert(r == -0.333333, s"assortativity: $r")
  }
}
