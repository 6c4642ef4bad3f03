package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contract for the online anomaly detector: exactly the
  * flat-history-then-jump event fires (with the PRIOR moments it was
  * judged against), the post-jump recovery value stays quiet against
  * the widened state, and a short-history key never pages. */
class StreamingQ2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream anomaly: only the 10→100 jump fires, judged against " +
      "prior n=5 mean=10 sd=0") {
    val out = SparkEntry.queries("q_stream_anomaly")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq((6L, 1L, 100.0, 5L, 10.0, 0.0)),
      s"anomaly emissions wrong: ${out.toSeq}")
  }

  test("stream anomaly: deterministic across replays") {
    val a = SparkEntry.queries("q_stream_anomaly")(spark, "unused")
      .collect().toSeq
    val b = SparkEntry.queries("q_stream_anomaly")(spark, "unused")
      .collect().toSeq
    assert(a === b)
  }

  test("stream drift: per-batch PSI matches an independent replay — " +
      "in-distribution batch near 0, shifted batch strictly higher") {
    val out = SparkEntry.queries("q_stream_drift")(spark, "unused")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // replay: reference uniform 10×4 on bins 0..3; batch 0 = 40 events
    // uniform on bins 0..3; batch 1 adds 30 events on bins 8..9
    def psi(cnt: Map[Int, Long]): Double = {
      val n = cnt.values.sum
      val v = (0 to 9).map { b =>
        val pa = (cnt.getOrElse(b, 0L) + 1.0) / (n + 10.0)
        val pb = (if (b <= 3) 10L else 0L) + 1.0
        val pbb = pb / 50.0
        math.rint((pa - pbb) * math.log(pa / pbb) * 1e9) / 1e9
      }.sum
      math.rint(v * 1e6) / 1e6
    }
    val b0 = Map(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L)
    val b1 = b0 ++ Map(8 -> 15L, 9 -> 15L)
    assert(out.toSeq === Seq((0L, 40L, psi(b0)), (1L, 70L, psi(b1))),
      s"drift trajectory wrong: ${out.toSeq} vs ${(psi(b0), psi(b1))}")
    assert(out(0)._3 < 0.01 && out(1)._3 > out(0)._3 + 0.1,
      s"drift ordering wrong: ${out.toSeq}")
  }
}
