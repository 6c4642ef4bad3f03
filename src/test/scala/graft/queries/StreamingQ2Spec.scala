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
}
