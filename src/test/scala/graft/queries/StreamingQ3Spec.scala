package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gate for the r11 batch/stream parity audit: both closed windows
  * emit, every emitted window matches the batch recomputation
  * exactly, and the still-open sentinel window is absent. */
class StreamingQ3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream parity: two closed windows, exact count/sum agreement " +
      "with the batch path, open sentinel window excluded") {
    val rows = SparkEntry.queries("q_stream_parity")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 2, s"windows: ${rows.toSeq}")
    assert(rows.forall(_.getBoolean(5)), s"mismatch: ${rows.toSeq}")
    assert(rows.forall(_.getLong(6) == 2), s"closed count: ${rows.toSeq}")
    // window [0,600): events 1,2,3 (2.5 + 1.5 + 4.0);
    // window [600,1200): events 4,5 (3.0 + 0.5)
    val w0 = rows.head
    assert(w0.getLong(1) == 3 && w0.getDouble(3) == 8.0, s"w0: $w0")
    val w1 = rows(1)
    assert(w1.getLong(1) == 2 && w1.getDouble(3) == 3.5, s"w1: $w1")
    // parity double-check outside the op: stream counts equal batch
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(2)).toSeq)
  }

  test("TTL dedup: in-delay duplicate dropped, watermark evicts the key, " +
      "the post-TTL re-occurrence of the SAME id emits a second time") {
    val usBase = StreamingQ.t0 * 1000000L
    val rows = SparkEntry.queries("q_stream_dedup_ttl")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def abs(off: Long) = usBase + off * 1000000L
    // emitted: 1@10 (first), 2@20, 3@3600 (sentinel), 1@3200 (post-TTL
    // RE-emission — plain dropDuplicates would have suppressed it);
    // 1@15 (in-delay duplicate) never emits
    assert(rows.toSeq == Seq(
      (1L, abs(10)), (2L, abs(20)), (1L, abs(3200)), (3L, abs(3600))),
      s"got ${rows.toSeq}")
    assert(rows.count(_._1 == 1L) == 2,
      "the evicted key must re-emit after its TTL")
  }

  test("TTL dedup state ledger: keys admitted - keys evicted = state " +
      "size per batch, against the observed input count") {
    case class Phase(in: Long, updated: Long, removed: Long, total: Long)
    val phases = scala.collection.mutable.Map[Int, Phase]()
    StreamingQ3.runStreamDedupTtl(spark, (i, q) => {
      val ps = q.recentProgress.toSeq
      val in = ps.flatMap(p => Option(p.observedMetrics.get("graft_ttl_in")))
        .map(_.getAs[Long]("n_rows")).sum
      val led = ps.filter(_.stateOperators.nonEmpty)
        .map(p => (p.stateOperators.map(_.numRowsUpdated).sum,
          p.stateOperators.map(_.numRowsRemoved).sum,
          p.stateOperators.map(_.numRowsTotal).sum))
      phases(i) = Phase(in, led.map(_._1).sum, led.map(_._2).sum,
        led.lastOption.map(_._3).getOrElse(-1L))
    })
    // b1: 3 rows observed in, keys {1,2} admitted (the in-delay dup of
    // key 1 adds no state), nothing evicted → state 2
    assert(phases(1) == Phase(3, 2, 0, 2), s"phase 1: ${phases(1)}")
    // b2: the sentinel (key 3) admits 1 more; its watermark (3000 s)
    // evicts keys 1 and 2 within the same commit → state 1 = {3}
    assert(phases(2) == Phase(4, 3, 2, 1), s"phase 2: ${phases(2)}")
    // b3: key 1 re-admitted above the watermark → state 2 = {1', 3};
    // the cumulative ledger closes: admitted 4 − evicted 2 = 2
    assert(phases(3) == Phase(5, 4, 2, 2), s"phase 3: ${phases(3)}")
    phases.values.foreach(p => assert(p.updated - p.removed == p.total,
      s"state-size equation broken: $p"))
  }
}
