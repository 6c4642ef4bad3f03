package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Round-11 streaming wave: the batch/stream parity audit — Spark's
  * unified-semantics guarantee made checkable. The SAME tumbling
  * 10-minute aggregation (count + exact DECIMAL sum) runs twice over
  * one crafted feed: once as a watermarked Append-mode stream across
  * two micro-batches (out-of-order arrivals included), once as a plain
  * batch query over the union of the feed — and the op emits the
  * per-window side-by-side with an is_match verdict. Every closed
  * window must agree exactly: a replayed backfill and the live
  * pipeline produce identical tables, the property that lets a 100 TB
  * pipeline rebuild any day from the lake with the streaming code
  * path.
  *
  * The feed's tail sentinel (2 h ahead) advances the watermark past
  * both data windows so Append mode finalizes them; the sentinel's own
  * still-open window is excluded from the comparison on both sides by
  * construction (batch side compares only windows the stream emitted —
  * an inner join, with a separate emitted-window count column guarding
  * against silent drops).
  *
  * No SQL oracle (MemoryStream rig; SURVEY §2.C rule 4) —
  * StreamingQ3Spec pins exact window contents, the all-match verdict,
  * and the closed-window count. */
object StreamingQ3 {

  private[graft] def qStreamParity(s: SparkSession, d: String)
      : DataFrame = {
    import StreamingQ.{ev, Ev}
    // two 10-min windows of data (out-of-order within each), then the
    // watermark-advancing sentinel
    val batch1 = Seq(ev(1, 30, uid = 1, v = 2.5), ev(2, 540, uid = 2,
      v = 1.5), ev(3, 120, uid = 1, v = 4.0))
    val batch2 = Seq(ev(4, 660, uid = 3, v = 3.0), ev(5, 1170, uid = 1,
      v = 0.5), ev(6, 7200, uid = 9, v = 9.9))
    val agg: DataFrame => DataFrame = df => df
      .withColumn("v", col("value").cast("decimal(18,4)"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("w_start"), col("n"), col("sv"))
    val streamed = StreamingQ.runStream(s, batch1, batch2, agg,
      OutputMode.Append())
    import s.implicits._
    val batch = (batch1 ++ batch2).toDF()
      .withColumn("v", col("value").cast("decimal(18,4)"))
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_batch"), sum(col("v")).as("sv_batch"))
      .select(col("window.start").as("w_start"), col("n_batch"),
        col("sv_batch"))
    val emitted = streamed.agg(count(lit(1)).as("n_closed_windows"))
    streamed
      .join(batch, Seq("w_start"))
      .crossJoin(broadcast(emitted))
      .select(col("w_start"), col("n").as("n_stream"), col("n_batch"),
        col("sv").cast("double").as("sum_stream"),
        col("sv_batch").cast("double").as("sum_batch"),
        (col("n") === col("n_batch") &&
          col("sv") === col("sv_batch")).as("is_match"),
        col("n_closed_windows"))
      .orderBy(col("w_start"))
  }

  /** TTL dedup (r12): `dropDuplicatesWithinWatermark` — the bounded-
    * state dedup semantics `q_stream_dedup`'s plain dropDuplicates
    * does NOT have: a key's dedup state is EVICTED once the watermark
    * passes its event time + delay, so a genuine re-occurrence after
    * the TTL emits AGAIN (at-least-once dedup with provably bounded
    * state — the production trade for infinite streams, where exact
    * forever-dedup would grow state without bound). The crafted feed
    * pins all three behaviors: an in-delay duplicate is dropped, the
    * watermark evicts the key, and the post-TTL re-occurrence of the
    * SAME event id emits a second time. Rule 4 (MemoryStream rig);
    * StreamingQ3Spec pins the exact emission multiset. */
  private[graft] def qStreamDedupTtl(s: SparkSession, d: String)
      : DataFrame = runStreamDedupTtl(s)

  /** [[qStreamDedupTtl]]'s rig with a per-phase query hook: the spec
    * reads observed-in + the state-store ledger after each batch and
    * closes keys-admitted − keys-evicted = state-size (the r12
    * full-outer observe() discipline extended to the dedup store). */
  private[graft] def runStreamDedupTtl(s: SparkSession,
      onQueryPhase: (Int, org.apache.spark.sql.streaming.StreamingQuery)
        => Unit = (_, _) => ()): DataFrame = {
    import StreamingQ.{ev, Ev}
    import s.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val name = s"ttl_${java.util.UUID.randomUUID().toString
      .replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val q = input.toDF()
        .observe("graft_ttl_in", count(lit(1)).as("n_rows"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        // b1: id 1 twice within the 10-min delay → second dropped
        input.addData(Seq(ev(1, 10), ev(2, 20), ev(1, 15)))
        q.processAllAvailable(); onQueryPhase(1, q)
        // b2: sentinel drags the watermark to 3000 s — past 10 s + 10
        // min, so id 1's dedup state is evicted
        input.addData(Seq(ev(3, 3600)))
        q.processAllAvailable(); onQueryPhase(2, q)
        // b3: id 1 RE-OCCURS above the watermark → emits a second time
        input.addData(Seq(ev(1, 3200)))
        q.processAllAvailable(); onQueryPhase(3, q)
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name).orderBy("us")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_stream_parity" -> (qStreamParity _),
    "q_stream_dedup_ttl" -> (qStreamDedupTtl _),
  )

  val sql: Map[String, String] = Map()
}
