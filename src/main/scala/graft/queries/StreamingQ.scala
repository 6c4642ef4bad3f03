package graft.queries

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import Tables._

/** Streaming surface (SURVEY §2.C cat. S).
  *
  * Tumble/slide/session run the *same* `window()`/`session_window()`
  * functions in batch mode (the functions are mode-agnostic), which makes
  * them DuckDB-oracle-able; watermark/dedup/stateful run real
  * micro-batch streaming queries over a MemoryStream feed with crafted
  * late/duplicate events (FIXTURES §B.4) and are ScalaTest-verified.
  * All event-time comparisons are in epoch micros on both engines
  * (events.ts is nanosecond parquet). */
object StreamingQ {

  private def qStreamTumble(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec(col("value")))).as("sum_v"))
      .select(unix_micros(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sum_v"))
      .orderBy("w_start", "event_type")

  private def qStreamSlide(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts_utc"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("w_start"), col("n"))
      .orderBy("w_start")

  private def qStreamSession(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_start"),
        unix_micros(col("session_window.end")).as("s_end"), col("n"))
      .orderBy("user_id", "s_start")

  // ---- real streaming over MemoryStream ------------------------------

  /** Crafted feed (FIXTURES §B.4): base hour of events, out-of-order
    * arrivals, one straggler beyond the watermark, duplicates. Times are
    * epoch seconds from 2024-01-01T00:00Z. */
  private[graft] val t0 = 1704067200L
  private[graft] case class Ev(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, value: Double)
  private[graft] def ev(id: Long, offSec: Long, uid: Long = 1L,
      v: Double = 1.0): Ev =
    Ev(id, new java.sql.Timestamp((t0 + offSec) * 1000L), uid, v)

  /** Run a streaming transform over two crafted micro-batches and return
    * the memory-sink contents as a DataFrame. */
  private[graft] def runStream(s: SparkSession,
      batch1: Seq[Ev], batch2: Seq[Ev],
      transform: DataFrame => DataFrame,
      mode: OutputMode): DataFrame = {
    import s.implicits._
    runStreamT[Ev](s, batch1, batch2, transform, mode)
  }

  /** Typed generalization of [[runStream]] for non-Ev feeds (the CDC
    * change stream). */
  private[graft] def runStreamT[T: org.apache.spark.sql.Encoder](
      s: SparkSession, batch1: Seq[T], batch2: Seq[T],
      transform: DataFrame => DataFrame,
      mode: OutputMode): DataFrame = {
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[T](s)
    val name = s"sink_${UUID.randomUUID().toString.replace("-", "")}"
    // Stateful micro-batches create one state-store instance per shuffle
    // partition; 32 stores for a 7-event feed is pure scheduling
    // overhead. Narrow while the stream runs, restore after.
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val q = transform(input.toDF())
        .writeStream.format("memory").queryName(name).outputMode(mode).start()
      try {
        input.addData(batch1)
        q.processAllAvailable()
        input.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name)
  }

  /** Observability readout for [[runWatermarkObserved]]: rows the
    * `observe()` hook counted entering the pipeline, and rows the
    * watermark dropped at the stateful operator (the engine's
    * numRowsDroppedByWatermark), summed over all micro-batches. */
  private[graft] case class WatermarkObs(observedRows: Long,
      droppedByWatermark: Long)

  /** Watermarked tumbling agg WITH the production monitoring surface
    * wired in: a `Dataset.observe()` named aggregate on the raw input
    * (rows entering, per batch — the sink every streaming pipeline
    * exports to its metrics system) plus the engine's own
    * per-state-operator `numRowsDroppedByWatermark`, both read off the
    * StreamingQueryProgress API after the run. observe() computes its
    * aggregates inline on rows flowing past — no extra pass, no state —
    * and the two counters together give the live late-data equation:
    * rows_in − rows_dropped = rows aggregated. The straggler (55+ min
    * late vs a 10-min watermark) must be dropped; on-time out-of-order
    * events must land. StreamingLlmSpec asserts the observed totals
    * equal the crafted feed (7 in, exactly the 1 straggler dropped). */
  private[graft] def runWatermarkObserved(s: SparkSession)
      : (DataFrame, WatermarkObs) = {
    import s.implicits._
    val batch1 = Seq(ev(1, 60), ev(2, 400), ev(3, 310), // window 0-5min ×2, 5-10 ×1
      ev(4, 1000))                                      // 15-20min
    val batch2 = Seq(ev(5, 3600),                       // advances watermark to 50min
      ev(6, 70),                                        // 55+ min late → DROPPED
      ev(7, 3650))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val name = s"wmsink_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val q = input.toDF()
        .observe("graft_input", count(lit(1)).as("n_rows"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("long")).as("sum_v"))
        .select(unix_micros(col("window.start")).as("w_start"), col("n"),
          col("sum_v"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      val obs = try {
        input.addData(batch1)
        q.processAllAvailable()
        input.addData(batch2)
        q.processAllAvailable()
        // recentProgress covers every batch of this short run (default
        // retention 100); no-data batches carry no observed metrics
        val ps = q.recentProgress.toSeq
        WatermarkObs(
          ps.flatMap(p => Option(p.observedMetrics.get("graft_input")))
            .map(_.getAs[Long]("n_rows")).sum,
          ps.flatMap(_.stateOperators.toSeq)
            .map(_.numRowsDroppedByWatermark).sum)
      } finally q.stop()
      (s.table(name).orderBy("w_start"), obs)
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private def qStreamWatermark(s: SparkSession, d: String): DataFrame =
    runWatermarkObserved(s)._1

  /** Streaming dropDuplicates on event_id within the watermark. */
  private def qStreamDedup(s: SparkSession, d: String): DataFrame = {
    val batch1 = Seq(ev(1, 10), ev(2, 20), ev(1, 10), ev(3, 30))
    val batch2 = Seq(ev(2, 20), ev(4, 3600), ev(4, 3600))
    runStream(s, batch1, batch2,
      df => df.withWatermark("ts", "10 minutes")
        .dropDuplicates("event_id")
        .select(col("event_id"), unix_micros(col("ts")).as("us")),
      OutputMode.Append())
      .orderBy("event_id")
  }

  /** Arbitrary stateful processing: per-user running event count via
    * flatMapGroupsWithState (reference-class engines expose custom state;
    * SURVEY §2.C q_stream_stateful). */
  private def qStreamStateful(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val batch1 = Seq(ev(1, 10, uid = 1), ev(2, 20, uid = 2), ev(3, 30, uid = 1))
    val batch2 = Seq(ev(4, 40, uid = 1), ev(5, 50, uid = 3))
    runStream(s, batch1, batch2,
      df => df.as[Ev].groupByKey(_.user_id)
        .flatMapGroupsWithState[Long, (Long, Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
            val prev = state.getOption.getOrElse(0L)
            val now = prev + evs.size
            state.update(now)
            Iterator((uid, prev, now))
        }.toDF("user_id", "prev_count", "new_count"),
      OutputMode.Append())
      .orderBy("user_id", "new_count")
  }

  /** A CDC change record: key, monotone per-key sequence number, op
    * (upsert/delete), payload. */
  private[graft] case class Chg(key: Long, seq: Long, op: String,
      value: Double)

  /** Streaming CDC APPLY — the streaming MERGE every replication
    * pipeline needs: a change stream of keyed upsert/delete records
    * folds into per-key latest state via flatMapGroupsWithState, and
    * the output is the TRANSITION LOG (key, seq, op, old, new,
    * applied). Replay/out-of-order protection is the production
    * property pinned here: a change whose seq is ≤ the applied
    * high-water mark is emitted with applied=false and cannot touch
    * state — so at-least-once upstream delivery and cross-batch
    * reordering both converge to the same final state. State per key
    * is (high-water seq, current value) — O(1), keyed, partitionable;
    * at 100 TB this is exactly Delta/Hudi-style streaming upsert with
    * the state store as the table index. */
  private def qStreamCdcApply(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val batch1 = Seq(Chg(1, 1, "upsert", 1.0), Chg(1, 3, "upsert", 3.0),
      Chg(2, 1, "upsert", 5.0))
    val batch2 = Seq(Chg(1, 2, "upsert", 2.0), // STALE: seq 2 < hwm 3
      Chg(2, 2, "delete", 0.0),
      Chg(3, 1, "delete", 0.0),                // delete of absent key
      Chg(1, 4, "delete", 0.0))
    runStreamT[Chg](s, batch1, batch2,
      df => df.as[Chg].groupByKey(_.key)
        .flatMapGroupsWithState[(Long, Option[Double]),
          (Long, Long, String, Option[Double], Option[Double], Boolean)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (key: Long, chgs: Iterator[Chg],
              state: GroupState[(Long, Option[Double])]) =>
            var (hwm, cur) = state.getOption.getOrElse((0L, None))
            val out = chgs.toSeq.sortBy(_.seq).map { c =>
              val applied = c.seq > hwm
              val old = cur
              if (applied) {
                hwm = c.seq
                cur = if (c.op == "delete") None else Some(c.value)
              }
              (key, c.seq, c.op, old, cur, applied)
            }
            state.update((hwm, cur))
            out.iterator
        }
        .toDF("key", "seq", "op", "old_value", "new_value", "applied"),
      OutputMode.Append())
      .orderBy("key", "seq")
  }

  /** StatefulProcessor for q_stream_tws: per-user running (count, sum)
    * in a RocksDB-backed ValueState, one output row per user per batch.
    * The class is the Spark 4 transformWithState API surface — typed
    * state handles acquired in init, batch-at-a-time handleInputRows. */
  private class RunningAgg
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, errors => _}
    @transient private var st: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Double)]("agg",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Double)] = {
      val (pn, psum) = if (st.exists()) st.get() else (0L, 0.0)
      var n = pn; var sum = psum
      rows.foreach { e => n += 1; sum += e.value }
      st.update((n, sum))
      Iterator((key, n, math.round(sum * 100).toDouble / 100))
    }
  }

  /** Spark 4 transformWithState: the successor stateful API —
    * RocksDB-backed typed state handles (ValueState/ListState/MapState,
    * TTL, timers) instead of a single GroupState blob. Per-user running
    * count+sum across micro-batches; output checked against an exact
    * per-batch replay in StreamingLlmSpec. Requires the RocksDB state
    * store provider, set for the duration of the stream. */
  private def qStreamTws(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch1 = Seq(ev(1, 10, uid = 1, v = 2.5), ev(2, 20, uid = 2, v = 1.0),
        ev(3, 30, uid = 1, v = 0.5))
      val batch2 = Seq(ev(4, 40, uid = 1, v = 3.0), ev(5, 50, uid = 3, v = 4.0))
      runStream(s, batch1, batch2,
        df => df.as[Ev].groupByKey(_.user_id)
          .transformWithState(new RunningAgg, TimeMode.None(),
            OutputMode.Append())
          .toDF("user_id", "n_events", "sum_value"),
        OutputMode.Append())
        .orderBy("user_id", "n_events")
    } finally {
      prev match {
        case Some(v) => s.conf.set(providerKey, v)
        case None => s.conf.unset(providerKey)
      }
    }
  }

  /** Open-session state for [[runSessionAgg]]: bounds in epoch millis,
    * event count. O(1) per user — the watermark bounds how long it
    * lives, so the store holds only open sessions at any stream
    * length. */
  private[graft] case class Sess(startMs: Long, endMs: Long, n: Long)

  /** Watermarked session aggregation in UPDATE mode — the production
    * sessionization shape. Spark's built-in `session_window` supports
    * only append/complete output (append emits nothing until the
    * watermark closes a session), so the update-mode variant is built
    * the way production pipelines build it: `flatMapGroupsWithState`
    * with `EventTimeTimeout` — custom (user → open-session) state,
    * gap-30min merge logic, an update row emitted per touched session
    * per batch, and an explicit finalize+evict when the watermark
    * passes a session's end (timeout callback, or inline for a key
    * poked by late data). Behaviors pinned by the returned update LOG:
    *  - on-time events MERGE into the open session and re-emit it
    *    (u1's batch-2 event extends [0,31m) n=2 to [0,35m) n=3);
    *  - watermark passage EVICTS closed state, emitting the session
    *    once more with finalized=true (u1/u2 during batch 3, after u3's
    *    +2h event drags the watermark to +110min);
    *  - a late event can neither update nor resurrect an evicted
    *    session (u2's +2min batch-3 straggler changes nothing).
    * Out-of-order events ABOVE the watermark merge exactly: an event
    * earlier than the open session's start (reachable — the 10-min
    * watermark is shorter than the 30-min gap) moves startMs BACK
    * (min-merge), so the emitted s_start always covers every counted
    * event (ADVICE r9). `onBatch` lets the spec read per-batch
    * state-store metrics (numRowsTotal / numRowsRemoved) off the live
    * query. */
  private[graft] def runSessionAgg(s: SparkSession,
      onBatch: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): DataFrame =
    runSessionAggFeed(s, Seq(
      // b1: two open sessions — u1 [0,31m) n=2, u2 [100s,31m40s) n=1
      Seq(ev(1, 0, uid = 1), ev(2, 60, uid = 1), ev(3, 100, uid = 2)),
      // b2: u1 grows (merge into open session); u3 opens at +2h and
      // drags the watermark to +110min at batch end
      Seq(ev(4, 300, uid = 1), ev(5, 7200, uid = 3)),
      // b3: u1/u2 time out under the +110min watermark (finalized +
      // evicted); u2's +2min straggler is beyond the watermark →
      // dropped, cannot resurrect the session; u3 grows normally
      Seq(ev(6, 120, uid = 2), ev(7, 7260, uid = 3))), onBatch)

  /** [[runSessionAgg]] with a caller-supplied micro-batch feed (the
    * spec uses it to pin the out-of-order min-merge case). */
  private[graft] def runSessionAggFeed(s: SparkSession,
      batches: Seq[Seq[Ev]],
      onBatch: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): DataFrame = {
    import s.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val name = s"sess_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      // observe() on the input side (the r12 full-outer ledger pattern):
      // the spec closes sessions-created − numRowsRemoved = numRowsTotal
      // against the observed input count per batch.
      val q = sessionFlatMap(input.toDF()
        .observe("graft_sess_in", count(lit(1)).as("n_rows"))
        .withWatermark("ts", "10 minutes"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        batches.foreach { b =>
          input.addData(b)
          q.processAllAvailable(); onBatch(q)
        }
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name)
  }

  /** The fMGWS session-operator BODY, shared by the MemoryStream rig
    * above and the kill-and-resume durability spec
    * (StreamingRestartSpec) — the restart test must exercise the
    * production state logic, not a copy. Input must already carry its
    * watermark. */
  private[graft] def sessionFlatMap(watermarked: DataFrame): DataFrame = {
    val s = watermarked.sparkSession
    import s.implicits._
    val gapMs = 30L * 60 * 1000
    watermarked
        .as[Ev].groupByKey(_.user_id)
        .flatMapGroupsWithState[Sess, (Long, Long, Long, Long, Boolean)](
          OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
          (uid: Long, evs: Iterator[Ev], state: GroupState[Sess]) =>
            def fin(st: Sess) = {
              state.remove()
              Iterator((uid, st.startMs * 1000, st.endMs * 1000, st.n, true))
            }
            if (state.hasTimedOut) fin(state.get)
            else {
              val wm = state.getCurrentWatermarkMs()
              // defensive late filter: rows under the watermark must not
              // touch state even if the engine hands them to us
              val ts = evs.map(_.ts.getTime).filter(_ >= wm).toSeq.sorted
              val closing = state.getOption
                .filter(st => ts.isEmpty && wm > st.endMs)
              if (closing.isDefined) fin(closing.get)
              else if (ts.isEmpty) Iterator.empty
              else {
                // fold the batch into sessions: extend while the gap
                // stays under 30 min, finalize-and-restart otherwise
                var out = List.empty[(Long, Long, Long, Long, Boolean)]
                var cur = state.getOption match {
                  case Some(st) if ts.head <= st.endMs =>
                    // min-merge: an above-watermark but out-of-order
                    // event earlier than the open session's start moves
                    // startMs back, so s_start covers every counted
                    // event (ADVICE r9)
                    Sess(math.min(st.startMs, ts.head),
                      math.max(st.endMs, ts.head + gapMs), st.n + 1)
                  case Some(st) =>
                    out ::= (uid, st.startMs * 1000, st.endMs * 1000,
                      st.n, true)
                    Sess(ts.head, ts.head + gapMs, 1)
                  case None => Sess(ts.head, ts.head + gapMs, 1)
                }
                ts.tail.foreach { t =>
                  if (t <= cur.endMs)
                    cur = Sess(cur.startMs, math.max(cur.endMs, t + gapMs),
                      cur.n + 1)
                  else {
                    out ::= (uid, cur.startMs * 1000, cur.endMs * 1000,
                      cur.n, true)
                    cur = Sess(t, t + gapMs, 1)
                  }
                }
                state.update(cur)
                state.setTimeoutTimestamp(cur.endMs)
                out ::= (uid, cur.startMs * 1000, cur.endMs * 1000,
                  cur.n, false)
                out.reverseIterator
              }
            }
        }
        .toDF("user_id", "s_start", "s_end", "n", "finalized")
  }

  private def qStreamSessionAgg(s: SparkSession, d: String): DataFrame =
    runSessionAgg(s).orderBy("user_id", "s_end", "finalized")

  /** File-based streaming source: the events parquet consumed via
    * readStream (one micro-batch), windowed per-type counts to a memory
    * sink in complete mode — same results as the batch window query, so
    * it's fully oracle-able. */
  private def qStreamFileSource(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = t(s, d, "events").schema
    val name = s"fsink_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts_utc", timestamp_micros(tsMicros(schema)))
        .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("w_start"),
          col("event_type"), col("n"))
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name).orderBy("w_start", "event_type")
  }

  /** Stream-stream inner join with watermarks + an event-time range
    * constraint (impression → click within 10 minutes): both sides
    * buffer state bounded by the watermark; the out-of-window click must
    * not join. */
  private def qStreamJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val imp = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val clk = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val name = s"jsink_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val impDf = imp.toDF().select(col("event_id").as("ad_id"),
        col("ts").as("imp_ts")).withWatermark("imp_ts", "10 minutes")
      val clkDf = clk.toDF().select(col("event_id").as("c_ad_id"),
        col("ts").as("clk_ts")).withWatermark("clk_ts", "10 minutes")
      val joined = impDf.join(clkDf, expr(
        "ad_id = c_ad_id AND clk_ts BETWEEN imp_ts AND imp_ts + INTERVAL 10 MINUTES"))
        .select(col("ad_id"), unix_micros(col("imp_ts")).as("imp_us"),
          unix_micros(col("clk_ts")).as("clk_us"))
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        imp.addData(Seq(ev(1, 0), ev(2, 60), ev(3, 120)))
        clk.addData(Seq(ev(1, 300),   // 5 min later → joins
          ev(2, 1500),                // 24 min later → outside window
          ev(4, 200)))                // no matching impression
        q.processAllAvailable()
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name).orderBy("ad_id")
  }

  /** Watermarked stream-stream LEFT OUTER join — the attribution /
    * conversion-funnel staple (every impression reports exactly once:
    * matched with its click when one lands inside the 10-minute window,
    * or null-padded once the watermark passes the window's end). This
    * exercises a state-eviction path the inner join never touches: an
    * unmatched left row is EMITTED (not just dropped) at eviction time,
    * and must be emitted exactly once. Three phases, with `onPhase`
    * exposing the sink between them so the spec can pin WHEN the null
    * row appears:
    *  1. impressions 1/2/3 + a click for 1 (and a clickless click 4):
    *     the match emits immediately; 2/3 are buffered, no null rows —
    *     the watermark hasn't passed their windows;
    *  2. a +~67min impression/click pair: the pair matches, and its
    *     event time drags the watermark to +~57min — past impressions
    *     2/3's join-window ends — so their null-padded rows emit (in
    *     this trigger's no-data follow-up batch or the next batch);
    *  3. a flush impression whose own window the watermark has NOT
    *     passed: it forces one more micro-batch (evicting anything
    *     pending) but must itself stay buffered, proving null emission
    *     is watermark-gated, not stop-gated.
    * State on both sides is bounded by the watermark (evicted rows
    * leave the store — the production guarantee that the join's memory
    * is O(window), not O(stream)). No SQL oracle (stateful streaming;
    * SURVEY §2.C rule 4); StreamingLlmSpec pins the phase behavior and
    * exactly-once emission. */
  /** `consolidated` (r16): the registered no-callback query feeds all
    * three phases' events up front and runs ONE processAllAvailable —
    * the final watermark is the same min-of-sides max-event-time−delay
    * either way, so the emitted/evicted/buffered FINAL set is
    * identical (oracle-checked); what changes is only per-micro-batch
    * planning paid 3× for a sink nobody reads between phases. The
    * spec keeps the 3-phase schedule (default) to pin WHEN each null
    * row appears. */
  private[graft] def runStreamJoinOuter(s: SparkSession,
      onPhase: (Int, DataFrame) => Unit = (_, _) => (),
      consolidated: Boolean = false): DataFrame = {
    import s.implicits._
    val imp = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val clk = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val name = s"josink_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val impDf = imp.toDF().select(col("event_id").as("ad_id"),
        col("ts").as("imp_ts")).withWatermark("imp_ts", "10 minutes")
      val clkDf = clk.toDF().select(col("event_id").as("c_ad_id"),
        col("ts").as("clk_ts")).withWatermark("clk_ts", "10 minutes")
      val joined = impDf.join(clkDf, expr(
        "ad_id = c_ad_id AND clk_ts BETWEEN imp_ts AND imp_ts + INTERVAL 10 MINUTES"),
        "left_outer")
        .select(col("ad_id"), unix_micros(col("imp_ts")).as("imp_us"),
          unix_micros(col("clk_ts")).as("clk_us"))
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        if (consolidated) {
          imp.addData(Seq(ev(1, 0), ev(2, 60), ev(3, 120), ev(9, 4000),
            ev(10, 4600)))
          clk.addData(Seq(ev(1, 300), ev(4, 200), ev(9, 4200)))
          q.processAllAvailable()
        } else {
          imp.addData(Seq(ev(1, 0), ev(2, 60), ev(3, 120)))
          clk.addData(Seq(ev(1, 300),  // 5 min later → matches ad 1
            ev(4, 200)))               // click with no impression → dropped
          q.processAllAvailable(); onPhase(1, s.table(name))
          imp.addData(Seq(ev(9, 4000)))
          clk.addData(Seq(ev(9, 4200))) // watermark → 4200s − 10min = 3600s
          q.processAllAvailable(); onPhase(2, s.table(name))
          imp.addData(Seq(ev(10, 4600))) // flush; own window not yet closed
          q.processAllAvailable(); onPhase(3, s.table(name))
        }
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name)
  }

  private def qStreamJoinOuter(s: SparkSession, d: String): DataFrame =
    runStreamJoinOuter(s, consolidated = true).orderBy("ad_id")

  /** Watermarked stream-stream FULL OUTER join — completes the outer
    * matrix (inner / left r10 / full r11). Beyond the left-outer rig
    * this exercises CLICK-side state eviction, which left-outer never
    * touches: an unmatched click must itself be emitted null-padded
    * (no impression arrived for it) exactly once, when the watermark
    * guarantees no future impression can still match — i.e. both
    * stores evict-and-emit, in opposite directions. Phases:
    *  1. impressions 1/2/3, a matching click for 1 and an orphan click
    *     4: the match emits; 2/3 AND click 4 are all buffered — full
    *     outer may not drop the orphan click the inner join dropped;
    *  2. a +~67min matched pair drags the global watermark (min of the
    *     two sides' watermarks) past every phase-1 window: impressions
    *     2/3 null-pad on the click side, click 4 null-pads on the
    *     impression side;
    *  3. flush rows on BOTH sides whose own windows are still open:
    *     they force eviction micro-batches but must not emit, proving
    *     both directions' null emission is watermark-gated.
    * State on both sides stays O(window) — every evicted row leaves
    * its store. No SQL oracle (stateful streaming; SURVEY §2.C rule
    * 4); StreamingLlmSpec pins both null-pad directions + exactly-once. */
  /** `consolidated` (r16): see runStreamJoinOuter — same argument,
    * both eviction directions included (final watermark identical, so
    * both sides' evict-and-emit sets are identical; oracle-checked). */
  private[graft] def runStreamJoinFull(s: SparkSession,
      onPhase: (Int, DataFrame) => Unit = (_, _) => (),
      onQueryPhase: (Int, org.apache.spark.sql.streaming.StreamingQuery)
        => Unit = (_, _) => (),
      consolidated: Boolean = false): DataFrame = {
    import s.implicits._
    val imp = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val clk = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val name = s"jfsink_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      // observe() on BOTH input sides (the runWatermarkObserved pattern,
      // r12): every input row enters join state, so observed-in minus
      // rows evicted must equal the final numRowsTotal. symmetricHashJoin
      // reports eviction only through the numRowsTotal ledger (its
      // numRowsRemoved stays 0), so the spec derives per-batch removals
      // as prevTotal + numRowsUpdated − numRowsTotal and asserts the
      // ledger closes for both eviction directions.
      val impDf = imp.toDF()
        .observe("graft_jf_imp", count(lit(1)).as("n_rows"))
        .select(col("event_id").as("ad_id"),
        col("ts").as("imp_ts")).withWatermark("imp_ts", "10 minutes")
      val clkDf = clk.toDF()
        .observe("graft_jf_clk", count(lit(1)).as("n_rows"))
        .select(col("event_id").as("c_ad_id"),
        col("ts").as("clk_ts")).withWatermark("clk_ts", "10 minutes")
      val joined = impDf.join(clkDf, expr(
        "ad_id = c_ad_id AND clk_ts BETWEEN imp_ts AND imp_ts + INTERVAL 10 MINUTES"),
        "full_outer")
        .select(col("ad_id"), col("c_ad_id"),
          unix_micros(col("imp_ts")).as("imp_us"),
          unix_micros(col("clk_ts")).as("clk_us"))
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        if (consolidated) {
          imp.addData(Seq(ev(1, 0), ev(2, 60), ev(3, 120), ev(9, 4000),
            ev(10, 4600)))
          clk.addData(Seq(ev(1, 300), ev(4, 200), ev(9, 4200),
            ev(11, 4700)))
          q.processAllAvailable()
        } else {
          imp.addData(Seq(ev(1, 0), ev(2, 60), ev(3, 120)))
          clk.addData(Seq(ev(1, 300),  // 5 min later → matches ad 1
            ev(4, 200)))               // orphan click → must null-pad later
          q.processAllAvailable(); onPhase(1, s.table(name))
          onQueryPhase(1, q)
          imp.addData(Seq(ev(9, 4000)))
          clk.addData(Seq(ev(9, 4200))) // global wm → min(3400, 3600) s
          q.processAllAvailable(); onPhase(2, s.table(name))
          onQueryPhase(2, q)
          imp.addData(Seq(ev(10, 4600))) // flush both sides; own windows
          clk.addData(Seq(ev(11, 4700))) // still open → must stay buffered
          q.processAllAvailable(); onPhase(3, s.table(name))
          onQueryPhase(3, q)
        }
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name)
  }

  private def qStreamJoinFull(s: SparkSession, d: String): DataFrame =
    runStreamJoinFull(s, consolidated = true).orderBy("ad_id", "c_ad_id")

  /** Stream-static join: the streaming event feed enriched against a
    * small static dimension (event_type → funnel stage) and aggregated —
    * the standard streaming-enrichment shape. The static side is
    * broadcast into every micro-batch; no join state accumulates. */
  private def qStreamStaticJoin(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import s.implicits._
    val dim = Seq(("view", "browse"), ("click", "browse"),
      ("signup", "convert"), ("purchase", "convert"), ("error", "ops"))
      .toDF("event_type", "stage")
    val schema = t(s, d, "events").schema
    val name = s"ssj_${UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .join(broadcast(dim), Seq("event_type"))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("value")))).as("sum_v"))
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name).orderBy("stage")
  }

  /** foreachBatch sink: complete-mode aggregate re-emitted per
    * micro-batch, atomically overwriting the target — the idempotent
    * "upsert the whole aggregate" sink shape (a restart or batch replay
    * rewrites the same state; no duplicates possible). */
  private def qStreamForeachBatch(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = t(s, d, "events").schema
    val outDir = freshDir(s"feb_${math.abs(d.hashCode)}")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("value")))).as("sum_v"))
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(outDir)
        }
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.read.parquet(outDir).orderBy("event_type")
  }

  /** A streamed token occurrence for the heavy-hitter summary. */
  private[graft] case class Tok(event_id: Long, ts: java.sql.Timestamp,
      item: String)

  private[graft] def tok(id: Long, offSec: Long, item: String): Tok =
    Tok(id, new java.sql.Timestamp((t0 + offSec) * 1000L), item)

  /** Streaming heavy hitters — bounded-state frequent-items maintenance
    * (the SpaceSaving summary of Metwally, Agrawal & El Abbadi, "Efficient
    * computation of frequent and top-k elements in data streams") over a
    * micro-batched stream. The item space is sharded by hash into a fixed
    * number of key-groups, and each shard's state is ONE SpaceSaving
    * summary of fixed capacity — so total state is shards × capacity
    * entries no matter how many distinct items flow past (the unbounded
    * per-item-keyed count state a naive streaming groupBy would keep is
    * exactly what this op exists to avoid). Every batch emits the
    * shard's current summary rows (item, est, err) in update mode; the
    * final read takes the latest estimate per item and ranks. The
    * SpaceSaving invariants pinned by StreamingLlmSpec:
    * true_count ≤ est ≤ true_count + err, and any item with frequency
    * above capacity⁻¹ of its shard's stream is present in the summary.
    * Deterministic: batch items fold in (ts, event_id) order and
    * eviction ties break lexicographically. No SQL oracle (stateful
    * streaming; SURVEY §2.C rule 4). */
  private def qStreamTopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cap = 4
    // skewed feed across 8 distinct items: "alpha" dominates with 10,
    // "beta" 5, "gamma" 3, five singletons force evictions past cap=4
    val batch1 = Seq.tabulate(6)(i => tok(i + 1, 10 + i, "alpha")) ++
      Seq(tok(7, 20, "beta"), tok(8, 21, "beta"), tok(9, 22, "gamma"),
        tok(10, 23, "noise1"), tok(11, 24, "noise2"))
    val batch2 = Seq.tabulate(4)(i => tok(20 + i, 40 + i, "alpha")) ++
      Seq(tok(30, 50, "beta"), tok(31, 51, "beta"), tok(32, 52, "beta"),
        tok(33, 53, "gamma"), tok(34, 54, "gamma"),
        tok(35, 55, "noise3"), tok(36, 56, "noise4"), tok(37, 57, "noise5"))
    val summaries = runStreamT[Tok](s, batch1, batch2,
      df => df.as[Tok]
        .groupByKey(tk => math.floorMod(tk.item.hashCode, 2))
        .flatMapGroupsWithState[Map[String, (Long, Long)],
          (Int, String, Long, Long)](
          OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (shard: Int, toks: Iterator[Tok],
              state: GroupState[Map[String, (Long, Long)]]) =>
            var m = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
            toks.toSeq.sortBy(tk => (tk.ts.getTime, tk.event_id))
              .foreach { tk =>
                m.get(tk.item) match {
                  case Some((c, e)) => m += tk.item -> (c + 1, e)
                  case None if m.size < cap => m += tk.item -> (1L, 0L)
                  case None =>
                    // evict the min-count entry (tie → lexicographic
                    // min item) and inherit its count as the error bound
                    val (victim, (vc, _)) =
                      m.minBy { case (it, (c, _)) => (c, it) }
                    m -= victim
                    m += tk.item -> (vc + 1, vc)
                }
              }
            state.update(m)
            m.toSeq.sortBy(_._1)
              .map { case (it, (c, e)) => (shard, it, c, e) }.iterator
        }
        .toDF("shard", "item", "est", "err"),
      OutputMode.Update())
    // latest summary per item (counts are monotone across batches), then
    // global rank — stale rows of evicted items can't outrank survivors
    summaries.groupBy(col("item"))
      .agg(max(col("est")).as("est"), max(col("err")).as("err"))
      .orderBy(desc("est"), col("item")).limit(5)
      .select(col("item"), col("est"), col("err"))
  }

  /** Streaming running quantiles — the native t-digest carried as
    * per-key streaming state: each micro-batch folds its values into
    * the key's digest (deserialized from the state store, re-serialized
    * after — the same binary layout the batch aggregate shuffles and
    * the sketch tables persist), and emits the key's current
    * (n, p50, p95) in update mode. State per key is O(compression)
    * bytes FOREVER — a running exact quantile would have to retain
    * every value seen. The final read takes each key's latest emission.
    * No SQL oracle (stateful streaming; SURVEY §2.C rule 4);
    * StreamingLlmSpec pins exact small-n quantiles (singleton centroids
    * make the digest exact below compression). */
  private def qStreamQuantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TDigest
    val batch1 = Seq(ev(1, 10, uid = 1, v = 1.0), ev(2, 11, uid = 1, v = 2.0),
      ev(3, 12, uid = 1, v = 3.0), ev(4, 13, uid = 1, v = 4.0),
      ev(5, 20, uid = 2, v = 10.0), ev(6, 21, uid = 2, v = 30.0))
    val batch2 = Seq(ev(7, 30, uid = 1, v = 5.0), ev(8, 31, uid = 1, v = 6.0),
      ev(9, 32, uid = 1, v = 7.0), ev(10, 33, uid = 1, v = 8.0),
      ev(11, 34, uid = 1, v = 9.0), ev(12, 40, uid = 2, v = 20.0))
    val emitted = runStreamT[Ev](s, batch1, batch2,
      df => df.as[Ev].groupByKey(_.user_id)
        .flatMapGroupsWithState[Array[Byte], (Long, Long, Double, Double)](
          OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
          (uid: Long, evs: Iterator[Ev], state: GroupState[Array[Byte]]) =>
            val dg = state.getOption.map(TDigest.deserialize)
              .getOrElse(new TDigest(100.0))
            evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
              .foreach(e => dg.add(e.value))
            state.update(dg.serialize())
            Iterator((uid, dg.totalWeight, dg.quantile(0.5),
              dg.quantile(0.95)))
        }
        .toDF("user_id", "n", "p50", "p95"),
      OutputMode.Update())
    // latest emission per key = the one with the largest n (monotone)
    emitted.groupBy(col("user_id"))
      .agg(max(struct(col("n"), col("p50"), col("p95"))).as("s"))
      .select(col("user_id"), col("s.n").as("n"),
        round(col("s.p50"), 6).as("p50"), round(col("s.p95"), 6).as("p95"))
      .orderBy("user_id")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_stream_topk" -> (qStreamTopk _),
    "q_stream_quantiles" -> (qStreamQuantiles _),
    "q_stream_join" -> (qStreamJoin _),
    "q_stream_join_outer" -> (qStreamJoinOuter _),
    "q_stream_join_full" -> (qStreamJoinFull _),
    "q_stream_static_join" -> (qStreamStaticJoin _),
    "q_stream_foreachbatch" -> (qStreamForeachBatch _),
    "q_stream_file_source" -> (qStreamFileSource _),
    "q_stream_tumble" -> (qStreamTumble _),
    "q_stream_slide" -> (qStreamSlide _),
    "q_stream_session" -> (qStreamSession _),
    "q_stream_session_agg" -> (qStreamSessionAgg _),
    "q_stream_watermark" -> (qStreamWatermark _),
    "q_stream_dedup" -> (qStreamDedup _),
    "q_stream_stateful" -> (qStreamStateful _),
    "q_stream_tws" -> (qStreamTws _),
    "q_stream_cdc_apply" -> (qStreamCdcApply _),
  )

  val sql: Map[String, String] = Map(
    "q_stream_foreachbatch" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_static_join" ->
      """SELECT CASE WHEN event_type IN ('view', 'click') THEN 'browse'
        |            WHEN event_type IN ('signup', 'purchase') THEN 'convert'
        |            ELSE 'ops' END AS stage,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1 ORDER BY stage""".stripMargin,
    "q_stream_file_source" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS w_start,
        |  event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_tumble" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS w_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sliding 1h/15min: every event belongs to exactly 4 epoch-aligned
    // windows starting at floor15(ts) - k*15min, k ∈ 0..3
    "q_stream_slide" ->
      """SELECT (us - (us % 900000000)) - 900000000 * k AS w_start, COUNT(*) AS n
        |FROM (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events) e
        |CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) t(k)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // session windows = gaps-and-islands; a gap >= 30 min breaks the
    // session, end = last event + gap (Spark session_window semantics)
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (SELECT user_id, us,
        |  CASE WHEN LAG(us) OVER w IS NULL
        |       OR us - LAG(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |g AS (SELECT user_id, us,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, MIN(us) AS s_start, MAX(us) + 1800000000 AS s_end,
        |  COUNT(*) AS n
        |FROM g GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
  )
}
