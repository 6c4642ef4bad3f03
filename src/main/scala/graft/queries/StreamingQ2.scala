package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Round-10 streaming wave: online per-key anomaly detection — the
  * production monitoring shape where each entity's metric stream keeps
  * running moments in state and flags values that break from their own
  * history (not a global threshold), emitting ONLY anomalies.
  *
  * Scale notes: state per key is three numbers (n, Σx, Σx²) —
  * constant-size, merge-free, keyed on the same column the stream
  * shuffles on; emission volume is the anomaly rate, not the stream
  * rate. Within a micro-batch the group's events fold in (ts,
  * event_id) order — deterministic replay regardless of arrival
  * interleaving. */
object StreamingQ2 {

  /** flatMapGroupsWithState anomaly detector: per user, flag an event
    * when it deviates from the user's PRIOR mean by more than
    * 3·σ_prior (σ from the prior state; with ≥4 prior observations),
    * then absorb it into the state. A constant history has σ 0, so
    * the first break from a flat series is flagged by the |x−μ|>3σ=0
    * rule — the "metric was steady, then jumped" page. */
  private def qStreamAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import StreamingQ.{ev, Ev}
    val batch1 = (1 to 5).map(i => ev(i.toLong, i * 60L, uid = 1,
      v = 10.0)) ++ Seq(ev(11, 60, uid = 2, v = 5.0),
      ev(12, 120, uid = 2, v = 7.0))
    val batch2 = Seq(ev(6, 400, uid = 1, v = 100.0), // flat→jump: flag
      ev(7, 460, uid = 1, v = 10.0),  // back to normal vs drifted state
      ev(13, 180, uid = 2, v = 6.0))  // only 2 prior obs: never flagged
    StreamingQ.runStream(s, batch1, batch2,
      df => df.as[Ev].groupByKey(_.user_id)
        .flatMapGroupsWithState[(Long, Double, Double),
            (Long, Long, Double, Long, Double, Double)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (uid: Long, it: Iterator[Ev],
              st: GroupState[(Long, Double, Double)]) =>
            var (n, sx, sxx) = st.getOption.getOrElse((0L, 0.0, 0.0))
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Double, Long, Double, Double)]
            // deterministic fold order regardless of arrival interleaving
            it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              if (n >= 4) {
                val mean = sx / n
                val varp = math.max(sxx / n - mean * mean, 0.0)
                val sd = math.sqrt(varp)
                if (math.abs(e.value - mean) > 3.0 * sd)
                  out += ((e.event_id, uid, e.value, n,
                    math.rint(mean * 1e6) / 1e6,
                    math.rint(sd * 1e6) / 1e6))
              }
              n += 1; sx += e.value; sxx += e.value * e.value
            }
            st.update((n, sx, sxx))
            out.iterator
        }
        .toDF("event_id", "user_id", "value", "n_prior", "mean_prior",
          "sd_prior"),
      OutputMode.Append())
      .orderBy("event_id")
  }

  /** Streaming distribution-drift monitor: the stream's cumulative
    * value histogram (10 equi-width bins, a bounded streaming agg in
    * complete mode) is compared per micro-batch against a STATIC
    * reference distribution, emitting (batch, n_stream, psi) — the
    * per-batch PSI trajectory an ingest pipeline alarms on ("did the
    * feed's distribution move while we were reading it").
    *
    * Scale notes: streaming state is the 10-bin histogram (constant);
    * the per-batch PSI fold runs on those ≤10 rows inside
    * foreachBatch — the monitoring emission is bounded by the bin
    * count, never the stream. Laplace-smoothed fractions with 9-dp
    * term rounding (the q_agg_psi discipline) keep the trajectory
    * deterministic across replays. */
  private def qStreamDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import StreamingQ.{ev, Ev}
    // static reference histogram: 40 observations uniform on bins 0..3
    val refCounts = Map(0 -> 10L, 1 -> 10L, 2 -> 10L, 3 -> 10L)
    val refN = refCounts.values.sum
    // batch 1 matches the reference shape; batch 2 is mass on bins 8..9
    val batch1 = (0 until 40).map(i =>
      ev((i + 1).toLong, 10L + i, uid = 1, v = (i % 4) * 10.0 + 1.0))
    val batch2 = (0 until 30).map(i =>
      ev((100 + i).toLong, 300L + i, uid = 1,
        v = 80.0 + (i % 2) * 10.0 + 1.0))
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Ev](s)
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val hist = input.toDF()
        .select(least(lit(9L), greatest(lit(0L),
          expr("CAST(floor(value / 10.0) AS BIGINT)"))).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      val q = hist.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          // ≤10 rows: the bounded monitoring emission
          val cnt = batch.collect()
            .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
          val nStream = cnt.values.sum
          val psi = (0 to 9).map { b =>
            val pa = (cnt.getOrElse(b, 0L) + 1.0) / (nStream + 10.0)
            val pb = (refCounts.getOrElse(b, 0L) + 1.0) / (refN + 10.0)
            math.rint((pa - pb) * math.log(pa / pb) * 1e9) / 1e9
          }.sum
          rows.synchronized {
            rows += ((id, nStream, math.rint(psi * 1e6) / 1e6))
          }
          ()
        }
        .outputMode("complete").start()
      try {
        input.addData(batch1)
        q.processAllAvailable()
        input.addData(batch2)
        q.processAllAvailable()
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    rows.toSeq.toDF("batch", "n_stream", "psi").orderBy("batch")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_stream_anomaly" -> (qStreamAnomaly _),
    "q_stream_drift" -> (qStreamDrift _),
  )

  /** Streaming-state ops over crafted MemoryStream feeds (declared per
    * SURVEY §2.C rule 4); StreamingQ2Spec pins the exact anomaly flag
    * set and replays the per-batch PSI trajectory (in-distribution
    * batch ≈ 0, shifted batch strictly higher). */
  val sql: Map[String, String] = Map.empty
}
