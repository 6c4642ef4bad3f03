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

  val defs: Map[String, Relational.Q] = Map(
    "q_stream_anomaly" -> (qStreamAnomaly _),
  )

  /** Streaming-state op over a crafted MemoryStream feed (declared per
    * SURVEY §2.C rule 4); StreamingQ2Spec pins the exact flag set:
    * the flat-then-jump event fires, the recovery event and the
    * short-history user never do. */
  val sql: Map[String, String] = Map.empty
}
