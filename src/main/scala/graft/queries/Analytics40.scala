package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 fortieth wave: top user-journey paths — the "behavior flow"
  * report (which first-3-event sequences do users actually take)
  * sitting between q_agg_markov's single transitions and
  * q_win_funnel's fixed steps.
  *
  * Scale notes: the first-3 pick runs on the NATIVE TopKPerGroup
  * operator (earliest-first via a negated-time order column): partial
  * per-partition heaps mean the exchange carries ≤3 rows per (user,
  * partition) instead of every user's full history — the windowed
  * row_number formulation would sort and shuffle the whole event
  * stream. The path pivot is three conditional aggregates on the user
  * key (no collect_list order hazard — Spark's collect_list is
  * partition-order-dependent), the path count is a path-keyed
  * map-side-combined aggregate, and the top-20 cut is a TakeOrdered,
  * never a global sort. */
object Analytics40 {

  /** Top 20 first-3-event-type paths by user count (ties → path asc);
    * users with fewer than 3 events contribute their shorter path. */
  private def qWinPaths(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        (-col("us")).as("neg_us"), col("event_id"))
    // rnk 1..3 = the 3 EARLIEST events: neg_us descending ≡ us
    // ascending, event_id ascending tie-break — the exact total-order
    // prefix the oracle's row_number uses
    val firsts = graft.plans.TopKPerGroup(ev,
      groupCols = Seq("user_id"), orderCol = "neg_us",
      tieCols = Seq("event_id"), k = 3)
      .withColumnRenamed("rnk", "rn")
      .groupBy(col("user_id"))
      .agg(max(when(col("rn") === 1, col("event_type"))).as("e1"),
        max(when(col("rn") === 2, col("event_type"))).as("e2"),
        max(when(col("rn") === 3, col("event_type"))).as("e3"))
      // concat_ws skips NULLs on both engines → short histories yield
      // their shorter path instead of a dangling separator
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
    firsts.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), col("path"))
      .limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_paths" -> (qWinPaths _),
  )

  val sql: Map[String, String] = Map(
    "q_win_paths" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
        |  FROM events),
        |paths AS (
        |  SELECT concat_ws('>',
        |      max(CASE WHEN rn = 1 THEN event_type END),
        |      max(CASE WHEN rn = 2 THEN event_type END),
        |      max(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM ranked WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM paths GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
  )
}
