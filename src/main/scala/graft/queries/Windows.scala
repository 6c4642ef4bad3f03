package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Window functions (SURVEY.md §2.C): ranking, analytic, row/range frames,
  * top-k per group. Determinism rules: row_number only over a unique sort
  * key; moving averages computed as exact integer SUM/COUNT then one double
  * division (bit-identical across engines). */
object Windows {

  // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem;
  // (.., l_partkey, l_suppkey, l_quantity, l_extendedprice) is. Window
  // ORDER BYs use the full tie-break so row_number/frames are
  // deterministic, and final sorts are total over the output.
  private val liTieAsc = Seq(col("l_linenumber").asc, col("l_partkey").asc,
    col("l_suppkey").asc, col("l_quantity").asc, col("l_extendedprice").asc)

  private def qWinRank(s: SparkSession, d: String): DataFrame = {
    val wU = Window.partitionBy(col("l_orderkey")).orderBy(liTieAsc: _*)
    val wQ = Window.partitionBy(col("l_orderkey"))
      .orderBy((col("l_quantity").desc +: liTieAsc): _*)
    t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      row_number().over(wU).as("rn"),
      rank().over(wQ).as("rnk"),
      dense_rank().over(wQ).as("drnk"),
      ntile(4).over(wU).as("quartile"))
      .orderBy("l_orderkey", "rn")
  }

  private def qWinAnalytic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
      col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      first(col("o_orderkey"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("first_ok"),
      last(col("o_orderkey"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("last_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private def qWinFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(liTieAsc: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    t(s, d, "lineitem")
      .withColumn("xq", col("l_quantity").cast("bigint"))
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(col("xq")).over(wRun).as("run_qty"),
        (sum(col("xq")).over(wMov).cast("double") /
          count(lit(1)).over(wMov)).as("mov_avg"))
      .orderBy("l_orderkey", "run_qty", "l_linenumber", "mov_avg")
  }

  /** Range frame: trailing-30-day order count/total per customer, keyed on
    * an integer day number so the frame bound is engine-portable. */
  private def qWinRange(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").withColumn("day_no",
      datediff(col("o_orderdate").cast("date"),
        lit(java.sql.Date.valueOf("1995-01-01"))))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-30, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"), col("day_no"),
      count(lit(1)).over(w).as("n_30d"),
      dbl(sum(dec(col("o_totalprice"))).over(w)).as("sum_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private def qTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy((col("l_quantity").desc +: liTieAsc): _*)
    t(s, d, "lineitem").withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("rn"))
      .orderBy("l_orderkey", "rn")
  }

  /** Batch sessionization: gap-based session windows (30-min idle gap)
    * via the lag→flag→running-sum island pattern, then per-session
    * aggregates. Both window passes share one (user, time) partitioning,
    * so the plan pays a single shuffle+sort — per-user state never
    * crosses executors, the shape that scales to billions of users.
    * The streaming twin is q_stream_session (session_window). */
  private def qWinSession(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val gapUs = 1800000000L // 30 min
    events(s, d)
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("us")).as("sess_start"), max(col("us")).as("sess_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess_id")
  }

  /** Rolling distinct users (7-day trailing window) — the rolling-cohort
    * metric COUNT(DISTINCT) can't express directly (distinct aggregates
    * are not frameable). Scale-safe exact form with NO per-day user-set
    * materialization (a collect_set row for a hot day would hold that
    * day's full distinct-user set in one aggregation buffer): dedup to
    * (day, user) pairs, explode each pair into the ≤7 trailing days it
    * covers, and countDistinct per covering day. Every aggregation
    * buffer is a counter, every shuffle is keyed by (day, user) — both
    * spillable and skew-splittable by AQE at any corpus size. The inner
    * join restricts output to days actually observed (matching the
    * oracle's d1), and both join sides are ≤ #days rows post-agg. */
  private def qWinDistinct(s: SparkSession, d: String): DataFrame = {
    val dayUser = events(s, d)
      .select(expr("us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val u1 = dayUser.groupBy(col("day"))
      .agg(count(lit(1)).as("u1"))
    val u7 = dayUser
      .select(explode(expr("sequence(day, day + 6)")).as("day"),
        col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).cast("int").as("u7"))
    u1.join(u7, "day")
      .select(col("day"), col("u1"), col("u7"))
      .orderBy("day")
  }

  /** Gaps-and-islands: per-user consecutive-active-day streaks via the
    * classic day − row_number() grouping key. Every window partitions by
    * user_id (no global window task), the (user, day) dedup bounds all
    * downstream cardinalities by active-days-per-user, and the
    * longest-streak tie-break (earliest start) is an explicit equi-join
    * on (user, max_len) — deterministic on both engines without relying
    * on struct-ordering semantics. */
  private def qWinIslands(s: SparkSession, d: String): DataFrame = {
    val dayUser = events(s, d)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = dayUser
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("day")).as("streak_start"),
        count(lit(1)).as("streak_len"))
    val summary = islands.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        sum(col("streak_len")).as("n_days"),
        max(col("streak_len")).as("max_streak"))
    val best = islands
      .join(summary.select(col("user_id"),
        col("max_streak").as("streak_len")), Seq("user_id", "streak_len"))
      .groupBy(col("user_id"))
      .agg(min(col("streak_start")).as("best_start"))
    summary.join(best, "user_id")
      .select(col("user_id"), col("n_streaks"), col("n_days"),
        col("max_streak"), col("best_start"))
      .orderBy("user_id")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_islands" -> (qWinIslands _),
    "q_win_distinct" -> (qWinDistinct _),
    "q_win_session" -> (qWinSession _),
    "q_win_rank" -> (qWinRank _),
    "q_win_analytic" -> (qWinAnalytic _),
    "q_win_frame" -> (qWinFrame _),
    "q_win_range" -> (qWinRange _),
    "q_topk_per_group" -> (qTopkPerGroup _),
  )

  val sql: Map[String, String] = Map(
    // same day-bucketing convention as q_win_distinct; COUNT(BIGINT)
    // sums cast back from HUGEINT
    "q_win_islands" ->
      """WITH du AS (SELECT DISTINCT user_id,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
        |      AS day FROM events),
        |isl AS (SELECT user_id, day - rn AS island,
        |    MIN(day) AS streak_start, COUNT(*) AS streak_len
        |  FROM (SELECT user_id, day,
        |      row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |    FROM du) x
        |  GROUP BY user_id, day - rn),
        |summary AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |    CAST(SUM(streak_len) AS BIGINT) AS n_days,
        |    CAST(MAX(streak_len) AS BIGINT) AS max_streak
        |  FROM isl GROUP BY user_id),
        |best AS (SELECT i.user_id, MIN(i.streak_start) AS best_start
        |  FROM isl i JOIN summary s
        |    ON i.user_id = s.user_id AND i.streak_len = s.max_streak
        |  GROUP BY i.user_id)
        |SELECT s.user_id, n_streaks, n_days, max_streak, best_start
        |FROM summary s JOIN best b ON s.user_id = b.user_id
        |ORDER BY s.user_id""".stripMargin,
    // epoch-micro day bucketing both sides (ts is TIMESTAMP(NANOS):
    // Spark reads long nanos, DuckDB TIMESTAMP_NS → epoch_us)
    "q_win_distinct" ->
      """WITH e AS (SELECT
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS BIGINT)
        |      AS day, user_id FROM events),
        |d1 AS (SELECT DISTINCT day FROM e)
        |SELECT d1.day,
        |  (SELECT CAST(COUNT(DISTINCT e2.user_id) AS BIGINT) FROM e e2
        |    WHERE e2.day = d1.day) AS u1,
        |  (SELECT CAST(COUNT(DISTINCT e3.user_id) AS INTEGER) FROM e e3
        |    WHERE e3.day BETWEEN d1.day - 6 AND d1.day) AS u7
        |FROM d1 ORDER BY day""".stripMargin,
    // CAST(ts AS TIMESTAMP) truncates TIMESTAMP_NS to micros = Spark's
    // `ts div 1000`; the running SUM window needs the same (us, event_id)
    // tie-break as the lag pass
    "q_win_session" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |         OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM f)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  MIN(us) AS sess_start, MAX(us) AS sess_end, COUNT(*) AS n_events
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_win_rank" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROW_NUMBER() OVER wu AS INT) AS rn,
        |  CAST(RANK() OVER wq AS INT) AS rnk,
        |  CAST(DENSE_RANK() OVER wq AS INT) AS drnk,
        |  CAST(NTILE(4) OVER wu AS INT) AS quartile
        |FROM lineitem
        |WINDOW wu AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice),
        |       wq AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice)
        |ORDER BY l_orderkey, rn""".stripMargin,
    "q_win_analytic" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ok,
        |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_frame" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w1 AS BIGINT) AS run_qty,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w2 AS DOUBLE) / COUNT(*) OVER w2 AS mov_avg
        |FROM lineitem
        |WINDOW w1 AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       w2 AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY l_orderkey, run_qty, l_linenumber, mov_avg""".stripMargin,
    "q_win_range" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day_no,
        |  COUNT(*) OVER w AS n_30d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_30d
        |FROM orders WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, rn FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_quantity DESC, l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS INT) AS rn
        |  FROM lineitem) z
        |WHERE rn <= 3 ORDER BY l_orderkey, rn""".stripMargin,
  )
}
