package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 sixth wave: exact coalition-game attribution and recursive
  * state estimation —
  *
  *  - q_win_shapley: EXACT Shapley-value channel attribution over the
  *    conversion funnel (the data-driven attribution model ad
  *    platforms ship, replacing last-touch heuristics the engine
  *    already has in q_win_attribution). The coalition game is
  *    tractable because the channel domain is bounded (the event-type
  *    vocabulary), NOT because users are few: per-user exposure
  *    collapses to a bitmask, and everything after that runs on the
  *    2^n-row coalition grid.
  *  - q_time_kalman: a local-level Kalman filter (state = level +
  *    error variance) over each event type's daily count series — the
  *    optimal-under-noise successor to q_time_ema's fixed-α smoothing,
  *    with the filter's own converged gain and variance reported.
  *
  * Scale notes:
  *  - Shapley: ONE user-keyed aggregate (map-side combined bit_or /
  *    max) collapses the fact table; the coalition grid is 2^n rows
  *    (n = |channel vocabulary|, 4 here → 16), the v(S) evaluation is
  *    a grid×grid bounded broadcast join, and the marginal-contribution
  *    sum is exact BIGINT arithmetic — |S|!·(n−|S|−1)!·Δv summed, one
  *    IEEE division by n! at the very end. No floating point ever
  *    crosses a shuffle.
  *  - Kalman: the recursion is inherently sequential per series, so it
  *    runs as the engine's established sorted-fold (collect over the
  *    calendar-bounded daily table → aggregate() with a fixed-width
  *    DOUBLE-array state, the q_time_holt discipline) — state is 3
  *    numbers per event type, series length is bounded by the
  *    calendar, and both engines walk the identical fold so the
  *    emitted doubles are bit-equal. */
object Analytics49 {

  /** Exact Shapley attribution: channels = non-purchase event types,
    * conversion = the user purchased, v(S) = conversions among users
    * whose entire touch-set lies inside S. Output per channel: the
    * Shapley value and its share of total attributed credit. */
  private def qWinShapley(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    // bounded channel table: (channel, bit); n = |channels|
    val chan = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("ch")).distinct()
      .withColumn("r", expr(
        "row_number() OVER (ORDER BY ch)"))
      .withColumn("bit", expr("shiftleft(CAST(1 AS BIGINT), r - 1)"))
      .select(col("ch"), col("bit"))
    // per-user exposure bitmask + conversion flag: ONE map-side
    // combined aggregate over the fact table
    val users = ev
      .join(broadcast(chan), ev("event_type") === chan("ch"), "left")
      .groupBy(col("user_id"))
      .agg(coalesce(bit_or(col("bit")), lit(0L)).as("umask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val grid = users.groupBy(col("umask"))
      .agg(sum(col("conv")).as("n_conv"))
    val nTab = chan.agg(count(lit(1)).as("n"))
      // exact-Shapley tractability guard: the 2^n coalition grid and
      // BIGINT factorial(n) are only sound for small n (Spark's
      // factorial() returns NULL past 20, and sequence() would blow up
      // well before). Fail LOUDLY on vocabulary growth instead of
      // silently emitting NULL phi. The filter form (not a dropped
      // column) keeps the assert out of reach of column pruning.
      .filter(expr("assert_true(n <= 16, " +
        "'q_win_shapley: channel vocabulary exceeds 16; the exact " +
        "2^n coalition grid is refused — sample or truncate channels'" +
        ") IS NULL"))
    // all 2^n coalitions; v(S) = Σ conversions of users with umask ⊆ S
    val masks = nTab.select(col("n"),
      explode(expr("sequence(CAST(0 AS BIGINT), " +
        "shiftleft(CAST(1 AS BIGINT), n) - 1)")).as("cs"))
    val v = masks.crossJoin(broadcast(grid))
      .select(col("n"), col("cs"),
        when(expr("(umask & cs) = umask"), col("n_conv")).otherwise(0L)
          .as("c"))
      .groupBy(col("n"), col("cs")).agg(sum(col("c")).as("v"))
    // φ(ch) = Σ_{S ∌ ch} |S|!·(n−|S|−1)!·(v(S ∪ ch) − v(S)) / n!
    // S ∪ {ch} = S + bit because bit ∉ S — the join stays an equi-join
    val vPlus = v.select(col("cs").as("cs2"), col("v").as("v2"))
    val terms = chan.join(v.hint("broadcast"),
        expr("(cs & bit) = 0"))
      .join(vPlus.hint("broadcast"), expr("cs2 = cs + bit"))
      .select(col("ch"), col("n"), expr(
        "factorial(CAST(bit_count(cs) AS INT)) " +
          "* factorial(CAST(n AS INT) - CAST(bit_count(cs) AS INT) - 1) " +
          "* (v2 - v)").as("term"))
    val phi = terms.groupBy(col("ch"), col("n"))
      .agg(sum(col("term")).as("num"))
    val tot = phi.agg(sum(col("num")).as("den"))
    phi.crossJoin(broadcast(tot))
      .select(col("ch").as("channel"),
        round(expr(
          "CAST(num AS DOUBLE) / CAST(factorial(CAST(n AS INT)) AS DOUBLE)"),
          6).as("phi"),
        when(col("den") > 0, round(expr(
          "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"), 6)).as("share"))
      .orderBy(col("channel"))
  }

  /** Local-level Kalman filter (process var q = 4, obs var r = 16,
    * P₀ = 16) over each event type's daily count series: final level
    * estimate, error variance, and gain — converged gain ≈ the
    * steady-state Riccati fixed point, reported per series. */
  private def qTimeKalman(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("arr"))
      // fixed-width DOUBLE-array state [level, P, gain] — the
      // q_time_holt fold discipline (list accumulator, never a struct:
      // DuckDB v1.0 mis-evaluates struct accumulators beyond 2 steps)
      .select(col("event_type"), size(col("arr")).as("nd"), expr(
        """aggregate(
          |  transform(slice(arr, 2, size(arr) - 1),
          |    e -> CAST(e.c AS DOUBLE)),
          |  array(CAST(element_at(arr, 1).c AS DOUBLE),
          |        CAST(16.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
          |  (acc, y) -> array(
          |    acc[0] + ((acc[1] + CAST(4.0 AS DOUBLE))
          |        / (acc[1] + CAST(4.0 AS DOUBLE) + CAST(16.0 AS DOUBLE)))
          |      * (y - acc[0]),
          |    (CAST(1.0 AS DOUBLE)
          |        - (acc[1] + CAST(4.0 AS DOUBLE))
          |          / (acc[1] + CAST(4.0 AS DOUBLE) + CAST(16.0 AS DOUBLE)))
          |      * (acc[1] + CAST(4.0 AS DOUBLE)),
          |    (acc[1] + CAST(4.0 AS DOUBLE))
          |      / (acc[1] + CAST(4.0 AS DOUBLE) + CAST(16.0 AS DOUBLE))))"""
          .stripMargin).as("st"))
      .select(col("event_type"), col("nd").cast("long").as("n_days"),
        round(expr("st[0]"), 6).as("level"),
        round(expr("st[1]"), 6).as("pvar"),
        round(expr("st[2]"), 6).as("gain"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_shapley" -> (qWinShapley _),
    "q_time_kalman" -> (qTimeKalman _),
  )

  val sql: Map[String, String] = Map(
    "q_win_shapley" ->
      """WITH chan AS (
        |  SELECT ch, (CAST(1 AS BIGINT) << (r - 1)) AS bit FROM (
        |    SELECT ch, ROW_NUMBER() OVER (ORDER BY ch) AS r FROM (
        |      SELECT DISTINCT event_type AS ch FROM events
        |      WHERE event_type <> 'purchase') a) b),
        |users AS (
        |  SELECT user_id,
        |    COALESCE(bit_or(bit), CAST(0 AS BIGINT)) AS umask,
        |    max(CASE WHEN event_type = 'purchase'
        |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)
        |      AS conv
        |  FROM events e LEFT JOIN chan ON e.event_type = chan.ch
        |  GROUP BY 1),
        |grid AS (
        |  SELECT umask, CAST(sum(conv) AS BIGINT) AS n_conv
        |  FROM users GROUP BY 1),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM chan),
        |masks AS (
        |  SELECT n, unnest(generate_series(CAST(0 AS BIGINT),
        |    (CAST(1 AS BIGINT) << n) - 1)) AS cs FROM nt),
        |v AS (
        |  SELECT n, cs, CAST(sum(CASE WHEN (umask & cs) = umask
        |    THEN n_conv ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS v
        |  FROM masks CROSS JOIN grid GROUP BY 1, 2),
        |terms AS (
        |  SELECT ch, v.n,
        |    CAST(factorial(CAST(bit_count(cs) AS INT)) AS BIGINT)
        |      * CAST(factorial(CAST(v.n AS INT)
        |          - CAST(bit_count(cs) AS INT) - 1) AS BIGINT)
        |      * (v2.v - v.v) AS term
        |  FROM chan JOIN v ON (v.cs & chan.bit) = 0
        |  JOIN (SELECT cs AS cs2, v FROM v) v2
        |    ON v2.cs2 = v.cs + chan.bit),
        |phi AS (
        |  SELECT ch, n, CAST(sum(term) AS BIGINT) AS num
        |  FROM terms GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(num) AS BIGINT) AS den FROM phi)
        |SELECT ch AS channel,
        |  ROUND(CAST(num AS DOUBLE)
        |    / CAST(CAST(factorial(CAST(n AS INT)) AS BIGINT) AS DOUBLE), 6)
        |    AS phi,
        |  CASE WHEN den > 0
        |       THEN ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
        |       END AS share
        |FROM phi CROSS JOIN tot ORDER BY channel""".stripMargin,
    "q_time_kalman" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type,
        |    list_sort(list({'day': day, 'c': c})) AS arr
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT event_type, len(arr) AS nd,
        |    list_reduce(list_prepend(
        |      [CAST(arr[1].c AS DOUBLE), CAST(16.0 AS DOUBLE),
        |       CAST(0.0 AS DOUBLE)],
        |      list_transform(arr[2:], e -> [CAST(e.c AS DOUBLE),
        |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)])),
        |      (acc, x) -> [
        |        acc[1] + ((acc[2] + CAST(4.0 AS DOUBLE))
        |            / (acc[2] + CAST(4.0 AS DOUBLE)
        |               + CAST(16.0 AS DOUBLE)))
        |          * (x[1] - acc[1]),
        |        (CAST(1.0 AS DOUBLE)
        |            - (acc[2] + CAST(4.0 AS DOUBLE))
        |              / (acc[2] + CAST(4.0 AS DOUBLE)
        |                 + CAST(16.0 AS DOUBLE)))
        |          * (acc[2] + CAST(4.0 AS DOUBLE)),
        |        (acc[2] + CAST(4.0 AS DOUBLE))
        |          / (acc[2] + CAST(4.0 AS DOUBLE)
        |             + CAST(16.0 AS DOUBLE))]) AS st
        |  FROM g)
        |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
        |  ROUND(st[1], 6) AS level, ROUND(st[2], 6) AS pvar,
        |  ROUND(st[3], 6) AS gain
        |FROM f ORDER BY event_type""".stripMargin,
  )
}
