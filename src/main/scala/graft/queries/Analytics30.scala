package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirtieth wave: peak concurrency via sweep-line (the
  * capacity-planning number — how many 5-minute activity windows
  * overlap at the worst moment), DAU/MAU stickiness (the growth
  * metric product teams live by), and inter-arrival burstiness (the
  * coefficient of variation that separates Poisson-steady streams
  * from bursty ones).
  *
  * Scale notes:
  *  - Sweep-line: each event explodes to a (+1, −1) delta pair and
  *    the running sum is windowed PER DAY — the global interval sort
  *    a textbook sweep needs becomes an embarrassingly parallel
  *    per-partition sort (5-minute windows barely cross midnight;
  *    the boundary error is bounded and documented). Equal-time
  *    deltas order ends-before-starts, so touching intervals don't
  *    double-count.
  *  - Stickiness: two distinct-shuffles ((user, day) and (user,
  *    period)) reduced to bounded per-period tables.
  *  - Arrival CV: one user-independent per-type sort for the lag,
  *    then exact decimal moments; n ≤ 1 or zero-mean gates to NULL
  *    (ANSI). */
object Analytics30 {

  /** Peak concurrent 5-minute activity windows per day (sweep-line,
    * ends sort before starts at equal instants). */
  private def qWinConcurrency(s: SparkSession, d: String): DataFrame = {
    val win = 300L * 1000000L // 5 minutes in micros
    val ev = events(s, d).select(col("us"))
    val deltas = ev.select(col("us").as("t"), lit(1L).as("delta"))
      .union(ev.select((col("us") + win).as("t"), lit(-1L).as("delta")))
      .withColumn("day", expr("t div 86400000000"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("delta")) // -1 before +1 at equal t
      .rowsBetween(Window.unboundedPreceding, 0)
    deltas
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("conc")).as("peak_concurrency"),
        min(when(col("delta") === 1, col("t"))).as("first_start_us"))
      .orderBy(col("day"))
  }

  /** Monthly stickiness: average DAU over the 30-day period divided
    * by the period's MAU. */
  private def qAggStickiness(s: SparkSession, d: String): DataFrame = {
    val ud = events(s, d)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
      .withColumn("period", expr("day div 30"))
    val dau = ud.groupBy(col("period"), col("day"))
      .agg(count(lit(1)).as("dau"))
      .groupBy(col("period"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val mau = ud.select(col("period"), col("user_id")).distinct()
      .groupBy(col("period")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("period"))
      .select(col("period"), col("n_days"), col("mau"),
        round(dbl(col("sum_dau")) / dbl(col("n_days")), 6).as("avg_dau"),
        round(dbl(col("sum_dau")) /
          (dbl(col("n_days")) * dbl(col("mau"))), 6).as("stickiness"))
      .orderBy(col("period"))
  }

  /** Inter-arrival coefficient of variation per event type: CV > 1 is
    * burstier than Poisson, CV < 1 steadier. */
  private def qTimeArrivalCv(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val gaps = events(s, d)
      .select(col("event_type"), col("event_id"), col("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .filter(col("prev").isNotNull)
      // keep gaps in EXACT integer micros (a /1e6 → DECIMAL(18,4)
      // cast would hit the HALF_UP-vs-half-even rounding-tie gotcha);
      // CV is scale-invariant, and the mean converts at the end
      .select(col("event_type"),
        (col("us") - col("prev")).cast("decimal(18,0)").as("g"))
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("sgg"))
      .select(col("event_type"), col("n"),
        round(dbl(col("sg")) / dbl(col("n")) / 1e6, 6).as("mean_gap_sec"),
        when(col("n") > 1 && dbl(col("sg")) > 0,
          round(sqrt((dbl(col("sgg")) -
            dbl(col("sg")) * dbl(col("sg")) / dbl(col("n"))) /
            (dbl(col("n")) - 1.0)) /
            (dbl(col("sg")) / dbl(col("n"))), 6)).as("cv"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_concurrency" -> (qWinConcurrency _),
    "q_agg_stickiness" -> (qAggStickiness _),
    "q_time_arrival_cv" -> (qTimeArrivalCv _),
  )

  val sql: Map[String, String] = Map(
    "q_win_concurrency" ->
      """WITH ev AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |deltas AS (
        |  SELECT us AS t, CAST(1 AS BIGINT) AS delta FROM ev
        |  UNION ALL
        |  SELECT us + 300000000 AS t, CAST(-1 AS BIGINT) FROM ev),
        |sw AS (
        |  SELECT t // 86400000000 AS day, t, delta,
        |    sum(delta) OVER (PARTITION BY t // 86400000000
        |      ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |  FROM deltas)
        |SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  CAST(min(CASE WHEN delta = 1 THEN t END) AS BIGINT)
        |    AS first_start_us
        |FROM sw GROUP BY day ORDER BY day""".stripMargin,
    "q_agg_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |p AS (SELECT user_id, day, day // 30 AS period FROM ud),
        |dau AS (
        |  SELECT period, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM (SELECT period, day, CAST(count(*) AS BIGINT) AS dau
        |        FROM p GROUP BY period, day)
        |  GROUP BY period),
        |mau AS (
        |  SELECT period, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM p GROUP BY period)
        |SELECT period, n_days, mau,
        |  round(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS avg_dau,
        |  round(CAST(sum_dau AS DOUBLE)
        |    / (CAST(n_days AS DOUBLE) * CAST(mau AS DOUBLE)), 6)
        |    AS stickiness
        |FROM dau JOIN mau USING (period) ORDER BY period""".stripMargin,
    "q_time_arrival_cv" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |gaps AS (
        |  SELECT event_type,
        |    CAST(us - lag(us, 1) OVER (PARTITION BY event_type
        |      ORDER BY us, event_id) AS HUGEINT) AS g
        |  FROM ev),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(g) AS sg, sum(g * g) AS sgg
        |  FROM gaps WHERE g IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6)
        |    AS mean_gap_sec,
        |  CASE WHEN n > 1 AND CAST(sg AS DOUBLE) > 0 THEN
        |    round(sqrt((CAST(sgg AS DOUBLE)
        |        - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |      / (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |  END AS cv
        |FROM m ORDER BY event_type""".stripMargin,
  )
}
