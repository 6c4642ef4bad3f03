package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 robust-location / survival-comparison wave: the
  * Hodges–Lehmann pseudomedian (the estimator the Mann–Whitney test
  * inverts — the robust "typical level" a monitoring page shows next
  * to the mean) and the two-sample log-rank test (the standard
  * comparison on top of the Kaplan–Meier curves q_agg_survival already
  * builds).
  *
  * Scale notes:
  *  - HL runs on the CALENDAR-BOUNDED daily table (≤ a few hundred
  *    rows per series): the Walsh-pair self-join is day²-bounded per
  *    event type regardless of corpus size, partitioned per type, and
  *    the median pick is an exact integer rank over 2×-scaled sums.
  *  - Log-rank collapses the fact table with ONE per-user aggregate;
  *    risk sets come from suffix cumulative sums over the bounded
  *    per-day removal table (never the raw stream); every variance
  *    term is rounded to 9 dp and summed in DECIMAL; all degenerate
  *    denominators (n_t ≤ 1, V = 0) gate to NULL in both engines. */
object Analytics60 {

  /** Hodges–Lehmann pseudomedian of each event type's daily counts:
    * lower median of all Walsh averages (x_i + x_j)/2, i ≤ j, in exact
    * 2× integer space. */
  private def qAggHodgeslehmann(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("g"),
        expr("us div 86400000000").as("day"))
      .groupBy(col("g"), col("day")).agg(count(lit(1)).as("c"))
    val a = daily.select(col("g"), col("day").as("di"), col("c").as("ci"))
    val b = daily.select(col("g"), col("day").as("dj"), col("c").as("cj"))
    val pairs = a.join(b, Seq("g")).filter(col("di") <= col("dj"))
      .select(col("g"), (col("ci") + col("cj")).as("m2"))
    val np = pairs.groupBy(col("g")).agg(count(lit(1)).as("np"))
    val wp = Window.partitionBy(col("g")).orderBy(col("m2"))
    pairs.withColumn("rn", row_number().over(wp))
      .join(broadcast(np), Seq("g"))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .join(broadcast(daily.groupBy(col("g"))
        .agg(count(lit(1)).as("n_days"))), Seq("g"))
      .select(col("g").as("event_type"), col("n_days"), col("np")
        .as("n_pairs"), (dbl(col("m2")) / lit(2.0)).as("hl"))
      .orderBy(col("event_type"))
  }

  /** Two-sample log-rank test: md5-parity arms over users; event time =
    * days from a user's first event to first purchase, censored at the
    * user's last observed day. O−E and variance accumulate over the
    * bounded distinct-death-day table. */
  private def qAggLogrank(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("us div 86400000000").as("day"))
    val users = ev.groupBy(col("user_id")).agg(
        min(col("day")).as("d0"),
        max(col("day")).as("dl"),
        min(when(col("event_type") === "purchase", col("day")))
          .as("dp"))
      .select(col("user_id"),
        when(expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), " +
          "1, 6), 16, 10) AS BIGINT) % 2") === 0, "A").otherwise("B")
          .as("arm"),
        (coalesce(col("dp"), col("dl")) - col("d0")).as("tt"),
        when(col("dp").isNotNull, 1L).otherwise(0L).as("e"))
      .localCheckpoint(true)
    val totals = users.groupBy(col("arm")).agg(count(lit(1)).as("ntot"))
    // per (t, arm): deaths and total removals (death or censor) at t
    val byT = users.groupBy(col("tt"), col("arm"))
      .agg(sum(col("e")).as("dth"), count(lit(1)).as("rem"))
    // at-risk_g(t) = ntot_g − removals strictly before t
    val wA = Window.partitionBy(col("arm")).orderBy(col("tt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.join(broadcast(totals), Seq("arm"))
      .withColumn("atrisk",
        col("ntot") - coalesce(sum(col("rem")).over(wA), lit(0L)))
    // wide per-t table (bounded by the day span); death times only
    val wide = risk.groupBy(col("tt")).agg(
        sum(when(col("arm") === "A", col("dth"))).as("d1"),
        sum(when(col("arm") === "B", col("dth"))).as("d2"),
        sum(when(col("arm") === "A", col("atrisk"))).as("n1r"),
        sum(when(col("arm") === "B", col("atrisk"))).as("n2r"))
      .select(col("tt"),
        coalesce(col("d1"), lit(0L)).as("d1"),
        coalesce(col("d2"), lit(0L)).as("d2"),
        coalesce(col("n1r"), lit(0L)).as("n1r"),
        coalesce(col("n2r"), lit(0L)).as("n2r"))
      .filter(col("d1") + col("d2") > 0)
    val terms = wide
      .withColumn("nt", col("n1r") + col("n2r"))
      .withColumn("dt", col("d1") + col("d2"))
      .select(col("d1"),
        expr("CAST(ROUND(CAST(dt AS DOUBLE) * CAST(n1r AS DOUBLE) " +
          "/ CAST(nt AS DOUBLE), 9) AS DECIMAL(28,9))").as("e1"),
        when(col("nt") > 1, expr(
          "CAST(ROUND(CAST(dt AS DOUBLE) " +
            "* (CAST(n1r AS DOUBLE) / CAST(nt AS DOUBLE)) " +
            "* (1.0 - CAST(n1r AS DOUBLE) / CAST(nt AS DOUBLE)) " +
            "* (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE)) " +
            "/ (CAST(nt AS DOUBLE) - 1.0), 9) AS DECIMAL(28,9))"))
          .otherwise(expr("CAST(0 AS DECIMAL(28,9))")).as("v"))
    val armN = users.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
    terms.agg(sum(col("d1")).as("o1"), sum(col("e1")).as("e1s"),
        sum(col("v")).as("vs"))
      .crossJoin(broadcast(armN))
      .select(col("n_a"), col("n_b"), col("o1"),
        round(dbl(col("e1s")), 6).as("e1"),
        round(dbl(col("vs")), 6).as("v"),
        when(dbl(col("vs")) > 0,
          round((dbl(col("o1")) - dbl(col("e1s"))) / sqrt(dbl(col("vs"))),
            6)).as("z"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_hodgeslehmann" -> (qAggHodgeslehmann _),
    "q_agg_logrank" -> (qAggLogrank _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_hodgeslehmann" ->
      """WITH daily AS (
        |  SELECT event_type AS g,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.g, a.c + b.c AS m2
        |  FROM daily a JOIN daily b ON a.g = b.g AND a.day <= b.day),
        |np AS (SELECT g, CAST(count(*) AS BIGINT) AS np
        |       FROM pairs GROUP BY g),
        |nd AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days
        |       FROM daily GROUP BY g),
        |ranked AS (
        |  SELECT g, m2, row_number() OVER (PARTITION BY g ORDER BY m2)
        |    AS rn
        |  FROM pairs)
        |SELECT r.g AS event_type, nd.n_days, np.np AS n_pairs,
        |  CAST(r.m2 AS DOUBLE) / 2.0 AS hl
        |FROM ranked r JOIN np ON r.g = np.g JOIN nd ON r.g = nd.g
        |WHERE r.rn = (np.np + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "q_agg_logrank" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |peruser AS (
        |  SELECT user_id,
        |    COALESCE(min(CASE WHEN event_type = 'purchase' THEN day END),
        |      max(day)) - min(day) AS tt,
        |    CASE WHEN min(CASE WHEN event_type = 'purchase' THEN day END)
        |      IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM ev GROUP BY user_id),
        |users AS (
        |  SELECT user_id,
        |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(
        |          substr(md5(CAST(user_id AS VARCHAR)), 1, 6), ''),
        |          ch -> CAST(strpos('0123456789abcdef', ch) - 1
        |            AS BIGINT))),
        |        (h, x) -> h * 16 + x) % 2 = 0
        |      THEN 'A' ELSE 'B' END AS arm,
        |    tt, e
        |  FROM peruser),
        |totals AS (SELECT arm, CAST(count(*) AS BIGINT) AS ntot
        |           FROM users GROUP BY arm),
        |byt AS (
        |  SELECT tt, arm, CAST(sum(e) AS BIGINT) AS dth,
        |    CAST(count(*) AS BIGINT) AS rem
        |  FROM users GROUP BY 1, 2),
        |risk AS (
        |  SELECT b.tt, b.arm, b.dth,
        |    t.ntot - COALESCE(sum(b.rem) OVER (PARTITION BY b.arm
        |      ORDER BY b.tt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS atrisk
        |  FROM byt b JOIN totals t ON b.arm = t.arm),
        |wide AS (
        |  SELECT tt,
        |    CAST(COALESCE(sum(CASE WHEN arm = 'A' THEN dth END), 0)
        |      AS BIGINT) AS d1,
        |    CAST(COALESCE(sum(CASE WHEN arm = 'B' THEN dth END), 0)
        |      AS BIGINT) AS d2,
        |    CAST(COALESCE(sum(CASE WHEN arm = 'A' THEN atrisk END), 0)
        |      AS BIGINT) AS n1r,
        |    CAST(COALESCE(sum(CASE WHEN arm = 'B' THEN atrisk END), 0)
        |      AS BIGINT) AS n2r
        |  FROM risk GROUP BY tt HAVING COALESCE(sum(CASE WHEN arm = 'A'
        |    THEN dth END), 0) + COALESCE(sum(CASE WHEN arm = 'B'
        |    THEN dth END), 0) > 0),
        |terms AS (
        |  SELECT d1,
        |    CAST(ROUND(CAST(d1 + d2 AS DOUBLE) * CAST(n1r AS DOUBLE)
        |      / CAST(n1r + n2r AS DOUBLE), 9) AS DECIMAL(28,9)) AS e1,
        |    CASE WHEN n1r + n2r > 1 THEN
        |      CAST(ROUND(CAST(d1 + d2 AS DOUBLE)
        |        * (CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE))
        |        * (1.0 - CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE))
        |        * (CAST(n1r + n2r AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
        |        / (CAST(n1r + n2r AS DOUBLE) - 1.0), 9) AS DECIMAL(28,9))
        |      ELSE CAST(0 AS DECIMAL(28,9)) END AS v
        |  FROM wide),
        |armn AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM users)
        |SELECT n_a, n_b, CAST(o1 AS BIGINT) AS o1,
        |  ROUND(CAST(e1s AS DOUBLE), 6) AS e1,
        |  ROUND(CAST(vs AS DOUBLE), 6) AS v,
        |  CASE WHEN CAST(vs AS DOUBLE) > 0
        |    THEN ROUND((CAST(o1 AS DOUBLE) - CAST(e1s AS DOUBLE))
        |      / sqrt(CAST(vs AS DOUBLE)), 6) END AS z
        |FROM (SELECT sum(d1) AS o1, sum(e1) AS e1s, sum(v) AS vs
        |      FROM terms) CROSS JOIN armn""".stripMargin,
  )
}
