package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 twelfth wave: nonparametric trend / change-point /
  * effect-size tests over the calendar-bounded daily grids — the
  * distribution-free monitoring trio:
  *
  *  - q_agg_mannkendall: Mann–Kendall trend S with tie-corrected
    *  variance and continuity-corrected z per event type — "is this
  *    metric drifting?" without a linearity assumption (the rank
  *    sibling of q_time_theilsen's slope);
  *  - q_agg_pettitt: Pettitt's change-point test per type — K =
  *    max_t |U_t| over all split points with its location and the
  *    closed-form significance bound (the nonparametric counterpart
  *    of q_time_changepoint's mean-shift scan);
  *  - q_agg_cliffsdelta: Cliff's δ between click and view daily-mean
  *    distributions — the ordinal effect size (#(x>y) − #(x<y))/nm
  *    that q_agg_mannwhitney's U implies.
  *
  * All three are pure BIGINT sign/pair lattices over day²-bounded
  * self-joins of per-type daily DECIMAL aggregates (the
  * hodgeslehmann discipline) — exact at any scale, one final IEEE
  * expression each. */
object Analytics73 {

  /** (event_type et, day t ordinal within type, v DECIMAL). */
  private def dailyByType(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("et"), col("day"))
      .agg(sum(col("vv")).as("v"))

  /** Mann–Kendall S, tie-corrected Var(S) (×18 integer lattice), and
    * continuity-corrected z per event type. */
  private def qAggMannkendall(s: SparkSession, d: String): DataFrame = {
    val g = dailyByType(s, d)
    val pairs = g.select(col("et"), col("day").as("di"), col("v").as("vi"))
      .join(g.select(col("et"), col("day").as("dj"), col("v").as("vj")),
        Seq("et"))
      .filter(col("di") < col("dj"))
    val sAgg = pairs.groupBy(col("et"))
      .agg(sum(when(col("vj") > col("vi"), 1L)
        .when(col("vj") < col("vi"), -1L).otherwise(0L)).as("s"))
    val nAgg = g.groupBy(col("et")).agg(count(lit(1)).as("n"))
    // tie groups on the exact DECIMAL daily values
    val ties = g.groupBy(col("et"), col("v"))
      .agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy(col("et"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
        .as("tie18"))
    nAgg.join(sAgg, Seq("et"))
      .join(ties, Seq("et"), "left")
      .withColumn("var18",
        col("n") * (col("n") - 1) * (col("n") * 2 + 5) -
          coalesce(col("tie18"), lit(0L)))
      .select(col("et").as("event_type"), col("n"), col("s"),
        col("var18"),
        when(col("var18") > 0,
          round(dbl(col("s") - signum(col("s")).cast("long")) /
            sqrt(dbl(col("var18")) / 18.0), 6)).as("z"))
      .orderBy(col("event_type"))
  }

  /** Pettitt change-point per type: K = max_t |U_t|, its location
    * (earliest day on ties), and p ≈ 2·exp(−6K²/(n³+n²)). */
  private def qAggPettitt(s: SparkSession, d: String): DataFrame = {
    val g = dailyByType(s, d)
    val pairs = g.select(col("et"), col("day").as("di"), col("v").as("vi"))
      .join(g.select(col("et"), col("day").as("dj"), col("v").as("vj")),
        Seq("et"))
      .filter(col("di") < col("dj"))
      .select(col("et"), col("di"), col("dj"),
        when(col("vi") > col("vj"), 1L)
          .when(col("vi") < col("vj"), -1L).otherwise(0L).as("sgn"))
    // split points: every day except the last carries U_t = sum over
    // pairs straddling it (di <= t < dj)
    val ts = g.select(col("et"), col("day").as("t"))
    val u = pairs.join(ts, Seq("et"))
      .filter(col("di") <= col("t") && col("t") < col("dj"))
      .groupBy(col("et"), col("t"))
      .agg(sum(col("sgn")).as("u"))
    val best = u.groupBy(col("et"))
      .agg(max(struct(abs(col("u")).as("k"), (-col("t")).as("nt")))
        .as("b"))
      .select(col("et"), col("b.k").as("k"), (-col("b.nt")).as("t_star"))
    best.join(g.groupBy(col("et")).agg(count(lit(1)).as("n")), Seq("et"))
      .select(col("et").as("event_type"), col("n"), col("k"),
        col("t_star"),
        when(col("n") > 1, round(
          exp(dbl(col("k") * col("k")) * -6.0 /
            dbl(col("n") * col("n") * col("n") + col("n") * col("n")))
            * 2.0, 6)).as("p_approx"))
      .orderBy(col("event_type"))
  }

  /** Cliff's δ between click and view daily means. */
  private def qAggCliffsdelta(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), expr("us div 86400000000").as("day"),
        dec(col("value")).as("vv"))
      .groupBy(col("event_type"), col("day"))
      .agg(round(dbl(sum(col("vv"))) / dbl(count(lit(1))), 9).as("x"))
    val a = daily.filter(col("event_type") === "click").select(col("x"))
    val b = daily.filter(col("event_type") === "view")
      .select(col("x").as("y"))
    a.crossJoin(b)
      .agg(count(lit(1)).as("nm"),
        sum(when(col("x") > col("y"), 1L).otherwise(0L)).as("gt"),
        sum(when(col("x") < col("y"), 1L).otherwise(0L)).as("lt"))
      .select(col("nm"), col("gt"), col("lt"),
        when(col("nm") > 0,
          round(dbl(col("gt") - col("lt")) / dbl(col("nm")), 6))
          .as("delta"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_mannkendall" -> (qAggMannkendall _),
    "q_agg_pettitt" -> (qAggPettitt _),
    "q_agg_cliffsdelta" -> (qAggCliffsdelta _),
  )

  private val gridSql =
    """WITH g AS (
      |  SELECT event_type AS et,
      |    (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
      |      // 86400000000) AS day,
      |    sum(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_mannkendall" -> (gridSql +
      """,
        |p AS (
        |  SELECT a.et,
        |    sum(CASE WHEN b.v > a.v THEN 1
        |             WHEN b.v < a.v THEN -1 ELSE 0 END) AS s
        |  FROM g a JOIN g b ON a.et = b.et AND a.day < b.day
        |  GROUP BY a.et),
        |n AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY et),
        |ties AS (
        |  SELECT et, sum(t * (t - 1) * (t * 2 + 5)) AS tie18
        |  FROM (SELECT et, v, CAST(count(*) AS BIGINT) AS t
        |        FROM g GROUP BY et, v HAVING count(*) > 1)
        |  GROUP BY et)
        |SELECT n.et AS event_type, n.n, CAST(p.s AS BIGINT) AS s,
        |  CAST(n.n * (n.n - 1) * (n.n * 2 + 5)
        |    - coalesce(tie18, 0) AS BIGINT) AS var18,
        |  CASE WHEN n.n * (n.n - 1) * (n.n * 2 + 5)
        |      - coalesce(tie18, 0) > 0 THEN
        |    round(CAST(p.s - sign(p.s) AS DOUBLE)
        |      / sqrt(CAST(n.n * (n.n - 1) * (n.n * 2 + 5)
        |          - coalesce(tie18, 0) AS DOUBLE) / 18.0), 6)
        |  END AS z
        |FROM n JOIN p ON n.et = p.et
        |LEFT JOIN ties ON n.et = ties.et
        |ORDER BY event_type""".stripMargin),
    "q_agg_pettitt" -> (gridSql +
      """,
        |pairs AS (
        |  SELECT a.et, a.day AS di, b.day AS dj,
        |    CASE WHEN a.v > b.v THEN 1
        |         WHEN a.v < b.v THEN -1 ELSE 0 END AS sgn
        |  FROM g a JOIN g b ON a.et = b.et AND a.day < b.day),
        |u AS (
        |  SELECT p.et, t.day AS t, CAST(sum(sgn) AS BIGINT) AS u
        |  FROM pairs p JOIN g t ON p.et = t.et
        |    AND p.di <= t.day AND t.day < p.dj
        |  GROUP BY p.et, t.day),
        |best AS (
        |  SELECT et, abs(u) AS k, t,
        |    row_number() OVER (PARTITION BY et
        |      ORDER BY abs(u) DESC, t) AS rk
        |  FROM u),
        |n AS (SELECT et, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY et)
        |SELECT n.et AS event_type, n.n, CAST(b.k AS BIGINT) AS k,
        |  b.t AS t_star,
        |  CASE WHEN n.n > 1 THEN
        |    round(exp(CAST(b.k * b.k AS DOUBLE) * -6.0
        |      / CAST(n.n * n.n * n.n + n.n * n.n AS DOUBLE)) * 2.0, 6)
        |  END AS p_approx
        |FROM n JOIN best b ON n.et = b.et AND b.rk = 1
        |ORDER BY event_type""".stripMargin),
    "q_agg_cliffsdelta" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
        |      // 86400000000) AS day,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 9) AS x
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1, 2),
        |a AS (SELECT x FROM daily WHERE event_type = 'click'),
        |b AS (SELECT x AS y FROM daily WHERE event_type = 'view'),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nm,
        |    CAST(sum(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT) AS gt,
        |    CAST(sum(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT) AS lt
        |  FROM a CROSS JOIN b)
        |SELECT nm, gt, lt,
        |  CASE WHEN nm > 0 THEN
        |    round(CAST(gt - lt AS DOUBLE) / CAST(nm AS DOUBLE), 6)
        |  END AS delta
        |FROM agg""".stripMargin,
  )
}
