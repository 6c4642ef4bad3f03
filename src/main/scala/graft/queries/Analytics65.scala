package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 third wave — the causal-inference / reliability toolbox
  * the experimentation battery (did/cuped/uplift/permtest/gst) still
  * lacked: the instrumental-variable Wald/LATE estimator (what you
  * reach for when treatment is self-selected but the encouragement is
  * random), regression-discontinuity at a cutoff (local-linear both
  * sides), the stratified ATE (coarse propensity adjustment by
  * blocking), Cronbach's alpha (are the engagement items one scale),
  * and the Nelson–Aalen cumulative hazard (the estimator next to
  * q_agg_survival's Kaplan–Meier — sums hazards instead of
  * multiplying survivals, better-behaved at small risk sets).
  *
  * Scale notes: every op collapses the fact table with ONE
  * map-side-combined aggregate (per-user or per-stratum); statistics
  * assemble from 1-row or stratum-bounded broadcast aggregates with
  * 9-dp DECIMAL term sums; every divisor that can degenerate gates to
  * NULL identically in both engines. Nelson–Aalen's risk sets ride the
  * bounded per-day removal table (the q_agg_logrank discipline). */
object Analytics65 {

  private def armExpr(c: String): org.apache.spark.sql.Column =
    when(expr(s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 6), " +
      "16, 10) AS BIGINT) % 2") === 0, 1L).otherwise(0L)

  /** IV / Wald LATE: instrument = md5 parity of user_id (as-if random
    * encouragement), treatment = user clicked, outcome = user
    * purchased. Reports first stage, ITT, and LATE = ITT/first-stage. */
  private def qAggIv(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("t"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .select(armExpr("user_id").as("z"), col("t"), col("y"))
    users.agg(
        count(lit(1)).as("n"),
        sum(col("z")).as("n1"),
        sum(lit(1L) - col("z")).as("n0"),
        sum(col("z") * col("t")).as("t1"),
        sum((lit(1L) - col("z")) * col("t")).as("t0"),
        sum(col("z") * col("y")).as("y1"),
        sum((lit(1L) - col("z")) * col("y")).as("y0"))
      .filter(col("n1") > 0 && col("n0") > 0)
      .select(col("n"), col("n1"), col("n0"),
        round(dbl(col("t1")) / dbl(col("n1"))
          - dbl(col("t0")) / dbl(col("n0")), 6).as("first_stage"),
        round(dbl(col("y1")) / dbl(col("n1"))
          - dbl(col("y0")) / dbl(col("n0")), 6).as("itt"),
        // a zero first stage (weak/no instrument) leaves LATE undefined
        when(dbl(col("t1")) / dbl(col("n1"))
            - dbl(col("t0")) / dbl(col("n0")) =!= 0.0,
          round((dbl(col("y1")) / dbl(col("n1"))
            - dbl(col("y0")) / dbl(col("n0"))) /
            (dbl(col("t1")) / dbl(col("n1"))
              - dbl(col("t0")) / dbl(col("n0"))), 6)).as("late"))
  }

  /** Sharp RDD at the zero-balance cutoff: local-linear fit of order
    * count on centered balance within ±2000, both sides; effect = the
    * intercept jump at the cutoff. */
  private def qAggRdd(s: SparkSession, d: String): DataFrame = {
    val orders = t(s, d, "orders")
      .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("no"))
    val cust = t(s, d, "customer")
      .select(col("c_custkey").as("ck"), dbl(col("c_acctbal")).as("u"))
      .join(orders, Seq("ck"), "left")
      .select(col("u"), coalesce(col("no"), lit(0L)).as("y"))
      .filter(abs(col("u")) <= 2000.0)
      .withColumn("side", when(col("u") >= 0, "r").otherwise("l"))
    val m = cust.groupBy(col("side")).agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(u, 9) AS DECIMAL(28,9))")).as("su"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(ROUND(u * y, 9) AS DECIMAL(28,9))")).as("suy"),
        sum(expr("CAST(ROUND(u * u, 9) AS DECIMAL(28,9))")).as("suu"))
      .withColumn("den", expr(
        "CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) " +
          "- CAST(su AS DOUBLE) * CAST(su AS DOUBLE)"))
      .filter(col("den") > 0)
      .select(col("side"), col("n"),
        round(expr("(CAST(sy AS DOUBLE) * CAST(suu AS DOUBLE) " +
          "- CAST(su AS DOUBLE) * CAST(suy AS DOUBLE)) / den"), 6)
          .as("a"),
        round(expr("(CAST(n AS DOUBLE) * CAST(suy AS DOUBLE) " +
          "- CAST(su AS DOUBLE) * CAST(sy AS DOUBLE)) / den"), 6)
          .as("b"))
    val l = m.filter(col("side") === "l")
      .select(col("n").as("n_l"), col("a").as("a_l"), col("b").as("b_l"))
    val r = m.filter(col("side") === "r")
      .select(col("n").as("n_r"), col("a").as("a_r"), col("b").as("b_r"))
    l.crossJoin(broadcast(r))
      .select(col("n_l"), col("n_r"), col("a_l"), col("b_l"),
        col("a_r"), col("b_r"),
        round(col("a_r") - col("a_l"), 6).as("effect"))
  }

  /** Stratified ATE (blocking on nation): md5-parity treatment, mean
    * balance difference per stratum, N-weighted over strata carrying
    * both arms; reports the unadjusted difference alongside. */
  private def qAggAte(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .select(col("c_nationkey").as("st"), armExpr("c_custkey").as("z"),
        dec(col("c_acctbal")).as("y"))
    val strata = cust.groupBy(col("st")).agg(
        count(lit(1)).as("ns"),
        sum(col("z")).as("n1"),
        sum(lit(1L) - col("z")).as("n0"),
        sum(when(col("z") === 1, col("y"))).as("s1"),
        sum(when(col("z") === 0, col("y"))).as("s0"))
      .filter(col("n1") > 0 && col("n0") > 0)
      .withColumn("diff", expr(
        "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) " +
          "- CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"))
      .withColumn("wdiff", expr(
        "CAST(ROUND(CAST(ns AS DOUBLE) * diff, 9) AS DECIMAL(28,9))"))
    val pooled = cust.agg(
      sum(col("z")).as("p1"), sum(lit(1L) - col("z")).as("p0"),
      sum(when(col("z") === 1, col("y"))).as("ps1"),
      sum(when(col("z") === 0, col("y"))).as("ps0"))
    strata.agg(count(lit(1)).as("n_strata"), sum(col("ns")).as("n"),
        sum(col("wdiff")).as("swd"))
      .crossJoin(broadcast(pooled))
      .select(col("n_strata"), col("n"),
        round(expr("CAST(ps1 AS DOUBLE) / CAST(p1 AS DOUBLE) " +
          "- CAST(ps0 AS DOUBLE) / CAST(p0 AS DOUBLE)"), 6)
          .as("naive_diff"),
        round(dbl(col("swd")) / dbl(col("n")), 6).as("ate_strat"))
  }

  /** Cronbach's alpha over the 3 engagement items (view/click/signup
    * counts per user): k/(k−1) · (1 − Σ item var / total var). */
  private def qAggCronbach(s: SparkSession, d: String): DataFrame = {
    val items = events(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("i1"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("i2"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("i3"))
      .withColumn("tot", col("i1") + col("i2") + col("i3"))
    def v(c: String) = expr(
      s"(CAST(s_$c AS DOUBLE) - CAST(l_$c AS DOUBLE) " +
        s"* CAST(l_$c AS DOUBLE) / CAST(n AS DOUBLE)) " +
        "/ (CAST(n AS DOUBLE) - 1.0)")
    items.agg(count(lit(1)).as("n"),
        sum(col("i1")).as("l_i1"), sum(col("i1") * col("i1")).as("s_i1"),
        sum(col("i2")).as("l_i2"), sum(col("i2") * col("i2")).as("s_i2"),
        sum(col("i3")).as("l_i3"), sum(col("i3") * col("i3")).as("s_i3"),
        sum(col("tot")).as("l_tot"),
        sum(col("tot") * col("tot")).as("s_tot"))
      .filter(col("n") > 1)
      .select(col("n"), lit(3L).as("k"),
        round(v("i1"), 6).as("var_1"),
        round(v("i2"), 6).as("var_2"),
        round(v("i3"), 6).as("var_3"),
        round(v("tot"), 6).as("var_total"),
        when(v("tot") > 0,
          round(lit(1.5) * (lit(1.0)
            - (v("i1") + v("i2") + v("i3")) / v("tot")), 6))
          .as("alpha"))
  }

  /** Nelson–Aalen cumulative hazard of time-to-first-purchase (days
    * from first event; censored at last observation): per death time,
    * the hazard increment d/n, cumulative H(t), and the variance
    * estimate Σ d/n². */
  private def qAggNelsonaalen(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("us div 86400000000").as("day"))
    val users = ev.groupBy(col("user_id")).agg(
        min(col("day")).as("d0"), max(col("day")).as("dl"),
        min(when(col("event_type") === "purchase", col("day"))).as("dp"))
      .select((coalesce(col("dp"), col("dl")) - col("d0")).as("tt"),
        when(col("dp").isNotNull, 1L).otherwise(0L).as("e"))
    val total = users.agg(count(lit(1)).as("ntot"))
    val byT = users.groupBy(col("tt"))
      .agg(sum(col("e")).as("dth"), count(lit(1)).as("rem"))
    val w = Window.orderBy(col("tt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(total))
      .withColumn("atrisk",
        col("ntot") - coalesce(sum(col("rem")).over(w), lit(0L)))
      .filter(col("dth") > 0)
      .select(col("tt"), col("dth"), col("atrisk"),
        expr("CAST(ROUND(CAST(dth AS DOUBLE) / CAST(atrisk AS DOUBLE), " +
          "9) AS DECIMAL(28,9))").as("h"),
        expr("CAST(ROUND(CAST(dth AS DOUBLE) / (CAST(atrisk AS DOUBLE) " +
          "* CAST(atrisk AS DOUBLE)), 9) AS DECIMAL(28,9))").as("vh"))
    val wc = Window.orderBy(col("tt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    risk.select(col("tt"), col("dth"), col("atrisk"),
        round(dbl(col("h")), 6).as("hazard"),
        round(dbl(sum(col("h")).over(wc)), 6).as("cum_hazard"),
        round(dbl(sum(col("vh")).over(wc)), 6).as("var_h"))
      .orderBy(col("tt"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_iv" -> (qAggIv _),
    "q_agg_rdd" -> (qAggRdd _),
    "q_agg_ate" -> (qAggAte _),
    "q_agg_cronbach" -> (qAggCronbach _),
    "q_agg_nelsonaalen" -> (qAggNelsonaalen _),
  )

  private val armSqlU =
    """CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(
      |      substr(md5(CAST(user_id AS VARCHAR)), 1, 6), ''),
      |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
      |    (h, x) -> h * 16 + x) % 2 = 0
      |  THEN 1 ELSE 0 END""".stripMargin

  private val armSqlC = armSqlU.replace("user_id", "c_custkey")

  val sql: Map[String, String] = Map(
    "q_agg_iv" ->
      s"""WITH peruser AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS y
        |  FROM events GROUP BY user_id),
        |users AS (
        |  SELECT $armSqlU AS z, t, y FROM peruser),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z) AS BIGINT) AS n1,
        |    CAST(sum(1 - z) AS BIGINT) AS n0,
        |    CAST(sum(z * t) AS BIGINT) AS t1,
        |    CAST(sum((1 - z) * t) AS BIGINT) AS t0,
        |    CAST(sum(z * y) AS BIGINT) AS y1,
        |    CAST(sum((1 - z) * y) AS BIGINT) AS y0
        |  FROM users)
        |SELECT n, n1, n0,
        |  ROUND(CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(t0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS first_stage,
        |  ROUND(CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS itt,
        |  CASE WHEN CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(t0 AS DOUBLE) / CAST(n0 AS DOUBLE) <> 0.0
        |    THEN ROUND((CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / (CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |        - CAST(t0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 6) END
        |    AS late
        |FROM agg WHERE n1 > 0 AND n0 > 0""".stripMargin,
    "q_agg_rdd" ->
      """WITH oc AS (
        |  SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS no
        |  FROM orders GROUP BY 1),
        |cust AS (
        |  SELECT CAST(c_acctbal AS DOUBLE) AS u,
        |    COALESCE(oc.no, 0) AS y,
        |    CASE WHEN CAST(c_acctbal AS DOUBLE) >= 0 THEN 'r'
        |         ELSE 'l' END AS side
        |  FROM customer LEFT JOIN oc ON c_custkey = oc.ck
        |  WHERE abs(CAST(c_acctbal AS DOUBLE)) <= 2000.0),
        |m AS (
        |  SELECT side, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(u, 9) AS DECIMAL(28,9))) AS su,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(ROUND(u * y, 9) AS DECIMAL(28,9))) AS suy,
        |    sum(CAST(ROUND(u * u, 9) AS DECIMAL(28,9))) AS suu
        |  FROM cust GROUP BY side),
        |fit AS (
        |  SELECT side, n,
        |    ROUND((CAST(sy AS DOUBLE) * CAST(suu AS DOUBLE)
        |      - CAST(su AS DOUBLE) * CAST(suy AS DOUBLE)) / den, 6) AS a,
        |    ROUND((CAST(n AS DOUBLE) * CAST(suy AS DOUBLE)
        |      - CAST(su AS DOUBLE) * CAST(sy AS DOUBLE)) / den, 6) AS b
        |  FROM (SELECT *, CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
        |          - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS den
        |        FROM m) mm
        |  WHERE den > 0)
        |SELECT l.n AS n_l, r.n AS n_r, l.a AS a_l, l.b AS b_l,
        |  r.a AS a_r, r.b AS b_r, ROUND(r.a - l.a, 6) AS effect
        |FROM (SELECT * FROM fit WHERE side = 'l') l
        |CROSS JOIN (SELECT * FROM fit WHERE side = 'r') r""".stripMargin,
    "q_agg_ate" ->
      s"""WITH cust AS (
        |  SELECT c_nationkey AS st, $armSqlC AS z,
        |    CAST(c_acctbal AS DECIMAL(18,4)) AS y
        |  FROM customer),
        |strata AS (
        |  SELECT st, CAST(count(*) AS BIGINT) AS ns,
        |    CAST(sum(z) AS BIGINT) AS n1,
        |    CAST(sum(1 - z) AS BIGINT) AS n0,
        |    sum(CASE WHEN z = 1 THEN y END) AS s1,
        |    sum(CASE WHEN z = 0 THEN y END) AS s0
        |  FROM cust GROUP BY st HAVING sum(z) > 0 AND sum(1 - z) > 0),
        |wd AS (
        |  SELECT ns, CAST(ROUND(CAST(ns AS DOUBLE)
        |    * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 9)
        |    AS DECIMAL(28,9)) AS wdiff
        |  FROM strata),
        |pooled AS (
        |  SELECT CAST(sum(z) AS BIGINT) AS p1,
        |    CAST(sum(1 - z) AS BIGINT) AS p0,
        |    sum(CASE WHEN z = 1 THEN y END) AS ps1,
        |    sum(CASE WHEN z = 0 THEN y END) AS ps0
        |  FROM cust)
        |SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(ns) AS BIGINT) AS n,
        |  ROUND(CAST(ps1 AS DOUBLE) / CAST(p1 AS DOUBLE)
        |    - CAST(ps0 AS DOUBLE) / CAST(p0 AS DOUBLE), 6) AS naive_diff,
        |  ROUND(CAST(sum(wdiff) AS DOUBLE) / CAST(sum(ns) AS DOUBLE), 6)
        |    AS ate_strat
        |FROM wd CROSS JOIN pooled
        |GROUP BY p1, p0, ps1, ps0""".stripMargin,
    "q_agg_cronbach" ->
      """WITH items AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS i1,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS i2,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS i3
        |  FROM events GROUP BY user_id),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(i1) AS BIGINT) AS l_i1,
        |    CAST(sum(i1 * i1) AS BIGINT) AS s_i1,
        |    CAST(sum(i2) AS BIGINT) AS l_i2,
        |    CAST(sum(i2 * i2) AS BIGINT) AS s_i2,
        |    CAST(sum(i3) AS BIGINT) AS l_i3,
        |    CAST(sum(i3 * i3) AS BIGINT) AS s_i3,
        |    CAST(sum(i1 + i2 + i3) AS BIGINT) AS l_tot,
        |    CAST(sum((i1 + i2 + i3) * (i1 + i2 + i3)) AS BIGINT) AS s_tot
        |  FROM items)
        |SELECT n, CAST(3 AS BIGINT) AS k,
        |  ROUND((CAST(s_i1 AS DOUBLE) - CAST(l_i1 AS DOUBLE)
        |    * CAST(l_i1 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0), 6) AS var_1,
        |  ROUND((CAST(s_i2 AS DOUBLE) - CAST(l_i2 AS DOUBLE)
        |    * CAST(l_i2 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0), 6) AS var_2,
        |  ROUND((CAST(s_i3 AS DOUBLE) - CAST(l_i3 AS DOUBLE)
        |    * CAST(l_i3 AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0), 6) AS var_3,
        |  ROUND((CAST(s_tot AS DOUBLE) - CAST(l_tot AS DOUBLE)
        |    * CAST(l_tot AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0), 6) AS var_total,
        |  CASE WHEN (CAST(s_tot AS DOUBLE) - CAST(l_tot AS DOUBLE)
        |      * CAST(l_tot AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) > 0
        |    THEN ROUND(1.5 * (1.0 -
        |      (((CAST(s_i1 AS DOUBLE) - CAST(l_i1 AS DOUBLE)
        |          * CAST(l_i1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0))
        |       + ((CAST(s_i2 AS DOUBLE) - CAST(l_i2 AS DOUBLE)
        |          * CAST(l_i2 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0))
        |       + ((CAST(s_i3 AS DOUBLE) - CAST(l_i3 AS DOUBLE)
        |          * CAST(l_i3 AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0)))
        |      / ((CAST(s_tot AS DOUBLE) - CAST(l_tot AS DOUBLE)
        |          * CAST(l_tot AS DOUBLE) / CAST(n AS DOUBLE))
        |          / (CAST(n AS DOUBLE) - 1.0))), 6) END AS alpha
        |FROM agg WHERE n > 1""".stripMargin,
    "q_agg_nelsonaalen" ->
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |users AS (
        |  SELECT COALESCE(min(CASE WHEN event_type = 'purchase'
        |      THEN day END), max(day)) - min(day) AS tt,
        |    CASE WHEN min(CASE WHEN event_type = 'purchase' THEN day END)
        |      IS NOT NULL THEN 1 ELSE 0 END AS e
        |  FROM ev GROUP BY user_id),
        |total AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM users),
        |byt AS (
        |  SELECT tt, CAST(sum(e) AS BIGINT) AS dth,
        |    CAST(count(*) AS BIGINT) AS rem
        |  FROM users GROUP BY tt),
        |risk AS (
        |  SELECT tt, dth,
        |    ntot - COALESCE(sum(rem) OVER (ORDER BY tt
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS atrisk
        |  FROM byt CROSS JOIN total),
        |h AS (
        |  SELECT tt, dth, atrisk,
        |    CAST(ROUND(CAST(dth AS DOUBLE) / CAST(atrisk AS DOUBLE), 9)
        |      AS DECIMAL(28,9)) AS h,
        |    CAST(ROUND(CAST(dth AS DOUBLE) / (CAST(atrisk AS DOUBLE)
        |      * CAST(atrisk AS DOUBLE)), 9) AS DECIMAL(28,9)) AS vh
        |  FROM risk WHERE dth > 0)
        |SELECT tt, dth, CAST(atrisk AS BIGINT) AS atrisk,
        |  ROUND(CAST(h AS DOUBLE), 6) AS hazard,
        |  ROUND(CAST(sum(h) OVER (ORDER BY tt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 6) AS cum_hazard,
        |  ROUND(CAST(sum(vh) OVER (ORDER BY tt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE), 6) AS var_h
        |FROM h ORDER BY tt""".stripMargin,
  )
}
