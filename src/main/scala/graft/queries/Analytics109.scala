package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 seventh wave: the three categorical/post-hoc completions
  * the test family still lacked — three oracled operators:
  *
  *  - q_agg_cochranarmitage: Cochran–Armitage trend test for a binary
  *    outcome across ORDERED groups (outcome = order fully shipped,
  *    groups = the five priorities with scores 1..5) — the directional
  *    question q_agg_chisq's any-association test cannot pose.
  *    T = Σsᵢaᵢ with classical variance p̄(1−p̄)[Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N];
  *    every moment is exact BIGINT off one 5-row grid.
  *  - q_agg_gameshowell: Games–Howell post-hoc — after
  *    q_agg_welchanova rejects, WHICH priority pairs differ? Pairwise
  *    Welch t and Welch–Satterthwaite df per pair over the same exact
  *    cents-moment group table (10 bounded pairs).
  *  - q_agg_breslowday: Breslow–Day homogeneity of odds ratios across
  *    q_agg_cmh's nation strata — CMH assumes a COMMON odds ratio;
  *    this is the test of that assumption (classical, no Tarone
  *    correction — stated). Expected cell under the Mantel–Haenszel
  *    ψ solves the stratum quadratic a²(ψ−1) − a[ψ(n1+m1)+(T−n1−m1)]
  *    + ψ·n1·m1 = 0 with the root inside the margin box.
  *
  * Determinism: Cochran–Armitage is exact integers to one final z
  * division; Games–Howell rides welchanova's exact cents moments with
  * identical double trees; Breslow–Day routes both the ψ numerator
  * terms and the per-stratum χ² contributions through 9dp DECIMAL
  * before summing (the CMH discipline), and the quadratic root choice
  * is a box-membership CASE on the same doubles in both engines.
  * Scale: each collapses the fact table to a ≤25-row grid in one
  * scan; all test algebra is bounded. */
object Analytics109 {

  private def qAggCochranarmitage(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
        .as("g"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("a"))
      .agg(sum(col("n")).as("nn"), sum(col("a")).as("aa"),
        count(lit(1)).as("k"),
        sum(col("g") * col("a")).as("t_raw"),
        sum(col("g") * col("n")).as("sn"),
        sum(col("g") * col("g") * col("n")).as("s2n"))
      .select(col("nn").as("n"), col("k"), col("aa").as("cases"),
        dbl(col("t_raw")).as("t_stat"),
        round(dbl(col("aa")) * dbl(col("sn")) / dbl(col("nn")), 6)
          .as("e_t"),
        when(col("nn") > 0 && col("aa") > 0 && col("aa") < col("nn"),
          round((dbl(col("t_raw"))
              - dbl(col("aa")) * dbl(col("sn")) / dbl(col("nn")))
            / sqrt((dbl(col("aa")) / dbl(col("nn")))
              * (lit(1.0) - dbl(col("aa")) / dbl(col("nn")))
              * (dbl(col("s2n"))
                - dbl(col("sn")) * dbl(col("sn")) / dbl(col("nn")))), 6))
          .as("z"))

  private def qAggGameshowell(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "orders")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
        .as("g"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr("CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))"))
          .as("sy2"))
      .filter(col("n") > 1)
      .select(col("g"), col("n"),
        expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").as("m"),
        expr("""(CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)
               |  * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               | / (CAST(n AS DOUBLE) - 1.0)""".stripMargin).as("v"))
      .localCheckpoint(true) // ≤5-row group table
    g.select(col("g").as("g1"), col("n").as("n1"), col("m").as("m1"),
        col("v").as("v1"))
      .crossJoin(g.select(col("g").as("g2"), col("n").as("n2"),
        col("m").as("m2"), col("v").as("v2")))
      .filter(col("g1") < col("g2"))
      .withColumn("se2", col("v1") / dbl(col("n1"))
        + col("v2") / dbl(col("n2")))
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        round((col("m1") - col("m2")) / 100.0, 6).as("diff_usd"),
        when(col("se2") > 0,
          round((col("m1") - col("m2")) / sqrt(col("se2")), 6)).as("t"),
        when(col("se2") > 0,
          round(col("se2") * col("se2")
            / ((col("v1") / dbl(col("n1"))) * (col("v1") / dbl(col("n1")))
                / (dbl(col("n1")) - 1.0)
              + (col("v2") / dbl(col("n2"))) * (col("v2") / dbl(col("n2")))
                / (dbl(col("n2")) - 1.0)), 4)).as("df"))
      .orderBy(col("g1"), col("g2"))
  }

  private def qAggBreslowday(s: SparkSession, d: String): DataFrame = {
    val strata = t(s, d, "customer")
      .select(col("c_nationkey").as("k"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("e"),
        when(col("c_acctbal") > 5000.0, 1L).otherwise(0L).as("o"))
      .groupBy(col("k"))
      .agg(sum(expr("e * o")).as("a"), sum(expr("e * (1 - o)")).as("b"),
        sum(expr("(1 - e) * o")).as("c"),
        sum(expr("(1 - e) * (1 - o)")).as("dd"))
      .withColumn("nn", col("a") + col("b") + col("c") + col("dd"))
      // strata with all four margins present (the BD validity box)
      .filter(col("a") + col("b") > 0 && col("c") + col("dd") > 0 &&
        col("a") + col("c") > 0 && col("b") + col("dd") > 0)
      .localCheckpoint(true) // ≤25-row stratum table
    val psi = strata.agg(
        sum(expr("""CAST(ROUND(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
               |  / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))"""
          .stripMargin)).as("sad"),
        sum(expr("""CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
               |  / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))"""
          .stripMargin)).as("sbc"))
      .select(when(dbl(col("sbc")) > 0,
        dbl(col("sad")) / dbl(col("sbc"))).as("psi"))
    strata.crossJoin(broadcast(psi))
      .withColumn("n1", dbl(col("a") + col("b")))
      .withColumn("m1", dbl(col("a") + col("c")))
      .withColumn("tt", dbl(col("nn")))
      .withColumn("qa", col("psi") - 1.0)
      .withColumn("qb", -(col("psi") * (col("n1") + col("m1"))
        + col("tt") - col("n1") - col("m1")))
      .withColumn("qc", col("psi") * col("n1") * col("m1"))
      .withColumn("disc", greatest(
        col("qb") * col("qb") - lit(4.0) * col("qa") * col("qc"),
        lit(0.0)))
      .withColumn("r1", (-col("qb") - sqrt(col("disc")))
        / (lit(2.0) * col("qa")))
      .withColumn("r2", (-col("qb") + sqrt(col("disc")))
        / (lit(2.0) * col("qa")))
      .withColumn("lo", greatest(lit(0.0),
        col("n1") + col("m1") - col("tt")))
      .withColumn("hi", least(col("n1"), col("m1")))
      .withColumn("ee",
        when(abs(col("qa")) < 1e-12, -col("qc") / col("qb"))
          .when(col("r1") >= col("lo") - 1e-7 &&
            col("r1") <= col("hi") + 1e-7, col("r1"))
          .when(col("r2") >= col("lo") - 1e-7 &&
            col("r2") <= col("hi") + 1e-7, col("r2")))
      .withColumn("vv",
        when(col("ee") > col("lo") + 1e-9 && col("ee") < col("hi") - 1e-9,
          lit(1.0) / (lit(1.0) / col("ee")
            + lit(1.0) / (col("n1") - col("ee"))
            + lit(1.0) / (col("m1") - col("ee"))
            + lit(1.0) / (col("tt") - col("n1") - col("m1") + col("ee")))))
      .filter(col("vv").isNotNull && col("vv") > 0)
      .select(col("psi"),
        expr("""CAST(ROUND((CAST(a AS DOUBLE) - ee) * (CAST(a AS DOUBLE) - ee)
               |  / vv, 9) AS DECIMAL(28,9))""".stripMargin).as("term"))
      .groupBy(col("psi"))
      .agg(count(lit(1)).as("k_strata"), sum(col("term")).as("x2"))
      .select(col("k_strata"), round(col("psi"), 6).as("psi_mh"),
        round(dbl(col("x2")), 6).as("x2_bd"),
        (col("k_strata") - 1).as("df"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_cochranarmitage" -> (qAggCochranarmitage _),
    "q_agg_gameshowell" -> (qAggGameshowell _),
    "q_agg_breslowday" -> (qAggBreslowday _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_cochranarmitage" ->
      """WITH g AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(a) AS BIGINT) AS aa,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(g * a) AS BIGINT) AS t_raw,
        |    CAST(sum(g * n) AS BIGINT) AS sn,
        |    CAST(sum(g * g * n) AS BIGINT) AS s2n
        |  FROM g)
        |SELECT nn AS n, k, aa AS cases,
        |  CAST(t_raw AS DOUBLE) AS t_stat,
        |  ROUND(CAST(aa AS DOUBLE) * CAST(sn AS DOUBLE)
        |    / CAST(nn AS DOUBLE), 6) AS e_t,
        |  CASE WHEN nn > 0 AND aa > 0 AND aa < nn THEN
        |    ROUND((CAST(t_raw AS DOUBLE)
        |        - CAST(aa AS DOUBLE) * CAST(sn AS DOUBLE)
        |          / CAST(nn AS DOUBLE))
        |      / sqrt((CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (1.0 - CAST(aa AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (CAST(s2n AS DOUBLE)
        |          - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
        |            / CAST(nn AS DOUBLE))), 6) END AS z
        |FROM m""".stripMargin,
    "q_agg_gameshowell" ->
      """WITH g AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(y) AS sy, sum(CAST(y AS HUGEINT) * y) AS sy2
        |  FROM (SELECT o_orderpriority,
        |          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |            AS BIGINT) AS y
        |        FROM orders) z
        |  GROUP BY 1),
        |gm AS (
        |  SELECT g, n, CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |    (CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS v
        |  FROM g WHERE n > 1),
        |p AS (
        |  SELECT a.g AS g1, b.g AS g2, a.n AS n1, b.n AS n2,
        |    a.m AS m1, b.m AS m2, a.v AS v1, b.v AS v2,
        |    a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE) AS se2
        |  FROM gm a JOIN gm b ON a.g < b.g)
        |SELECT g1, g2, n1, n2,
        |  ROUND((m1 - m2) / 100.0, 6) AS diff_usd,
        |  CASE WHEN se2 > 0 THEN
        |    ROUND((m1 - m2) / sqrt(se2), 6) END AS t,
        |  CASE WHEN se2 > 0 THEN
        |    ROUND(se2 * se2
        |      / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
        |          / (CAST(n1 AS DOUBLE) - 1.0)
        |        + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
        |          / (CAST(n2 AS DOUBLE) - 1.0)), 4) END AS df
        |FROM p ORDER BY g1, g2""".stripMargin,
    "q_agg_breslowday" ->
      """WITH s AS (
        |  SELECT c_nationkey AS k,
        |    CAST(sum(e * o) AS BIGINT) AS a,
        |    CAST(sum(e * (1 - o)) AS BIGINT) AS b,
        |    CAST(sum((1 - e) * o) AS BIGINT) AS c,
        |    CAST(sum((1 - e) * (1 - o)) AS BIGINT) AS dd
        |  FROM (SELECT c_nationkey,
        |      CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS e,
        |      CASE WHEN c_acctbal > 5000.0 THEN 1 ELSE 0 END AS o
        |    FROM customer) z
        |  GROUP BY 1),
        |st AS (
        |  SELECT k, a, b, c, dd, a + b + c + dd AS nn
        |  FROM s WHERE a + b > 0 AND c + dd > 0
        |    AND a + c > 0 AND b + dd > 0),
        |psi AS (
        |  SELECT CASE WHEN CAST(sbc AS DOUBLE) > 0 THEN
        |      CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE) END AS psi
        |  FROM (SELECT
        |      sum(CAST(ROUND(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
        |        / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sad,
        |      sum(CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
        |        / CAST(nn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sbc
        |    FROM st) z),
        |q AS (
        |  SELECT st.*, psi,
        |    CAST(a + b AS DOUBLE) AS n1, CAST(a + c AS DOUBLE) AS m1,
        |    CAST(nn AS DOUBLE) AS tt, psi - 1.0 AS qa,
        |    -(psi * (CAST(a + b AS DOUBLE) + CAST(a + c AS DOUBLE))
        |      + CAST(nn AS DOUBLE) - CAST(a + b AS DOUBLE)
        |      - CAST(a + c AS DOUBLE)) AS qb,
        |    psi * CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) AS qc
        |  FROM st CROSS JOIN psi),
        |r AS (
        |  SELECT *, greatest(qb * qb - 4.0 * qa * qc, 0.0) AS disc,
        |    greatest(0.0, n1 + m1 - tt) AS lo, least(n1, m1) AS hi
        |  FROM q),
        |e AS (
        |  SELECT *,
        |    CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
        |      WHEN (-qb - sqrt(disc)) / (2.0 * qa) >= lo - 1e-7
        |        AND (-qb - sqrt(disc)) / (2.0 * qa) <= hi + 1e-7
        |        THEN (-qb - sqrt(disc)) / (2.0 * qa)
        |      WHEN (-qb + sqrt(disc)) / (2.0 * qa) >= lo - 1e-7
        |        AND (-qb + sqrt(disc)) / (2.0 * qa) <= hi + 1e-7
        |        THEN (-qb + sqrt(disc)) / (2.0 * qa) END AS ee
        |  FROM r),
        |v AS (
        |  SELECT *,
        |    CASE WHEN ee > lo + 1e-9 AND ee < hi - 1e-9 THEN
        |      1.0 / (1.0 / ee + 1.0 / (n1 - ee) + 1.0 / (m1 - ee)
        |        + 1.0 / (tt - n1 - m1 + ee)) END AS vv
        |  FROM e)
        |SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |  ROUND(psi, 6) AS psi_mh,
        |  ROUND(CAST(sum(CAST(ROUND((CAST(a AS DOUBLE) - ee)
        |    * (CAST(a AS DOUBLE) - ee) / vv, 9) AS DECIMAL(28,9)))
        |    AS DOUBLE), 6) AS x2_bd,
        |  CAST(count(*) - 1 AS BIGINT) AS df
        |FROM v WHERE vv IS NOT NULL AND vv > 0
        |GROUP BY psi""".stripMargin,
  )
}
