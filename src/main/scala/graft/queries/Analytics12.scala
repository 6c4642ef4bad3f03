package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twelfth wave: modularity scoring of the label-propagation
  * partition (the community-quality metric that turns q_graph_labelprop
  * from a heuristic into a measured result) and closed-form TWO-regressor
  * OLS via Cramer's rule on exact moments (the multivariate upgrade of
  * q_agg_ols).
  *
  * Scale notes:
  *  - Modularity needs only community-level aggregates: intra-community
  *    weight and degree mass per label — two label-keyed BIGINT aggs over
  *    the edge list; the per-community Q terms round to 9 dp and sum as
  *    DECIMAL (order-free), so the score is engine-exact.
  *  - OLS: the normal-equations matrix is NINE numbers (exact BIGINT /
  *    DECIMAL moments from one scan); Cramer's determinants are a fixed
  *    double expression tree over those exact inputs — identical on both
  *    engines regardless of magnitude, no distributed linear algebra. */
object Analytics12 {

  /** Weighted modularity Q = Σ_c (in_c/2W − (d_c/2W)²) of the 2-round
    * label-propagation partition over the support-≥2 co-purchase graph. */
  private def qGraphModularity(s: SparkSession, d: String): DataFrame = {
    val sym = Analytics10.lpSymEdges(s, d)
    val lab = Analytics10.lp2Labels(sym)
    val m2 = sym.agg(sum(col("cn")).as("m2")) // = 2W, exact
    val wdeg = sym.groupBy(col("u")).agg(sum(col("cn")).as("wdeg"))
    val dC = lab.join(wdeg, Seq("u"))
      .groupBy(col("lbl")).agg(sum(col("wdeg")).as("d_c"))
    val inC = sym
      .join(lab, Seq("u"))
      .join(lab.select(col("u").as("v"), col("lbl").as("lbl_v")), Seq("v"))
      .filter(col("lbl") === col("lbl_v"))
      .groupBy(col("lbl")).agg(sum(col("cn")).as("in_c"))
    dC.join(inC, Seq("lbl"), "left")
      .select(col("lbl"), col("d_c"),
        coalesce(col("in_c"), lit(0L)).as("in_c"))
      .crossJoin(broadcast(m2))
      .withColumn("term", expr(
        """CAST(ROUND(
          |  CAST(in_c AS DOUBLE) / CAST(m2 AS DOUBLE)
          |  - (CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE))
          |    * (CAST(d_c AS DOUBLE) / CAST(m2 AS DOUBLE)), 9)
          |  AS DECIMAL(18,9))""".stripMargin))
      .agg(count(lit(1)).as("n_comms"), max(col("m2")).as("m2"),
        sum(col("term")).as("q"))
      .select(col("n_comms"), col("m2"),
        round(dbl(col("q")), 6).as("modularity"))
  }

  /** Two-regressor OLS value ~ b0 + b1·hour-of-day + b2·day-of-week by
    * Cramer's rule on one pass of exact moments. */
  private def qAggOls2(s: SparkSession, d: String): DataFrame = {
    def D(c: String) = s"CAST($c AS DOUBLE)"
    val detM =
      s"""(${D("n")} * (${D("s11")} * ${D("s22")} - ${D("s12")} * ${D("s12")})
         | - ${D("s1")} * (${D("s1")} * ${D("s22")} - ${D("s12")} * ${D("s2")})
         | + ${D("s2")} * (${D("s1")} * ${D("s12")} - ${D("s11")} * ${D("s2")}))""".stripMargin
    val det0 =
      s"""(${D("sy")} * (${D("s11")} * ${D("s22")} - ${D("s12")} * ${D("s12")})
         | - ${D("s1")} * (${D("s1y")} * ${D("s22")} - ${D("s12")} * ${D("s2y")})
         | + ${D("s2")} * (${D("s1y")} * ${D("s12")} - ${D("s11")} * ${D("s2y")}))""".stripMargin
    val det1 =
      s"""(${D("n")} * (${D("s1y")} * ${D("s22")} - ${D("s12")} * ${D("s2y")})
         | - ${D("sy")} * (${D("s1")} * ${D("s22")} - ${D("s12")} * ${D("s2")})
         | + ${D("s2")} * (${D("s1")} * ${D("s2y")} - ${D("s1y")} * ${D("s2")}))""".stripMargin
    val det2 =
      s"""(${D("n")} * (${D("s11")} * ${D("s2y")} - ${D("s1y")} * ${D("s12")})
         | - ${D("s1")} * (${D("s1")} * ${D("s2y")} - ${D("s1y")} * ${D("s2")})
         | + ${D("sy")} * (${D("s1")} * ${D("s12")} - ${D("s11")} * ${D("s2")}))""".stripMargin
    events(s, d)
      .select((expr("us div 3600000000") % 24).as("x1"),
        (expr("us div 86400000000") % 7).as("x2"),
        expr("CAST(ROUND(value, 4) AS DECIMAL(18,4))").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      .selectExpr("n",
        s"ROUND($det0 / $detM, 6) AS b0",
        s"ROUND($det1 / $detM, 6) AS b1",
        s"ROUND($det2 / $detM, 6) AS b2")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_modularity" -> (qGraphModularity _),
    "q_agg_ols2" -> (qAggOls2 _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_modularity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e0 AS (SELECT a.pk AS u, b.pk AS v,
        |         CAST(count(*) AS BIGINT) AS cn
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v, cn FROM e0
        |        UNION ALL SELECT v, u, cn FROM e0),
        |l0 AS (SELECT DISTINCT u, u AS lbl FROM sym),
        |n1 AS (SELECT sym.u, l0.lbl, CAST(sum(sym.cn) AS BIGINT) AS w
        |       FROM sym JOIN l0 ON sym.v = l0.u GROUP BY 1, 2),
        |l1 AS (SELECT u, lbl FROM (
        |         SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u
        |           ORDER BY w DESC, lbl) AS rn FROM n1) z
        |       WHERE rn = 1),
        |n2 AS (SELECT sym.u, l1.lbl, CAST(sum(sym.cn) AS BIGINT) AS w
        |       FROM sym JOIN l1 ON sym.v = l1.u GROUP BY 1, 2),
        |l2 AS (SELECT u, lbl FROM (
        |         SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u
        |           ORDER BY w DESC, lbl) AS rn FROM n2) z
        |       WHERE rn = 1),
        |m2 AS (SELECT CAST(sum(cn) AS BIGINT) AS m2 FROM sym),
        |wdeg AS (SELECT u, CAST(sum(cn) AS BIGINT) AS wdeg
        |         FROM sym GROUP BY u),
        |dc AS (SELECT l2.lbl, CAST(sum(wdeg.wdeg) AS BIGINT) AS d_c
        |       FROM l2 JOIN wdeg ON l2.u = wdeg.u GROUP BY l2.lbl),
        |inc AS (SELECT a.lbl, CAST(sum(sym.cn) AS BIGINT) AS in_c
        |        FROM sym
        |        JOIN l2 a ON sym.u = a.u
        |        JOIN l2 b ON sym.v = b.u
        |        WHERE a.lbl = b.lbl GROUP BY a.lbl),
        |terms AS (
        |  SELECT CAST(ROUND(
        |      CAST(COALESCE(inc.in_c, 0) AS DOUBLE) / CAST(m2 AS DOUBLE)
        |      - (CAST(dc.d_c AS DOUBLE) / CAST(m2 AS DOUBLE))
        |        * (CAST(dc.d_c AS DOUBLE) / CAST(m2 AS DOUBLE)), 9)
        |    AS DECIMAL(18,9)) AS term, m2
        |  FROM dc LEFT JOIN inc ON dc.lbl = inc.lbl CROSS JOIN m2)
        |SELECT CAST(count(*) AS BIGINT) AS n_comms,
        |  max(m2) AS m2,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS modularity
        |FROM terms""".stripMargin,
    "q_agg_ols2" ->
      """WITH ev AS (
        |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
        |      AS x1,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7 AS x2,
        |    CAST(ROUND(value, 4) AS DECIMAL(18,4)) AS y
        |  FROM events),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1,
        |    CAST(sum(x2) AS BIGINT) AS s2,
        |    sum(y) AS sy,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
        |    sum(x1 * y) AS s1y,
        |    sum(x2 * y) AS s2y
        |  FROM ev)
        |SELECT n,
        |  ROUND((CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
        |    - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
        |    + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))
        |   / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
        |    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS b0,
        |  ROUND((CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
        |    - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))
        |   / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
        |    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS b1,
        |  ROUND((CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))
        |    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
        |    + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
        |   / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
        |    - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
        |    + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS b2
        |FROM m""".stripMargin,
  )
}
