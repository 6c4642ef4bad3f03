package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 fifth wave: multiple-testing control and distribution-free
  * uncertainty — the two statistical gates an experimentation/eval
  * platform runs AFTER the per-segment tests the engine already has
  * (q_agg_ttest, q_agg_tost, q_agg_mde):
  *
  *  - q_agg_fdr: Benjamini–Hochberg false-discovery-rate correction
  *    across the per-nation mean tests. Screening 25+ segments with
  *    uncorrected p < 0.05 manufactures discoveries; BH is the
  *    standard step-up correction every metrics platform applies
  *    before flagging segments.
  *  - q_agg_conformal: split conformal prediction — a finite-sample,
  *    distribution-free interval around a point predictor, with the
  *    empirical coverage report that validates it on a held-out test
  *    split (the calibration artifact shipped with every model-backed
  *    column).
  *
  * Scale notes:
  *  - Both collapse the fact table ONCE with map-side-combined
  *    aggregates; everything downstream runs on bounded tables (25
  *    nation rows; 5 segment rows + three 1-row split summaries).
  *    The BH window sorts 25 rows; the conformal quantile pick ranks
  *    only the calibration split (a fixed fraction chosen for the
  *    report, not the corpus).
  *  - Determinism: cross-row moments use the ROUND(·,dp) → DECIMAL
  *    sum discipline (acctbal is DOUBLE in the source schema); the
  *    normal CDF uses the Abramowitz–Stegun 26.2.17 polynomial
  *    (|ε| < 7.5e-8) — elementary ops only, the identical expression
  *    tree in both engines (erf exists in neither). p-values round to
  *    9 dp BEFORE ranking/adjusting so order and the step-up minima
  *    cannot sit on a float boundary; the conformal rank index k is
  *    computed in integer arithmetic ((9·(n+1)+9) div 10), not via
  *    ceil of a double. */
object Analytics48 {

  /** 1 − Φ(|z|) via Abramowitz–Stegun 26.2.17 (same literal constants
    * on the oracle side). Expects a non-negative argument. */
  private def upperTail(az: String): String =
    s"(0.3989422804014327 * exp(-($az) * ($az) / 2.0) * " +
      s"((((1.330274429 * (1.0 / (1.0 + 0.2316419 * ($az))) " +
      s"- 1.821255978) * (1.0 / (1.0 + 0.2316419 * ($az))) " +
      s"+ 1.781477937) * (1.0 / (1.0 + 0.2316419 * ($az))) " +
      s"- 0.356563782) * (1.0 / (1.0 + 0.2316419 * ($az))) " +
      s"+ 0.319381530) * (1.0 / (1.0 + 0.2316419 * ($az))))"

  /** Benjamini–Hochberg FDR across the 25 per-nation "does this
    * nation's mean balance differ from the global mean" z-tests:
    * per nation, z, two-sided p, BH-adjusted p (step-up running min),
    * and the q = 0.10 discovery flag. */
  private def qAggFdr(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
    val nat = cust.groupBy(col("c_nationkey").as("nat"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(c_acctbal, 9) AS DECIMAL(28,9))")).as("s1"))
    val glob = cust.agg(count(lit(1)).as("nn"),
      sum(expr("CAST(ROUND(c_acctbal, 9) AS DECIMAL(28,9))")).as("g1"),
      sum(expr("CAST(ROUND(c_acctbal * c_acctbal, 6) AS DECIMAL(38,6))"))
        .as("g2"))
    val scored = nat.crossJoin(broadcast(glob))
      .withColumn("mu", expr("CAST(g1 AS DOUBLE) / CAST(nn AS DOUBLE)"))
      .withColumn("vr", expr(
        "CAST(g2 AS DOUBLE) / CAST(nn AS DOUBLE) - mu * mu"))
      // constant-balance corpus → zero variance → z undefined (ANSI
      // mode throws on the division): gate to NULL, p = 1
      .withColumn("z", when(col("vr") > 0, expr(
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - mu) " +
          "/ sqrt(vr / CAST(n AS DOUBLE))")))
      .withColumn("p9", when(col("z").isNotNull,
        expr(s"ROUND(2.0 * ${upperTail("abs(z)")}, 9)"))
        .otherwise(lit(1.0)))
    val wRank = Window.orderBy(col("p9"), col("nat"))
    val wAll = Window.partitionBy()
    // step-up: p_adj(i) = min over j >= i of m * p(j) / j, clamped to 1
    val wUp = Window.orderBy(col("rk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("rk", row_number().over(wRank))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("raw", expr(
        "CAST(m AS DOUBLE) * p9 / CAST(rk AS DOUBLE)"))
      .withColumn("padj", least(lit(1.0), min(col("raw")).over(wUp)))
      .select(col("nat"), col("n"),
        round(col("z"), 6).as("z"),
        round(col("p9"), 6).as("p"),
        round(col("padj"), 6).as("p_adj"),
        (round(col("padj"), 9) <= 0.10).as("discovery"))
      .orderBy(col("nat"))
  }

  /** Split conformal interval around the per-segment mean predictor:
    * md5-keyed train/calibration/test split (8/4/4 sixteenths),
    * q̂ = the ⌈0.9·(n_cal+1)⌉-th smallest calibration |residual|
    * (deterministic (score, custkey) order pick), then per-segment +
    * overall empirical coverage of ŷ ± q̂ on the test split. */
  private def qAggConformal(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"),
        col("c_acctbal").as("bal"))
      .withColumn("h", expr("substring(md5(CAST(ck AS STRING)), 1, 1)"))
      .withColumn("part", when(col("h") <= "7", "train")
        .when(col("h") <= "b", "cal").otherwise("test"))
    val model = cust.filter(col("part") === "train")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_tr"),
        sum(expr("CAST(ROUND(bal, 9) AS DECIMAL(28,9))")).as("s1"))
      .withColumn("yhat", expr("CAST(s1 AS DOUBLE) / CAST(n_tr AS DOUBLE)"))
      .select(col("seg"), col("yhat"))
    val calScores = cust.filter(col("part") === "cal")
      .join(broadcast(model), Seq("seg"))
      .select(col("ck"), expr("ROUND(abs(bal - yhat), 9)").as("sc"))
    val nCal = calScores.agg(count(lit(1)).as("n_cal"))
    val wSc = Window.orderBy(col("sc"), col("ck"))
    val qhat = calScores.crossJoin(broadcast(nCal))
      .withColumn("rn", row_number().over(wSc))
      // k = ceil(0.9 * (n_cal + 1)) in EXACT integer arithmetic — a
      // double 0.9·(n+1) sits on an engine-shared but mathematically
      // wrong boundary whenever n+1 is a multiple of 10. Clamped to
      // n_cal so a tiny calibration split (n_cal < 9 ⇒ k > n_cal)
      // degrades to the max residual instead of an empty qhat table
      // silently zeroing the whole report (both engines identically).
      .filter(col("rn") ===
        expr("least((9 * (n_cal + 1) + 9) div 10, n_cal)"))
      .select(col("sc").as("qhat"), col("n_cal"))
    val test = cust.filter(col("part") === "test")
      .join(broadcast(model), Seq("seg"))
      .crossJoin(broadcast(qhat))
      .withColumn("cov",
        when(expr("ROUND(abs(bal - yhat), 9)") <= col("qhat"), 1L)
          .otherwise(0L))
    test
      .groupBy(col("seg")).agg(count(lit(1)).as("n_test"),
        sum(col("cov")).as("n_covered"),
        max(col("qhat")).as("qh"), max(col("n_cal")).as("ncal"))
      .select(col("seg"), col("n_test"), col("n_covered"),
        round(expr("CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE)"), 6)
          .as("coverage"),
        round(col("qh"), 6).as("qhat"),
        round(col("qh") * 2.0, 6).as("width"),
        col("ncal").as("n_cal"))
      .orderBy(col("seg"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_fdr" -> (qAggFdr _),
    "q_agg_conformal" -> (qAggConformal _),
  )

  private val tailSql = upperTail("abs(z)")

  val sql: Map[String, String] = Map(
    "q_agg_fdr" ->
      s"""WITH nat AS (
        |  SELECT c_nationkey AS nat, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(c_acctbal, 9) AS DECIMAL(28,9))) AS s1
        |  FROM customer GROUP BY 1),
        |gstat AS (
        |  SELECT CAST(count(*) AS BIGINT) AS nn,
        |    sum(CAST(ROUND(c_acctbal, 9) AS DECIMAL(28,9))) AS g1,
        |    sum(CAST(ROUND(c_acctbal * c_acctbal, 6) AS DECIMAL(38,6)))
        |      AS g2
        |  FROM customer),
        |scored AS (
        |  SELECT nat, n, z,
        |    CASE WHEN z IS NOT NULL
        |         THEN ROUND(2.0 * $tailSql, 9)
        |         ELSE CAST(1.0 AS DOUBLE) END AS p9
        |  FROM (
        |    SELECT nat, n,
        |      CASE WHEN vr > 0 THEN
        |        (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) - mu)
        |          / sqrt(vr / CAST(n AS DOUBLE)) END AS z
        |    FROM (
        |      SELECT nat, n, s1, mu,
        |        CAST(g2 AS DOUBLE) / CAST(nn AS DOUBLE) - mu * mu AS vr
        |      FROM (SELECT nat, n, s1, nn, g2,
        |              CAST(g1 AS DOUBLE) / CAST(nn AS DOUBLE) AS mu
        |            FROM nat CROSS JOIN gstat) a) b) c),
        |ranked AS (
        |  SELECT nat, n, z, p9,
        |    ROW_NUMBER() OVER (ORDER BY p9, nat) AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM scored),
        |adj AS (
        |  SELECT nat, n, z, p9,
        |    LEAST(CAST(1.0 AS DOUBLE), min(
        |        CAST(m AS DOUBLE) * p9 / CAST(rk AS DOUBLE))
        |      OVER (ORDER BY rk DESC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS padj
        |  FROM ranked)
        |SELECT nat, n, ROUND(z, 6) AS z, ROUND(p9, 6) AS p,
        |  ROUND(padj, 6) AS p_adj,
        |  ROUND(padj, 9) <= 0.10 AS discovery
        |FROM adj ORDER BY nat""".stripMargin,
    "q_agg_conformal" ->
      """WITH cust AS (
        |  SELECT c_custkey AS ck, c_mktsegment AS seg, c_acctbal AS bal,
        |    CASE WHEN substring(md5(CAST(ck AS VARCHAR)), 1, 1) <= '7'
        |           THEN 'train'
        |         WHEN substring(md5(CAST(ck AS VARCHAR)), 1, 1) <= 'b'
        |           THEN 'cal'
        |         ELSE 'test' END AS part
        |  FROM customer),
        |model AS (
        |  SELECT seg,
        |    CAST(sum(CAST(ROUND(bal, 9) AS DECIMAL(28,9))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS yhat
        |  FROM cust WHERE part = 'train' GROUP BY 1),
        |cal AS (
        |  SELECT ck, ROUND(abs(bal - yhat), 9) AS sc
        |  FROM cust JOIN model USING (seg) WHERE part = 'cal'),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |qh AS (
        |  SELECT sc AS qhat, n_cal FROM (
        |    SELECT sc, n_cal, ROW_NUMBER() OVER (ORDER BY sc, ck) AS rn
        |    FROM cal CROSS JOIN nc) a
        |  WHERE rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal))
        |SELECT seg, CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN ROUND(abs(bal - yhat), 9) <= qhat
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        |  ROUND(CAST(sum(CASE WHEN ROUND(abs(bal - yhat), 9) <= qhat
        |                      THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS coverage,
        |  ROUND(max(qhat), 6) AS qhat,
        |  ROUND(max(qhat) * 2.0, 6) AS width,
        |  max(n_cal) AS n_cal
        |FROM cust JOIN model USING (seg) CROSS JOIN qh
        |WHERE part = 'test'
        |GROUP BY seg ORDER BY seg""".stripMargin,
  )
}
