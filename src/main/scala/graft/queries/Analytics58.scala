package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 fifteenth wave: delete-one-group jackknife for the ratio
  * estimator — the survey-statistics standard error for a quantity
  * that is a RATIO of totals (here revenue per order across nation
  * strata), where a naive per-row variance is simply wrong and the
  * bootstrap is overkill: R̂ = ΣY/ΣX, replicate R̂₍g₎ drops stratum g,
  * SE² = (G−1)/G · Σ(R̂₍g₎ − R̄)².
  *
  * Scale notes: ONE map-side-combined scan collapses the fact table
  * to the 25-row (nation, ΣY, ΣX) stratum table; every replicate is
  * computed from (total − stratum) differences on that bounded table —
  * no second scan, no resampling. Sums are exact DECIMAL; the
  * replicate ratios round to 9 dp before the decimal-summed variance
  * terms so the SE is order-free. */
object Analytics58 {

  /** Jackknife SE of revenue-per-order over nation strata. */
  private def qAggJackknife(s: SparkSession, d: String): DataFrame = {
    val strata = t(s, d, "orders")
      .join(t(s, d, "customer").select(col("c_custkey"),
        col("c_nationkey").as("nat")).hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("nat"))
      .agg(sum(expr("CAST(ROUND(o_totalprice, 2) AS DECIMAL(28,2))"))
        .as("y"), count(lit(1)).as("x"))
    val tot = strata.agg(sum(col("y")).as("ty"), sum(col("x")).as("tx"),
      count(lit(1)).as("g"))
    val reps = strata.crossJoin(broadcast(tot))
      // replicate ratio with stratum g removed; tx > x for any G ≥ 2
      // real corpus, gated anyway for the single-stratum degenerate
      .withColumn("rg", when(col("tx") > col("x"), expr(
        "ROUND(CAST(ty - y AS DOUBLE) / CAST(tx - x AS DOUBLE), 9)")))
    reps
      .agg(max(col("g")).as("g"),
        max(expr("ROUND(CAST(ty AS DOUBLE) / CAST(tx AS DOUBLE), 9)"))
          .as("r_hat"),
        sum(expr("CAST(rg AS DECIMAL(28,9))")).as("sr"),
        sum(expr("CAST(ROUND(rg * rg, 9) AS DECIMAL(38,9))")).as("srr"),
        count(col("rg")).as("nrep"))
      .selectExpr("g", "ROUND(r_hat, 6) AS ratio",
        "CASE WHEN nrep = g AND g > 1 THEN " +
          "ROUND(sqrt(GREATEST(CAST(0.0 AS DOUBLE), " +
          "(CAST(g AS DOUBLE) - 1.0) / CAST(g AS DOUBLE) " +
          "* (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) " +
          "* CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)))), 6) END " +
          "AS jackknife_se")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_jackknife" -> (qAggJackknife _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_jackknife" ->
      """WITH strata AS (
        |  SELECT c_nationkey AS nat,
        |    sum(CAST(ROUND(o_totalprice, 2) AS DECIMAL(28,2))) AS y,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(y) AS DECIMAL(38,2)) AS ty,
        |  CAST(sum(x) AS BIGINT) AS tx,
        |  CAST(count(*) AS BIGINT) AS g FROM strata),
        |reps AS (
        |  SELECT g, ty, tx,
        |    CASE WHEN tx > x THEN
        |      ROUND(CAST(ty - y AS DOUBLE) / CAST(tx - x AS DOUBLE), 9)
        |      END AS rg
        |  FROM strata CROSS JOIN tot)
        |SELECT max(g) AS g,
        |  ROUND(max(ROUND(CAST(ty AS DOUBLE) / CAST(tx AS DOUBLE), 9)),
        |    6) AS ratio,
        |  CASE WHEN count(rg) = max(g) AND max(g) > 1 THEN
        |    ROUND(sqrt(GREATEST(CAST(0.0 AS DOUBLE),
        |      (CAST(max(g) AS DOUBLE) - 1.0)
        |      / CAST(max(g) AS DOUBLE)
        |      * (CAST(sum(CAST(ROUND(rg * rg, 9) AS DECIMAL(38,9)))
        |           AS DOUBLE)
        |         - CAST(sum(CAST(rg AS DECIMAL(28,9))) AS DOUBLE)
        |           * CAST(sum(CAST(rg AS DECIMAL(28,9))) AS DOUBLE)
        |           / CAST(max(g) AS DOUBLE)))), 6) END AS jackknife_se
        |FROM reps""".stripMargin,
  )
}
