package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 twelfth wave: Hill estimator of the heavy-tail index over
  * order values — the "how heavy is the spend/latency tail" statistic
  * (α ≤ 2 means infinite variance: bootstrap CIs and mean-based
  * dashboards silently break) computed from the top-k order
  * statistics.
  *
  * Scale notes: the ONLY corpus-wide operation is a deterministic
  * global top-(k+1) with a total (value, key) order — Spark plans it
  * as TakeOrderedAndProject (per-partition heaps + one k-row merge),
  * never a full sort. Everything after runs on the 101-row table:
  * ln-ratio terms round to 9 dp and sum as DECIMAL (order-free), two
  * final IEEE divisions. */
object Analytics55 {

  /** Hill tail-index estimator (k = 100) on o_totalprice: ĥ = mean of
    * ln(x_(i)/x_(k+1)) over the top k, α̂ = 1/ĥ. */
  private def qAggHill(s: SparkSession, d: String): DataFrame = {
    val top = t(s, d, "orders")
      .select(col("o_orderkey").as("ok"), dbl(col("o_totalprice")).as("x"))
      .orderBy(col("x").desc, col("ok"))
      .limit(101)
    val w = Window.orderBy(col("x").desc, col("ok"))
    val ranked = top.withColumn("rn", row_number().over(w))
    val xk1 = ranked.filter(col("rn") === 101)
      .select(col("x").as("xk"))
    ranked.filter(col("rn") <= 100)
      .crossJoin(broadcast(xk1))
      .select(expr("CAST(ROUND(ln(x / xk), 9) AS DECIMAL(28,9))").as("t"),
        col("xk"))
      .groupBy(col("xk")).agg(count(lit(1)).as("k"), sum(col("t")).as("st"))
      .selectExpr("k", "ROUND(xk, 6) AS x_k1",
        "ROUND(CAST(st AS DOUBLE) / CAST(k AS DOUBLE), 6) AS hill",
        "CASE WHEN CAST(st AS DOUBLE) > 0 THEN " +
          "ROUND(CAST(k AS DOUBLE) / CAST(st AS DOUBLE), 6) END AS alpha")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_hill" -> (qAggHill _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_hill" ->
      """WITH top AS (
        |  SELECT o_orderkey AS ok, CAST(o_totalprice AS DOUBLE) AS x
        |  FROM orders ORDER BY x DESC, ok LIMIT 101),
        |ranked AS (
        |  SELECT x, ROW_NUMBER() OVER (ORDER BY x DESC, ok) AS rn
        |  FROM top),
        |xk1 AS (SELECT x AS xk FROM ranked WHERE rn = 101),
        |terms AS (
        |  SELECT CAST(ROUND(ln(x / xk), 9) AS DECIMAL(28,9)) AS t, xk
        |  FROM ranked CROSS JOIN xk1 WHERE rn <= 100)
        |SELECT CAST(count(*) AS BIGINT) AS k, ROUND(max(xk), 6) AS x_k1,
        |  ROUND(CAST(sum(t) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS hill,
        |  CASE WHEN CAST(sum(t) AS DOUBLE) > 0 THEN
        |    ROUND(CAST(count(*) AS DOUBLE)
        |      / CAST(sum(t) AS DOUBLE), 6) END AS alpha
        |FROM terms""".stripMargin,
  )
}
