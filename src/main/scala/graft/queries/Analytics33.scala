package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirty-third wave: price elasticity of demand (log-log OLS
  * per brand — the econometrics read on the catalog, distinct from
  * q_agg_ols's linear fit by the model, the dimension join, and the
  * log-transform discipline) and the per-column data profile (null /
  * distinct / extremes — the first report any data tool prints).
  *
  * Scale notes:
  *  - Elasticity joins the fact rows to the part dimension broadcast,
  *    then collapses to per-brand exact moment rows; the per-row
  *    ln-products (the only engine-order-sensitive step) are
  *    round-9dp + DECIMAL-summed.
  *  - Profile: ONE pass computes every column's null count, distinct
  *    estimate-free exact count, and extremes via a shared-scan
  *    aggregate — no per-column jobs. */
object Analytics33 {

  /** Log-log OLS elasticity of quantity on price per part brand:
    * ε = slope of ln(qty) ~ ln(price). */
  private def qAggElasticity(s: SparkSession, d: String): DataFrame = {
    val rows = t(s, d, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .join(broadcast(t(s, d, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))),
        Seq("l_partkey"))
      .select(col("p_brand"),
        expr("CAST(ROUND(ln(l_extendedprice), 9) AS DECIMAL(18,9))").as("x"),
        expr("CAST(ROUND(ln(l_quantity), 9) AS DECIMAL(18,9))").as("y"))
    rows.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr("CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))")).as("sxy"),
        sum(expr("CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))")).as("sxx"))
      .withColumn("den", dbl(col("n")) * dbl(col("sxx"))
        - dbl(col("sx")) * dbl(col("sx")))
      .select(col("p_brand"), col("n"),
        when(col("den") > 0, round(
          (dbl(col("n")) * dbl(col("sxy"))
            - dbl(col("sx")) * dbl(col("sy"))) / col("den"), 6))
          .as("elasticity"))
      .orderBy(col("p_brand"))
  }

  /** One-pass per-column profile of the events table: nulls, exact
    * distincts, min/max (stringified for the mixed-type report). */
  private def qQualityProfile(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val agg = ev.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("null_et"),
      countDistinct(col("event_type")).as("dist_et"),
      min(col("event_type")).as("min_et"), max(col("event_type")).as("max_et"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_u"),
      countDistinct(col("user_id")).as("dist_u"),
      min(col("user_id")).cast("string").as("min_u"),
      max(col("user_id")).cast("string").as("max_u"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_v"),
      countDistinct(col("value")).as("dist_v"),
      min(col("value")).cast("string").as("min_v"),
      max(col("value")).cast("string").as("max_v"))
    agg.selectExpr(
      """stack(3,
        |  'event_type', n_rows, null_et, dist_et, min_et, max_et,
        |  'user_id',    n_rows, null_u,  dist_u,  min_u,  max_u,
        |  'value',      n_rows, null_v,  dist_v,  min_v,  max_v)
        |AS (column_name, n_rows, n_null, n_distinct, min_str, max_str)
        |""".stripMargin)
      .orderBy(col("column_name"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_elasticity" -> (qAggElasticity _),
    "q_quality_profile" -> (qQualityProfile _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_elasticity" ->
      """WITH rows_ AS (
        |  SELECT p.p_brand,
        |    CAST(ROUND(ln(l.l_extendedprice), 9) AS DECIMAL(18,9)) AS x,
        |    CAST(ROUND(ln(l.l_quantity), 9) AS DECIMAL(18,9)) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
        |m AS (
        |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DECIMAL(38,9)) AS sx,
        |    CAST(sum(y) AS DECIMAL(38,9)) AS sy,
        |    CAST(sum(CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 9)
        |      AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS sxy,
        |    CAST(sum(CAST(ROUND(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
        |      AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS sxx
        |  FROM rows_ GROUP BY p_brand)
        |SELECT p_brand, n,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 THEN
        |    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        |  END AS elasticity
        |FROM m ORDER BY p_brand""".stripMargin,
    "q_quality_profile" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS null_et,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS dist_et,
        |    min(event_type) AS min_et, max(event_type) AS max_et,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS null_u,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS dist_u,
        |    CAST(min(user_id) AS VARCHAR) AS min_u,
        |    CAST(max(user_id) AS VARCHAR) AS max_u,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS null_v,
        |    CAST(count(DISTINCT value) AS BIGINT) AS dist_v,
        |    CAST(min(value) AS VARCHAR) AS min_v,
        |    CAST(max(value) AS VARCHAR) AS max_v
        |  FROM events)
        |SELECT 'event_type' AS column_name, n_rows, null_et AS n_null,
        |  dist_et AS n_distinct, min_et AS min_str, max_et AS max_str
        |FROM a
        |UNION ALL
        |SELECT 'user_id', n_rows, null_u, dist_u, min_u, max_u FROM a
        |UNION ALL
        |SELECT 'value', n_rows, null_v, dist_v, min_v, max_v FROM a
        |ORDER BY column_name""".stripMargin,
  )
}
