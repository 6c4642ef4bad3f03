package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 seventh wave: concentration / inequality diagnostics and
  * soft deduplication —
  *
  *  - q_agg_lorenz: the decile Lorenz table of customer spend
  *    (cumulative population share vs cumulative value share) — the
  *    curve behind every Gini number (q_agg_gini reports the scalar;
  *    this is the distribution a dashboard plots);
  *  - q_agg_hoover: the Hoover / Robin Hood index — the share of
  *    total value that would have to move to equalize. Computed
  *    EXACTLY: Σ|n·xᵢ − T| in DECIMAL, one division at the end;
  *  - q_agg_atkinson: Atkinson inequality A(ε=1) = 1 − geomean/mean —
  *    the welfare-weighted inequality measure (more sensitive to the
  *    bottom than Gini);
  *  - q_dedup_softweight: soft deduplication — instead of DROPPING
  *    duplicates (q_dedup_exact), each document is weighted 1/|its
  *    exact-dup cluster| so every cluster contributes unit mass; the
  *    per-source effective-size report (n_docs vs Σ weights) is the
  *    "how much of this source is repetition" number a data-mixing
  *    recipe consumes. The modern alternative to hard dedup when
  *    repetition carries signal.
  *
  * Inequality ops read customer spend (one orders scan → per-customer
  * DECIMAL totals); the Lorenz ranking uses a total tie-break
  * (spend, custkey) so decile assignment is deterministic. ln terms
  * ride the 12dp DECIMAL lattice; weights the same. Scale: everything
  * collapses to per-customer / per-cluster aggregates first; the only
  * global window rides the bounded per-customer table. */
object Analytics89 {

  private def spend(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .select(col("o_custkey"), dec(col("o_totalprice")).as("x"))
      .groupBy(col("o_custkey")).agg(sum(col("x")).as("x"))

  /** Decile Lorenz table of customer spend. */
  private def qAggLorenz(s: SparkSession, d: String): DataFrame = {
    val sp = spend(s, d)
    val wOrd = Window.orderBy(col("x"), col("o_custkey"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val tot = sp.agg(count(lit(1)).as("n"), sum(col("x")).as("tv"))
    sp.withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("cv", sum(col("x")).over(wCum))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rn - 1) * 10) div n + 1"))
      .groupBy(col("decile"))
      .agg(max(col("rn")).as("mrn"), max(col("cv")).as("mcv"),
        max(col("n")).as("n"), max(col("tv")).as("tv"))
      .select(col("decile"),
        round(dbl(col("mrn")) / dbl(col("n")), 6).as("pop_share"),
        when(dbl(col("tv")) =!= 0.0,
          round(dbl(col("mcv")) / dbl(col("tv")), 6))
          .as("cum_value_share"))
      .orderBy(col("decile"))
  }

  /** Hoover index: Σ|n·xᵢ − T| / (2·n·T), exact to the last division. */
  private def qAggHoover(s: SparkSession, d: String): DataFrame = {
    val sp = spend(s, d)
    val tot = sp.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("decimal(28,4)").as("tv"))
    sp.crossJoin(broadcast(tot))
      .select(col("n"), col("tv"),
        abs(col("n").cast("decimal(28,0)") * col("x").cast("decimal(28,4)")
          - col("tv")).as("dev"))
      .groupBy(col("n"), col("tv"))
      .agg(sum(col("dev")).as("sdev"))
      .select(col("n").as("n_customers"),
        when(dbl(col("tv")) > 0, round(dbl(col("sdev"))
          / (lit(2.0) * dbl(col("n")) * dbl(col("tv"))), 6))
          .as("hoover"))
  }

  /** Atkinson A(1) = 1 − exp(mean ln x)/mean x over positive spends. */
  private def qAggAtkinson(s: SparkSession, d: String): DataFrame =
    spend(s, d).filter(dbl(col("x")) > 0)
      .select(col("x"),
        expr("CAST(ROUND(ln(CAST(x AS DOUBLE)), 12) AS DECIMAL(30,12))")
          .as("lx"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("lx")).as("slx"))
      .select(col("n").as("n_customers"),
        round(dbl(col("sx")) / dbl(col("n")), 4).as("mean_spend"),
        when(dbl(col("sx")) > 0, round(lit(1.0)
          - expr("exp(CAST(slx AS DOUBLE) / CAST(n AS DOUBLE))")
          / (dbl(col("sx")) / dbl(col("n"))), 6)).as("atkinson_1"))

  /** Soft dedup: per-source effective size under 1/cluster weights. */
  private def qDedupSoftweight(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        lower(trim(col("text"))).as("k"))
    val sizes = docs.groupBy(col("k")).agg(count(lit(1)).as("sz"))
    docs.join(sizes.hint("shuffle_hash"), Seq("k"))
      .select(col("source"),
        expr("CAST(ROUND(1.0 / CAST(sz AS DOUBLE), 12)" +
          " AS DECIMAL(18,12))").as("w"),
        when(col("sz") > 1, 1L).otherwise(0L).as("in_cluster"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("eff"),
        sum(col("in_cluster")).as("n_in_dup_cluster"))
      .select(col("source"), col("n_docs"), col("n_in_dup_cluster"),
        round(dbl(col("eff")), 6).as("effective_docs"),
        round(lit(1.0) - dbl(col("eff")) / dbl(col("n_docs")), 6)
          .as("dedup_mass"))
      .orderBy(col("source"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_lorenz" -> (qAggLorenz _),
    "q_agg_hoover" -> (qAggHoover _),
    "q_agg_atkinson" -> (qAggAtkinson _),
    "q_dedup_softweight" -> (qDedupSoftweight _),
  )

  private val spendSql =
    """WITH sp AS (
      |  SELECT o_custkey,
      |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS x
      |  FROM orders GROUP BY o_custkey),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_lorenz" -> (spendSql +
      """r AS (
        |  SELECT x, o_custkey,
        |    CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT)
        |      AS rn,
        |    sum(x) OVER (ORDER BY x, o_custkey
        |      ROWS UNBOUNDED PRECEDING) AS cv,
        |    CAST(count(*) OVER () AS BIGINT) AS n,
        |    sum(x) OVER () AS tv
        |  FROM sp)
        |SELECT ((rn - 1) * 10) // n + 1 AS decile,
        |  ROUND(CAST(max(rn) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        |    AS pop_share,
        |  CASE WHEN CAST(max(tv) AS DOUBLE) <> 0 THEN
        |    ROUND(CAST(max(cv) AS DOUBLE) / CAST(max(tv) AS DOUBLE), 6)
        |    END AS cum_value_share
        |FROM r GROUP BY 1 ORDER BY decile""".stripMargin),
    "q_agg_hoover" -> (spendSql +
      """tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DECIMAL(28,4)) AS tv
        |  FROM sp)
        |SELECT n AS n_customers,
        |  CASE WHEN CAST(tv AS DOUBLE) > 0 THEN
        |    ROUND(CAST(sum(abs(CAST(n AS DECIMAL(28,0))
        |        * CAST(x AS DECIMAL(28,4)) - tv)) AS DOUBLE)
        |      / (2.0 * CAST(n AS DOUBLE) * CAST(tv AS DOUBLE)), 6) END
        |    AS hoover
        |FROM sp, tot GROUP BY n, tv""".stripMargin),
    "q_agg_atkinson" -> (spendSql +
      """a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
        |    sum(CAST(ROUND(ln(CAST(x AS DOUBLE)), 12)
        |      AS DECIMAL(30,12))) AS slx
        |  FROM sp WHERE CAST(x AS DOUBLE) > 0)
        |SELECT n AS n_customers,
        |  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_spend,
        |  CASE WHEN CAST(sx AS DOUBLE) > 0 THEN
        |    ROUND(1.0 - exp(CAST(slx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) END
        |    AS atkinson_1
        |FROM a""".stripMargin),
    "q_dedup_softweight" ->
      """WITH docs AS (
        |  SELECT doc_id, source, lower(trim(text)) AS k FROM documents),
        |sizes AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS sz FROM docs GROUP BY k)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_in_dup_cluster,
        |  ROUND(CAST(sum(CAST(ROUND(1.0 / CAST(sz AS DOUBLE), 12)
        |    AS DECIMAL(18,12))) AS DOUBLE), 6) AS effective_docs,
        |  ROUND(1.0 - CAST(sum(CAST(ROUND(1.0 / CAST(sz AS DOUBLE), 12)
        |    AS DECIMAL(18,12))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS dedup_mass
        |FROM docs JOIN sizes USING (k)
        |GROUP BY source ORDER BY source""".stripMargin,
  )
}
