package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 fourth wave: decomposition & drift guards —
  *
  *  - q_time_stl: STL-lite seasonal decomposition of each type's daily
  *    revenue — trend = centered 7-day moving average, seasonal = the
  *    recentred day-of-week means of the detrended series, residual =
  *    what's left; reported as the per-(type, dow) seasonal index
  *    table with each type's variance ledger and seasonal strength
  *    (the component table q_time_season_strength's single statistic
  *    summarizes);
  *  - q_quality_drift_matrix: the multi-feature drift report between
  *    the first and second calendar halves of the stream — PSI over
  *    fixed-width value bins, PSI over event-type categories, and the
  *    exact KS distance off the integer value grid, one row per
  *    feature. The "did anything move between these two data
  *    generations" gate a pipeline runs before retraining.
  *
  * Scale: both collapse the stream to calendar-/category-bounded
  * grids first (daily table, 20 value bins, type table, integer value
  * grid); windows are type-partitioned; the half-split boundary is a
  * 1-row broadcast. Round-then-DECIMAL sums everywhere. */
object Analytics77 {

  /** STL-lite per type: (event_type, dow, seasonal, n_obs) plus the
    * type's variance ledger. */
  private def qTimeStl(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("et"), col("day")).agg(sum(col("vv")).as("v"))
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val detr = g
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("ws", sum(col("v")).over(w))
      .filter(col("wn") === 7) // full centered windows only
      .withColumn("trend", expr("ROUND(CAST(ws AS DOUBLE) / 7.0, 6)"))
      .withColumn("detr", expr("ROUND(CAST(v AS DOUBLE) - trend, 6)"))
      .withColumn("dow", expr("day % 7"))
    val dowMean = detr.groupBy(col("et"), col("dow"))
      .agg(count(lit(1)).as("n_obs"),
        sum(expr("CAST(detr AS DECIMAL(28,6))")).as("sd"))
      .withColumn("raw", expr("CAST(sd AS DOUBLE) / CAST(n_obs AS DOUBLE)"))
    val center = dowMean.groupBy(col("et"))
      .agg(sum(expr("CAST(ROUND(raw, 6) AS DECIMAL(28,6))")).as("sr"),
        count(lit(1)).as("nd"))
      .select(col("et"), expr(
        "CAST(sr AS DOUBLE) / CAST(nd AS DOUBLE)").as("c"))
    val seas = dowMean.join(broadcast(center), Seq("et"))
      .withColumn("seasonal", expr("ROUND(raw - CAST(c AS DOUBLE), 6)"))
      .select(col("et"), col("dow"), col("n_obs"), col("seasonal"))
    val resid = detr.join(broadcast(seas.select(col("et"), col("dow"),
        col("seasonal"))), Seq("et", "dow"))
      .withColumn("resid", expr("ROUND(detr - seasonal, 6)"))
    val ledger = resid.groupBy(col("et"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(detr * detr, 4) AS DECIMAL(38,4))")).as("sdd"),
        sum(expr("CAST(ROUND(resid * resid, 4) AS DECIMAL(38,4))")).as("srr"))
      .withColumn("var_detr", expr(
        "ROUND(CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE), 6)"))
      .withColumn("var_resid", expr(
        "ROUND(CAST(srr AS DOUBLE) / CAST(n AS DOUBLE), 6)"))
      .withColumn("strength", expr(
        "ROUND(greatest(0.0, 1.0 - CAST(srr AS DOUBLE) " +
          "/ CAST(sdd AS DOUBLE)), 6)"))
      .select(col("et"), col("var_detr"), col("var_resid"), col("strength"))
    seas.join(broadcast(ledger), Seq("et"))
      .select(col("et").as("event_type"), col("dow"), col("n_obs"),
        col("seasonal"), col("var_detr"), col("var_resid"), col("strength"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Drift matrix between calendar halves: PSI on fixed value bins,
    * PSI on event-type shares, exact KS off the integer value grid. */
  private def qQualityDriftMatrix(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(expr("us div 86400000000").as("day"), col("event_type"),
        col("value"))
    val mid = e.agg(((min(col("day")) + max(col("day")) + 1) / 2)
      .cast("long").as("mid"))
    val tagged = e.crossJoin(broadcast(mid))
      .withColumn("half", when(col("day") < col("mid"), "a").otherwise("b"))
      .localCheckpoint(true)
    def psiOver(keyCol: org.apache.spark.sql.Column,
        feature: String): DataFrame = {
      val grid = tagged.groupBy(keyCol.as("k"), col("half"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("k"))
        .agg(sum(when(col("half") === "a", col("c")).otherwise(0L)).as("ca"),
          sum(when(col("half") === "b", col("c")).otherwise(0L)).as("cb"))
      val tot = grid.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      grid.crossJoin(broadcast(tot))
        // add-half smoothing keeps empty-cell logs finite in both engines
        .withColumn("pa", expr(
          "(CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5)"))
        .withColumn("pb", expr(
          "(CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5)"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(expr("CAST(ROUND((pa - pb) * ln(pa / pb), 9) " +
            "AS DECIMAL(28,9))")).as("psi9"))
        .select(lit(feature).as("feature"), col("n_a"), col("n_b"),
          expr("ROUND(CAST(psi9 AS DOUBLE), 6)").as("psi"))
    }
    val psiValue = psiOver(
      expr("least(CAST(floor(value / 10.0) AS BIGINT), 19L)"), "value_bins")
    val psiType = psiOver(col("event_type"), "event_type")
    // exact KS on the integer-scaled value grid (4-dp micro-units)
    val vg = tagged.groupBy(expr("CAST(ROUND(value * 10000) AS BIGINT)")
        .as("v"), col("half"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("v"))
      .agg(sum(when(col("half") === "a", col("c")).otherwise(0L)).as("ca"),
        sum(when(col("half") === "b", col("c")).otherwise(0L)).as("cb"))
    val vtot = vg.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val wv = Window.orderBy(col("v"))
    val ks = vg
      .withColumn("cca", sum(col("ca")).over(wv))
      .withColumn("ccb", sum(col("cb")).over(wv))
      .crossJoin(broadcast(vtot))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(expr("abs(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE) " +
          "- CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE))")).as("ksr"))
      .select(lit("value_ks").as("feature"), col("n_a"), col("n_b"),
        expr("ROUND(ksr, 6)").as("psi"))
    psiValue.unionAll(psiType).unionAll(ks)
      .withColumnRenamed("psi", "stat")
      .orderBy(col("feature"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_stl" -> (qTimeStl _),
    "q_quality_drift_matrix" -> (qQualityDriftMatrix _),
  )

  val sql: Map[String, String] = Map(
    "q_time_stl" ->
      """WITH g AS (
        |  SELECT event_type AS et,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      AS BIGINT) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY 1, 2),
        |detr AS (
        |  SELECT et, day, day % 7 AS dow,
        |    ROUND(CAST(v AS DOUBLE)
        |      - ROUND(CAST(ws AS DOUBLE) / 7.0, 6), 6) AS detr
        |  FROM (
        |    SELECT et, day, v,
        |      count(*) OVER w AS wn, sum(v) OVER w AS ws
        |    FROM g
        |    WINDOW w AS (PARTITION BY et ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) z
        |  WHERE wn = 7),
        |dowmean AS (
        |  SELECT et, dow, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(CAST(detr AS DECIMAL(28,6))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS raw
        |  FROM detr GROUP BY et, dow),
        |center AS (
        |  SELECT et,
        |    CAST(sum(CAST(ROUND(raw, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS c
        |  FROM dowmean GROUP BY et),
        |seas AS (
        |  SELECT d.et, d.dow, d.n_obs,
        |    ROUND(d.raw - c.c, 6) AS seasonal
        |  FROM dowmean d JOIN center c ON d.et = c.et),
        |resid AS (
        |  SELECT detr.et,
        |    ROUND(detr.detr - s.seasonal, 6) AS resid, detr.detr
        |  FROM detr JOIN seas s ON detr.et = s.et AND detr.dow = s.dow),
        |ledger AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(detr * detr, 4) AS DECIMAL(38,4))) AS sdd,
        |    sum(CAST(ROUND(resid * resid, 4) AS DECIMAL(38,4))) AS srr
        |  FROM resid GROUP BY et)
        |SELECT s.et AS event_type, s.dow, s.n_obs, s.seasonal,
        |  ROUND(CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS var_detr,
        |  ROUND(CAST(srr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS var_resid,
        |  ROUND(greatest(0.0, 1.0 - CAST(srr AS DOUBLE)
        |    / CAST(sdd AS DOUBLE)), 6) AS strength
        |FROM seas s JOIN ledger l ON s.et = l.et
        |ORDER BY event_type, dow""".stripMargin,
    "q_quality_drift_matrix" ->
      """WITH e AS (
        |  SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |      AS BIGINT) AS day,
        |    event_type, value
        |  FROM events),
        |mid AS (
        |  SELECT CAST((min(day) + max(day) + 1) // 2 AS BIGINT) AS mid
        |  FROM e),
        |tagged AS (
        |  SELECT e.*, CASE WHEN day < mid THEN 'a' ELSE 'b' END AS half
        |  FROM e CROSS JOIN mid),
        |vb AS (
        |  SELECT least(CAST(floor(value / 10.0) AS BIGINT), 19) AS k,
        |    sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM tagged GROUP BY 1),
        |vbt AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM vb),
        |psi_v AS (
        |  SELECT 'value_bins' AS feature,
        |    CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |    ROUND(CAST(sum(CAST(ROUND(
        |      ((CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5)
        |       - (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5))
        |      * ln(((CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5))
        |        / ((CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5))),
        |      9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS stat
        |  FROM vb CROSS JOIN vbt),
        |tb AS (
        |  SELECT event_type AS k,
        |    sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM tagged GROUP BY 1),
        |tbt AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM tb),
        |psi_t AS (
        |  SELECT 'event_type' AS feature,
        |    CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |    ROUND(CAST(sum(CAST(ROUND(
        |      ((CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5)
        |       - (CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5))
        |      * ln(((CAST(ca AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 0.5))
        |        / ((CAST(cb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 0.5))),
        |      9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS stat
        |  FROM tb CROSS JOIN tbt),
        |vg AS (
        |  SELECT CAST(ROUND(value * 10000) AS BIGINT) AS v,
        |    sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS ca,
        |    sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS cb
        |  FROM tagged GROUP BY 1),
        |vgt AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM vg),
        |ks AS (
        |  SELECT 'value_ks' AS feature,
        |    CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |    ROUND(max(abs(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE)
        |      - CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS stat
        |  FROM (
        |    SELECT v, sum(ca) OVER (ORDER BY v) AS cca,
        |      sum(cb) OVER (ORDER BY v) AS ccb
        |    FROM vg) z CROSS JOIN vgt)
        |SELECT * FROM psi_v
        |UNION ALL SELECT * FROM psi_t
        |UNION ALL SELECT * FROM ks
        |ORDER BY feature""".stripMargin,
  )
}
