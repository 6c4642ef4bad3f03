package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 third wave: dynamic partition pruning (the runtime partition
  * skip that static pruning can't express), linear gap interpolation
  * (the resample family's second fill strategy), the Herfindahl–
  * Hirschman concentration index, and per-dimension embedding
  * standardization (the z-score featurization step).
  *
  * Scale notes:
  *  - DPP: the fact side is a hive-partitioned layout; the pruning
  *    values exist only at RUNTIME (a HAVING over the dim), so static
  *    partition pruning can't apply — Spark's DynamicPartitionPruning
  *    inserts a dynamicpruning#N subquery into the fact scan's
  *    PartitionFilters and only the matching directories are read.
  *    At 100 TB this is the difference between scanning 7 years and 2.
  *    The plan shape is asserted in Analytics4Spec.
  *  - Interpolation mirrors q_time_resample's single-scan checkpointed
  *    hourly aggregate + per-user-bounded grid explode; the
  *    prev/next-anchor search is two IGNORE NULLS window passes over
  *    the same per-user ordering (one exchange).
  *  - HHI is one exact-DECIMAL moment pass (Σrev², (Σrev)² — rev² sums
  *    overflow BIGINT, so the squares route through DECIMAL(38,0)).
  *  - Standardization: per-dim moment table is 64 rows → broadcast
  *    back over the exploded stream; map-only otherwise. */
object Analytics4 {

  /** Dynamic partition pruning: join the hive-partitioned orders copy
    * against a runtime-determined year subset (years whose order count
    * clears a threshold — unknowable at plan time), aggregate revenue
    * per status. Spark plants a dynamicpruning subquery filter on the
    * partition column so only matching year directories are scanned. */
  private def qJoinDpp(s: SparkSession, d: String): DataFrame = {
    val dir = s"/root/repo/target/qtmp/orders_hive_${math.abs(d.hashCode)}"
    if (!pathExists(s"$dir/_SUCCESS")) {
      t(s, d, "orders").withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    }
    // runtime dim: the FULL years — those with >= 80% of the busiest
    // year's order count (partial boundary years fall below). The
    // threshold rides in a SCALAR SUBQUERY so the >= comparison stays a
    // Filter node — Spark's PartitionPruning rule requires a selective
    // Filter on the pruning side, and a crossJoin'd threshold gets
    // fused into a join condition (no DPP), while an ORDER BY/LIMIT
    // dim has no filter at all.
    s.read.parquet(dir).createOrReplaceTempView("graft_orders_hive")
    t(s, d, "orders").createOrReplaceTempView("orders")
    s.sql(
      """WITH yc AS (SELECT year(o_orderdate) AS y, count(*) AS n_orders
        |            FROM orders GROUP BY 1)
        |SELECT /*+ BROADCAST(dim) */ o_orderstatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM graft_orders_hive f
        |JOIN (SELECT y FROM yc
        |      WHERE n_orders * 10 >= (SELECT max(n_orders) * 8 FROM yc))
        |  dim ON f.o_year = dim.y
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** Hourly gap LINEAR interpolation per user (the companion to
    * q_time_resample's forward-fill): missing hours get
    * prev + (next − prev) · (t − t_prev)/(t_next − t_prev) between the
    * nearest observed anchors; leading/trailing gaps fall back to the
    * single available anchor. Anchor search = one backward and one
    * forward IGNORE NULLS pass over the same per-user ordering. */
  private def qTimeInterpolate(s: SparkSession, d: String): DataFrame = {
    // Values ride as BIGINT ten-thousandths so the interpolated value is
    // ONE division of two exact integers — engines' ROUND-on-double tie
    // behavior differs (Spark shortest-repr HALF_UP vs DuckDB's
    // multiply-rint), so no post-rounding is applied anywhere.
    val agg = events(s, d)
      .select(col("user_id"), expr("us div 3600000000").as("hr"),
        col("value").cast("decimal(18,4)").as("v"))
      .groupBy(col("user_id"), col("hr"))
      .agg(expr("CAST(sum(v) * 10000 AS BIGINT)").as("vi"))
      .localCheckpoint(true)
    val grid = agg.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hr"))
    val back = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(agg, Seq("user_id", "hr"), "left")
      .withColumn("pv", last(col("vi"), ignoreNulls = true).over(back))
      .withColumn("ph", last(when(col("vi").isNotNull, col("hr")),
        ignoreNulls = true).over(back))
      .withColumn("nv", first(col("vi"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(when(col("vi").isNotNull, col("hr")),
        ignoreNulls = true).over(fwd))
      .select(col("user_id"), col("hr"), col("vi").isNull.as("is_gap"),
        expr("""CASE
               |  WHEN vi IS NOT NULL THEN CAST(vi AS DOUBLE) / 10000.0
               |  WHEN ph IS NULL THEN CAST(nv AS DOUBLE) / 10000.0
               |  WHEN nh IS NULL THEN CAST(pv AS DOUBLE) / 10000.0
               |  ELSE CAST(pv * (nh - ph) + (nv - pv) * (hr - ph)
               |            AS DOUBLE)
               |       / (CAST(nh - ph AS DOUBLE) * 10000.0)
               |END""".stripMargin).as("v_interp"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** Herfindahl–Hirschman concentration index of order revenue per
    * region: HHI = Σᵢ sᵢ² = Σrev² / (Σrev)² — the standard market-
    * concentration metric next to the Pareto share report. rev² sums
    * exceed BIGINT range, so squares are exact DECIMAL(38,0). */
  private def qAggHhi(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "orders")
      .select(col("o_custkey"), expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("rev"))
    rev
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("rev")).as("st"),
        sum(expr("CAST(rev AS DECIMAL(19,0)) * CAST(rev AS DECIMAL(19,0))"))
          .as("s2"))
      .selectExpr("r_name", "n_cust",
        """ROUND(CAST(s2 AS DOUBLE)
          | / (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6) AS hhi"""
          .stripMargin)
      .orderBy(col("r_name"))
  }

  /** Per-dimension z-score standardization of the embedding cloud (the
    * whitening-diagonal featurization step): x → (x − μᵢ)/σᵢ with
    * per-dim population moments. The 64-row moment table broadcasts
    * back over the exploded stream; sums are plain doubles because the
    * 6-dp round absorbs order noise (covariance discipline). */
  private def qEmbedStandardize(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).as("dim"),
        col("x").cast("double").as("x"))
    val stats = e.groupBy(col("dim"))
      .agg(avg(col("x")).as("mu"),
        avg(col("x") * col("x")).as("ex2"), count(lit(1)).as("n"))
      .select(col("dim"), col("mu"), col("ex2"))
    e.join(broadcast(stats), Seq("dim"))
      .filter(col("vec_id") < 10) // bounded presentation slice
      .select(col("vec_id"), col("dim"),
        expr("""ROUND((x - mu) / sqrt(ex2 - mu * mu), 6) + 0.0""")
          .as("z"))
      .orderBy(col("vec_id"), col("dim"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_join_dpp" -> (qJoinDpp _),
    "q_time_interpolate" -> (qTimeInterpolate _),
    "q_agg_hhi" -> (qAggHhi _),
    "q_embed_standardize" -> (qEmbedStandardize _),
  )

  val sql: Map[String, String] = Map(
    "q_join_dpp" ->
      """WITH fact AS (SELECT o_orderstatus, o_totalprice,
        |    CAST(year(o_orderdate) AS INT) AS o_year FROM orders),
        |yc AS (SELECT CAST(year(o_orderdate) AS INT) AS y,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |       FROM orders GROUP BY 1),
        |dim AS (SELECT y FROM yc
        |        CROSS JOIN (SELECT max(n_orders) AS mx FROM yc) m
        |        WHERE n_orders * 10 >= mx * 8)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM fact JOIN dim ON fact.o_year = dim.y
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_time_interpolate" ->
      """WITH agg AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
        |      AS vi
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(range(h0, h1 + 1)) AS hr
        |  FROM (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |        FROM agg GROUP BY user_id) b),
        |w AS (
        |  SELECT g.user_id, g.hr, a.vi,
        |    last_value(a.vi IGNORE NULLS) OVER bk AS pv,
        |    last_value(CASE WHEN a.vi IS NOT NULL THEN g.hr END
        |      IGNORE NULLS) OVER bk AS ph,
        |    first_value(a.vi IGNORE NULLS) OVER fw AS nv,
        |    first_value(CASE WHEN a.vi IS NOT NULL THEN g.hr END
        |      IGNORE NULLS) OVER fw AS nh
        |  FROM grid g LEFT JOIN agg a
        |    ON g.user_id = a.user_id AND g.hr = a.hr
        |  WINDOW bk AS (PARTITION BY g.user_id ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  fw AS (PARTITION BY g.user_id ORDER BY g.hr
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, hr, vi IS NULL AS is_gap,
        |  CASE
        |    WHEN vi IS NOT NULL THEN CAST(vi AS DOUBLE) / 10000.0
        |    WHEN ph IS NULL THEN CAST(nv AS DOUBLE) / 10000.0
        |    WHEN nh IS NULL THEN CAST(pv AS DOUBLE) / 10000.0
        |    ELSE CAST(pv * (nh - ph) + (nv - pv) * (hr - ph)
        |              AS DOUBLE)
        |         / (CAST(nh - ph AS DOUBLE) * 10000.0)
        |  END AS v_interp
        |FROM w ORDER BY user_id, hr""".stripMargin,
    "q_agg_hhi" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY o_custkey),
        |m AS (
        |  SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(rev.rev) AS BIGINT) AS st,
        |    sum(CAST(rev.rev AS DECIMAL(19,0))
        |        * CAST(rev.rev AS DECIMAL(19,0))) AS s2
        |  FROM rev
        |  JOIN customer cu ON rev.o_custkey = cu.c_custkey
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY r.r_name)
        |SELECT r_name, n_cust,
        |  ROUND(CAST(s2 AS DOUBLE)
        |   / (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6) AS hhi
        |FROM m ORDER BY r_name""".stripMargin,
    "q_embed_standardize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(i AS INT) AS dim,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
        |stats AS (
        |  SELECT dim, avg(x) AS mu, avg(x * x) AS ex2
        |  FROM e GROUP BY dim)
        |SELECT e.vec_id, e.dim,
        |  ROUND((e.x - mu) / sqrt(ex2 - mu * mu), 6) + 0.0 AS z
        |FROM e JOIN stats ON e.dim = stats.dim
        |WHERE e.vec_id < 10
        |ORDER BY e.vec_id, e.dim""".stripMargin,
  )
}
