package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 sixth wave: deterministic Poisson-bootstrap confidence
  * intervals (the distributed-bootstrap standard), CUSUM changepoint
  * location on the event stream, and degree assortativity of the
  * co-purchase graph — uncertainty quantification, drift localization,
  * and graph mixing structure.
  *
  * Scale notes:
  *  - The Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
  *    for Massive Data Streams", Google 2012) is THE bootstrap that
  *    distributes: instead of resampling n rows with replacement
  *    (impossible without global coordination), each row gets an
  *    independent Poisson(1) weight per replica — one map-side explode
  *    by B=32, one partial-agg'd shuffle to (group, replica) means,
  *    and a 32-row-per-group percentile finish. Weights derive from
  *    md5(row-key, replica) against PRECOMPUTED integer inverse-CDF
  *    thresholds — deterministic and engine-portable.
  *  - CUSUM rides the integer lattice: D_t = T·(running Σc) − t·(total)
  *    is the exactly-scaled cumulative deviation (×T avoids the
  *    rational mean), so the argmax changepoint is exact integer math;
  *    one hour-ordered window per type over the HOURLY table.
  *  - Assortativity is one exact-BIGINT moment pass over the symmetric
  *    edge list (degrees bounded by the support-pruned graph) with the
  *    q_agg_corr double finish. */
object Analytics7 {

  /** Poisson(1) inverse CDF over a 24-bit md5-derived uniform:
    * thresholds are ⌊16777216·P(X≤k)⌋ for k=0..5 (then clamp). */
  private val poissonW =
    """CASE WHEN h < 6171992 THEN 0 WHEN h < 12343985 THEN 1
      | WHEN h < 15429982 THEN 2 WHEN h < 16458647 THEN 3
      | WHEN h < 16715813 THEN 4 WHEN h < 16767247 THEN 5
      | ELSE 6 END""".stripMargin

  /** Bootstrap 90% CI (B=20 Poisson replicas — the textbook minimum
    * for a 5%/95% percentile CI — via percentile_disc) for the mean of
    * lineitem quantity per return flag, next to the full-sample point
    * estimate. ONE md5 yields FIVE independent 24-bit uniforms (128
    * bits = 5×24 + change), so 20 replicas cost 4 md5s per row instead
    * of 20 — the hash count, not the explode, is what dominates a
    * ×B resampling pass. Identical rows share a weight key (lineitem
    * has no unique key) — documented, deterministic. */
  private def qAggBootstrap(s: SparkSession, d: String): DataFrame = {
    // x rides as BIGINT ten-thousandths (12M-row BIGINT sums, not
    // DECIMAL); ONE Generate: the 4 md5 strings precompute into an
    // array, then a single posexplode emits the 20 (replica, uniform)
    // pairs — two stacked explodes each breaking codegen cost ~2× this.
    val li = t(s, d, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)")
          .as("xi"),
        expr("""concat_ws('_', l_orderkey, l_linenumber, l_partkey,
               |  l_suppkey, CAST(l_quantity AS DECIMAL(18,4)))"""
          .stripMargin).as("rk"))
    // Shape choice, MEASURED at sf0.1: (a) md5-per-(row,replica) 13 s;
    // (b) hash folded into a generator expression 15 s (CollapseProject
    // re-evaluates the md5 array PER OUTPUT ELEMENT); (c) 20 weight
    // COLUMNS + 40-sum wide aggregation 13 s (the generated code blows
    // past the JIT-friendly size and falls off codegen); (d) THIS shape
    // 7.5 s — two trivial int-sequence Generates with the md5 and the
    // hex-slice parse in codegen'd projections between them, 4 md5s
    // per row.
    val reps = li
      // spread the ×B hash/explode stage across the cluster BEFORE the
      // generate: the scan's partition count is the parquet file
      // layout (ONE file locally → one task was computing all 4·n
      // md5s; idle cpu/wall ≈ 2.3 on 32 cores). Only the narrow
      // (flag, xi, rk) rows shuffle — trivial next to the hashing.
      .repartition(s.sessionState.conf.numShufflePartitions)
      .select(col("l_returnflag"), col("xi"), col("rk"),
        explode(expr("sequence(0, 3)")).as("m"))
      .withColumn("hx", expr("md5(concat(rk, '#', m))"))
      .select(col("l_returnflag"), col("xi"), col("m"), col("hx"),
        explode(expr("sequence(0, 4)")).as("k"))
      .withColumn("h", expr(
        "cast(conv(substring(hx, k * 6 + 1, 6), 16, 10) as bigint)"))
      .withColumn("b", col("m") * 5 + col("k"))
      .withColumn("w", expr(poissonW))
      .groupBy(col("l_returnflag"), col("b"))
      .agg(sum(expr("xi * w")).as("swx"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("l_returnflag"),
        expr("CAST(swx AS DOUBLE) / (CAST(sw AS DOUBLE) * 10000.0)")
          .as("m"))
    val point = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("sx"))
      .select(col("l_returnflag"), col("n"),
        expr("CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)")
          .as("mean"))
    reps.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_replicas"),
        expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY m)").as("ci_lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY m)").as("ci_hi"))
      .join(point, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"), col("mean"),
        col("n_replicas"), col("ci_lo"), col("ci_hi"))
      .orderBy(col("l_returnflag"))
  }

  /** CUSUM changepoint per event type: the hour t maximizing
    * |T·Σ_{i≤t}cᵢ − t·C| (the ×T-scaled cumulative deviation from a
    * flat rate; C = total events, T = observed hours). Exact integers
    * end to end; the normalized statistic is one final division. */
  private def qTimeCusum(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(desc("dabs"), col("hr"))
    hourly
      // two projections → two Window nodes (one per spec); withColumn
      // chains would leave four
      .select(col("*"),
        sum(col("c")).over(wRun).as("run"),
        count(lit(1)).over(wRun).as("tidx"))
      .select(col("*"),
        sum(col("c")).over(wAll).as("tot"),
        count(lit(1)).over(wAll).as("nh"))
      .withColumn("dabs", abs(col("nh") * col("run")
        - col("tidx") * col("tot")))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hr").as("changepoint_hr"),
        col("dabs"),
        expr("CAST(dabs AS DOUBLE) / CAST(nh AS DOUBLE)").as("cusum_stat"))
      .orderBy(col("event_type"))
  }

  /** Degree assortativity of the support-≥2 co-purchase graph: Pearson
    * correlation of (deg(u), deg(v)) over the symmetric edge list —
    * positive = hubs link hubs, negative = hub-and-spoke mixing. */
  private def qGraphAssortativity(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2) // materialized (Tables)
      .select(col("u"), col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("u"), col("deg").as("du"))
        .hint("shuffle_hash"), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv"))
        .hint("shuffle_hash"), Seq("v"))
      .agg(count(lit(1)).as("n"),
        sum(col("du")).as("sx"), sum(col("dv")).as("sy"),
        sum(col("du") * col("dv")).as("sxy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"))
      .selectExpr("n AS n_edges",
        """ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          | / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
          |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
          |AS assortativity""".stripMargin)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_bootstrap" -> (qAggBootstrap _),
    "q_time_cusum" -> (qTimeCusum _),
    "q_graph_assortativity" -> (qGraphAssortativity _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_bootstrap" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      AS xi,
        |    concat_ws('_', l_orderkey, l_linenumber, l_partkey,
        |      l_suppkey, CAST(l_quantity AS DECIMAL(18,4))) AS rk
        |  FROM lineitem),
        |reps AS (
        |  SELECT l_returnflag, b,
        |    CAST(sum(xi * w) AS DOUBLE)
        |      / (CAST(sum(w) AS DOUBLE) * 10000.0) AS m
        |  FROM (
        |    SELECT l_returnflag, xi,
        |      CASE WHEN h < 6171992 THEN 0 WHEN h < 12343985 THEN 1
        |       WHEN h < 15429982 THEN 2 WHEN h < 16458647 THEN 3
        |       WHEN h < 16715813 THEN 4 WHEN h < 16767247 THEN 5
        |       ELSE 6 END AS w, b
        |    FROM (
        |      SELECT l_returnflag, xi, mm.m * 5 + kk.k AS b,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split(
        |            substr(md5(concat(rk, '#', mm.m)),
        |                   CAST(kk.k * 6 + 1 AS INT), 6), ''),
        |            c -> CAST(strpos('0123456789abcdef', c) - 1
        |                 AS BIGINT))),
        |          (acc, v) -> acc * 16 + v) AS h
        |      FROM li
        |      CROSS JOIN (SELECT unnest(range(0, 4)) AS m) mm
        |      CROSS JOIN (SELECT unnest(range(0, 5)) AS k) kk
        |    ) z
        |  ) zz
        |  GROUP BY l_returnflag, b
        |  HAVING sum(w) > 0),
        |ci AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_replicas,
        |    quantile_disc(m, 0.05) AS ci_lo,
        |    quantile_disc(m, 0.95) AS ci_hi
        |  FROM reps GROUP BY l_returnflag),
        |pt AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xi) AS DOUBLE) / (CAST(count(*) AS DOUBLE)
        |      * 10000.0) AS mean
        |  FROM li GROUP BY l_returnflag)
        |SELECT ci.l_returnflag, pt.n, pt.mean, ci.n_replicas,
        |  ci.ci_lo, ci.ci_hi
        |FROM ci JOIN pt ON ci.l_returnflag = pt.l_returnflag
        |ORDER BY ci.l_returnflag""".stripMargin,
    "q_time_cusum" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hr,
        |    CAST(sum(c) OVER run AS BIGINT) AS run,
        |    CAST(count(*) OVER run AS BIGINT) AS tidx,
        |    CAST(sum(c) OVER alln AS BIGINT) AS tot,
        |    CAST(count(*) OVER alln AS BIGINT) AS nh
        |  FROM hourly
        |  WINDOW run AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  alln AS (PARTITION BY event_type)),
        |d AS (
        |  SELECT event_type, hr, nh,
        |    abs(nh * run - tidx * tot) AS dabs,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY abs(nh * run - tidx * tot) DESC, hr) AS rn
        |  FROM w)
        |SELECT event_type, hr AS changepoint_hr, dabs,
        |  CAST(dabs AS DOUBLE) / CAST(nh AS DOUBLE) AS cusum_stat
        |FROM d WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_graph_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(du.deg) AS BIGINT) AS sx,
        |    CAST(sum(dv.deg) AS BIGINT) AS sy,
        |    CAST(sum(du.deg * dv.deg) AS BIGINT) AS sxy,
        |    CAST(sum(du.deg * du.deg) AS BIGINT) AS sxx,
        |    CAST(sum(dv.deg * dv.deg) AS BIGINT) AS syy
        |  FROM sym JOIN deg du ON sym.u = du.u
        |           JOIN deg dv ON sym.v = dv.u)
        |SELECT n AS n_edges,
        |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |   / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  AS assortativity
        |FROM m""".stripMargin,
  )
}
