package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 eighth wave: the stationarity/randomness completions of
  * the series-diagnostics family — three oracled operators over the
  * per-type daily value series:
  *
  *  - q_time_kpss: the KPSS level-stationarity test — the COMPLEMENT
  *    of q_time_adf (ADF's null is a unit root, KPSS's null is
  *    stationarity; a production drift monitor wants both sides).
  *    η = n⁻²ΣSₜ²/σ̂² with the Bartlett long-run variance at
  *    bandwidth l = ⌊4(n/100)^¼⌋. Everything rides an EXACT integer
  *    lattice: with ẽₜ = n·yₜ − Σy (BIGINT), both ΣS̃ₜ² and the
  *    Bartlett numerator G = γ̃₀(l+1) + 2Σⱼγ̃ⱼ(l+1−j) are exact
  *    DECIMAL sums — the weights' denominator (l+1) is factored out
  *    so no double enters before the single final division
  *    η = ΣS̃²·(l+1)/(n·G).
  *  - q_time_bartels: Bartels' rank von Neumann ratio — the
  *    rank-based serial-randomness test beside q_agg_runs (signs) and
  *    q_time_turningpoint (local extrema): RVN = Σ(Rₜ−Rₜ₊₁)²/
  *    Σ(Rₜ−R̄)² on tie-averaged midranks, computed wholly in the 2×
  *    integer rank space (the 4× scale cancels in the ratio), with
  *    the exact large-sample variance 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).
  *  - q_time_coxstuart: the Cox–Stuart sign trend test — pair the
  *    first half with the second half (middle dropped when odd),
  *    count rises vs falls; z continuity-corrected via D − sign(D)
  *    (the Mann–Kendall convention). The assumption-free quick answer
  *    before the heavier MK/seasonal-MK machinery.
  *
  * Determinism: all three are exact BIGINT/DECIMAL lattices to one
  * final division (the repo's signature discipline); the only doubles
  * are identical single-expression trees. Scale: the fact stream
  * collapses once to the calendar-bounded (type, day) grid; the KPSS
  * lag self-join is bounded by l ≤ 10 against a literal lag relation;
  * ranks ride per-type windows on the bounded day grid. */
object Analytics110 {

  /** (et, idx, y): exact daily value units (×10⁴) per event type,
    * idx = 1-based day order. */
  private def daily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
    events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("et"), col("day"))
      .agg(expr("CAST(sum(vv) * 10000 AS BIGINT)").as("y"))
      .withColumn("idx", row_number().over(w))
  }

  /** Lattice headroom (the kruskal/dunn convention): ẽ rides
    * DECIMAL(19,0) (|ẽ| ≲ 10¹³ at sf1) and the γ̃/g0 cells
    * DECIMAL(30,0) (≲ 4·10²⁸ at sf1) — exact through sf≈3; past that
    * the DECIMAL(30) cast is the first bound to widen. */
  private def qTimeKpss(s: SparkSession, d: String): DataFrame = {
    val byEt = Window.partitionBy(col("et"))
    val cum = Window.partitionBy(col("et")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = daily(s, d)
      .withColumn("n", count(lit(1)).over(byEt))
      .withColumn("sy", sum(col("y")).over(byEt))
      .withColumn("e", col("n") * col("y") - col("sy"))
      .withColumn("st", sum(col("e")).over(cum))
      .localCheckpoint(true)
    val perEt = base.groupBy(col("et"))
      .agg(max(col("n")).as("n"),
        sum(expr("CAST(st AS DECIMAL(19,0)) * CAST(st AS DECIMAL(19,0))"))
          .as("num"),
        sum(expr("CAST(e AS DECIMAL(19,0)) * CAST(e AS DECIMAL(19,0))"))
          .as("g0"))
      .withColumn("l", expr(
        "CAST(floor(4.0 * pow(CAST(n AS DOUBLE) / 100.0, 0.25)) AS BIGINT)"))
    val lags = s.range(1, 11).select(col("id").as("j"))
    val gj = base.select(col("et"), col("idx"), col("e"))
      .crossJoin(broadcast(lags))
      .withColumn("idx2", col("idx") + col("j"))
      .join(base.select(col("et"), col("idx").as("idx2"),
        col("e").as("e2")), Seq("et", "idx2"))
      .groupBy(col("et"), col("j"))
      .agg(sum(expr("CAST(e AS DECIMAL(19,0)) * CAST(e2 AS DECIMAL(19,0))"))
        .as("gj"))
    val wsum = gj.join(perEt.select(col("et"), col("l")), Seq("et"))
      .filter(col("j") <= col("l"))
      .select(col("et"),
        (expr("CAST(gj AS DECIMAL(30,0))")
          * expr("CAST(2 * (l + 1 - j) AS DECIMAL(4,0))")).as("wterm"))
      .groupBy(col("et")).agg(sum(col("wterm")).as("ws"))
    perEt.join(wsum, Seq("et"), "left")
      // G = γ̃₀(l+1) + 2Σγ̃ⱼ(l+1−j) stays ONE exact DECIMAL value in
      // both engines (double-cast once) — casting γ̃₀ to double before
      // the (l+1) product would differ from DuckDB's exact HUGEINT
      // product by ulps at 10²⁸ magnitudes (the chow class)
      .withColumn("gexact",
        expr("CAST(g0 AS DECIMAL(30,0)) * CAST(l + 1 AS DECIMAL(4,0))")
          + coalesce(col("ws"), lit(0).cast("decimal(35,0)")))
      .select(col("et").as("event_type"), col("n"), col("l").as("lag"),
        when(dbl(col("gexact")) > 0,
          round(dbl(col("num")) * (dbl(col("l")) + 1.0) / dbl(col("n"))
            / dbl(col("gexact")), 6)).as("kpss_eta"))
      .orderBy(col("event_type"))
  }

  private def qTimeBartels(s: SparkSession, d: String): DataFrame = {
    val g = daily(s, d).localCheckpoint(true)
    // tie-averaged midranks in 2× integer space over the day grid
    val vals = g.groupBy(col("et"), col("y")).agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy(col("et")).orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = vals
      .withColumn("cum", coalesce(sum(col("t")).over(wv), lit(0L)))
      .select(col("et"), col("y"),
        (lit(2L) * col("cum") + col("t") + 1).as("r2"))
    val wl = Window.partitionBy(col("et")).orderBy(col("idx"))
    val ranked = g.join(r2, Seq("et", "y"))
      .withColumn("nxt", lead(col("r2"), 1).over(wl))
      .withColumn("nn",
        count(lit(1)).over(Window.partitionBy(col("et"))))
    val byEt = ranked.groupBy(col("et"))
      .agg(max(col("nn")).as("n"),
        sum(when(col("nxt").isNotNull,
          (col("r2") - col("nxt")) * (col("r2") - col("nxt")))).as("nm"),
        sum((col("r2") - col("nn") - 1)
          * (col("r2") - col("nn") - 1)).as("den"))
    byEt.select(col("et").as("event_type"), col("n"),
        when(col("den") > 0,
          round(dbl(col("nm")) / dbl(col("den")), 6)).as("rvn"),
        when(col("n") > 2 && col("den") > 0,
          round((dbl(col("nm")) / dbl(col("den")) - 2.0)
            / sqrt(lit(4.0) * (dbl(col("n")) - 2.0)
              * (lit(5.0) * dbl(col("n")) * dbl(col("n"))
                - lit(2.0) * dbl(col("n")) - 9.0)
              / (lit(5.0) * dbl(col("n")) * (dbl(col("n")) + 1.0)
                * (dbl(col("n")) - 1.0) * (dbl(col("n")) - 1.0))), 6))
          .as("z"))
      .orderBy(col("event_type"))
  }

  private def qTimeCoxstuart(s: SparkSession, d: String): DataFrame = {
    val g = daily(s, d).localCheckpoint(true)
    val nEt = g.groupBy(col("et")).agg(count(lit(1)).as("n"))
      .withColumn("c", expr("(n + 1) div 2")) // integer div: ceil(n/2)
    val paired = g.join(nEt, Seq("et"))
      .filter(col("idx") <= col("n") - col("c"))
      .withColumn("idx2", col("idx") + col("c"))
      .join(g.select(col("et"), col("idx").as("idx2"),
        col("y").as("y2")), Seq("et", "idx2"))
    paired.groupBy(col("et"), col("n"))
      .agg(count(lit(1)).as("pairs"),
        sum(when(col("y2") > col("y"), 1L).otherwise(0L)).as("s_plus"),
        sum(when(col("y2") < col("y"), 1L).otherwise(0L)).as("s_minus"))
      .select(col("et").as("event_type"), col("n"), col("pairs"),
        col("s_plus"), col("s_minus"),
        when(col("s_plus") + col("s_minus") > 0,
          round((dbl(col("s_plus") - col("s_minus"))
              - signum(dbl(col("s_plus") - col("s_minus"))))
            / sqrt(dbl(col("s_plus") + col("s_minus"))), 6)).as("z"))
      .orderBy(col("event_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_kpss" -> (qTimeKpss _),
    "q_time_bartels" -> (qTimeBartels _),
    "q_time_coxstuart" -> (qTimeCoxstuart _),
  )

  private val dailySql =
    """WITH g AS MATERIALIZED (
      |  SELECT et, day, y,
      |    CAST(row_number() OVER (PARTITION BY et ORDER BY day)
      |      AS BIGINT) AS idx
      |  FROM (SELECT event_type AS et,
      |      epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |      CAST(sum(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT)
      |        AS y
      |    FROM events GROUP BY 1, 2) z)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_kpss" -> (dailySql +
      """,
        |base AS MATERIALIZED (
        |  SELECT et, idx,
        |    count(*) OVER (PARTITION BY et) * y
        |      - sum(y) OVER (PARTITION BY et) AS e,
        |    count(*) OVER (PARTITION BY et) AS n
        |  FROM g),
        |cum AS MATERIALIZED (
        |  SELECT et, idx, e, n,
        |    sum(e) OVER (PARTITION BY et ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
        |  FROM base),
        |peret AS (
        |  SELECT et, CAST(max(n) AS BIGINT) AS n,
        |    sum(CAST(st AS HUGEINT) * st) AS num,
        |    sum(CAST(e AS HUGEINT) * e) AS g0,
        |    CAST(floor(4.0 * pow(CAST(max(n) AS DOUBLE) / 100.0, 0.25))
        |      AS BIGINT) AS l
        |  FROM cum GROUP BY et),
        |gj AS (
        |  SELECT a.et, j.j,
        |    sum(CAST(a.e AS HUGEINT) * b.e) AS gj
        |  FROM cum a
        |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS j) j
        |  JOIN cum b ON b.et = a.et AND b.idx = a.idx + j.j
        |  GROUP BY 1, 2),
        |ws AS (
        |  SELECT gj.et,
        |    sum(CAST(gj AS HUGEINT) * (2 * (l + 1 - j))) AS ws
        |  FROM gj JOIN peret ON peret.et = gj.et
        |  WHERE j <= l GROUP BY 1)
        |SELECT peret.et AS event_type, n, l AS lag,
        |  CASE WHEN CAST(g0 * (l + 1)
        |      + coalesce(ws, CAST(0 AS HUGEINT)) AS DOUBLE) > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) * (CAST(l AS DOUBLE) + 1.0)
        |      / CAST(n AS DOUBLE)
        |      / CAST(g0 * (l + 1)
        |        + coalesce(ws, CAST(0 AS HUGEINT)) AS DOUBLE), 6)
        |  END AS kpss_eta
        |FROM peret LEFT JOIN ws ON ws.et = peret.et
        |ORDER BY event_type""".stripMargin),
    "q_time_bartels" -> (dailySql +
      """,
        |vals AS (
        |  SELECT et, y, CAST(count(*) AS BIGINT) AS t
        |  FROM g GROUP BY 1, 2),
        |r2 AS (
        |  SELECT et, y,
        |    2 * coalesce(sum(t) OVER (PARTITION BY et ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r2
        |  FROM vals),
        |ranked AS (
        |  SELECT g.et, g.idx, r2.r2,
        |    lead(r2.r2, 1) OVER (PARTITION BY g.et ORDER BY g.idx)
        |      AS nxt,
        |    count(*) OVER (PARTITION BY g.et) AS n
        |  FROM g JOIN r2 ON r2.et = g.et AND r2.y = g.y),
        |byet AS (
        |  SELECT et, CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN nxt IS NOT NULL THEN
        |      (r2 - nxt) * (r2 - nxt) END) AS BIGINT) AS nm,
        |    CAST(sum((r2 - n - 1) * (r2 - n - 1)) AS BIGINT) AS den
        |  FROM ranked GROUP BY et)
        |SELECT et AS event_type, n,
        |  CASE WHEN den > 0 THEN
        |    ROUND(CAST(nm AS DOUBLE) / CAST(den AS DOUBLE), 6) END
        |    AS rvn,
        |  CASE WHEN n > 2 AND den > 0 THEN
        |    ROUND((CAST(nm AS DOUBLE) / CAST(den AS DOUBLE) - 2.0)
        |      / sqrt(4.0 * (CAST(n AS DOUBLE) - 2.0)
        |        * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |          - 2.0 * CAST(n AS DOUBLE) - 9.0)
        |        / (5.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
        |          * (CAST(n AS DOUBLE) - 1.0)
        |          * (CAST(n AS DOUBLE) - 1.0))), 6) END AS z
        |FROM byet ORDER BY event_type""".stripMargin),
    "q_time_coxstuart" -> (dailySql +
      """,
        |net AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    CAST((count(*) + 1) // 2 AS BIGINT) AS c
        |  FROM g GROUP BY et),
        |paired AS (
        |  SELECT a.et, net.n, a.y, b.y AS y2
        |  FROM g a JOIN net ON net.et = a.et
        |  JOIN g b ON b.et = a.et AND b.idx = a.idx + net.c
        |  WHERE a.idx <= net.n - net.c)
        |SELECT et AS event_type, n,
        |  CAST(count(*) AS BIGINT) AS pairs,
        |  CAST(sum(CASE WHEN y2 > y THEN 1 ELSE 0 END) AS BIGINT)
        |    AS s_plus,
        |  CAST(sum(CASE WHEN y2 < y THEN 1 ELSE 0 END) AS BIGINT)
        |    AS s_minus,
        |  CASE WHEN sum(CASE WHEN y2 <> y THEN 1 ELSE 0 END) > 0 THEN
        |    ROUND((CAST(sum(CASE WHEN y2 > y THEN 1 ELSE 0 END)
        |        - sum(CASE WHEN y2 < y THEN 1 ELSE 0 END) AS DOUBLE)
        |      - CASE WHEN sum(CASE WHEN y2 > y THEN 1 ELSE 0 END)
        |          > sum(CASE WHEN y2 < y THEN 1 ELSE 0 END) THEN 1.0
        |        WHEN sum(CASE WHEN y2 > y THEN 1 ELSE 0 END)
        |          < sum(CASE WHEN y2 < y THEN 1 ELSE 0 END) THEN -1.0
        |        ELSE 0.0 END)
        |      / sqrt(CAST(sum(CASE WHEN y2 > y THEN 1 ELSE 0 END)
        |        + sum(CASE WHEN y2 < y THEN 1 ELSE 0 END) AS DOUBLE)),
        |      6) END AS z
        |FROM paired GROUP BY et, n ORDER BY event_type""".stripMargin),
  )
}
