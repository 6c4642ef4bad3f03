package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 third wave: change-point detection on the daily activity
  * series (binary-segmentation split scoring from exact prefix sums)
  * and a calibrated differentially-private count release (seeded
  * Laplace mechanism) — the monitoring and privacy-publishing staples.
  *
  * Scale notes:
  *  - Change-point collapses the stream to the calendar-bounded daily
  *    table once; every candidate split is scored from ONE ordered
  *    prefix-sum window pass over that bounded series (never a
  *    per-split rescan), with totals attached as a 1-row broadcast
  *    aggregate. Prefix sums stay exact BIGINT; squares go through
  *    double AFTER the exact sums (BIGINT² would overflow at corpus
  *    scale), and the argmax compares 6-dp-rounded gains with a
  *    min-day tie-break — deterministic in both engines.
  *  - The DP release is a map-only pass over the class-bounded count
  *    table: noise derives from md5 of the (class, ε) key — seeded,
  *    reproducible, engine-portable — through the inverse-CDF Laplace
  *    transform; the ε sweep is a 2-row broadcast cross join. */
object Analytics46 {

  /** Single change-point scan over daily click counts: for every
    * candidate boundary, the between-segment variance gain
    * S_L²/n_L + S_R²/n_R − S²/n (the binary-segmentation objective).
    * Top-3 candidates by gain — the "did the metric shift, and when"
    * report. */
  private def qTimeChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type") === "click")
      .select(expr("us div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily.select(col("day"), col("x"),
      sum(col("x")).over(w).as("sl"),
      count(lit(1)).over(w).as("nl"))
    val tot = daily.agg(sum(col("x")).as("st"), count(lit(1)).as("nt"))
    val scored = pre.crossJoin(broadcast(tot))
      .filter(col("nl") < col("nt"))
      .select(col("day"), col("nl"), (col("nt") - col("nl")).as("nr"),
        col("sl"), (col("st") - col("sl")).as("sr"),
        col("st"), col("nt"))
      .select(col("day"), col("nl"), col("nr"),
        round(dbl(col("sl")) / dbl(col("nl")), 6).as("mean_left"),
        round(dbl(col("sr")) / dbl(col("nr")), 6).as("mean_right"),
        round(dbl(col("sl")) * dbl(col("sl")) / dbl(col("nl"))
          + dbl(col("sr")) * dbl(col("sr")) / dbl(col("nr"))
          - dbl(col("st")) * dbl(col("st")) / dbl(col("nt")), 6)
          .as("gain"))
    scored.orderBy(desc("gain"), col("day")).limit(3)
      .withColumn("rk", row_number().over(
        Window.orderBy(desc("gain"), col("day"))))
      .select(col("rk"), col("day").as("split_day"), col("nl"), col("nr"),
        col("mean_left"), col("mean_right"), col("gain"))
      .orderBy(col("rk"))
  }

  /** Differentially-private release of per-nation customer counts for
    * ε ∈ {0.5, 1.0}: Laplace(1/ε) noise via the inverse CDF of a
    * seeded uniform (md5 of the class⊕ε key → 32-bit mantissa →
    * u ∈ (0,1)), released count clamped at 0 — the calibration report
    * (true vs released vs error) a privacy team signs off before
    * publishing histogram statistics.
    *
    * NOT a usable privacy mechanism: the seeded inverse-CDF
    * construction exists ONLY for cross-engine reproducibility (both
    * engines must emit bit-equal noise for the DuckDB hash compare) —
    * anyone holding the released (nat, eps) key can recompute the
    * noise exactly, so the release provides no actual differential
    * privacy. A real deployment keeps the Laplace calibration math
    * (b = Δf/ε = 1/ε for a unit-sensitivity count) but draws from a
    * non-reproducible CSPRNG. */
  private def qQualityDpcount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cls = t(s, d, "customer")
      .groupBy(col("c_nationkey").as("nat"))
      .agg(count(lit(1)).as("n_true"))
    val eps = Seq(("0.5", 2.0), ("1.0", 1.0)).toDF("eps", "b")
    cls.crossJoin(broadcast(eps))
      .withColumn("u", (expr(
        "CAST(conv(substring(md5(concat(CAST(nat AS STRING), ':', eps)), " +
          "1, 8), 16, 10) AS DOUBLE)") + lit(0.5)) / lit(4294967296.0))
      .withColumn("noise",
        -col("b") * signum(col("u") - lit(0.5))
          * log(lit(1.0) - lit(2.0) * abs(col("u") - lit(0.5))))
      .select(col("eps"), col("nat"), col("n_true"),
        greatest(round(dbl(col("n_true")) + col("noise")).cast("bigint"),
          lit(0L)).as("released"))
      .withColumn("err", col("released") - col("n_true"))
      .orderBy(col("eps"), col("nat"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_changepoint" -> (qTimeChangepoint _),
    "q_quality_dpcount" -> (qQualityDpcount _),
  )

  val sql: Map[String, String] = Map(
    // Identical prefix-sum windows; the gain is three IEEE divisions
    // and two adds from exact BIGINTs — bit-identical — and the 6-dp
    // round + min-day tie-break pin the top-3 pick.
    "q_time_changepoint" ->
      """WITH daily AS (SELECT epoch_us(CAST(ts AS TIMESTAMP))
        |    // 86400000000 AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |pre AS (SELECT day, x,
        |    CAST(sum(x) OVER (ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
        |    CAST(count(*) OVER (ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl
        |  FROM daily),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS st,
        |    CAST(count(*) AS BIGINT) AS nt FROM daily),
        |scored AS (SELECT day, nl, nt - nl AS nr,
        |    round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 6)
        |      AS mean_left,
        |    round(CAST(st - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE), 6)
        |      AS mean_right,
        |    round(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
        |        / CAST(nl AS DOUBLE)
        |      + CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
        |        / CAST(nt - nl AS DOUBLE)
        |      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
        |        / CAST(nt AS DOUBLE), 6) AS gain
        |  FROM pre CROSS JOIN tot WHERE nl < nt)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY gain DESC, day) AS INT)
        |    AS rk,
        |  day AS split_day, nl, nr, mean_left, mean_right, gain
        |FROM scored ORDER BY gain DESC, day LIMIT 3""".stripMargin,
    // The hex fold mirrors conv(hex, 16, 10); u, the inverse-CDF
    // transform, and the final round are single IEEE ops per row.
    "q_quality_dpcount" ->
      """WITH cls AS (SELECT c_nationkey AS nat,
        |    CAST(count(*) AS BIGINT) AS n_true FROM customer GROUP BY 1),
        |eps AS (SELECT eps, b FROM (VALUES ('0.5', 2.0), ('1.0', 1.0))
        |        v(eps, b)),
        |seeded AS (SELECT nat, n_true, eps, b,
        |    (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substr(md5(
        |          CAST(nat AS VARCHAR) || ':' || eps), 1, 8), ''),
        |          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |        (h, x) -> h * 16 + x) AS DOUBLE) + 0.5) / 4294967296.0
        |      AS u
        |  FROM cls CROSS JOIN eps),
        |noised AS (SELECT eps, nat, n_true,
        |    -b * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        |  FROM seeded)
        |SELECT eps, nat, n_true,
        |  greatest(CAST(round(CAST(n_true AS DOUBLE) + noise) AS BIGINT),
        |    0) AS released,
        |  greatest(CAST(round(CAST(n_true AS DOUBLE) + noise) AS BIGINT),
        |    0) - n_true AS err
        |FROM noised ORDER BY eps, nat""".stripMargin,
  )
}
