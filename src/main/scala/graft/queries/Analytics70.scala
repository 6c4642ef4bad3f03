package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 eighth wave: the classic rolling technical indicators over
  * each event type's daily value total — the operational-dashboard
  * trio on top of the engine's forecasting ops (holt/holtwinters):
  *
  *  - q_time_bollinger: 7-day rolling mean ± 2σ bands and the
  *    breakout flag (the volatility envelope);
  *  - q_time_rsi: Cutler's RSI-14 (SMA variant — window-expressible,
  *    unlike Wilder's recursive smoothing) from exact DECIMAL
  *    gain/loss sums;
  *  - q_time_macd: MACD line (fast dyadic-kernel EMA − slow kernel),
  *    signal line, histogram — both kernels are depth-8 truncated
  *    EMAs with exactly-representable binary weights (α = 1/2 and
  *    1/4), normalized over available lags, so both engines evaluate
  *    the IDENTICAL fixed expression tree.
  *
  * Determinism: the only shuffle input is the (type, day) DECIMAL(18,4)
  * sum grid — exact in both engines; every downstream window rides
  * that calendar-bounded table (≤ #days rows per type), partitioned by
  * event_type. Variance uses the moment identity on DECIMAL sums with
  * a greatest(·,0) clamp before sqrt; RSI's zero-movement window gates
  * to the conventional 50. At 100 TB only the daily cell values
  * change, never the window row counts. */
object Analytics70 {

  private def dailyGrid(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), expr("us div 86400000000").as("day"),
        dec(col("value")).as("v"))
      // Narrowed back to DECIMAL(18,4): the squared terms below must
      // stay inside 38-digit precision in BOTH engines (DuckDB errors
      // past it, Spark silently rounds).
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).cast("decimal(18,4)").as("v"))

  /** 7-day Bollinger bands per event type; emitted only for full
    * windows. */
  private def qTimeBollinger(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    dailyGrid(s, d)
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sv", sum(col("v")).over(w))
      .withColumn("s2", sum(col("v") * col("v")).over(w))
      .filter(col("cnt") === 7)
      .withColumn("mid", dbl(col("sv")) / 7.0)
      .withColumn("sd", sqrt(greatest(
        (dbl(col("s2")) - dbl(col("sv")) * dbl(col("sv")) / 7.0) / 7.0,
        lit(0.0))))
      .select(col("event_type"), col("day"),
        round(dbl(col("v")), 4).as("v"),
        round(col("mid"), 6).as("mid"), round(col("sd"), 6).as("sd"),
        (dbl(col("v")) > col("mid") + col("sd") * 2.0 ||
          dbl(col("v")) < col("mid") - col("sd") * 2.0).as("breakout"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Cutler's RSI-14 per event type from DECIMAL gain/loss sums. */
  private def qTimeRsi(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-13, Window.currentRow)
    dailyGrid(s, d)
      .withColumn("diff", col("v") - lag(col("v"), 1).over(ord))
      .withColumn("gain",
        when(col("diff") > 0, col("diff")).otherwise(lit(0)))
      .withColumn("loss",
        when(col("diff") < 0, -col("diff")).otherwise(lit(0)))
      .withColumn("nd", count(col("diff")).over(w14))
      .withColumn("sg", sum(col("gain")).over(w14))
      .withColumn("sl", sum(col("loss")).over(w14))
      .filter(col("nd") === 14)
      .select(col("event_type"), col("day"),
        when(col("sg") + col("sl") > 0,
          round(dbl(col("sg")) * 100.0 / dbl(col("sg") + col("sl")), 6))
          .otherwise(50.0).as("rsi"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Normalized truncated-kernel EMA as a dialect-portable CASE
    * expression over lag columns c0.. with weight literals. */
  private[queries] def kernel(cols: Seq[String],
      weights: Seq[String]): String = {
    val num = cols.zip(weights)
      .map { case (c, w) => s"(CASE WHEN $c IS NULL THEN 0.0 ELSE $c * $w END)" }
      .mkString(" + ")
    val den = cols.zip(weights)
      .map { case (c, w) => s"(CASE WHEN $c IS NULL THEN 0.0 ELSE $w END)" }
      .mkString(" + ")
    s"(($num) / ($den))"
  }

  private[queries] val wFast = Seq("0.5", "0.25", "0.125", "0.0625",
    "0.03125", "0.015625", "0.0078125", "0.00390625")
  private[queries] val wSlow = Seq("0.25", "0.1875", "0.140625",
    "0.10546875", "0.0791015625", "0.059326171875", "0.04449462890625",
    "0.0333709716796875")
  private[queries] val wSig = Seq("0.5", "0.25", "0.125", "0.0625")

  /** MACD line, signal line, and histogram per event type. */
  private def qTimeMacd(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy(col("event_type")).orderBy(col("day"))
    var g = dailyGrid(s, d).withColumn("x0", dbl(col("v")))
    for (k <- 1 to 7)
      g = g.withColumn(s"x$k", lag(col("x0"), k).over(ord))
    val xs = (0 to 7).map(k => s"x$k")
    g = g.withColumn("macd",
      expr(s"${kernel(xs, wFast)} - ${kernel(xs, wSlow)}"))
    for (k <- 1 to 3)
      g = g.withColumn(s"m$k", lag(col("macd"), k).over(ord))
    val ms = Seq("macd", "m1", "m2", "m3")
    g.withColumn("signal", expr(kernel(ms, wSig)))
      .select(col("event_type"), col("day"),
        round(col("macd"), 6).as("macd"),
        round(col("signal"), 6).as("signal"),
        round(col("macd") - col("signal"), 6).as("hist"))
      .orderBy(col("event_type"), col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_bollinger" -> (qTimeBollinger _),
    "q_time_rsi" -> (qTimeRsi _),
    "q_time_macd" -> (qTimeMacd _),
  )

  private val gridSql =
    """WITH g AS (
      |  SELECT event_type,
      |    (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)
      |      // 86400000000) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_bollinger" -> (gridSql +
      """,
        |w AS (
        |  SELECT event_type, day, v,
        |    count(*) OVER win AS cnt,
        |    sum(v) OVER win AS sv,
        |    -- widened: DECIMAL(18)² overflows DuckDB's int64 backing at
        |    -- sf1 daily sums (r15 campaign); the wider type forces the
        |    -- int128 path, values unchanged
        |    sum(CAST(v AS DECIMAL(28,4)) * v) OVER win AS s2
        |  FROM g
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day,
        |  round(CAST(v AS DOUBLE), 4) AS v,
        |  round(CAST(sv AS DOUBLE) / 7.0, 6) AS mid,
        |  round(sqrt(greatest(
        |    (CAST(s2 AS DOUBLE)
        |     - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / 7.0) / 7.0,
        |    0.0)), 6) AS sd,
        |  (CAST(v AS DOUBLE) > CAST(sv AS DOUBLE) / 7.0
        |     + sqrt(greatest((CAST(s2 AS DOUBLE)
        |       - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / 7.0) / 7.0,
        |       0.0)) * 2.0
        |   OR CAST(v AS DOUBLE) < CAST(sv AS DOUBLE) / 7.0
        |     - sqrt(greatest((CAST(s2 AS DOUBLE)
        |       - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / 7.0) / 7.0,
        |       0.0)) * 2.0) AS breakout
        |FROM w WHERE cnt = 7
        |ORDER BY event_type, day""".stripMargin),
    "q_time_rsi" -> (gridSql +
      """,
        |df AS (
        |  SELECT event_type, day,
        |    v - lag(v, 1) OVER (PARTITION BY event_type ORDER BY day)
        |      AS diff
        |  FROM g),
        |gl AS (
        |  SELECT event_type, day, diff,
        |    CASE WHEN diff > 0 THEN diff ELSE 0 END AS gain,
        |    CASE WHEN diff < 0 THEN -diff ELSE 0 END AS loss
        |  FROM df),
        |w AS (
        |  SELECT event_type, day,
        |    count(diff) OVER win AS nd,
        |    sum(gain) OVER win AS sg,
        |    sum(loss) OVER win AS sl
        |  FROM gl
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day,
        |  CASE WHEN sg + sl > 0 THEN
        |    round(CAST(sg AS DOUBLE) * 100.0 / CAST(sg + sl AS DOUBLE), 6)
        |  ELSE 50.0 END AS rsi
        |FROM w WHERE nd = 14
        |ORDER BY event_type, day""".stripMargin),
    "q_time_macd" -> (gridSql +
      s""",
        |lx AS (
        |  SELECT event_type, day, CAST(v AS DOUBLE) AS x0,
        |${(1 to 7).map(k =>
        s"    lag(CAST(v AS DOUBLE), $k) OVER (PARTITION BY event_type " +
          s"ORDER BY day) AS x$k").mkString(",\n")}
        |  FROM g),
        |mc AS (
        |  SELECT event_type, day,
        |    ${kernel((0 to 7).map(k => s"x$k"), wFast)}
        |    - ${kernel((0 to 7).map(k => s"x$k"), wSlow)} AS macd
        |  FROM lx),
        |ms AS (
        |  SELECT event_type, day, macd,
        |${(1 to 3).map(k =>
        s"    lag(macd, $k) OVER (PARTITION BY event_type ORDER BY day) " +
          s"AS m$k").mkString(",\n")}
        |  FROM mc)
        |SELECT event_type, day, round(macd, 6) AS macd,
        |  round(${kernel(Seq("macd", "m1", "m2", "m3"), wSig)}, 6)
        |    AS signal,
        |  round(macd - ${kernel(Seq("macd", "m1", "m2", "m3"), wSig)}, 6)
        |    AS hist
        |FROM ms ORDER BY event_type, day""".stripMargin),
  )
}
