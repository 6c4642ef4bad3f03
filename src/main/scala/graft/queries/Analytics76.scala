package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 third wave: time-series MODEL DIAGNOSTICS per event type —
  * the "is this series white noise / stationary / random-walk" tests
  * that gate every forecasting model the repo already ships (holt,
  * kalman, croston):
  *
  *  - q_time_ljungbox: Ljung–Box Q over lags 1..8 of the mean-centered
  *    daily series (portmanteau whiteness test);
  *  - q_time_adf: Dickey–Fuller regression Δy_t = α + β·y_{t−1}, the
  *    unit-root t-statistic on β (stationarity gate);
  *  - q_time_varratio: Lo–MacKinlay variance ratio VR(5) with the
  *    homoskedastic z — random-walk test on the daily levels;
  *  - q_time_turningpoint: turning-point randomness test — observed
  *    local extrema T vs E[T] = 2(n−2)/3, Var = (16n−29)/90;
  *  - q_time_hampel: Hampel outlier filter — rolling 7-day lower
  *    median ± 3·1.4826·MAD, emitted flags only.
  *
  * Every series is the calendar-bounded per-type daily table (one
  * groupBy collapse of the stream, then all window work is
  * PARTITIONED by type over a bounded frame); moment sums round each
  * term to a fixed scale then sum in DECIMAL; divisions/sqrt are one
  * final IEEE expression. Hampel's median/MAD use the repo's sorted-
  * list lower-median convention (no interpolation ambiguity). */
object Analytics76 {

  /** (et, day, v DECIMAL, tt ordinal within type). */
  private def dailyTyped(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"), dec(col("value")).as("vv"))
      .groupBy(col("et"), col("day")).agg(sum(col("vv")).as("v"))
      .withColumn("tt", row_number()
        .over(Window.partitionBy(col("et")).orderBy(col("day")))
        .cast("long"))

  /** Ljung–Box Q per type, lags 1..8. */
  private def qTimeLjungbox(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = dailyTyped(s, d)
    val m = g.groupBy(col("et")).agg(count(lit(1)).as("n"),
      sum(col("v")).as("sv"))
      .withColumn("mean", expr("CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)"))
    val e = g.join(broadcast(m), Seq("et"))
      .select(col("et"), col("tt"), col("n"),
        expr("ROUND(CAST(v AS DOUBLE) - mean, 6)").as("e6"))
    val den = e.groupBy(col("et")).agg(
      sum(expr("CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4))")).as("see"))
    val lags = (1 to 8).toDF("k")
    val shifted = e.select(col("et").as("et2"), col("tt").as("ttp"),
      col("e6").as("ep"))
    val num = e.crossJoin(broadcast(lags))
      .join(shifted, col("et") === col("et2") &&
        col("ttp") === col("tt") - col("k"))
      .groupBy(col("et"), col("k"))
      .agg(sum(expr("CAST(ROUND(e6 * ep, 4) AS DECIMAL(38,4))")).as("sk"))
    val rho = num.join(broadcast(den), Seq("et"))
      .join(broadcast(m.select(col("et"), col("n"))), Seq("et"))
      .withColumn("rho", expr(
        "CAST(sk AS DOUBLE) / CAST(see AS DOUBLE)"))
      .withColumn("term", expr(
        "rho * rho / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))"))
    rho.withColumn("qsum", sum(expr("CAST(ROUND(term, 9) AS DECIMAL(28,9))"))
        .over(Window.partitionBy(col("et")).orderBy(col("k"))))
      .select(col("et").as("event_type"), col("k").as("lag"),
        expr("ROUND(rho, 6)").as("rho"),
        expr("ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) " +
          "* CAST(qsum AS DOUBLE), 4)").as("q_stat"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** Dickey–Fuller regression per type: Δy on y_{t−1}, t-stat of β. */
  private def qTimeAdf(s: SparkSession, d: String): DataFrame = {
    val g = dailyTyped(s, d)
    val w = Window.partitionBy(col("et")).orderBy(col("tt"))
    val pts = g.withColumn("yp", lag(dbl(col("v")), 1).over(w))
      .filter(col("yp").isNotNull)
      .select(col("et"), col("yp").as("x"),
        (dbl(col("v")) - col("yp")).as("dy"))
      .select(col("et"), expr("ROUND(x, 6)").as("x"),
        expr("ROUND(dy, 6)").as("y"))
    val m = pts.groupBy(col("et")).agg(count(lit(1)).as("n"),
      sum(expr("CAST(ROUND(x, 4) AS DECIMAL(38,4))")).as("sx"),
      sum(expr("CAST(ROUND(y, 4) AS DECIMAL(38,4))")).as("sy"),
      sum(expr("CAST(ROUND(x * y, 2) AS DECIMAL(38,2))")).as("sxy"),
      sum(expr("CAST(ROUND(x * x, 2) AS DECIMAL(38,2))")).as("sxx"),
      sum(expr("CAST(ROUND(y * y, 2) AS DECIMAL(38,2))")).as("syy"))
    m.withColumn("sxxc", expr(
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) " +
          "/ CAST(n AS DOUBLE)"))
      .withColumn("b", expr(
        "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) " +
          "/ CAST(n AS DOUBLE)) / sxxc"))
      .withColumn("sse", expr(
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) " +
          "/ CAST(n AS DOUBLE) - b * b * sxxc"))
      .select(col("et").as("event_type"), col("n"),
        expr("ROUND(b, 6)").as("beta"),
        expr("ROUND(b / sqrt(sse / (CAST(n AS DOUBLE) - 2.0) / sxxc), 4)")
          .as("df_tstat"))
      .orderBy(col("event_type"))
  }

  /** Lo–MacKinlay VR(q=5) per type with the homoskedastic z. */
  private def qTimeVarratio(s: SparkSession, d: String): DataFrame = {
    val q = 5
    val g = dailyTyped(s, d)
    val w = Window.partitionBy(col("et")).orderBy(col("tt"))
    val withLags = g
      .withColumn("y", dbl(col("v")))
      .withColumn("y1", lag(col("y"), 1).over(w))
      .withColumn("yq", lag(col("y"), q).over(w))
    val ends = g.groupBy(col("et")).agg(count(lit(1)).as("n"),
      max(when(col("tt") === 1, dbl(col("v")))).as("yfirst"))
    // drift μ = (y_n − y_1)/(n − 1) off the ordinal extremes
    val lastv = g.withColumn("rn", row_number().over(
        Window.partitionBy(col("et")).orderBy(desc("tt"))))
      .filter(col("rn") === 1).select(col("et"), dbl(col("v")).as("ylast"))
    val mu = ends.join(lastv, Seq("et"))
      .withColumn("mu", expr(
        "(ylast - yfirst) / (CAST(n AS DOUBLE) - 1.0)"))
      .select(col("et"), col("n"), col("mu"))
    val terms = withLags.join(broadcast(mu), Seq("et"))
    val s1 = terms.filter(col("y1").isNotNull)
      .groupBy(col("et")).agg(
        sum(expr("CAST(ROUND((y - y1 - mu) * (y - y1 - mu), 4) " +
          "AS DECIMAL(38,4))")).as("ss1"))
    val sq = terms.filter(col("yq").isNotNull)
      .groupBy(col("et")).agg(
        sum(expr(s"CAST(ROUND((y - yq - $q * mu) * (y - yq - $q * mu), 4) " +
          "AS DECIMAL(38,4))")).as("ssq"))
    mu.join(s1, Seq("et")).join(sq, Seq("et"))
      .withColumn("var1", expr(
        "CAST(ss1 AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)"))
      .withColumn("mq", expr(
        s"$q.0 * (CAST(n AS DOUBLE) - $q.0 + 1.0) " +
          s"* (1.0 - $q.0 / CAST(n AS DOUBLE))"))
      .withColumn("varq", expr("CAST(ssq AS DOUBLE) / mq"))
      .withColumn("vr", expr("varq / var1"))
      .select(col("et").as("event_type"), col("n"),
        expr("ROUND(vr, 6)").as("vr5"),
        expr(s"ROUND((vr - 1.0) * sqrt(CAST(n AS DOUBLE)) " +
          s"/ sqrt(2.0 * (2.0 * $q.0 - 1.0) * ($q.0 - 1.0) " +
          s"/ (3.0 * $q.0)), 4)").as("z"))
      .orderBy(col("event_type"))
  }

  /** Turning-point randomness test per type. */
  private def qTimeTurningpoint(s: SparkSession, d: String): DataFrame = {
    val g = dailyTyped(s, d)
    val w = Window.partitionBy(col("et")).orderBy(col("tt"))
    g.withColumn("vp", lag(col("v"), 1).over(w))
      .withColumn("vn", lead(col("v"), 1).over(w))
      .filter(col("vp").isNotNull && col("vn").isNotNull)
      .groupBy(col("et"))
      .agg((count(lit(1)) + 2).as("n"),
        sum(when((col("vp") < col("v") && col("v") > col("vn")) ||
          (col("vp") > col("v") && col("v") < col("vn")), 1L)
          .otherwise(0L)).as("t_obs"))
      .withColumn("e_t", expr("2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0"))
      .withColumn("v_t", expr("(16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0"))
      .select(col("et").as("event_type"), col("n"), col("t_obs"),
        expr("ROUND(e_t, 6)").as("expected"),
        expr("ROUND((CAST(t_obs AS DOUBLE) - e_t) / sqrt(v_t), 4)").as("z"))
      .orderBy(col("event_type"))
  }

  /** Hampel filter: flags where |c − med7| > 3·1.4826·MAD7 (daily
    * per-type event counts, 7-day centered window, lower medians). */
  private def qTimeHampel(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("event_type").as("et"), expr("us div 86400000000").as("day"))
      .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("win", array_sort(collect_list(col("c")).over(w)))
      .withColumn("med", expr(
        "element_at(win, CAST((size(win) + 1) div 2 AS INT))"))
      .withColumn("devs", expr(
        "array_sort(transform(win, x -> abs(x - med)))"))
      .withColumn("mad", expr(
        "element_at(devs, CAST((size(devs) + 1) div 2 AS INT))"))
      .filter(size(col("win")) === 7)
      .filter(expr(
        "CAST(abs(c - med) AS DOUBLE) > 3.0 * 1.4826 * CAST(mad AS DOUBLE)"))
      .select(col("et").as("event_type"), col("day"),
        col("c").as("n_events"), col("med").as("med7"), col("mad").as("mad7"))
      .orderBy(col("event_type"), col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_ljungbox" -> (qTimeLjungbox _),
    "q_time_adf" -> (qTimeAdf _),
    "q_time_varratio" -> (qTimeVarratio _),
    "q_time_turningpoint" -> (qTimeTurningpoint _),
    "q_time_hampel" -> (qTimeHampel _),
  )

  private val dailySql =
    """g AS (
      |  SELECT event_type AS et,
      |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
      |      AS BIGINT) AS day,
      |    sum(CAST(value AS DECIMAL(18,4))) AS v
      |  FROM events GROUP BY 1, 2),
      |gt AS (
      |  SELECT et, day, v,
      |    CAST(row_number() OVER (PARTITION BY et ORDER BY day)
      |      AS BIGINT) AS tt
      |  FROM g)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_ljungbox" ->
      s"""WITH $dailySql,
        |m AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
        |  FROM gt GROUP BY et),
        |e AS (
        |  SELECT gt.et, tt, n,
        |    ROUND(CAST(v AS DOUBLE) - mean, 6) AS e6
        |  FROM gt JOIN m ON gt.et = m.et),
        |den AS (
        |  SELECT et, sum(CAST(ROUND(e6 * e6, 4) AS DECIMAL(38,4))) AS see
        |  FROM e GROUP BY et),
        |num AS (
        |  SELECT a.et, k.k,
        |    sum(CAST(ROUND(a.e6 * b.e6, 4) AS DECIMAL(38,4))) AS sk
        |  FROM e a
        |  CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS k) k
        |  JOIN e b ON b.et = a.et AND b.tt = a.tt - k.k
        |  GROUP BY a.et, k.k),
        |rho AS (
        |  SELECT num.et, k,
        |    CAST(sk AS DOUBLE) / CAST(see AS DOUBLE) AS rho,
        |    m.n
        |  FROM num JOIN den ON num.et = den.et
        |  JOIN m ON num.et = m.et),
        |acc AS (
        |  SELECT et, k, rho, n,
        |    sum(CAST(ROUND(rho * rho / (CAST(n AS DOUBLE)
        |        - CAST(k AS DOUBLE)), 9) AS DECIMAL(28,9)))
        |      OVER (PARTITION BY et ORDER BY k) AS qsum
        |  FROM rho)
        |SELECT et AS event_type, CAST(k AS INT) AS lag,
        |  ROUND(rho, 6) AS rho,
        |  ROUND(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
        |    * CAST(qsum AS DOUBLE), 4) AS q_stat
        |FROM acc ORDER BY event_type, lag""".stripMargin,
    "q_time_adf" ->
      s"""WITH $dailySql,
        |pts AS (
        |  SELECT et, ROUND(x, 6) AS x, ROUND(y, 6) AS y FROM (
        |    SELECT et,
        |      lag(CAST(v AS DOUBLE)) OVER (PARTITION BY et ORDER BY tt)
        |        AS x,
        |      CAST(v AS DOUBLE)
        |        - lag(CAST(v AS DOUBLE)) OVER (PARTITION BY et ORDER BY tt)
        |        AS y
        |    FROM gt) z
        |  WHERE x IS NOT NULL),
        |m AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(ROUND(x, 4) AS DECIMAL(38,4))) AS sx,
        |    sum(CAST(ROUND(y, 4) AS DECIMAL(38,4))) AS sy,
        |    sum(CAST(ROUND(x * y, 2) AS DECIMAL(38,2))) AS sxy,
        |    sum(CAST(ROUND(x * x, 2) AS DECIMAL(38,2))) AS sxx,
        |    sum(CAST(ROUND(y * y, 2) AS DECIMAL(38,2))) AS syy
        |  FROM pts GROUP BY et),
        |f AS (
        |  SELECT et, n,
        |    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS sxxc,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |     / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS b,
        |    sy, syy FROM m)
        |SELECT et AS event_type, n, ROUND(b, 6) AS beta,
        |  ROUND(b / sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
        |      * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - b * b * sxxc)
        |    / (CAST(n AS DOUBLE) - 2.0) / sxxc), 4) AS df_tstat
        |FROM f ORDER BY event_type""".stripMargin,
    "q_time_varratio" ->
      s"""WITH $dailySql,
        |wl AS (
        |  SELECT et, tt, CAST(v AS DOUBLE) AS y,
        |    lag(CAST(v AS DOUBLE), 1)
        |      OVER (PARTITION BY et ORDER BY tt) AS y1,
        |    lag(CAST(v AS DOUBLE), 5)
        |      OVER (PARTITION BY et ORDER BY tt) AS yq
        |  FROM gt),
        |mu AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    (max(CASE WHEN tt = (SELECT max(tt) FROM gt g2
        |        WHERE g2.et = gt.et) THEN CAST(v AS DOUBLE) END)
        |     - max(CASE WHEN tt = 1 THEN CAST(v AS DOUBLE) END))
        |      / (CAST(count(*) AS DOUBLE) - 1.0) AS mu
        |  FROM gt GROUP BY et),
        |s1 AS (
        |  SELECT wl.et,
        |    sum(CAST(ROUND((y - y1 - mu) * (y - y1 - mu), 4)
        |      AS DECIMAL(38,4))) AS ss1
        |  FROM wl JOIN mu ON wl.et = mu.et
        |  WHERE y1 IS NOT NULL GROUP BY wl.et),
        |sq AS (
        |  SELECT wl.et,
        |    sum(CAST(ROUND((y - yq - 5 * mu) * (y - yq - 5 * mu), 4)
        |      AS DECIMAL(38,4))) AS ssq
        |  FROM wl JOIN mu ON wl.et = mu.et
        |  WHERE yq IS NOT NULL GROUP BY wl.et),
        |f AS (
        |  SELECT mu.et, mu.n,
        |    (CAST(ssq AS DOUBLE)
        |      / (5.0 * (CAST(n AS DOUBLE) - 5.0 + 1.0)
        |         * (1.0 - 5.0 / CAST(n AS DOUBLE))))
        |    / (CAST(ss1 AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)) AS vr
        |  FROM mu JOIN s1 ON mu.et = s1.et JOIN sq ON mu.et = sq.et)
        |SELECT et AS event_type, n, ROUND(vr, 6) AS vr5,
        |  ROUND((vr - 1.0) * sqrt(CAST(n AS DOUBLE))
        |    / sqrt(2.0 * (2.0 * 5.0 - 1.0) * (5.0 - 1.0)
        |      / (3.0 * 5.0)), 4) AS z
        |FROM f ORDER BY event_type""".stripMargin,
    "q_time_turningpoint" ->
      s"""WITH $dailySql,
        |tp AS (
        |  SELECT et,
        |    lag(v) OVER (PARTITION BY et ORDER BY tt) AS vp,
        |    v,
        |    lead(v) OVER (PARTITION BY et ORDER BY tt) AS vn
        |  FROM gt),
        |agg AS (
        |  SELECT et, CAST(count(*) + 2 AS BIGINT) AS n,
        |    sum(CASE WHEN (vp < v AND v > vn) OR (vp > v AND v < vn)
        |      THEN 1 ELSE 0 END) AS t_obs
        |  FROM tp WHERE vp IS NOT NULL AND vn IS NOT NULL
        |  GROUP BY et)
        |SELECT et AS event_type, n, CAST(t_obs AS BIGINT) AS t_obs,
        |  ROUND(2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0, 6) AS expected,
        |  ROUND((CAST(t_obs AS DOUBLE)
        |      - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
        |    / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 4) AS z
        |FROM agg ORDER BY event_type""".stripMargin,
    "q_time_hampel" ->
      """WITH daily AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |fr AS (
        |  SELECT et, day, c,
        |    list_sort(list(c) OVER (PARTITION BY et ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS win
        |  FROM daily),
        |med AS (
        |  SELECT et, day, c, win,
        |    win[CAST((len(win) + 1) // 2 AS INT)] AS med
        |  FROM fr WHERE len(win) = 7),
        |mad AS (
        |  SELECT et, day, c, med,
        |    list_sort(list_transform(win, x -> abs(x - med)))
        |      [CAST((len(win) + 1) // 2 AS INT)] AS mad
        |  FROM med)
        |SELECT et AS event_type, day, c AS n_events, med AS med7,
        |  mad AS mad7
        |FROM mad
        |WHERE CAST(abs(c - med) AS DOUBLE) > 3.0 * 1.4826 * CAST(mad AS DOUBLE)
        |ORDER BY event_type, day""".stripMargin,
  )
}
