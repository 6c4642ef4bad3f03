package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 thirty-first wave: dominant-cycle detection (the
  * autocorrelation periodogram over lags 1..48 — q_time_autocorr
  * checks two known lags, this FINDS the period), Tukey-fence outlier
  * counts (the box-plot rule — the robust-outlier report next to
  * z-score anomalies and MAD), and the quantization-error report (how
  * much signal the uint8 embedding compression loses — the check that
  * justifies shipping quantized vectors).
  *
  * Scale notes:
  *  - Periodogram: the hourly count table is bounded, and the lag
  *    sweep is ONE co-keyed self-join against a 48-row literal lag
  *    relation — (type, lag) moments come out of a single shuffle,
  *    never 48 passes over the stream.
  *  - Tukey: quartiles via percentile_disc on the per-type value
  *    buckets; the fence count is one conditional aggregate sharing
  *    the same scan.
  *  - Quantization error: map-only encode/decode/compare per vector,
  *    one global moment aggregate; the round-trip never leaves the
  *    row. */
object Analytics31 {

  /** Dominant cycle per event type: the lag L ∈ [1, 48] with the
    * highest autocorrelation of hourly counts. */
  private def qTimePeriodogram(s: SparkSession, d: String): DataFrame = {
    val hr = events(s, d)
      .select(col("event_type").as("et"), expr("us div 3600000000").as("h"))
      .groupBy(col("et"), col("h")).agg(count(lit(1)).as("c"))
    val lags = s.range(1, 49).select(col("id").as("lag"))
    val pairs = hr.crossJoin(broadcast(lags))
      .withColumn("h2", col("h") + col("lag"))
      .join(hr.select(col("et"), col("h").as("h2"), col("c").as("c2")),
        Seq("et", "h2"))
    val moments = pairs.groupBy(col("et"), col("lag"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(col("c2")).as("sy"), sum(col("c") * col("c2")).as("sxy"),
        sum(col("c") * col("c")).as("sxx"),
        sum(col("c2") * col("c2")).as("syy"))
    val r = moments
      .withColumn("dxx", dbl(col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("dyy", dbl(col("n") * col("syy") - col("sy") * col("sy")))
      .withColumn("r", when(col("dxx") > 0 && col("dyy") > 0,
        round((dbl(col("n") * col("sxy") - col("sx") * col("sy"))) /
          sqrt(col("dxx") * col("dyy")), 6)))
      .filter(col("r").isNotNull)
    // best lag per type: max r, ties to the SHORTEST lag
    val best = r.groupBy(col("et"))
      .agg(max(struct(col("r"), (-col("lag")).as("nl"))).as("b"))
      .select(col("et"), (-col("b.nl")).as("lag"), col("b.r").as("best"))
    r.join(best.select(col("et"), col("lag"),
        col("best")).hint("shuffle_hash"), Seq("et", "lag"))
      .select(col("et").as("event_type"), col("lag").as("dominant_lag"),
        col("n").as("n_pairs"), col("r").as("autocorr"))
      .orderBy(col("event_type"))
  }

  /** Tukey-fence outlier report per event type: quartiles, IQR
    * fences, and the count outside them. */
  private def qAggTukey(s: SparkSession, d: String): DataFrame = {
    val v = events(s, d)
      .select(col("event_type"),
        expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("x"))
    val q = v.groupBy(col("event_type"))
      // Spark's percentile_disc returns DOUBLE even over DECIMAL input
      // (DuckDB's quantile_disc keeps DECIMAL(18,1)); a disc percentile
      // is by definition an element of the input lattice, so the cast
      // back to DECIMAL(18,1) is value-exact — without it the hi fence
      // computes as 149.59999999999997 in double and the 5 lattice
      // values sitting exactly ON the fence flip sides between engines
      // (caught by the r14 sf0.1 exact-value pass: 965 vs 960
      // outliers; sf0.01 never had a value on the fence)
      .agg(expr("""CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY x)
             | AS DECIMAL(18,1))""".stripMargin).as("q1"),
        expr("""CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY x)
             | AS DECIMAL(18,1))""".stripMargin).as("q3"),
        count(lit(1)).as("n"))
      // fences in EXACT decimal: `* 1.5` with a Scala Double literal
      // would be a DOUBLE multiply in Spark but a DECIMAL(2,1)
      // multiply in DuckDB's mirror
      .withColumn("lo", col("q1")
        - (col("q3") - col("q1")) * expr("CAST(1.5 AS DECIMAL(2,1))"))
      .withColumn("hi", col("q3")
        + (col("q3") - col("q1")) * expr("CAST(1.5 AS DECIMAL(2,1))"))
    v.join(broadcast(q), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1"),
        max(col("q3")).as("q3"),
        sum(when(col("x") < col("lo") || col("x") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        dbl(col("q1")).as("q1"), dbl(col("q3")).as("q3"),
        col("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Uint8 quantization round-trip error over embeddings: mean and
    * max per-vector L2 error, and the error-to-norm ratio. */
  private def qEmbedQerror(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings")
      // symmetric [-1, 1] affine uint8 codec: q = round((x+1)*127.5)
      .withColumn("err2", expr(
        """aggregate(transform(embedding, x ->
          |  CAST(ROUND((CAST(x AS DOUBLE) + 1.0) * 127.5) AS DOUBLE)
          |    / 127.5 - 1.0 - CAST(x AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (a, dx) -> a + dx * dx)""".stripMargin))
      .withColumn("n2", expr(
        """aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (a, x) -> a + x * x)""".stripMargin))
      .select(
        expr("CAST(ROUND(sqrt(err2), 9) AS DECIMAL(18,9))").as("l2err"),
        expr("CAST(ROUND(CASE WHEN n2 > 0 THEN sqrt(err2) / sqrt(n2) END, 9) "
          + "AS DECIMAL(18,9))").as("rel"))
    e.agg(count(lit(1)).as("n_vectors"),
      round(dbl(sum(col("l2err"))) / dbl(count(lit(1))), 6)
        .as("mean_l2_err"),
      dbl(max(col("l2err"))).as("max_l2_err"),
      round(dbl(sum(col("rel"))) / dbl(count(lit(1))), 6)
        .as("mean_rel_err"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_periodogram" -> (qTimePeriodogram _),
    "q_agg_tukey" -> (qAggTukey _),
    "q_embed_qerror" -> (qEmbedQerror _),
  )

  val sql: Map[String, String] = Map(
    "q_time_periodogram" ->
      """WITH hr AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |lags AS (SELECT unnest(range(1, 49)) AS lag),
        |pairs AS (
        |  SELECT a.et, lags.lag, a.c AS c, b.c AS c2
        |  FROM hr a CROSS JOIN lags
        |       JOIN hr b ON a.et = b.et AND b.h = a.h + lags.lag),
        |m AS (
        |  SELECT et, lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS sx, CAST(sum(c2) AS BIGINT) AS sy,
        |    CAST(sum(c * c2) AS BIGINT) AS sxy,
        |    CAST(sum(c * c) AS BIGINT) AS sxx,
        |    CAST(sum(c2 * c2) AS BIGINT) AS syy
        |  FROM pairs GROUP BY et, lag),
        |r AS (
        |  SELECT et, lag, n,
        |    round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
        |  FROM m
        |  WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0),
        |best AS (
        |  SELECT et, lag, n, r,
        |    row_number() OVER (PARTITION BY et
        |      ORDER BY r DESC, lag) AS rk
        |  FROM r)
        |SELECT et AS event_type, CAST(lag AS BIGINT) AS dominant_lag,
        |  n AS n_pairs, r AS autocorr
        |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "q_agg_tukey" ->
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS x
        |  FROM events),
        |q AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    quantile_disc(x, 0.25) AS q1, quantile_disc(x, 0.75) AS q3
        |  FROM v GROUP BY event_type)
        |SELECT v.event_type, max(q.n) AS n,
        |  CAST(max(q.q1) AS DOUBLE) AS q1, CAST(max(q.q3) AS DOUBLE) AS q3,
        |  CAST(sum(CASE WHEN v.x < q.q1 - (q.q3 - q.q1) * 1.5
        |                  OR v.x > q.q3 + (q.q3 - q.q1) * 1.5
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM v JOIN q ON v.event_type = q.event_type
        |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin,
    "q_embed_qerror" ->
      """WITH e AS (
        |  SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(embedding, x ->
        |        ROUND((CAST(x AS DOUBLE) + 1.0) * 127.5) / 127.5 - 1.0
        |          - CAST(x AS DOUBLE))),
        |      (a, dx) -> a + dx * dx) AS err2,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(embedding, x -> CAST(x AS DOUBLE))),
        |      (a, x) -> a + x * x) AS n2
        |  FROM embeddings),
        |t AS (
        |  SELECT CAST(ROUND(sqrt(err2), 9) AS DECIMAL(18,9)) AS l2err,
        |    CAST(ROUND(CASE WHEN n2 > 0 THEN sqrt(err2) / sqrt(n2) END, 9)
        |      AS DECIMAL(18,9)) AS rel
        |  FROM e)
        |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
        |  round(CAST(CAST(sum(l2err) AS DECIMAL(38,9)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS mean_l2_err,
        |  CAST(max(l2err) AS DOUBLE) AS max_l2_err,
        |  round(CAST(CAST(sum(rel) AS DECIMAL(38,9)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS mean_rel_err
        |FROM t""".stripMargin,
  )
}
