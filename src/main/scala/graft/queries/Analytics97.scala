package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 fourth wave: series-shape mining, classical time-series
  * identification, stylometry, and density estimation — four oracled
  * operators:
  *
  *  - q_time_motif: matrix-profile-style motif discovery on the daily
  *    click series — the top-5 closest pairs of z-normalized 7-day
  *    windows under Euclidean distance, with a full-window exclusion
  *    zone (b ≥ a+7) so a window never matches its own overlap. The
  *    all-pairs work is a LAG-KEYED sliding dot product: the day-grid
  *    self-join emits (t, lag) products once, and every window pair's
  *    cross term is a 7-row window sum partitioned by lag — O(n²) on
  *    the CALENDAR-BOUNDED daily table (n ≈ days), never on events.
  *    This is the "does this week's shape repeat" primitive behind
  *    seasonality auditing and anomaly triage.
  *  - q_time_yulewalker: AR(2) identification by the Yule–Walker
  *    equations on the same daily series — lag-1/lag-2 autocorrelations
  *    from exact 9dp-lattice centered products, φ₁ = r₁(1−r₂)/(1−r₁²),
  *    φ₂ = (r₂−r₁²)/(1−r₁²), the innovation-variance ratio
  *    1−φ₁r₁−φ₂r₂, and the one-step forecast from the last two
  *    observations. The model-identification companion to the
  *    existing acf/pacf/holt-winters family.
  *  - q_text_burrows: Burrows' Delta stylometric distance between
  *    document sources — per-source relative frequencies of the
  *    corpus-top-30 tokens, z-scored against the cross-source
  *    distribution, Delta(s₁,s₂) = mean |z₁−z₂|. The authorship /
  *    provenance-drift measure: two sources with near-zero Delta are
  *    stylistically interchangeable (a contamination signal for
  *    training-data provenance). All algebra on the bounded
  *    sources×30 grid after one token-count scan.
  *  - q_agg_kde: Gaussian kernel density of order totals on a fixed
  *    21-point evaluation grid with the Silverman normal-reference
  *    bandwidth h = 1.06·σ·n^{−1/5} — the smooth replacement for
  *    q_agg_histogram when bin edges would lie. One map-side pass:
  *    the 21-row grid broadcasts against the orders scan; each kernel
  *    term is rounded to a 12dp DECIMAL lattice so the density sum is
  *    exact and engine-order-free.
  *
  * Determinism: series values are exact BIGINT day counts; every
  * engine-order-sensitive sum (centered products, kernel terms) rides
  * an explicit DECIMAL lattice; z-scores and distances are fixed
  * double trees over exact aggregates, 6dp-rounded. Scale: motif and
  * yulewalker collapse events to the calendar-bounded day grid first;
  * burrows collapses documents to (source, token) counts then works
  * on the sources×30 grid; kde is one broadcast-grid scan with
  * map-side-combined decimal sums. */
object Analytics97 {

  /** Daily click-count series indexed 1..n in day order. */
  private def clickSeries(s: SparkSession, d: String): DataFrame = {
    val g = events(s, d).filter(col("event_type") === "click")
      .select(expr("us div 86400000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("v"))
    // BIGINT index: the oracle's row_number casts to BIGINT, and the
    // driver compare is schema-strict
    g.withColumn("t",
      row_number().over(Window.orderBy(col("day"))).cast("bigint"))
  }

  private val W = 7

  /** Top-5 z-normalized 7-day motif pairs on a (day, v, t) series.
    * No checkpoint: the global forward windows must keep their
    * Aggregate lineage visible for the WindowAudit bounded-input
    * contract, and the grid is day-bounded anyway. */
  private[graft] def motifPairs(ser: DataFrame): DataFrame = {
    val wFwd = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, W - 1)
    // per-start window stats (valid when the full 7 days exist)
    val st = ser
      .withColumn("cw", count(lit(1)).over(wFwd))
      .withColumn("sv", sum(col("v")).over(wFwd))
      // v² rides DECIMAL(19,0)² → (38,0): daily counts at corpus scale
      // can pass 2³¹·5 where BIGINT v·v wraps silently; the oracle SQL
      // casts its products to HUGEINT for the same headroom (a plain
      // BIGINT product there ERRORS at that magnitude in DuckDB rather
      // than wrapping — ADVICE r14)
      .withColumn("sv2", sum(expr(
        "CAST(v AS DECIMAL(19,0)) * CAST(v AS DECIMAL(19,0))"))
        .over(wFwd))
      .filter(col("cw") === W)
      .select(col("t").as("a"), col("sv"), col("sv2"),
        (col("sv").cast("double") / lit(W.toDouble)).as("mu"),
        expr(s"""sqrt(greatest(0.0, CAST(sv2 AS DOUBLE) / ${W}.0
                | - (CAST(sv AS DOUBLE) / ${W}.0)
                |   * (CAST(sv AS DOUBLE) / ${W}.0)))""".stripMargin)
          .as("sd"))
    // lag-keyed sliding dot product: prod(t, L) = v(t)·v(t+L)
    val prod = ser.select(col("t"), col("v"))
      .join(ser.select(col("t").as("t2"), col("v").as("v2")),
        col("t2") > col("t"))
      .select(col("t"), (col("t2") - col("t")).as("lag"),
        // same DECIMAL width as sv2 — cross products hit the same
        // BIGINT wrap bound
        expr("CAST(v AS DECIMAL(19,0)) * CAST(v2 AS DECIMAL(19,0))")
          .as("p"))
    val wLag = Window.partitionBy(col("lag")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, W - 1)
    val cross = prod
      .withColumn("cw", count(lit(1)).over(wLag))
      .withColumn("c", sum(col("p")).over(wLag))
      .filter(col("cw") === W && col("lag") >= W)
      .select(col("t").as("a"), (col("t") + col("lag")).as("b"),
        col("c"))
    cross
      .join(st.select(col("a"), col("mu").as("mua"), col("sd").as("sda")),
        Seq("a"))
      .join(st.select(col("a").as("b"), col("mu").as("mub"),
        col("sd").as("sdb")), Seq("b"))
      .filter(col("sda") > 0 && col("sdb") > 0)
      .select(col("a"), col("b"),
        round(sqrt(greatest(lit(0.0),
          lit(2.0 * W) * (lit(1.0)
            - (col("c").cast("double") - lit(W.toDouble) * col("mua")
              * col("mub"))
              / (lit(W.toDouble) * col("sda") * col("sdb"))))), 6)
          .as("zdist"))
      .orderBy(col("zdist"), col("a"), col("b")).limit(5)
  }

  private def qTimeMotif(s: SparkSession, d: String): DataFrame = {
    val ser = clickSeries(s, d)
    motifPairs(ser)
      .join(ser.select(col("t").as("a"), col("day").as("a_day")),
        Seq("a"))
      .join(ser.select(col("t").as("b"), col("day").as("b_day")),
        Seq("b"))
      .select(col("a").as("a_idx"), col("b").as("b_idx"),
        col("a_day"), col("b_day"), col("zdist"))
      .orderBy(col("zdist"), col("a_idx"), col("b_idx"))
  }

  /** Yule–Walker AR(2) on a (t, v) series (v BIGINT, t 1..n). */
  private[graft] def yuleWalker(ser: DataFrame): DataFrame = {
    val mu = ser.agg((sum(col("v")).cast("double")
      / count(lit(1)).cast("double")).as("mu"),
      max(col("t")).as("n"))
    val wT = Window.orderBy(col("t"))
    val lagged = ser.crossJoin(broadcast(mu))
      .withColumn("x", col("v").cast("double") - col("mu"))
      .withColumn("x1", lag(col("x"), 1).over(wT))
      .withColumn("x2", lag(col("x"), 2).over(wT))
    val c = lagged.agg(max(col("n")).as("n"), max(col("mu")).as("mu"),
      sum(expr("CAST(ROUND(x * x, 9) AS DECIMAL(38,9))")).as("c0"),
      sum(when(col("x1").isNotNull,
        expr("CAST(ROUND(x * x1, 9) AS DECIMAL(38,9))"))).as("c1"),
      sum(when(col("x2").isNotNull,
        expr("CAST(ROUND(x * x2, 9) AS DECIMAL(38,9))"))).as("c2"),
      max(when(col("t") === col("n"), col("x"))).as("xl1"),
      max(when(col("t") === col("n") - 1, col("x"))).as("xl2"))
    c.select(col("n").as("n_days"),
        when(dbl(col("c0")) > 0, round(dbl(col("c1")) / dbl(col("c0")), 6))
          .as("r1"),
        when(dbl(col("c0")) > 0, round(dbl(col("c2")) / dbl(col("c0")), 6))
          .as("r2"),
        col("mu"), col("xl1"), col("xl2"))
      .select(col("n_days"), col("r1"), col("r2"),
        when(col("r1").isNotNull && abs(lit(1.0)
          - col("r1") * col("r1")) > 1e-12,
          round(col("r1") * (lit(1.0) - col("r2"))
            / (lit(1.0) - col("r1") * col("r1")), 6)).as("phi1"),
        when(col("r1").isNotNull && abs(lit(1.0)
          - col("r1") * col("r1")) > 1e-12,
          round((col("r2") - col("r1") * col("r1"))
            / (lit(1.0) - col("r1") * col("r1")), 6)).as("phi2"),
        col("mu"), col("xl1"), col("xl2"))
      .select(col("n_days"), col("r1"), col("r2"), col("phi1"),
        col("phi2"),
        when(col("phi1").isNotNull, round(lit(1.0)
          - col("phi1") * col("r1") - col("phi2") * col("r2"), 6))
          .as("innov_ratio"),
        when(col("phi1").isNotNull && col("xl2").isNotNull,
          round(col("mu") + col("phi1") * col("xl1")
            + col("phi2") * col("xl2"), 4)).as("forecast"))
  }

  private def qTimeYulewalker(s: SparkSession, d: String): DataFrame =
    yuleWalker(clickSeries(s, d))

  /** Burrows' Delta between document sources over the corpus-top-30
    * token grid. */
  private def qTextBurrows(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val counts = tok.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
    val top = counts.groupBy(col("w")).agg(sum(col("c")).as("tc"))
      .orderBy(desc("tc"), col("w")).limit(30)
      .select(col("w"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("c")).as("nt"))
    // full sources×top-30 grid (zeros included — absence is signal)
    // relative frequencies on a 12dp DECIMAL lattice: the per-token
    // mean/variance sums across sources must be engine-order-free
    val f = totals.crossJoin(broadcast(top))
      .join(counts, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        expr("""CAST(ROUND(CAST(coalesce(c, 0L) AS DOUBLE)
               | / CAST(nt AS DOUBLE), 12) AS DECIMAL(18,12))"""
          .stripMargin).as("fd"))
    val dist = f.groupBy(col("w"))
      .agg(count(lit(1)).as("ns"), sum(col("fd")).as("sf"),
        sum(col("fd") * col("fd")).as("sf2"))
      .select(col("w"),
        (dbl(col("sf")) / dbl(col("ns"))).as("mf"),
        sqrt(greatest(lit(0.0), dbl(col("sf2")) / dbl(col("ns"))
          - (dbl(col("sf")) / dbl(col("ns")))
            * (dbl(col("sf")) / dbl(col("ns"))))).as("sdf"))
      .filter(col("sdf") > 0)
    val z = f.join(broadcast(dist), Seq("w"))
      .select(col("source"), col("w"),
        ((dbl(col("fd")) - col("mf")) / col("sdf")).as("z"))
    z.select(col("source").as("s1"), col("w"), col("z").as("z1"))
      .join(z.select(col("source").as("s2"), col("w"),
        col("z").as("z2")), Seq("w"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      // |Δz| terms ride a 9dp lattice for the same reason
      .agg(sum(expr("CAST(ROUND(abs(z1 - z2), 9) AS DECIMAL(38,9))"))
          .as("sz"),
        count(lit(1)).as("n_tokens"))
      .select(col("s1"), col("s2"),
        round(dbl(col("sz")) / dbl(col("n_tokens")), 6).as("delta"),
        col("n_tokens"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Gaussian KDE of order totals on a 21-point grid, Silverman h. */
  private def qAggKde(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)").as("x"))
    val m = o.agg(count(lit(1)).as("n"), min(col("x")).as("mn"),
        max(col("x")).as("mx"), sum(col("x")).as("sx"),
        sum(expr("CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))"))
          .as("sx2"))
      .select(col("n"), col("mn"), col("mx"),
        expr("""sqrt(greatest(0.0,
               |  CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE)
               |  - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               |    * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))))"""
          .stripMargin).as("sd"))
      .select(col("n"), col("mn"), col("mx"),
        when(col("sd") > 0 && col("mx") > col("mn"),
          lit(1.06) * col("sd")
            * pow(col("n").cast("double"), lit(-0.2))).as("h"))
    val grid = m.select(col("n"), col("mn"), col("mx"), col("h"),
        explode(expr("sequence(0, 20)")).as("i"))
      .filter(col("h").isNotNull)
      .select(col("n"), col("h"), col("i"),
        (col("mn").cast("double") + col("i").cast("double")
          * (col("mx") - col("mn")).cast("double") / lit(20.0)).as("g"))
    o.crossJoin(broadcast(grid))
      .select(col("n"), col("h"), col("i"), col("g"),
        // kernel terms ≤ 0.399: a 12dp lattice keeps the density sum
        // exact and engine-order-free
        expr("""CAST(ROUND(exp(-((g - CAST(x AS DOUBLE)) / h)
               |  * ((g - CAST(x AS DOUBLE)) / h) / 2.0)
               |  * 0.3989422804014327, 12) AS DECIMAL(38,12))"""
          .stripMargin).as("kt"))
      .groupBy(col("i"))
      .agg(max(col("g")).as("g"), max(col("n")).as("n"),
        max(col("h")).as("h"), sum(col("kt")).as("sk"))
      .select(col("i").as("grid_idx"),
        round(col("g") / 100.0, 4).as("price"),
        // density per DOLLAR = 100 × per-cent density
        round(lit(100.0) * dbl(col("sk"))
          / (col("n").cast("double") * col("h")), 9).as("density"))
      .orderBy(col("grid_idx"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_motif" -> (qTimeMotif _),
    "q_time_yulewalker" -> (qTimeYulewalker _),
    "q_text_burrows" -> (qTextBurrows _),
    "q_agg_kde" -> (qAggKde _),
  )

  private val serSql =
    """WITH g AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS v
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |ser AS (
      |  SELECT day, v,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      |  FROM g),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_time_motif" -> (serSql +
      """st AS (
        |  SELECT t AS a,
        |    count(*) OVER w AS cw,
        |    sum(v) OVER w AS sv,
        |    sum(CAST(v AS HUGEINT) * v) OVER w AS sv2
        |  FROM ser
        |  WINDOW w AS (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)),
        |stats AS (
        |  SELECT a, CAST(sv AS DOUBLE) / 7.0 AS mu,
        |    sqrt(greatest(0.0, CAST(sv2 AS DOUBLE) / 7.0
        |      - (CAST(sv AS DOUBLE) / 7.0) * (CAST(sv AS DOUBLE) / 7.0)))
        |      AS sd
        |  FROM st WHERE cw = 7),
        |prod AS (
        |  SELECT s1.t AS t, s2.t - s1.t AS lag, CAST(s1.v AS HUGEINT) * s2.v AS p
        |  FROM ser s1 JOIN ser s2 ON s2.t > s1.t),
        |cr AS (
        |  SELECT t AS a, lag,
        |    count(*) OVER w AS cw,
        |    sum(p) OVER w AS c
        |  FROM prod
        |  WINDOW w AS (PARTITION BY lag ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING)),
        |pairs AS (
        |  SELECT cr.a, cr.a + cr.lag AS b,
        |    ROUND(sqrt(greatest(0.0, 14.0 * (1.0
        |      - (CAST(cr.c AS DOUBLE) - 7.0 * sa.mu * sb.mu)
        |        / (7.0 * sa.sd * sb.sd)))), 6) AS zdist
        |  FROM cr
        |  JOIN stats sa ON sa.a = cr.a
        |  JOIN stats sb ON sb.a = cr.a + cr.lag
        |  WHERE cr.cw = 7 AND cr.lag >= 7 AND sa.sd > 0 AND sb.sd > 0),
        |top AS (SELECT a, b, zdist FROM pairs
        |        ORDER BY zdist, a, b LIMIT 5)
        |SELECT top.a AS a_idx, top.b AS b_idx,
        |  sa.day AS a_day, sb.day AS b_day, top.zdist
        |FROM top JOIN ser sa ON sa.t = top.a JOIN ser sb ON sb.t = top.b
        |ORDER BY zdist, a_idx, b_idx""".stripMargin),
    "q_time_yulewalker" -> (serSql +
      """mu AS (
        |  SELECT CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu,
        |    max(t) AS n
        |  FROM ser),
        |lagged AS (
        |  SELECT t, n, mu, CAST(v AS DOUBLE) - mu AS x,
        |    lag(CAST(v AS DOUBLE) - mu, 1) OVER (ORDER BY t) AS x1,
        |    lag(CAST(v AS DOUBLE) - mu, 2) OVER (ORDER BY t) AS x2
        |  FROM ser CROSS JOIN mu),
        |c AS (
        |  SELECT max(n) AS n, max(mu) AS mu,
        |    sum(CAST(ROUND(x * x, 9) AS DECIMAL(38,9))) AS c0,
        |    sum(CASE WHEN x1 IS NOT NULL
        |      THEN CAST(ROUND(x * x1, 9) AS DECIMAL(38,9)) END) AS c1,
        |    sum(CASE WHEN x2 IS NOT NULL
        |      THEN CAST(ROUND(x * x2, 9) AS DECIMAL(38,9)) END) AS c2,
        |    max(CASE WHEN t = n THEN x END) AS xl1,
        |    max(CASE WHEN t = n - 1 THEN x END) AS xl2
        |  FROM lagged),
        |r AS (
        |  SELECT n AS n_days,
        |    CASE WHEN CAST(c0 AS DOUBLE) > 0
        |      THEN ROUND(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE), 6)
        |    END AS r1,
        |    CASE WHEN CAST(c0 AS DOUBLE) > 0
        |      THEN ROUND(CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE), 6)
        |    END AS r2,
        |    mu, xl1, xl2
        |  FROM c),
        |p AS (
        |  SELECT n_days, r1, r2,
        |    CASE WHEN r1 IS NOT NULL AND abs(1.0 - r1 * r1) > 1e-12
        |      THEN ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6)
        |    END AS phi1,
        |    CASE WHEN r1 IS NOT NULL AND abs(1.0 - r1 * r1) > 1e-12
        |      THEN ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6)
        |    END AS phi2,
        |    mu, xl1, xl2
        |  FROM r)
        |SELECT n_days, r1, r2, phi1, phi2,
        |  CASE WHEN phi1 IS NOT NULL
        |    THEN ROUND(1.0 - phi1 * r1 - phi2 * r2, 6)
        |  END AS innov_ratio,
        |  CASE WHEN phi1 IS NOT NULL AND xl2 IS NOT NULL
        |    THEN ROUND(mu + phi1 * xl1 + phi2 * xl2, 4)
        |  END AS forecast
        |FROM p""".stripMargin),
    "q_text_burrows" ->
      """WITH tok AS (
        |  SELECT source, w
        |  FROM (SELECT source, unnest(string_split(lower(text), ' '))
        |          AS w FROM documents)
        |  WHERE length(w) > 0),
        |counts AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |top AS (
        |  SELECT w FROM counts GROUP BY w
        |  ORDER BY sum(c) DESC, w LIMIT 30),
        |totals AS (
        |  SELECT source, sum(c) AS nt FROM counts GROUP BY source),
        |f AS (
        |  SELECT totals.source, top.w,
        |    CAST(ROUND(CAST(coalesce(counts.c, 0) AS DOUBLE)
        |      / CAST(totals.nt AS DOUBLE), 12) AS DECIMAL(18,12)) AS fd
        |  FROM totals CROSS JOIN top
        |  LEFT JOIN counts ON counts.source = totals.source
        |    AND counts.w = top.w),
        |dist AS (
        |  SELECT w,
        |    CAST(sum(fd) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mf,
        |    sqrt(greatest(0.0,
        |      CAST(sum(fd * fd) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      - (CAST(sum(fd) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |        * (CAST(sum(fd) AS DOUBLE) / CAST(count(*) AS DOUBLE))))
        |      AS sdf
        |  FROM f GROUP BY w),
        |z AS (
        |  SELECT f.source, f.w,
        |    (CAST(f.fd AS DOUBLE) - dist.mf) / dist.sdf AS z
        |  FROM f JOIN dist ON f.w = dist.w WHERE dist.sdf > 0)
        |SELECT z1.source AS s1, z2.source AS s2,
        |  ROUND(CAST(sum(CAST(ROUND(abs(z1.z - z2.z), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS delta,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM z z1 JOIN z z2 ON z1.w = z2.w AND z1.source < z2.source
        |GROUP BY 1, 2
        |ORDER BY s1, s2""".stripMargin,
    "q_agg_kde" ->
      """WITH o AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS x
        |  FROM orders),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, min(x) AS mn,
        |    max(x) AS mx,
        |    sqrt(greatest(0.0,
        |      CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |        AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      - (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |        * (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))))
        |      AS sd
        |  FROM o),
        |hh AS (
        |  SELECT n, mn, mx,
        |    CASE WHEN sd > 0 AND mx > mn
        |      THEN 1.06 * sd * pow(CAST(n AS DOUBLE), -0.2) END AS h
        |  FROM m),
        |grid AS (
        |  SELECT n, h, i,
        |    CAST(mn AS DOUBLE) + CAST(i AS DOUBLE)
        |      * CAST(mx - mn AS DOUBLE) / 20.0 AS g
        |  FROM hh, (SELECT unnest(range(0, 21)) AS i)
        |  WHERE h IS NOT NULL),
        |terms AS (
        |  SELECT grid.i, grid.g, grid.n, grid.h,
        |    CAST(ROUND(exp(-((grid.g - CAST(o.x AS DOUBLE)) / grid.h)
        |      * ((grid.g - CAST(o.x AS DOUBLE)) / grid.h) / 2.0)
        |      * 0.3989422804014327, 12) AS DECIMAL(38,12)) AS kt
        |  FROM o CROSS JOIN grid)
        |SELECT i AS grid_idx,
        |  ROUND(max(g) / 100.0, 4) AS price,
        |  ROUND(100.0 * CAST(sum(kt) AS DOUBLE)
        |    / (CAST(max(n) AS DOUBLE) * max(h)), 9) AS density
        |FROM terms GROUP BY i
        |ORDER BY grid_idx""".stripMargin,
  )
}
