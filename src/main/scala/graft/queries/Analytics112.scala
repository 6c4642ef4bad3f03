package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 eleventh wave: the survival-analysis and agreement
  * completions — three oracled operators:
  *
  *  - q_agg_gehan: Gehan–Breslow–Wilcoxon test on q_agg_logrank's
  *    A/B time-to-purchase setup — the EARLY-difference-sensitive
  *    weighted logrank (w_t = total at risk): logrank weights every
  *    event time equally and so can miss arms that separate early and
  *    re-converge; a survival review runs both.
  *  - q_agg_wkappa: weighted Cohen's kappa (linear AND quadratic) on
  *    the ordinal 5×5 agreement grid of two document length measures
  *    (char-bucket vs token-bucket raters) — unweighted kappa
  *    (q_text_kappa) treats off-by-one and off-by-four ordinal
  *    disagreements identically; the weighted forms are the standard
  *    ordinal correction.
  *  - q_agg_cindex: Harrell's concordance index for "does higher
  *    click activity predict faster conversion" — THE survival-model
  *    discrimination metric. The O(n²) usable-pair definition
  *    collapses exactly to a bounded (event-day × score) grid with
  *    two cumulative windows: suffix-later counts per score over
  *    time, then prefix counts per event day over score; tied scores
  *    ride the 2× half-pair lattice.
  *
  * Determinism: gehan's weighted terms round to a 6dp DECIMAL lattice
  * before summation (n_t·(d−e) products would overflow exact decimal
  * scale rules past precision 38); wkappa expected cells ride 9dp
  * DECIMAL (the CMH discipline); cindex is pure BIGINT pair counting
  * in 2× space to one final division. Scale: gehan/cindex collapse
  * the event stream to day-bounded grids in one scan; wkappa is one
  * documents scan to a 5×5 grid. */
object Analytics112 {

  /** (user, arm, duration, event) — q_agg_logrank's frame (same md5
    * parity arms, same censoring convention). */
  private def survFrame(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("us div 86400000000").as("day"))
    ev.groupBy(col("user_id")).agg(
        min(col("day")).as("d0"),
        max(col("day")).as("dl"),
        min(when(col("event_type") === "purchase", col("day")))
          .as("dp"))
      .select(col("user_id"),
        when(expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), " +
          "1, 6), 16, 10) AS BIGINT) % 2") === 0, "A").otherwise("B")
          .as("arm"),
        (coalesce(col("dp"), col("dl")) - col("d0")).as("tt"),
        when(col("dp").isNotNull, 1L).otherwise(0L).as("e"))
  }

  private def qAggGehan(s: SparkSession, d: String): DataFrame = {
    val users = survFrame(s, d).localCheckpoint(true)
    val totals = users.groupBy(col("arm")).agg(count(lit(1)).as("ntot"))
    val byT = users.groupBy(col("tt"), col("arm"))
      .agg(sum(col("e")).as("dth"), count(lit(1)).as("rem"))
    val wA = Window.partitionBy(col("arm")).orderBy(col("tt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.join(broadcast(totals), Seq("arm"))
      .withColumn("atrisk",
        col("ntot") - coalesce(sum(col("rem")).over(wA), lit(0L)))
    val wide = risk.groupBy(col("tt")).agg(
        sum(when(col("arm") === "A", col("dth"))).as("d1"),
        sum(when(col("arm") === "B", col("dth"))).as("d2"),
        sum(when(col("arm") === "A", col("atrisk"))).as("n1r"),
        sum(when(col("arm") === "B", col("atrisk"))).as("n2r"))
      .select(col("tt"),
        coalesce(col("d1"), lit(0L)).as("d1"),
        coalesce(col("d2"), lit(0L)).as("d2"),
        coalesce(col("n1r"), lit(0L)).as("n1r"),
        coalesce(col("n2r"), lit(0L)).as("n2r"))
      .filter(col("d1") + col("d2") > 0)
    // Gehan weight w_t = n_t (total at risk): per-time terms computed
    // in double and 6dp-rounded BEFORE the sum — nt²·v as exact
    // DECIMAL products would exceed precision 38 and Spark's
    // allowPrecisionLoss trims the scale DuckDB keeps
    val terms = wide
      .withColumn("nt", col("n1r") + col("n2r"))
      .withColumn("dt", col("d1") + col("d2"))
      .filter(col("nt") > 0)
      .select(
        expr("""CAST(ROUND(CAST(nt AS DOUBLE) * (CAST(d1 AS DOUBLE)
               |  - CAST(dt AS DOUBLE) * CAST(n1r AS DOUBLE)
               |    / CAST(nt AS DOUBLE)), 6) AS DECIMAL(28,6))"""
          .stripMargin).as("wu"),
        when(col("nt") > 1,
          expr("""CAST(ROUND(CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                 |  * CAST(dt AS DOUBLE)
                 |  * (CAST(n1r AS DOUBLE) / CAST(nt AS DOUBLE))
                 |  * (1.0 - CAST(n1r AS DOUBLE) / CAST(nt AS DOUBLE))
                 |  * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                 |  / (CAST(nt AS DOUBLE) - 1.0), 6)
                 | AS DECIMAL(28,6))""".stripMargin))
          .otherwise(lit(0).cast("decimal(28,6)")).as("wv"))
    terms.agg(count(lit(1)).as("n_times"),
        sum(col("wu")).as("u"), sum(col("wv")).as("v"))
      .select(col("n_times"), round(dbl(col("u")), 6).as("u_gehan"),
        when(dbl(col("v")) > 0,
          round(dbl(col("u")) / sqrt(dbl(col("v"))), 6)).as("z"))
  }

  /** Ordinal 5-level raters: char-length bucket vs token-count
    * bucket per document. */
  private def qAggWkappa(s: SparkSession, d: String): DataFrame = {
    val rated = t(s, d, "documents")
      .select(
        least(lit(4L), expr("CAST(n_chars AS BIGINT) div 500")).as("ra"),
        least(lit(4L),
          expr("CAST(size(split(text, ' ')) AS BIGINT) div 100"))
          .as("rb"))
    val cells = rated.groupBy(col("ra"), col("rb"))
      .agg(count(lit(1)).as("o"))
      .select(col("ra").as("ca"), col("rb").as("cb"), col("o"))
      .localCheckpoint(true) // ≤25 cells
    val margins = cells
      .groupBy(col("ca")).agg(sum(col("o")).as("rowc"))
      .withColumnRenamed("ca", "ra")
      .crossJoin(cells.groupBy(col("cb")).agg(sum(col("o")).as("colc"))
        .withColumnRenamed("cb", "rb"))
    val n = cells.agg(sum(col("o")).as("n"))
    val grid = margins.crossJoin(broadcast(n))
      .join(cells, col("ca") === col("ra") && col("cb") === col("rb"),
        "left")
      .select(col("ra"), col("rb"),
        coalesce(col("o"), lit(0L)).as("o"), col("rowc"), col("colc"),
        col("n"))
      .withColumn("ee", expr(
        """CAST(ROUND(CAST(rowc AS DOUBLE) * CAST(colc AS DOUBLE)
          |  / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))""".stripMargin))
      .withColumn("dlin", abs(col("ra") - col("rb")))
      .withColumn("dquad", (col("ra") - col("rb")) * (col("ra") - col("rb")))
    grid.agg(max(col("n")).as("n"),
        sum(col("dlin") * col("o")).as("ol"),
        sum(col("dlin") * col("ee")).as("el"),
        sum(col("dquad") * col("o")).as("oq"),
        sum(col("dquad") * col("ee")).as("eq"))
      .select(col("n"),
        when(dbl(col("el")) > 0,
          round(lit(1.0) - dbl(col("ol")) / dbl(col("el")), 6))
          .as("kappa_linear"),
        when(dbl(col("eq")) > 0,
          round(lit(1.0) - dbl(col("oq")) / dbl(col("eq")), 6))
          .as("kappa_quadratic"))
  }

  /** Harrell's C: score = click count, outcome = q_agg_logrank's
    * (tt, e) frame. Usable pairs: (i event, j with t_j > t_i) plus
    * (i event, j censored at t_i); concordant when score_i > score_j,
    * ties count ½ (2× lattice). */
  private def qAggCindex(s: SparkSession, d: String): DataFrame = {
    val clicks = events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"))
    val u = survFrame(s, d).join(clicks, Seq("user_id"))
      .select(col("tt"), col("e"), col("x"))
    // (t, x) grid: event deaths and censor counts
    val cells = u.groupBy(col("tt"), col("x"))
      .agg(sum(col("e")).as("d"),
        sum(lit(1L) - col("e")).as("c")).localCheckpoint(true)
    // later(t, x) = all removals strictly after t (events or censors)
    // at score x, PLUS censors exactly at t (they outlive the event)
    val wSuffix = Window.partitionBy(col("x")).orderBy(col("tt"))
      .rowsBetween(1, Window.unboundedFollowing)
    val later = cells
      .withColumn("lat",
        coalesce(sum(col("d") + col("c")).over(wSuffix), lit(0L))
          + col("c"))
    // dense (t, x) grid is sparse — cumulative-over-score needs every
    // (event-t, x) pairing: join event rows to the later table per t
    // via the score-prefix trick on the SAME grid: for each t, order
    // rows by x and take running sums of lat
    val wPrefix = Window.partitionBy(col("tt")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAllT = Window.partitionBy(col("tt"))
    val counted = later
      .withColumn("lat_below", coalesce(sum(col("lat")).over(wPrefix),
        lit(0L)))
      .withColumn("lat_total", sum(col("lat")).over(wAllT))
      .filter(col("d") > 0)
      // concordant×2: later pairs with LOWER score ×2 + equal score ×1
      .select(
        (col("d") * col("lat_below") * 2
          + col("d") * col("lat")).as("conc2"),
        (col("d") * col("lat_total")).as("usable"))
    counted.agg(sum(col("usable")).as("pairs"),
        sum(col("conc2")).as("conc2"))
      .select(col("pairs"),
        when(col("pairs") > 0,
          round(dbl(col("conc2")) / 2.0 / dbl(col("pairs")), 6))
          .as("c_index"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_gehan" -> (qAggGehan _),
    "q_agg_wkappa" -> (qAggWkappa _),
    "q_agg_cindex" -> (qAggCindex _),
  )

  private val survSql =
    """ev AS (
      |  SELECT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events),
      |users AS (
      |  SELECT user_id,
      |    CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(
      |          substr(md5(CAST(user_id AS VARCHAR)), 1, 6), ''),
      |          ch -> CAST(strpos('0123456789abcdef', ch) - 1
      |            AS BIGINT))),
      |        (h, x) -> h * 16 + x) % 2 = 0
      |      THEN 'A' ELSE 'B' END AS arm,
      |    coalesce(min(CASE WHEN event_type = 'purchase' THEN day END),
      |      max(day)) - min(day) AS tt,
      |    CASE WHEN min(CASE WHEN event_type = 'purchase' THEN day END)
      |      IS NOT NULL THEN 1 ELSE 0 END AS e
      |  FROM ev GROUP BY user_id)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_gehan" ->
      (s"""WITH $survSql,
        |totals AS (SELECT arm, CAST(count(*) AS BIGINT) AS ntot
        |           FROM users GROUP BY arm),
        |byt AS (
        |  SELECT tt, arm, CAST(sum(e) AS BIGINT) AS dth,
        |    CAST(count(*) AS BIGINT) AS rem
        |  FROM users GROUP BY tt, arm),
        |risk AS (
        |  SELECT byt.tt, byt.arm, dth,
        |    ntot - coalesce(sum(rem) OVER (PARTITION BY byt.arm
        |      ORDER BY tt ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS atrisk
        |  FROM byt JOIN totals ON totals.arm = byt.arm),
        |wide AS (
        |  SELECT tt,
        |    coalesce(sum(CASE WHEN arm = 'A' THEN dth END), 0) AS d1,
        |    coalesce(sum(CASE WHEN arm = 'B' THEN dth END), 0) AS d2,
        |    coalesce(sum(CASE WHEN arm = 'A' THEN atrisk END), 0)
        |      AS n1r,
        |    coalesce(sum(CASE WHEN arm = 'B' THEN atrisk END), 0)
        |      AS n2r
        |  FROM risk GROUP BY tt
        |  HAVING coalesce(sum(CASE WHEN arm = 'A' THEN dth END), 0)
        |    + coalesce(sum(CASE WHEN arm = 'B' THEN dth END), 0) > 0),
        |terms AS (
        |  SELECT
        |    CAST(ROUND(CAST(n1r + n2r AS DOUBLE)
        |      * (CAST(d1 AS DOUBLE) - CAST(d1 + d2 AS DOUBLE)
        |        * CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE)),
        |      6) AS DECIMAL(28,6)) AS wu,
        |    CASE WHEN n1r + n2r > 1 THEN
        |      CAST(ROUND(CAST(n1r + n2r AS DOUBLE)
        |        * CAST(n1r + n2r AS DOUBLE) * CAST(d1 + d2 AS DOUBLE)
        |        * (CAST(n1r AS DOUBLE) / CAST(n1r + n2r AS DOUBLE))
        |        * (1.0 - CAST(n1r AS DOUBLE)
        |          / CAST(n1r + n2r AS DOUBLE))
        |        * (CAST(n1r + n2r AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
        |        / (CAST(n1r + n2r AS DOUBLE) - 1.0), 6)
        |        AS DECIMAL(28,6))
        |      ELSE CAST(0 AS DECIMAL(28,6)) END AS wv
        |  FROM wide WHERE n1r + n2r > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_times,
        |  ROUND(CAST(sum(wu) AS DOUBLE), 6) AS u_gehan,
        |  CASE WHEN CAST(sum(wv) AS DOUBLE) > 0 THEN
        |    ROUND(CAST(sum(wu) AS DOUBLE)
        |      / sqrt(CAST(sum(wv) AS DOUBLE)), 6) END AS z
        |FROM terms""".stripMargin),
    "q_agg_wkappa" ->
      """WITH rated AS (
        |  SELECT least(4, CAST(n_chars AS BIGINT) // 500) AS ra,
        |    least(4, CAST(len(string_split(text, ' ')) AS BIGINT)
        |      // 100) AS rb
        |  FROM documents),
        |cells AS (
        |  SELECT ra, rb, CAST(count(*) AS BIGINT) AS o
        |  FROM rated GROUP BY ra, rb),
        |rowc AS (SELECT ra, CAST(sum(o) AS BIGINT) AS rowc
        |         FROM cells GROUP BY ra),
        |colc AS (SELECT rb, CAST(sum(o) AS BIGINT) AS colc
        |         FROM cells GROUP BY rb),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |grid AS (
        |  SELECT rowc.ra, colc.rb, coalesce(cells.o, 0) AS o,
        |    rowc.rowc, colc.colc, n.n,
        |    CAST(ROUND(CAST(rowc.rowc AS DOUBLE)
        |      * CAST(colc.colc AS DOUBLE) / CAST(n.n AS DOUBLE), 9)
        |      AS DECIMAL(28,9)) AS ee,
        |    abs(rowc.ra - colc.rb) AS dlin,
        |    (rowc.ra - colc.rb) * (rowc.ra - colc.rb) AS dquad
        |  FROM rowc CROSS JOIN colc CROSS JOIN n
        |  LEFT JOIN cells ON cells.ra = rowc.ra AND cells.rb = colc.rb)
        |SELECT max(n) AS n,
        |  CASE WHEN CAST(sum(dlin * ee) AS DOUBLE) > 0 THEN
        |    ROUND(1.0 - CAST(sum(dlin * o) AS DOUBLE)
        |      / CAST(sum(dlin * ee) AS DOUBLE), 6) END AS kappa_linear,
        |  CASE WHEN CAST(sum(dquad * ee) AS DOUBLE) > 0 THEN
        |    ROUND(1.0 - CAST(sum(dquad * o) AS DOUBLE)
        |      / CAST(sum(dquad * ee) AS DOUBLE), 6) END
        |    AS kappa_quadratic
        |FROM grid""".stripMargin,
    "q_agg_cindex" ->
      (s"""WITH $survSql,
        |clicks AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM ev GROUP BY user_id),
        |u AS (SELECT tt, e, x FROM users
        |      JOIN clicks ON clicks.user_id = users.user_id),
        |cells AS (
        |  SELECT tt, x, CAST(sum(e) AS BIGINT) AS d,
        |    CAST(sum(1 - e) AS BIGINT) AS c
        |  FROM u GROUP BY tt, x),
        |later AS (
        |  SELECT tt, x, d, c,
        |    coalesce(sum(d + c) OVER (PARTITION BY x ORDER BY tt
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
        |      + c AS lat
        |  FROM cells),
        |counted AS (
        |  SELECT d,
        |    coalesce(sum(lat) OVER (PARTITION BY tt ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS lat_below,
        |    lat, sum(lat) OVER (PARTITION BY tt) AS lat_total
        |  FROM later)
        |SELECT CAST(sum(d * lat_total) AS BIGINT) AS pairs,
        |  CASE WHEN sum(d * lat_total) > 0 THEN
        |    ROUND(CAST(sum(d * lat_below * 2 + d * lat) AS DOUBLE)
        |      / 2.0 / CAST(sum(d * lat_total) AS DOUBLE), 6) END
        |    AS c_index
        |FROM counted WHERE d > 0""".stripMargin),
  )
}
