package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 twelfth wave: multi-scale series structure, corpus
  * comparison, and median-quadrant association — three oracled
  * operators:
  *
  *  - q_time_haar: unnormalized Haar wavelet detail energies at
  *    scales 2/4/8 days of the per-type daily count series — WHERE
  *    the variance lives by time scale (day-to-day noise vs weekly
  *    structure), the multi-resolution view q_time_periodogram's
  *    single dominant frequency can't give. Detail coefficients are
  *    signed block sums (±1 by half-block), so every energy is an
  *    exact BIGINT; incomplete trailing blocks are dropped (stated).
  *  - q_text_keyness: log-likelihood keyness G² (Dunning) of web-source
  *    documents vs the rest — the standard corpus-comparison answer to
  *    "which tokens CHARACTERIZE this slice", the per-token drilldown
  *    behind q_text_jsd's single divergence number. Top 20 by G²
  *    (6dp-rounded, token tie-break), sign = overrepresented side.
  *  - q_agg_blomqvist: Blomqvist's β (medial correlation) between
  *    daily click and purchase counts — sign concordance about the
  *    medians: the robust five-minute dependence check beside
  *    q_agg_spearman (ranks) and q_agg_corr (moments); on-median
  *    points are excluded (the classical convention, stated).
  *
  * Determinism: haar and blomqvist are pure BIGINT lattices to one
  * final division; keyness' G² terms are single double trees over
  * exact token counts (x·ln x of exact integers), ranked on the
  * 6dp-rounded statistic with a token tie-break. Scale: haar runs on
  * the calendar-bounded day grid via three grouped signed sums;
  * keyness is one token-keyed groupBy (the tfidf shuffle) + a
  * TakeOrdered top-k (no global window); blomqvist is a bounded
  * day-grid pair count against two broadcast medians. */
object Analytics113 {

  private def dailyCounts(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type").as("et"),
        expr("us div 86400000000").as("day"))
      .groupBy(col("et"), col("day"))
      .agg(count(lit(1)).as("c"))

  private def qTimeHaar(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("et")).orderBy(col("day"))
    val idx = dailyCounts(s, d)
      .withColumn("t", row_number().over(w).cast("long") - 1)
      .localCheckpoint(true)
    val levels = s.range(1, 4).select(col("id").as("lvl"))
    val signed = idx.crossJoin(broadcast(levels))
      .withColumn("blk", expr("t div shiftleft(1L, CAST(lvl AS INT))"))
      .withColumn("sgn", when(
        expr("(t div shiftleft(1L, CAST(lvl AS INT) - 1)) % 2") === 0, 1L)
        .otherwise(-1L))
    val dcoef = signed.groupBy(col("et"), col("lvl"), col("blk"))
      .agg(sum(col("sgn") * col("c")).as("dd"),
        count(lit(1)).as("nb"))
      .filter(col("nb") === expr("shiftleft(1L, CAST(lvl AS INT))")) // full blocks
    val energy = dcoef.groupBy(col("et"), col("lvl"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("dd") * col("dd")).as("energy"))
    val tot = energy.groupBy(col("et"))
      .agg(sum(col("energy")).as("etot"))
    energy.join(tot, Seq("et"))
      .select(col("et").as("event_type"),
        expr("shiftleft(1L, CAST(lvl AS INT))").as("scale_days"),
        col("n_blocks"), col("energy"),
        when(col("etot") > 0,
          round(dbl(col("energy")) / dbl(col("etot")), 6)).as("share"))
      .orderBy(col("event_type"), col("scale_days"))
  }

  private def qTextKeyness(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(when(col("source") === "web", 1L).otherwise(0L).as("ia"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val counts = tok.groupBy(col("w"))
      .agg(sum(col("ia")).as("a"), sum(lit(1L) - col("ia")).as("b"))
    val totals = counts.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    counts.crossJoin(broadcast(totals))
      .filter(col("a") + col("b") >= 5) // rare-token floor (stated)
      .withColumn("ea", dbl(col("na")) * dbl(col("a") + col("b"))
        / (dbl(col("na")) + dbl(col("nb"))))
      .withColumn("eb", dbl(col("nb")) * dbl(col("a") + col("b"))
        / (dbl(col("na")) + dbl(col("nb"))))
      .withColumn("g2", round(lit(2.0) * (
        when(col("a") > 0, dbl(col("a")) * log(dbl(col("a")) / col("ea")))
          .otherwise(lit(0.0))
        + when(col("b") > 0, dbl(col("b")) * log(dbl(col("b")) / col("eb")))
          .otherwise(lit(0.0))), 6))
      .select(col("w").as("token"), col("a").as("n_web"),
        col("b").as("n_rest"), col("g2"),
        when(dbl(col("a")) * (dbl(col("na")) + dbl(col("nb")))
          > dbl(col("na")) * dbl(col("a") + col("b")), lit(1L))
          .otherwise(lit(-1L)).as("web_side"))
      .orderBy(col("g2").desc, col("token"))
      .limit(20)
  }

  private def qAggBlomqvist(s: SparkSession, d: String): DataFrame = {
    val wide = dailyCounts(s, d)
      .groupBy(col("day"))
      .agg(sum(when(col("et") === "click", col("c"))).as("x"),
        sum(when(col("et") === "purchase", col("c"))).as("y"))
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    wide.createOrReplaceTempView("graft_blomq_w")
    val med = s.sql(
      """SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS mx,
        |       percentile_disc(0.5) WITHIN GROUP (ORDER BY y) AS my
        |FROM graft_blomq_w""".stripMargin)
    wide.crossJoin(broadcast(med))
      .agg(count(lit(1)).as("n_days"),
        sum(when((col("x") > col("mx") && col("y") > col("my")) ||
          (col("x") < col("mx") && col("y") < col("my")), 1L)
          .otherwise(0L)).as("conc"),
        sum(when((col("x") > col("mx") && col("y") < col("my")) ||
          (col("x") < col("mx") && col("y") > col("my")), 1L)
          .otherwise(0L)).as("disc"))
      .select(col("n_days"), col("conc"), col("disc"),
        when(col("conc") + col("disc") > 0,
          round((dbl(col("conc")) - dbl(col("disc")))
            / (dbl(col("conc")) + dbl(col("disc"))), 6)).as("beta"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_haar" -> (qTimeHaar _),
    "q_text_keyness" -> (qTextKeyness _),
    "q_agg_blomqvist" -> (qAggBlomqvist _),
  )

  val sql: Map[String, String] = Map(
    "q_time_haar" ->
      """WITH daily AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |idx AS MATERIALIZED (
        |  SELECT et, c,
        |    CAST(row_number() OVER (PARTITION BY et ORDER BY day)
        |      AS BIGINT) - 1 AS t
        |  FROM daily),
        |signed AS (
        |  SELECT et, l.lvl, c,
        |    t // (1 << CAST(l.lvl AS INT)) AS blk,
        |    CASE WHEN (t // (1 << (CAST(l.lvl AS INT) - 1))) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM idx CROSS JOIN
        |    (SELECT unnest([1, 2, 3]) AS lvl) l),
        |dcoef AS (
        |  SELECT et, lvl, blk, CAST(sum(sgn * c) AS BIGINT) AS dd,
        |    CAST(count(*) AS BIGINT) AS nb
        |  FROM signed GROUP BY 1, 2, 3),
        |energy AS (
        |  SELECT et, lvl, CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(sum(dd * dd) AS BIGINT) AS energy
        |  FROM dcoef WHERE nb = (1 << CAST(lvl AS INT))
        |  GROUP BY 1, 2),
        |tot AS (SELECT et, CAST(sum(energy) AS BIGINT) AS etot
        |        FROM energy GROUP BY et)
        |SELECT energy.et AS event_type,
        |  CAST(1 << CAST(lvl AS INT) AS BIGINT) AS scale_days,
        |  n_blocks, energy,
        |  CASE WHEN etot > 0 THEN
        |    ROUND(CAST(energy AS DOUBLE) / CAST(etot AS DOUBLE), 6)
        |  END AS share
        |FROM energy JOIN tot ON tot.et = energy.et
        |ORDER BY event_type, scale_days""".stripMargin,
    "q_text_keyness" ->
      """WITH tok AS (
        |  SELECT CASE WHEN source = 'web' THEN 1 ELSE 0 END AS ia,
        |    u.w
        |  FROM documents, unnest(string_split(text, ' ')) AS u(w)
        |  WHERE u.w <> ''),
        |counts AS (
        |  SELECT w, CAST(sum(ia) AS BIGINT) AS a,
        |    CAST(sum(1 - ia) AS BIGINT) AS b
        |  FROM tok GROUP BY w),
        |totals AS (SELECT CAST(sum(a) AS BIGINT) AS na,
        |                  CAST(sum(b) AS BIGINT) AS nb
        |           FROM counts),
        |g AS (
        |  SELECT w, a, b, na, nb,
        |    CAST(na AS DOUBLE) * CAST(a + b AS DOUBLE)
        |      / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS ea,
        |    CAST(nb AS DOUBLE) * CAST(a + b AS DOUBLE)
        |      / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS eb
        |  FROM counts CROSS JOIN totals
        |  WHERE a + b >= 5)
        |SELECT w AS token, a AS n_web, b AS n_rest,
        |  ROUND(2.0 * (
        |    CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
        |      * ln(CAST(a AS DOUBLE) / ea) ELSE 0.0 END
        |    + CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
        |      * ln(CAST(b AS DOUBLE) / eb) ELSE 0.0 END), 6) AS g2,
        |  CASE WHEN CAST(a AS DOUBLE)
        |      * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
        |      > CAST(na AS DOUBLE) * CAST(a + b AS DOUBLE)
        |    THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END
        |    AS web_side
        |FROM g
        |ORDER BY g2 DESC, token LIMIT 20""".stripMargin,
    "q_agg_blomqvist" ->
      """WITH daily AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |wide AS (
        |  SELECT day,
        |    coalesce(sum(CASE WHEN et = 'click' THEN c END), 0) AS x,
        |    coalesce(sum(CASE WHEN et = 'purchase' THEN c END), 0) AS y
        |  FROM daily GROUP BY day),
        |med AS (
        |  SELECT quantile_disc(x, 0.5) AS mx, quantile_disc(y, 0.5) AS my
        |  FROM wide)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN (x > mx AND y > my) OR (x < mx AND y < my)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |  CAST(sum(CASE WHEN (x > mx AND y < my) OR (x < mx AND y > my)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        |  CASE WHEN sum(CASE WHEN (x > mx AND y > my) OR (x < mx AND y < my)
        |      THEN 1 ELSE 0 END)
        |    + sum(CASE WHEN (x > mx AND y < my) OR (x < mx AND y > my)
        |      THEN 1 ELSE 0 END) > 0 THEN
        |    ROUND((CAST(sum(CASE WHEN (x > mx AND y > my)
        |          OR (x < mx AND y < my) THEN 1 ELSE 0 END) AS DOUBLE)
        |      - CAST(sum(CASE WHEN (x > mx AND y < my)
        |          OR (x < mx AND y > my) THEN 1 ELSE 0 END) AS DOUBLE))
        |      / (CAST(sum(CASE WHEN (x > mx AND y > my)
        |          OR (x < mx AND y < my) THEN 1 ELSE 0 END) AS DOUBLE)
        |        + CAST(sum(CASE WHEN (x > mx AND y < my)
        |          OR (x < mx AND y > my) THEN 1 ELSE 0 END) AS DOUBLE)),
        |      6) END AS beta
        |FROM wide CROSS JOIN med""".stripMargin,
  )
}
