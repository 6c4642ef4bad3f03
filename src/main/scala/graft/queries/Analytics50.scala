package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 seventh wave: classifier-quality reporting and sequential
  * experiment monitoring —
  *
  *  - q_text_kappa: the chance-corrected evaluation report for the
  *    production language-ID classifier (accuracy alone is inflated by
  *    class imbalance; Cohen's κ and macro-F1 are what a labeling
  *    pipeline publishes next to its confusion matrix,
  *    q_text_langid_confusion).
  *  - q_agg_gst: group-sequential monitoring of a running experiment —
  *    the per-day cumulative z statistic against the O'Brien–Fleming
  *    spending boundary z·√(1/t), with the first-crossing day. Peeking
  *    at a fixed-α test daily inflates false positives; this is the
  *    standard correction every experimentation platform applies.
  *
  * Scale notes:
  *  - κ: the per-doc prediction is the production q_text_langid
  *    operator (one scan, map-side stopword counting); everything
  *    after is the langs×langs bounded grid. All marginals and the
  *    chance-agreement sum are exact BIGINT products; three final
  *    IEEE divisions.
  *  - GST: ONE scan collapses the stream to the calendar-bounded daily
  *    arm-moment table (exact DECIMAL Σv/Σv², the q_agg_ttest
  *    discipline); cumulative windows run over those ~tens of rows.
  *    Degenerate days (an arm still empty, zero pooled variance) gate
  *    to NULL identically on both engines. */
object Analytics50 {

  /** Cohen's κ + accuracy + macro-F1 of the stopword language-ID
    * against the labeled corpus: the one-row classifier report card. */
  private def qTextKappa(s: SparkSession, d: String): DataFrame = {
    val grid = LlmText.defs("q_text_langid")(s, d)
      .select(col("lang"), col("pred"))
      .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
    // class marginals over the union label space (actual ∪ predicted)
    val rows = grid.groupBy(col("lang").as("cls"))
      .agg(sum(col("n")).as("row_n"))
    val cols = grid.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).as("col_n"))
    val diag = grid.filter(col("lang") === col("pred"))
      .select(col("lang").as("cls"), col("n").as("diag_n"))
    val byClass = rows.join(cols, Seq("cls"), "full_outer")
      .join(diag, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("row_n"), lit(0L)).as("row_n"),
        coalesce(col("col_n"), lit(0L)).as("col_n"),
        coalesce(col("diag_n"), lit(0L)).as("diag_n"))
    val tot = grid.agg(sum(col("n")).as("nn"))
    byClass.crossJoin(broadcast(tot))
      .withColumn("f1", expr(
        // F1 = 2d / (row + col); 0 when the class was never hit
        "CASE WHEN row_n + col_n > 0 THEN " +
          "2.0 * CAST(diag_n AS DOUBLE) / CAST(row_n + col_n AS DOUBLE) " +
          "ELSE CAST(0.0 AS DOUBLE) END"))
      .agg(max(col("nn")).as("n"),
        sum(col("diag_n")).as("dsum"),
        sum(col("row_n") * col("col_n")).as("chance"),
        count(lit(1)).as("n_classes"),
        sum(expr("CAST(ROUND(f1, 9) AS DECIMAL(18,9))")).as("f1sum"))
      .selectExpr("n", "n_classes",
        "ROUND(CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy",
        // κ = (po − pe) / (1 − pe) with pe = Σ row·col / n²
        "CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE) " +
          "> CAST(chance AS DOUBLE) THEN " +
          "ROUND((CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE) " +
          "- CAST(chance AS DOUBLE) " +
          "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) " +
          "/ (1.0 - CAST(chance AS DOUBLE) " +
          "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) END AS kappa",
        "ROUND(CAST(f1sum AS DOUBLE) / CAST(n_classes AS DOUBLE), 6) " +
          "AS macro_f1")
  }

  /** Group-sequential monitor: per day, the cumulative treatment-vs-
    * control z on click value (arms = user-id parity), the information
    * fraction, the O'Brien–Fleming boundary 1.96/√t, the crossing
    * flag, and the first crossing day. */
  private def qAggGst(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .filter(col("event_type") === "click")
      .withColumn("day", expr("us div 86400000000"))
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "t").otherwise("c"))
      .withColumn("v", col("value").cast("decimal(18,6)"))
      .groupBy(col("day"))
      .agg(expr("count_if(arm = 't')").as("nt"),
        expr("count_if(arm = 'c')").as("nc"),
        sum(when(col("arm") === "t", col("v"))).as("st"),
        sum(when(col("arm") === "c", col("v"))).as("sc"),
        sum(when(col("arm") === "t", col("v") * col("v"))).as("qt"),
        sum(when(col("arm") === "c", col("v") * col("v"))).as("qc"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg((sum(col("nt")) + sum(col("nc"))).as("n_final"))
    val cum = daily.crossJoin(broadcast(tot))
      .select(col("day"), col("n_final"),
        sum(col("nt")).over(wCum).as("cnt"),
        sum(col("nc")).over(wCum).as("cnc"),
        sum(col("st")).over(wCum).as("cst"),
        sum(col("sc")).over(wCum).as("csc"),
        sum(col("qt")).over(wCum).as("cqt"),
        sum(col("qc")).over(wCum).as("cqc"))
      .selectExpr("day", "cnt + cnc AS n_cum", "n_final", "cnt", "cnc",
        "CASE WHEN cnt > 0 THEN CAST(cst AS DOUBLE) / cnt END AS mt",
        "CASE WHEN cnc > 0 THEN CAST(csc AS DOUBLE) / cnc END AS mc",
        "CASE WHEN cnt > 1 THEN (CAST(cqt AS DOUBLE) " +
          "- CAST(cst AS DOUBLE) * CAST(cst AS DOUBLE) / cnt) " +
          "/ (cnt - 1) END AS vt",
        "CASE WHEN cnc > 1 THEN (CAST(cqc AS DOUBLE) " +
          "- CAST(csc AS DOUBLE) * CAST(csc AS DOUBLE) / cnc) " +
          "/ (cnc - 1) END AS vc")
      .selectExpr("day", "n_cum", "n_final",
        "ROUND(CAST(n_cum AS DOUBLE) / CAST(n_final AS DOUBLE), 6) " +
          "AS info_frac",
        "CASE WHEN vt / cnt + vc / cnc > 0 THEN " +
          "(mt - mc) / sqrt(vt / cnt + vc / cnc) END AS z",
        "1.96 / sqrt(CAST(n_cum AS DOUBLE) / CAST(n_final AS DOUBLE)) " +
          "AS bound")
      .selectExpr("day", "n_cum", "info_frac",
        "ROUND(z, 6) AS z", "ROUND(bound, 6) AS obf_bound",
        "CASE WHEN z IS NOT NULL THEN " +
          "ROUND(abs(z), 9) >= ROUND(bound, 9) ELSE FALSE END AS crossed")
    val wAll = Window.partitionBy()
    cum
      .withColumn("first_cross_day",
        min(when(col("crossed"), col("day"))).over(wAll))
      .orderBy(col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_kappa" -> (qTextKappa _),
    "q_agg_gst" -> (qAggGst _),
  )

  val sql: Map[String, String] = Map(
    // same stopword-argmax prediction as the q_text_langid oracle,
    // reduced to the grid and the κ arithmetic (exact BIGINT marginal
    // products, three final divisions)
    "q_text_kappa" ->
      """WITH hits AS (
        |  SELECT lang,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('the','of','and','a','to','in','is'))) AS en_n,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('el','la','de','que','y','los','un'))) AS es_n,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('der','die','und','das','ist','ein','zu'))) AS de_n
        |  FROM documents),
        |scored AS (
        |  SELECT lang,
        |    CASE WHEN en_n >= es_n AND en_n >= de_n THEN 'en'
        |         WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred
        |  FROM hits),
        |grid AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
        |         FROM scored GROUP BY 1, 2),
        |rowm AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS row_n
        |         FROM grid GROUP BY 1),
        |colm AS (SELECT pred AS cls, CAST(sum(n) AS BIGINT) AS col_n
        |         FROM grid GROUP BY 1),
        |diag AS (SELECT lang AS cls, n AS diag_n FROM grid
        |         WHERE lang = pred),
        |byclass AS (
        |  SELECT cls, COALESCE(row_n, CAST(0 AS BIGINT)) AS row_n,
        |    COALESCE(col_n, CAST(0 AS BIGINT)) AS col_n,
        |    COALESCE(diag_n, CAST(0 AS BIGINT)) AS diag_n
        |  FROM rowm FULL OUTER JOIN colm USING (cls)
        |  LEFT JOIN diag USING (cls)),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM grid),
        |agg AS (
        |  SELECT max(nn) AS n, CAST(sum(diag_n) AS BIGINT) AS dsum,
        |    CAST(sum(row_n * col_n) AS BIGINT) AS chance,
        |    CAST(count(*) AS BIGINT) AS n_classes,
        |    sum(CAST(ROUND(CASE WHEN row_n + col_n > 0 THEN
        |      2.0 * CAST(diag_n AS DOUBLE) / CAST(row_n + col_n AS DOUBLE)
        |      ELSE CAST(0.0 AS DOUBLE) END, 9) AS DECIMAL(18,9))) AS f1sum
        |  FROM byclass CROSS JOIN tot)
        |SELECT n, n_classes,
        |  ROUND(CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy,
        |  CASE WHEN CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |       > CAST(chance AS DOUBLE) THEN
        |    ROUND((CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(chance AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    / (1.0 - CAST(chance AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) END AS kappa,
        |  ROUND(CAST(f1sum AS DOUBLE) / CAST(n_classes AS DOUBLE), 6)
        |    AS macro_f1
        |FROM agg""".stripMargin,
    "q_agg_gst" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nc,
        |    sum(CASE WHEN user_id % 2 = 0
        |        THEN CAST(value AS DECIMAL(18,6)) END) AS st,
        |    sum(CASE WHEN user_id % 2 <> 0
        |        THEN CAST(value AS DECIMAL(18,6)) END) AS sc,
        |    sum(CASE WHEN user_id % 2 = 0
        |        THEN CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6)) END) AS qt,
        |    sum(CASE WHEN user_id % 2 <> 0
        |        THEN CAST(value AS DECIMAL(18,6))
        |             * CAST(value AS DECIMAL(18,6)) END) AS qc
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |tot AS (SELECT CAST(sum(nt) + sum(nc) AS BIGINT) AS n_final
        |        FROM daily),
        |cum AS (
        |  SELECT day, n_final,
        |    CAST(sum(nt) OVER w AS BIGINT) AS cnt,
        |    CAST(sum(nc) OVER w AS BIGINT) AS cnc,
        |    CAST(sum(st) OVER w AS DECIMAL(38,6)) AS cst,
        |    CAST(sum(sc) OVER w AS DECIMAL(38,6)) AS csc,
        |    CAST(sum(qt) OVER w AS DECIMAL(38,12)) AS cqt,
        |    CAST(sum(qc) OVER w AS DECIMAL(38,12)) AS cqc
        |  FROM daily CROSS JOIN tot
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |stats AS (
        |  SELECT day, cnt + cnc AS n_cum, n_final, cnt, cnc,
        |    CASE WHEN cnt > 0 THEN CAST(cst AS DOUBLE) / cnt END AS mt,
        |    CASE WHEN cnc > 0 THEN CAST(csc AS DOUBLE) / cnc END AS mc,
        |    CASE WHEN cnt > 1 THEN (CAST(cqt AS DOUBLE)
        |      - CAST(cst AS DOUBLE) * CAST(cst AS DOUBLE) / cnt)
        |      / (cnt - 1) END AS vt,
        |    CASE WHEN cnc > 1 THEN (CAST(cqc AS DOUBLE)
        |      - CAST(csc AS DOUBLE) * CAST(csc AS DOUBLE) / cnc)
        |      / (cnc - 1) END AS vc
        |  FROM cum),
        |zed AS (
        |  SELECT day, n_cum,
        |    ROUND(CAST(n_cum AS DOUBLE) / CAST(n_final AS DOUBLE), 6)
        |      AS info_frac,
        |    CASE WHEN vt / cnt + vc / cnc > 0 THEN
        |      (mt - mc) / sqrt(vt / cnt + vc / cnc) END AS z,
        |    1.96 / sqrt(CAST(n_cum AS DOUBLE) / CAST(n_final AS DOUBLE))
        |      AS bound
        |  FROM stats),
        |flagged AS (
        |  SELECT day, n_cum, info_frac, ROUND(z, 6) AS z,
        |    ROUND(bound, 6) AS obf_bound,
        |    CASE WHEN z IS NOT NULL
        |         THEN ROUND(abs(z), 9) >= ROUND(bound, 9)
        |         ELSE FALSE END AS crossed
        |  FROM zed)
        |SELECT day, n_cum, info_frac, z, obf_bound, crossed,
        |  min(CASE WHEN crossed THEN day END) OVER () AS first_cross_day
        |FROM flagged ORDER BY day""".stripMargin,
  )
}
