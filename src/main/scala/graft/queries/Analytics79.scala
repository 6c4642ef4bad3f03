package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 fifth wave: forecast-quality & dataset-construction ops —
  *
  *  - q_agg_brier: Brier score with the Murphy decomposition
  *    (reliability − resolution + uncertainty) of the binned
  *    value→purchase forecaster — the proper-scoring-rule ledger
  *    behind q_agg_calibration's curve (identity holds exactly
  *    because the forecast is the bin mean);
  *  - q_agg_qq: the decile QQ table between purchase and view value
  *    distributions — exact lower quantiles read off the integer
  *    value lattice, the distribution-shift picture two medians miss;
  *  - q_sample_balanced: class-balanced downsampling of documents to
  *    the minority language count, deterministic md5-rank keeps — the
  *    "balance the mixture" step before training;
  *  - q_split_timecv: 3-fold rolling-origin cross-validation splits
  *    of the event stream (expanding train window, sliding test
  *    window) with per-fold counts and bounds — the time-series CV
  *    q_split_temporal's single cut generalizes to.
  *
  * Scale: brier/qq ride bounded bin/value grids; balanced sampling is
  * one partitioned rank window (never a global sort) under a 1-row
  * broadcast minority count; timecv tags each event against a 3-row
  * broadcast fold grid in one pass. */
object Analytics79 {

  /** Brier + Murphy decomposition over the 10-bin binned forecaster. */
  private def qAggBrier(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(
        expr("CAST(least(floor(least(value, 100.0) / 10.0), 9.0) AS INT)")
          .as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nk"), sum(col("y")).as("pk"))
    val tot = b.agg(sum(col("nk")).as("n"), sum(col("pk")).as("np"))
    b.crossJoin(broadcast(tot))
      .withColumn("ok", expr("CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)"))
      .withColumn("obar", expr("CAST(np AS DOUBLE) / CAST(n AS DOUBLE)"))
      // binned forecaster: p̄_k = ō_k, so REL = 0 by construction is
      // WRONG — forecast is the bin's mean scaled VALUE, not ō_k:
      // p̄_k = bin midpoint (bin·10+5)/100 — the fixed-bin forecaster
      .withColumn("pbar", expr("(CAST(bin AS DOUBLE) * 10.0 + 5.0) / 100.0"))
      .agg(max(col("n")).as("n"),
        sum(expr("CAST(ROUND(CAST(nk AS DOUBLE) * (pbar - ok) " +
          "* (pbar - ok), 9) AS DECIMAL(28,9))")).as("rel9"),
        sum(expr("CAST(ROUND(CAST(nk AS DOUBLE) * (ok - obar) " +
          "* (ok - obar), 9) AS DECIMAL(28,9))")).as("res9"),
        sum(expr("CAST(ROUND(CAST(nk AS DOUBLE) * (pbar * pbar " +
          "- 2.0 * pbar * ok + ok), 9) AS DECIMAL(28,9))")).as("bs9"),
        max(col("obar")).as("obar"))
      .select(col("n"),
        expr("ROUND(CAST(bs9 AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("brier"),
        expr("ROUND(CAST(rel9 AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("reliability"),
        expr("ROUND(CAST(res9 AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("resolution"),
        expr("ROUND(obar * (1.0 - obar), 6)").as("uncertainty"))
  }

  /** Decile QQ table purchase vs view (exact lattice quantiles). */
  private def qAggQq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vg = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type").as("g"),
        expr("CAST(ROUND(value * 10000) AS BIGINT)").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy(col("g")).orderBy(col("v"))
    val cum = vg.withColumn("ccum", sum(col("cnt")).over(wc))
      .join(broadcast(vg.groupBy(col("g"))
        .agg(sum(col("cnt")).as("n"))), Seq("g"))
    val qs = (1 to 9).map(_ / 10.0).toDF("q")
    val quant = cum.crossJoin(broadcast(qs))
      .filter(expr("ccum >= CAST(ceil(q * n) AS BIGINT)"))
      .groupBy(col("g"), col("q"))
      .agg(min(col("v")).as("vq"))
    quant.filter(col("g") === "purchase")
      .select(col("q"), col("vq").as("q_purchase"))
      .join(quant.filter(col("g") === "view")
        .select(col("q"), col("vq").as("q_view")), Seq("q"))
      .select(col("q"),
        expr("ROUND(CAST(q_purchase AS DOUBLE) / 10000.0, 4)")
          .as("q_purchase"),
        expr("ROUND(CAST(q_view AS DOUBLE) / 10000.0, 4)").as("q_view"),
        expr("ROUND(CAST(q_purchase - q_view AS DOUBLE) / 10000.0, 4)")
          .as("diff"))
      .orderBy(col("q"))
  }

  /** Balance documents to the minority language count (md5-rank keep). */
  private def qSampleBalanced(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
    val k = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("k"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id"))
    docs.crossJoin(broadcast(k))
      .withColumn("rn", row_number().over(w))
      .withColumn("keep", col("rn") <= col("k"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L))
          .as("kept_id_sum"))
      .orderBy(col("lang"))
  }

  /** 3-fold rolling-origin CV: expanding train, sliding test. */
  private def qSplitTimecv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d).select(expr("us div 86400000000").as("day"))
    val bounds = ev.agg(min(col("day")).as("mn"),
      (max(col("day")) - min(col("day")) + 1).as("span"))
    val folds = Seq(1, 2, 3).toDF("fold")
    ev.crossJoin(broadcast(bounds)).crossJoin(broadcast(folds))
      .withColumn("train_end", expr("mn + span * (2 + fold) div 6"))
      .withColumn("test_end", expr("mn + span * (3 + fold) div 6"))
      .groupBy(col("fold"))
      .agg(max(col("train_end")).as("train_end_day"),
        max(col("test_end")).as("test_end_day"),
        sum(when(col("day") < col("train_end"), 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("day") >= col("train_end") &&
          col("day") < col("test_end"), 1L).otherwise(0L)).as("n_test"))
      .orderBy(col("fold"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_brier" -> (qAggBrier _),
    "q_agg_qq" -> (qAggQq _),
    "q_sample_balanced" -> (qSampleBalanced _),
    "q_split_timecv" -> (qSplitTimecv _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_brier" ->
      """WITH b AS (
        |  SELECT CAST(least(floor(least(value, 100.0) / 10.0), 9.0)
        |      AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS nk,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pk
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |tot AS (SELECT sum(nk) AS n, sum(pk) AS np FROM b),
        |t AS (
        |  SELECT bin, nk,
        |    CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) AS ok,
        |    CAST(np AS DOUBLE) / CAST(n AS DOUBLE) AS obar,
        |    (CAST(bin AS DOUBLE) * 10.0 + 5.0) / 100.0 AS pbar, n
        |  FROM b CROSS JOIN tot)
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |  ROUND(CAST(sum(CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (pbar * pbar - 2.0 * pbar * ok + ok), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        |    AS brier,
        |  ROUND(CAST(sum(CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (pbar - ok) * (pbar - ok), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        |    AS reliability,
        |  ROUND(CAST(sum(CAST(ROUND(CAST(nk AS DOUBLE)
        |      * (ok - obar) * (ok - obar), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        |    AS resolution,
        |  ROUND(max(obar) * (1.0 - max(obar)), 6) AS uncertainty
        |FROM t""".stripMargin,
    "q_agg_qq" ->
      """WITH vg AS (
        |  SELECT event_type AS g, CAST(ROUND(value * 10000) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, v, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS ccum,
        |    sum(cnt) OVER (PARTITION BY g) AS n
        |  FROM vg),
        |qs AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q),
        |quant AS (
        |  SELECT g, q, min(v) AS vq
        |  FROM cum CROSS JOIN qs
        |  WHERE ccum >= CAST(ceil(q * n) AS BIGINT)
        |  GROUP BY g, q)
        |SELECT p.q, ROUND(CAST(p.vq AS DOUBLE) / 10000.0, 4) AS q_purchase,
        |  ROUND(CAST(v.vq AS DOUBLE) / 10000.0, 4) AS q_view,
        |  ROUND(CAST(p.vq - v.vq AS DOUBLE) / 10000.0, 4) AS diff
        |FROM (SELECT q, vq FROM quant WHERE g = 'purchase') p
        |JOIN (SELECT q, vq FROM quant WHERE g = 'view') v USING (q)
        |ORDER BY q""".stripMargin,
    "q_sample_balanced" ->
      """WITH k AS (
        |  SELECT min(n) AS k FROM (
        |    SELECT lang, count(*) AS n FROM documents GROUP BY lang) z),
        |r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_in,
        |  CAST(sum(CASE WHEN rn <= k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN rn <= k THEN doc_id ELSE 0 END) AS BIGINT)
        |    AS kept_id_sum
        |FROM r CROSS JOIN k
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_split_timecv" ->
      """WITH ev AS (
        |  SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
        |    AS BIGINT) AS day FROM events),
        |bounds AS (
        |  SELECT min(day) AS mn, max(day) - min(day) + 1 AS span FROM ev),
        |folds AS (SELECT unnest([1, 2, 3]) AS fold)
        |SELECT fold,
        |  max(mn + span * (2 + fold) // 6) AS train_end_day,
        |  max(mn + span * (3 + fold) // 6) AS test_end_day,
        |  CAST(sum(CASE WHEN day < mn + span * (2 + fold) // 6
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN day >= mn + span * (2 + fold) // 6
        |    AND day < mn + span * (3 + fold) // 6
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM ev CROSS JOIN bounds CROSS JOIN folds
        |GROUP BY fold ORDER BY fold""".stripMargin,
  )
}
