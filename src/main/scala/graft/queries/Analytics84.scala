package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 second wave: the ranking / retrieval-evaluation metric
  * family — what a search, recommendation, or RAG pipeline reports
  * when it asks "is the ranker any good":
  *
  *  - q_agg_ndcg: NDCG@10 per order priority — each order is a
  *    "query", its lineitems ranked by extended price (the model
  *    score) against a graded relevance label; DCG normalized by the
  *    ideal ordering's DCG;
  *  - q_agg_mrr: mean reciprocal rank of the first returned ('R')
  *    item under the same ranking;
  *  - q_agg_map: mean average precision with discounted lines
  *    (> 5%) as the relevant set;
  *  - q_agg_prauc: area under the precision-recall curve (average
  *    precision over score thresholds) for purchase-vs-view
  *    separation — the imbalanced-class companion to q_agg_auc's ROC,
  *    on the same exact decimal bucket lattice;
  *  - q_agg_youden: the optimal operating threshold — argmax of
  *    Youden's J = TPR − FPR over the same bucket grid, with
  *    sensitivity/specificity at the optimum.
  *
  * Determinism: every ranking is a row_number with a total tie-break
  * (score DESC, line number ASC) identical in both engines; per-rank
  * terms (gain/log2, reciprocal ranks, precision@k) are rounded to 12
  * dp and summed in DECIMAL (the round-then-DECIMAL-sum discipline),
  * so group averages are exact; the threshold metrics run on the
  * ROUND(value,1) decimal bucket lattice with BIGINT cumulative
  * counts (the q_agg_auc / q_agg_mannwhitney discipline).
  *
  * Scale: the per-query metrics are one window pass partitioned by
  * the query key (orders never cross partitions) into one group-by;
  * the threshold metrics collapse the stream to the bounded bucket
  * grid first — nothing sorts raw rows globally. */
object Analytics84 {

  /** rank lineitems within each order by price DESC, line ASC. */
  private[queries] def ranked(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(desc("l_extendedprice"), col("l_linenumber"))
    t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"), col("l_returnflag"),
        col("l_discount"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  private[queries] def withPriority(df: DataFrame, s: SparkSession,
      d: String): DataFrame =
    df.join(t(s, d, "orders").select(col("o_orderkey").as("l_orderkey"),
      col("o_orderpriority")), Seq("l_orderkey"))

  /** NDCG@10 per order priority; graded relevance = quantity mod 4. */
  private def qAggNdcg(s: SparkSession, d: String): DataFrame = {
    val base = ranked(s, d)
      .withColumn("rel", expr("CAST(l_quantity AS BIGINT) % 4"))
    val wi = Window.partitionBy(col("l_orderkey"))
      .orderBy(desc("rel"), col("l_linenumber"))
    val terms = base
      .withColumn("ipos", row_number().over(wi).cast("long"))
      .select(col("l_orderkey"),
        when(col("pos") <= 10, expr(
          """CAST(ROUND((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
            |  / log2(CAST(pos + 1 AS DOUBLE)), 12) AS DECIMAL(18,12))"""
            .stripMargin)).otherwise(lit(null)).as("dterm"),
        when(col("ipos") <= 10, expr(
          """CAST(ROUND((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
            |  / log2(CAST(ipos + 1 AS DOUBLE)), 12) AS DECIMAL(18,12))"""
            .stripMargin)).otherwise(lit(null)).as("iterm"))
    val perq = terms.groupBy(col("l_orderkey"))
      .agg(sum(col("dterm")).as("dcg"), sum(col("iterm")).as("idcg"))
      .filter(col("idcg") > 0)
      .select(col("l_orderkey"),
        expr("CAST(ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 12)" +
          " AS DECIMAL(18,12))").as("ndcg"))
    withPriority(perq, s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_queries"), sum(col("ndcg")).as("sn"))
      .select(col("o_orderpriority"), col("n_queries"),
        round(dbl(col("sn")) / dbl(col("n_queries")), 6).as("ndcg10"))
      .orderBy(col("o_orderpriority"))
  }

  /** MRR per order priority; relevant = returned ('R') lines. */
  private def qAggMrr(s: SparkSession, d: String): DataFrame = {
    val perq = ranked(s, d)
      .groupBy(col("l_orderkey"))
      .agg(min(when(col("l_returnflag") === "R", col("pos"))).as("fp"))
      .select(col("l_orderkey"),
        expr("CAST(ROUND(CASE WHEN fp IS NULL THEN 0.0" +
          " ELSE 1.0 / CAST(fp AS DOUBLE) END, 12) AS DECIMAL(18,12))")
          .as("rr"))
    withPriority(perq, s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_queries"), sum(col("rr")).as("sr"))
      .select(col("o_orderpriority"), col("n_queries"),
        round(dbl(col("sr")) / dbl(col("n_queries")), 6).as("mrr"))
      .orderBy(col("o_orderpriority"))
  }

  /** MAP per order priority; relevant = discount > 5%. Orders with no
    * relevant line are excluded (the standard IR convention). */
  private def qAggMap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("pos"))
    val base = ranked(s, d)
      .withColumn("rel", when(col("l_discount") > 0.05, 1L).otherwise(0L))
      .withColumn("cumrel", sum(col("rel")).over(w))
    val perq = base
      .select(col("l_orderkey"), col("rel"),
        when(col("rel") === 1, expr(
          "CAST(ROUND(CAST(cumrel AS DOUBLE) / CAST(pos AS DOUBLE), 12)" +
            " AS DECIMAL(18,12))")).as("pterm"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("rel")).as("nrel"), sum(col("pterm")).as("sp"))
      .filter(col("nrel") > 0)
      .select(col("l_orderkey"),
        expr("CAST(ROUND(CAST(sp AS DOUBLE) / CAST(nrel AS DOUBLE), 12)" +
          " AS DECIMAL(18,12))").as("ap"))
    withPriority(perq, s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_queries"), sum(col("ap")).as("sa"))
      .select(col("o_orderpriority"), col("n_queries"),
        round(dbl(col("sa")) / dbl(col("n_queries")), 6).as("map"))
      .orderBy(col("o_orderpriority"))
  }

  /** purchase-vs-view score buckets with cumulative counts from the
    * high end — shared by PR-AUC and Youden. */
  private def buckets(s: SparkSession, d: String): DataFrame = {
    val b = events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(ROUND(value, 1) AS DECIMAL(18,1))").as("sc"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("sc"))
      .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
    val wDesc = Window.orderBy(desc("sc"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("sc")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    b.withColumn("ctp", sum(col("np")).over(wDesc))
      .withColumn("cfp", sum(col("nn")).over(wDesc))
      .withColumn("tp", sum(col("np")).over(wAll))
      .withColumn("tn", sum(col("nn")).over(wAll))
  }

  /** Average precision over descending score thresholds (PR-AUC). */
  private def qAggPrauc(s: SparkSession, d: String): DataFrame =
    buckets(s, d)
      .select(col("tp"), col("tn"),
        when(col("np") > 0, expr(
          """CAST(ROUND(CAST(np AS DOUBLE)
            |  * (CAST(ctp AS DOUBLE) / CAST(ctp + cfp AS DOUBLE)), 12)
            | AS DECIMAL(30,12))""".stripMargin)).as("term"))
      .groupBy(col("tp"), col("tn"))
      .agg(sum(col("term")).as("st"))
      .select(col("tp").as("n_pos"), col("tn").as("n_neg"),
        round(dbl(col("tp")) / dbl(col("tp") + col("tn")), 6)
          .as("prevalence"),
        when(col("tp") > 0,
          round(dbl(col("st")) / dbl(col("tp")), 6)).as("pr_auc"))

  /** Youden's J optimum: the threshold (predict positive at score ≥ t)
    * maximizing TPR − FPR, ties broken toward the higher threshold. */
  private def qAggYouden(s: SparkSession, d: String): DataFrame =
    buckets(s, d)
      // tp/tn = 0 (single-class degenerate data) gates to NULL instead
      // of an ANSI DIVIDE_BY_ZERO throw (the DegenerateInput rule)
      .select(col("sc"), col("tp"), col("tn"),
        expr("""CASE WHEN tp > 0 AND tn > 0 THEN
               |  CAST(ROUND(CAST(ctp AS DOUBLE) / CAST(tp AS DOUBLE)
               |    - CAST(cfp AS DOUBLE) / CAST(tn AS DOUBLE), 12)
               |   AS DECIMAL(18,12)) END""".stripMargin).as("j"),
        expr("CASE WHEN tp > 0 THEN CAST(ROUND(CAST(ctp AS DOUBLE)" +
          " / CAST(tp AS DOUBLE), 12) AS DECIMAL(18,12)) END").as("tpr"),
        expr("CASE WHEN tn > 0 THEN CAST(ROUND(CAST(cfp AS DOUBLE)" +
          " / CAST(tn AS DOUBLE), 12) AS DECIMAL(18,12)) END").as("fpr"))
      .agg(max(struct(col("j"), col("sc"), col("tpr"), col("fpr")))
        .as("best"))
      .select(dbl(col("best.sc")).as("threshold"),
        round(dbl(col("best.j")), 6).as("youden_j"),
        round(dbl(col("best.tpr")), 6).as("sensitivity"),
        round(lit(1.0) - dbl(col("best.fpr")), 6).as("specificity"))

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_ndcg" -> (qAggNdcg _),
    "q_agg_mrr" -> (qAggMrr _),
    "q_agg_map" -> (qAggMap _),
    "q_agg_prauc" -> (qAggPrauc _),
    "q_agg_youden" -> (qAggYouden _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_ndcg" ->
      """WITH r AS (
        |  SELECT l_orderkey,
        |    CAST(l_quantity AS BIGINT) % 4 AS rel,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT)
        |      AS pos,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY CAST(l_quantity AS BIGINT) % 4 DESC, l_linenumber)
        |      AS BIGINT) AS ipos
        |  FROM lineitem),
        |perq AS (
        |  SELECT l_orderkey,
        |    sum(CASE WHEN pos <= 10 THEN CAST(ROUND(
        |      (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |        / log2(CAST(pos + 1 AS DOUBLE)), 12) AS DECIMAL(18,12))
        |      END) AS dcg,
        |    sum(CASE WHEN ipos <= 10 THEN CAST(ROUND(
        |      (pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |        / log2(CAST(ipos + 1 AS DOUBLE)), 12) AS DECIMAL(18,12))
        |      END) AS idcg
        |  FROM r GROUP BY l_orderkey),
        |nq AS (
        |  SELECT l_orderkey, CAST(ROUND(CAST(dcg AS DOUBLE)
        |    / CAST(idcg AS DOUBLE), 12) AS DECIMAL(18,12)) AS ndcg
        |  FROM perq WHERE idcg > 0)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_queries,
        |  ROUND(CAST(sum(ndcg) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS ndcg10
        |FROM nq JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_mrr" ->
      """WITH r AS (
        |  SELECT l_orderkey, l_returnflag,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT)
        |      AS pos
        |  FROM lineitem),
        |perq AS (
        |  SELECT l_orderkey, CAST(ROUND(CASE
        |      WHEN min(CASE WHEN l_returnflag = 'R' THEN pos END) IS NULL
        |      THEN 0.0
        |      ELSE 1.0 / CAST(min(CASE WHEN l_returnflag = 'R' THEN pos
        |        END) AS DOUBLE) END, 12) AS DECIMAL(18,12)) AS rr
        |  FROM r GROUP BY l_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_queries,
        |  ROUND(CAST(sum(rr) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS mrr
        |FROM perq JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_map" ->
      """WITH r AS (
        |  SELECT l_orderkey,
        |    CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS rel,
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS BIGINT)
        |      AS pos
        |  FROM lineitem),
        |c AS (
        |  SELECT l_orderkey, rel, pos,
        |    sum(rel) OVER (PARTITION BY l_orderkey ORDER BY pos)
        |      AS cumrel
        |  FROM r),
        |perq AS (
        |  SELECT l_orderkey, CAST(sum(rel) AS BIGINT) AS nrel,
        |    sum(CASE WHEN rel = 1 THEN CAST(ROUND(CAST(cumrel AS DOUBLE)
        |      / CAST(pos AS DOUBLE), 12) AS DECIMAL(18,12)) END) AS sp
        |  FROM c GROUP BY l_orderkey),
        |ap AS (
        |  SELECT l_orderkey, CAST(ROUND(CAST(sp AS DOUBLE)
        |    / CAST(nrel AS DOUBLE), 12) AS DECIMAL(18,12)) AS ap
        |  FROM perq WHERE nrel > 0)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_queries,
        |  ROUND(CAST(sum(ap) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS map
        |FROM ap JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_agg_prauc" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS sc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |c AS (
        |  SELECT sc, np, nn,
        |    sum(np) OVER (ORDER BY sc DESC) AS ctp,
        |    sum(nn) OVER (ORDER BY sc DESC) AS cfp,
        |    sum(np) OVER () AS tp, sum(nn) OVER () AS tn
        |  FROM b)
        |SELECT CAST(tp AS BIGINT) AS n_pos, CAST(tn AS BIGINT) AS n_neg,
        |  ROUND(CAST(tp AS DOUBLE) / CAST(tp + tn AS DOUBLE), 6)
        |    AS prevalence,
        |  CASE WHEN tp > 0 THEN ROUND(CAST(sum(CASE WHEN np > 0 THEN
        |    CAST(ROUND(CAST(np AS DOUBLE) * (CAST(ctp AS DOUBLE)
        |      / CAST(ctp + cfp AS DOUBLE)), 12) AS DECIMAL(30,12)) END)
        |    AS DOUBLE) / CAST(tp AS DOUBLE), 6) END AS pr_auc
        |FROM c GROUP BY tp, tn""".stripMargin,
    "q_agg_youden" ->
      """WITH b AS (
        |  SELECT CAST(ROUND(value, 1) AS DECIMAL(18,1)) AS sc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nn
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |c AS (
        |  SELECT sc,
        |    sum(np) OVER (ORDER BY sc DESC) AS ctp,
        |    sum(nn) OVER (ORDER BY sc DESC) AS cfp,
        |    sum(np) OVER () AS tp, sum(nn) OVER () AS tn
        |  FROM b),
        |j AS (
        |  SELECT sc,
        |    CASE WHEN tp > 0 AND tn > 0 THEN
        |      CAST(ROUND(CAST(ctp AS DOUBLE) / CAST(tp AS DOUBLE)
        |        - CAST(cfp AS DOUBLE) / CAST(tn AS DOUBLE), 12)
        |        AS DECIMAL(18,12)) END AS j,
        |    CASE WHEN tp > 0 THEN
        |      CAST(ROUND(CAST(ctp AS DOUBLE) / CAST(tp AS DOUBLE), 12)
        |        AS DECIMAL(18,12)) END AS tpr,
        |    CASE WHEN tn > 0 THEN
        |      CAST(ROUND(CAST(cfp AS DOUBLE) / CAST(tn AS DOUBLE), 12)
        |        AS DECIMAL(18,12)) END AS fpr
        |  FROM c)
        |SELECT CAST(sc AS DOUBLE) AS threshold,
        |  ROUND(CAST(j AS DOUBLE), 6) AS youden_j,
        |  ROUND(CAST(tpr AS DOUBLE), 6) AS sensitivity,
        |  ROUND(1.0 - CAST(fpr AS DOUBLE), 6) AS specificity
        |FROM j ORDER BY j DESC, sc DESC LIMIT 1""".stripMargin,
  )
}
