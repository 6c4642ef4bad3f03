package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 similarity wave: Matryoshka truncation fidelity — the
  * "can we serve 8/16/32 of the 64 dims" evaluation run before
  * shipping a truncated-embedding index (MRL-style prefix embeddings
  * trade index size for recall; this op measures the actual trade on
  * the corpus instead of trusting the model card).
  *
  * Scale notes:
  *  - The probe table is label-bounded (8 rows) and broadcast with its
  *    pre-sliced prefixes and norms; the corpus side computes its four
  *    prefix norms in the SAME scan that serves the similarity funnel —
  *    one pass over the vectors, no shuffle until the bounded
  *    aggregates.
  *  - Truncated dots reuse the native float_dot's min-length semantics
  *    (`float_dot(pe_k, embedding)` stops at the broadcast prefix's
  *    length), so the corpus-side vector is never sliced or copied for
  *    the similarity itself.
  *  - MAE accumulates exact integer micro-units (round(|st−sf|·10⁶) is
  *    integral because both sims are already 6-dp), so the sum is
  *    order-independent BIGINT arithmetic — no double-summation drift
  *    against the oracle.
  *  - Top-5 overlap uses row_number + rank≤5 filters (WindowGroupLimit
  *    prunes map-side), then joins two ≤(5·probes·dims)-row lists —
  *    never a full-rank materialization of the corpus. */
object LlmSim5 {

  private val dims = Seq(8, 16, 32, 64)

  /** Per-prefix-dimension fidelity report: mean |sim_trunc − sim_full|
    * in micro-units and top-5 retrieval recall vs the full-dim ranking,
    * over probe×corpus cosine similarities (probe = min-id vector per
    * label, the q_sim_cosine_topk probe discipline). dim=64 rows are
    * the identity control (mae 0, recall 1). */
  private def qEmbedMatryoshka(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
    val vec = emb.select(
      Seq(col("vec_id"), col("embedding")) ++ dims.map(k =>
        expr(s"sqrt(float_dot(slice(embedding, 1, $k), slice(embedding, 1, $k)))")
          .as(s"n$k")): _*)
    val pv = emb.groupBy(col("label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("pe"))
      .select(Seq(col("label").as("p_label")) ++ dims.flatMap(k => Seq(
        slice(col("pe"), 1, k).as(s"pe$k"),
        expr(s"sqrt(float_dot(slice(pe, 1, $k), slice(pe, 1, $k)))")
          .as(s"pn$k"))): _*)
    val sims = vec.crossJoin(broadcast(pv)).select(
      Seq(col("p_label"), col("vec_id")) ++ dims.map(k =>
        when(col(s"n$k") > 0 && col(s"pn$k") > 0,
          round(expr(s"float_dot(pe$k, embedding)")
            / (col(s"pn$k") * col(s"n$k")), 6))
          .otherwise(0.0).as(s"sim$k")): _*)
      .withColumn("sf", col("sim64"))
      .localCheckpoint(true)
    val stacked = sims.select(col("p_label"), col("vec_id"), col("sf"),
      expr("stack(4, 8, sim8, 16, sim16, 32, sim32, 64, sim64) as (dim, st)"))
    val mae = stacked.groupBy(col("dim"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("cast(round(abs(st - sf) * 1000000.0) as bigint)"))
          .as("err_e6"))
    val wF = Window.partitionBy(col("p_label"))
      .orderBy(desc("sf"), col("vec_id"))
    val topF = sims.select(col("p_label"), col("vec_id"), col("sf"))
      .withColumn("rf", row_number().over(wF)).filter(col("rf") <= 5)
      .select(col("p_label"), col("vec_id"))
    val wT = Window.partitionBy(col("p_label"), col("dim"))
      .orderBy(desc("st"), col("vec_id"))
    val topT = stacked
      .withColumn("rt", row_number().over(wT)).filter(col("rt") <= 5)
      .select(col("dim"), col("p_label"), col("vec_id"))
    val overlap = topT.join(topF, Seq("p_label", "vec_id"))
      .groupBy(col("dim")).agg(count(lit(1)).as("top5_hits"))
    val nP = pv.agg(count(lit(1)).as("n_probes"))
    mae.join(overlap, Seq("dim"), "left")
      .crossJoin(broadcast(nP))
      .select(col("dim"), col("n_pairs"), col("n_probes"),
        round(dbl(col("err_e6")) / (dbl(col("n_pairs")) * lit(1000000.0)), 9)
          .as("mae"),
        coalesce(col("top5_hits"), lit(0L)).as("top5_hits"),
        round(dbl(coalesce(col("top5_hits"), lit(0L)))
          / (lit(5.0) * dbl(col("n_probes"))), 9).as("top5_recall"))
      .orderBy(col("dim"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_matryoshka" -> (qEmbedMatryoshka _),
  )

  val sql: Map[String, String] = Map(
    // Variable-bound list slices feed the same prefix sims; the dim=64
    // slice IS the full vector, so sim_full joins in as the d=64 row
    // via a window max. Double casts before multiplication and the
    // 6-dp round mirror the Spark side exactly.
    "q_embed_matryoshka" ->
      """WITH probe AS (SELECT label, MIN(vec_id) AS pid
        |              FROM embeddings GROUP BY label),
        |pv AS (SELECT p.label AS p_label, e.embedding AS pe
        |       FROM probe p JOIN embeddings e ON e.vec_id = p.pid),
        |dims AS (SELECT d FROM (VALUES (8), (16), (32), (64)) v(d)),
        |z AS (SELECT pv.p_label, e.vec_id, dm.d,
        |        CAST(unnest(pv.pe[1:dm.d]) AS DOUBLE) AS px,
        |        CAST(unnest(e.embedding[1:dm.d]) AS DOUBLE) AS ex
        |      FROM pv CROSS JOIN embeddings e CROSS JOIN dims dm),
        |dots AS (SELECT p_label, vec_id, d, SUM(px*ex) AS dp,
        |                SUM(px*px) AS p2, SUM(ex*ex) AS n2
        |         FROM z GROUP BY 1, 2, 3),
        |sims AS (SELECT p_label, vec_id, d,
        |           CASE WHEN p2 > 0 AND n2 > 0
        |             THEN ROUND(dp / (sqrt(p2) * sqrt(n2)), 6)
        |             ELSE 0.0 END AS st
        |         FROM dots),
        |wf AS (SELECT *, max(CASE WHEN d = 64 THEN st END)
        |         OVER (PARTITION BY p_label, vec_id) AS sf FROM sims),
        |mae AS (SELECT d AS dim, CAST(count(*) AS BIGINT) AS n_pairs,
        |          CAST(sum(CAST(round(abs(st - sf) * 1000000.0) AS BIGINT))
        |            AS BIGINT) AS err_e6
        |        FROM wf GROUP BY 1),
        |topf AS (SELECT p_label, vec_id FROM (
        |           SELECT p_label, vec_id, ROW_NUMBER() OVER (
        |             PARTITION BY p_label ORDER BY st DESC, vec_id) AS rf
        |           FROM sims WHERE d = 64) WHERE rf <= 5),
        |topt AS (SELECT d, p_label, vec_id FROM (
        |           SELECT d, p_label, vec_id, ROW_NUMBER() OVER (
        |             PARTITION BY p_label, d ORDER BY st DESC, vec_id) AS rt
        |           FROM sims) WHERE rt <= 5),
        |ov AS (SELECT t.d AS dim, CAST(count(*) AS BIGINT) AS top5_hits
        |       FROM topt t JOIN topf f USING (p_label, vec_id) GROUP BY 1),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM pv)
        |SELECT m.dim, m.n_pairs, np.n_probes,
        |  round(CAST(m.err_e6 AS DOUBLE)
        |    / (CAST(m.n_pairs AS DOUBLE) * 1000000.0), 9) AS mae,
        |  COALESCE(ov.top5_hits, 0) AS top5_hits,
        |  round(CAST(COALESCE(ov.top5_hits, 0) AS DOUBLE)
        |    / (5.0 * CAST(np.n_probes AS DOUBLE)), 9) AS top5_recall
        |FROM mae m LEFT JOIN ov ON m.dim = ov.dim CROSS JOIN np
        |ORDER BY m.dim""".stripMargin,
  )
}
