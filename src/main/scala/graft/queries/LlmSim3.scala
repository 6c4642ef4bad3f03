package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-9 similarity addition: FILTERED vector search — cosine top-k
  * under a metadata predicate (here: "only vectors whose document is
  * English"), the hybrid-retrieval primitive every production RAG
  * stack runs daily. Two variants:
  *
  *  - `q_sim_filtered` (exact, oracled): the predicate semi-join prunes
  *    the corpus BEFORE the broadcast-probe scan; the lang filter is
  *    pushed into the documents parquet scan (PlanSpec5-gated), the id
  *    semi-join runs shuffle_hash (the allowed-id set scales with the
  *    corpus — never broadcast), and from there the plan is the
  *    q_sim_cosine_topk shape: probes broadcast, filtered corpus
  *    streams once, bounded per-probe rank.
  *  - `q_sim_filtered_ivf` (approximate, recall-tested): the same IVF
  *    index as q_sim_ann_ivf, with the predicate applied INSIDE the
  *    probed cells (LlmSim.annIvf's `keep` hook) — the index is built
  *    once over the whole corpus and every predicate reuses it, which
  *    is how production filtered-ANN works (pre-building one index per
  *    predicate value would be the non-scalable alternative). With
  *    nprobe = cells the funnel is provably exact (= q_sim_filtered) —
  *    LlmSim3Spec pins that limit plus recall at the operating point.
  *
  * At 100 TB: filtering before scoring means the probe scan touches
  * only the surviving fraction; when the metadata lives in the vector
  * table itself (the common layout) the semi-join disappears and the
  * predicate is a map-only pushed filter — this two-table form is the
  * harder, join-required case. */
object LlmSim3 {

  private def dot(a: String, b: String): Column = expr(s"float_dot($a, $b)")
  private def norm2(a: String): Column = dot(a, a)

  /** The metadata predicate: vec_ids whose document (vec_id = doc_id)
    * is English. The lang filter reaches the documents parquet scan
    * (pushed filter); only the surviving ids travel into the semi-join. */
  private[queries] def keepEn(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))

  /** Exact filtered cosine top-5 per labeled probe over the
    * English-document subset. Probes stay corpus-wide (one per label,
    * the q_sim_cosine_topk convention) — the filter restricts what can
    * be RETRIEVED, not where queries come from. */
  private def qSimFiltered(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val kept = t(s, d, "embeddings")
      .join(keepEn(s, d).hint("shuffle_hash"), Seq("vec_id"), "left_semi")
    val scored = kept.crossJoin(broadcast(LlmSim.probes(s, d)))
      .withColumn("sim", round(
        dot("pe", "embedding") /
          (sqrt(norm2("pe")) * sqrt(norm2("embedding"))), 6))
    val w = Window.partitionBy(col("p_label"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("p_label").as("label"), col("vec_id"), col("sim"),
        col("rn"))
      .orderBy("label", "rn")
  }

  /** IVF filtered top-3 at the q_sim_ann_ivf operating point (cells=8,
    * nprobe=6): the shared coarse quantizer routes each probe to its 6
    * nearest cells and the predicate prunes candidates inside them.
    * Approximate by construction → no SQL oracle; LlmSim3Spec measures
    * recall against q_sim_filtered and pins the nprobe=cells exactness
    * limit. */
  private def qSimFilteredIvf(s: SparkSession, d: String): DataFrame =
    LlmSim.annIvf(s, d, cells = 8, nprobe = 6, k = 3,
      keep = Some(keepEn(s, d)))

  val defs: Map[String, Relational.Q] = Map(
    "q_sim_filtered" -> (qSimFiltered _),
    "q_sim_filtered_ivf" -> (qSimFilteredIvf _),
  )

  val sql: Map[String, String] = Map(
    // the q_sim_cosine_topk mirror with the predicate applied to the
    // candidate side only (probes stay corpus-wide); parallel unnest
    // zips the arrays, 6-dp round precedes the rank
    "q_sim_filtered" ->
      """WITH probe AS (SELECT label, MIN(vec_id) AS pid
        |               FROM embeddings GROUP BY label),
        |pv AS (SELECT p.label AS p_label, e.embedding AS pe
        |       FROM probe p JOIN embeddings e ON e.vec_id = p.pid),
        |kept AS (SELECT e.vec_id, e.embedding FROM embeddings e
        |         WHERE e.vec_id IN
        |           (SELECT doc_id FROM documents WHERE lang = 'en')),
        |z AS (SELECT pv.p_label, k.vec_id,
        |        CAST(unnest(pv.pe) AS DOUBLE) AS px,
        |        CAST(unnest(k.embedding) AS DOUBLE) AS ex
        |      FROM pv CROSS JOIN kept k),
        |dots AS (SELECT p_label, vec_id, SUM(px*ex) AS dp,
        |                SUM(px*px) AS p2, SUM(ex*ex) AS n2
        |         FROM z GROUP BY 1, 2),
        |sims AS (SELECT p_label AS label, vec_id,
        |                ROUND(dp / (sqrt(p2) * sqrt(n2)), 6) AS sim
        |         FROM dots),
        |r AS (SELECT label, vec_id, sim,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY label
        |          ORDER BY sim DESC, vec_id ASC) AS INT) AS rn FROM sims)
        |SELECT label, vec_id, sim, rn FROM r WHERE rn <= 5
        |ORDER BY label, rn""".stripMargin,
  )
}
