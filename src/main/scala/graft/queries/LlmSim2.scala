package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 similarity addition: RADIUS search — every vector within
  * cosine ≥ τ of each labeled probe. The retrieval primitive top-k
  * cannot express (recall-complete candidate sets for dedup review,
  * near-duplicate sweeps at a fixed similarity bar, "everything at
  * least this close" audits).
  *
  * Scale notes: the exact form is the q_sim_cosine_topk shape — probes
  * broadcast (one per label, bounded), the embedding table streams
  * once, `float_dot` keeps the inner loop inside codegen, and the
  * τ-filter prunes before anything shuffles: output volume is the
  * true neighbor count, the scan is one pass at any corpus size. The
  * IVF/LSH variants in this file's siblings are the sub-linear dial
  * when the corpus no longer streams cheaply; this operator is their
  * exactness baseline, same as cosine-topk is for ANN. Similarity
  * rounds to 6dp BEFORE the threshold compare so the τ boundary is
  * engine-portable. */
object LlmSim2 {

  private def dot(a: String, b: String): Column = expr(s"float_dot($a, $b)")
  private def norm2(a: String): Column = dot(a, a)

  private def qSimRange(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val probes = t(s, d, "embeddings")
      .groupBy(col("label").as("p_label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("pe"),
        min(col("vec_id")).as("pid"))
    t(s, d, "embeddings").crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .withColumn("sim", round(
        dot("pe", "embedding") /
          (sqrt(norm2("pe")) * sqrt(norm2("embedding"))), 6))
      .filter(col("sim") >= 0.3)
      .select(col("p_label").as("label"), col("vec_id"), col("sim"))
      .orderBy(col("label"), col("vec_id"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_sim_range" -> (qSimRange _),
  )

  val sql: Map[String, String] = Map(
    // parallel unnest zips the arrays (the q_sim_cosine_topk mirror);
    // 6-dp round precedes the τ compare on both engines
    "q_sim_range" ->
      """WITH probe AS (SELECT label, MIN(vec_id) AS pid
        |               FROM embeddings GROUP BY label),
        |pv AS (SELECT p.label AS p_label, p.pid, e.embedding AS pe
        |       FROM probe p JOIN embeddings e ON e.vec_id = p.pid),
        |z AS (SELECT pv.p_label, pv.pid, e.vec_id,
        |        CAST(unnest(pv.pe) AS DOUBLE) AS px,
        |        CAST(unnest(e.embedding) AS DOUBLE) AS ex
        |      FROM pv CROSS JOIN embeddings e),
        |dots AS (SELECT p_label, pid, vec_id, SUM(px*ex) AS dp,
        |                SUM(px*px) AS p2, SUM(ex*ex) AS n2
        |         FROM z GROUP BY 1, 2, 3),
        |sims AS (SELECT p_label AS label, vec_id,
        |                ROUND(dp / (sqrt(p2) * sqrt(n2)), 6) AS sim
        |         FROM dots WHERE vec_id != pid)
        |SELECT label, vec_id, sim FROM sims
        |WHERE sim >= 0.3 ORDER BY label, vec_id""".stripMargin,
  )
}
