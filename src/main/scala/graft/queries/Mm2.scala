package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 multimodal wave: near-duplicate image DEDUP — the action
  * on top of q_mm_phash's pair detection. The blocked pHash pair table
  * ([[LlmText3.phashPairs]] — 9-block pigeonhole join over the 128-bit
  * dHash‖dHash-transpose fingerprints of the REAL binaryFile-ingested
  * BMP artifacts) is tightened to hamming ≤ 4 (the within-group edit
  * band; unrelated patterns sit ~32), clustered into dedup groups by
  * the accumulator-gated CC fixpoint (Analytics42.ccFixpoint — round
  * count data-driven), and each group keeps its min-id representative:
  * the output is the per-cluster (representative, n_members, n_dropped)
  * dedup ledger a pipeline applies as a semi-join.
  *
  * At 100 TB: pairs are pigeonhole-blocked (never O(n²)), cluster
  * state is one (node, lbl) row per image with node-keyed min
  * shuffles, and only (id, hash) tuples move after the decode stage.
  * No SQL oracle (pixel decode + data-driven cluster rounds; SURVEY
  * §2.C rule 4) — Mm2Spec pins exact cluster structure on the
  * group-keyed fixture (every id/5 artifact group = one cluster of 5,
  * min-id representative, no cross-group merge). */
object Mm2 {

  private def qMmDedup(s: SparkSession, d: String): DataFrame = {
    val pairs = LlmText3.phashPairs(s, d)
      .filter(col("hamming") <= 4)
      .select(col("a").as("u"), col("b").as("v"))
      .localCheckpoint(true)
    val sym = pairs.union(pairs.select(col("v").as("u"), col("u").as("v")))
    val (lbl, _) = Analytics42.ccFixpoint(sym)
    lbl.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("lbl").as("representative"), col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
      .orderBy(col("representative"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_mm_dedup" -> (qMmDedup _),
  )

  val sql: Map[String, String] = Map()
}
