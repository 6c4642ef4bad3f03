package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-9 index-lifecycle wave for the similarity family: the IVF
  * index as a PERSISTED artifact. q_sim_ann_ivf (LlmSim.annIvf) trains
  * its quantizer from a bounded sample and assigns cells inline — the
  * right shape for a one-shot query, but a production retrieval stack
  * builds the index ONCE (the expensive full-corpus assignment pass)
  * and amortizes it across every query thereafter. This file splits the
  * lifecycle exactly like the t-digest sketch tables
  * (Analytics42.qAggTdigestRollup): a build step materializes the
  * centroid table and the (vec_id, cell) assignment table to parquet,
  * and the search step routes probes against the STORED index — the
  * corpus embedding table is touched only to score the candidate cells'
  * members.
  *
  * Scale: at 100 TB the assignment pass is the index build cost (one
  * map-only scan, written cell-partitioned); a query then reads
  * nprobe/cells of the assignment table (partition pruning on the cell
  * column) plus the centroid table (cells rows). Identical quantizer +
  * identical routing ⇒ results are row-for-row equal to the inline
  * variant — LlmSim4Spec pins that parity, which is also why the op
  * carries no SQL oracle (the inline variant it equals is itself
  * recall-spec'd, not oracled). */
object LlmSim4 {

  private val Cells = 8
  private val NProbe = 6
  private val K = 3

  /** Materialize the IVF index (centroids + cell-partitioned
    * assignments) once per data dir — the coPairCounts write-once
    * pattern applied to an ANN index. */
  private[queries] def buildIndex(s: SparkSession, d: String): String = {
    val p = s"/root/repo/target/qtmp/sim_ivf_idx_${math.abs(d.hashCode)}"
    if (!pathExists(s"$p/assign/_SUCCESS")) {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      val cents = LlmSim.coarseCentroids(s, d, Cells)
      cents.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$p/centroids")
      t(s, d, "embeddings")
        .withColumn("cell", LlmSim.cellOf(cents))
        .select(col("vec_id"), col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$p/assign")
    }
    p
  }

  /** Incrementally-maintained index (the q_dedup_incremental pattern
    * applied to the IVF lifecycle): the BASE slice (vec_id % 5 != 0) is
    * assigned at build time; the DELTA (vec_id % 5 == 0 — "today's
    * ingest") is assigned LATER against the STORED centroid table — no
    * quantizer retrain, no base re-scan — and APPENDED into the same
    * cell-partitioned layout. Per-batch maintenance cost scales with
    * the delta (one map-only pass over the new vectors + an 8-row
    * centroid read), not the corpus; searches over the maintained index
    * are row-for-row identical to a full rebuild under the same
    * quantizer (LlmSim4Spec pins it against q_sim_index_search, whose
    * coarseCentroids call shares the cached model). */
  private[queries] def buildIncIndex(s: SparkSession, d: String): String = {
    val p = s"/root/repo/target/qtmp/sim_ivf_inc_${math.abs(d.hashCode)}"
    if (!pathExists(s"$p/done")) {
      graft.functions.GraftFunctions.register(s)
      import s.implicits._
      // base-time build: same quantizer as the monolithic index, only
      // the base slice assigned
      val cents = LlmSim.coarseCentroids(s, d, Cells)
      cents.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$p/centroids")
      t(s, d, "embeddings").filter(col("vec_id") % 5 =!= 0)
        .withColumn("cell", LlmSim.cellOf(cents))
        .select(col("vec_id"), col("cell"))
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$p/assign")
      // delta maintenance: the ingest job reads the STORED model back
      // (it has no access to the trainer), assigns ONLY the new
      // vectors, and appends — the base assignment files are untouched
      val stored: Array[Array[Float]] =
        s.read.parquet(s"$p/centroids").orderBy("cell")
          .as[(Int, Seq[Float])].collect().map(_._2.toArray)
      t(s, d, "embeddings").filter(col("vec_id") % 5 === 0)
        .withColumn("cell", LlmSim.cellOf(stored))
        .select(col("vec_id"), col("cell"))
        .write.mode("append").partitionBy("cell")
        .parquet(s"$p/assign")
      val (fs, done) = hfs(s"$p/done")
      fs.create(done).close()
    }
    p
  }

  /** Search the stored index: rank each probe's nprobe cells from the
    * centroid TABLE (cells rows, collected — bounded model state), prune
    * the assignment table to the probed cells (partition pruning on the
    * stored layout), then score only those members' embeddings. */
  private def searchIndex(s: SparkSession, d: String,
      p: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val cents: Array[Array[Float]] =
      s.read.parquet(s"$p/centroids").orderBy("cell")
        .as[(Int, Seq[Float])].collect().map(_._2.toArray)
    val units = cents.map(LlmSim.unit)
    val probeCells: Seq[(Int, Array[Float], Int)] =
      LlmSim.probesCollected(s, d).flatMap { case (lab, pe) =>
        val ranked = units.zipWithIndex.map { case (u, i) =>
          var acc = 0.0
          var j = 0
          while (j < u.length) { acc += pe(j).toDouble * u(j); j += 1 }
          (acc, i)
        }.sortBy(tc => (-tc._1, tc._2)).take(NProbe)
        ranked.map { case (_, cell) => (lab, pe, cell) }
      }
    val members = s.read.parquet(s"$p/assign")
      .join(broadcast(probeCells.toDF("p_label", "pe", "cell")), Seq("cell"))
    val scored = members
      .join(t(s, d, "embeddings").hint("shuffle_hash"), Seq("vec_id"))
      .withColumn("sim", round(
        LlmSim.dot("pe", "embedding") /
          (sqrt(LlmSim.norm2("pe")) * sqrt(LlmSim.norm2("embedding"))), 6))
      .select(col("p_label").as("label"), col("vec_id"), col("sim"))
    graft.plans.TopKPerGroup(scored, groupCols = Seq("label"),
      orderCol = "sim", tieCols = Seq("vec_id"), k = K)
      .select(col("label"), col("vec_id"), col("sim"), col("rnk").as("k"))
      .orderBy("label", "k")
  }

  private def qSimIndexSearch(s: SparkSession, d: String): DataFrame =
    searchIndex(s, d, buildIndex(s, d))

  /** Search over the incrementally-maintained (base build + delta
    * append) index — must equal the full-rebuild search row-for-row. */
  private def qSimIndexDelta(s: SparkSession, d: String): DataFrame =
    searchIndex(s, d, buildIncIndex(s, d))

  val defs: Map[String, Relational.Q] = Map(
    "q_sim_index_search" -> (qSimIndexSearch _),
    "q_sim_index_delta" -> (qSimIndexDelta _),
  )

  val sql: Map[String, String] = Map()
}
