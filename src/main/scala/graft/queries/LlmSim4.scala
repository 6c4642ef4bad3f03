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
  private[queries] def buildIncIndex(s: SparkSession, d: String,
      name: String = "sim_ivf_inc"): String = {
    val p = s"/root/repo/target/qtmp/${name}_${math.abs(d.hashCode)}"
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

  /** Cell compaction for a skew-fattened stored index (r11): delta
    * appends never retrain the quantizer, so a skewed ingest fattens
    * hot cells and degrades probe cost (a probe touching a fat cell
    * scores its whole postings list). The rebalance re-splits ONLY
    * cells whose postings exceed `bound`: a deterministic 2-means
    * (lowest-id member seed + least-cosine-similar second seed, two
    * Lloyd rounds with exact DECIMAL dimension sums) re-clusters
    * WITHIN the fat cell, and a dynamic-partition-overwrite rewrites
    * exactly the split cell's partition plus the new sibling — every
    * untouched cell's files are never rewritten. The coarse quantizer
    * is REUSED, never retrained: `cellmap` records each physical cell's
    * original parent, and search keeps routing probes on the parent
    * centroids, reading all of a probed parent's sub-cells — so the
    * candidate set (and therefore every search result) is IDENTICAL
    * pre/post rebalance by construction, while the per-partition size
    * bound is restored. Passes repeat (≤ maxPasses) until no cell
    * exceeds the bound; a degenerate cell whose members all land in
    * one half is left as-is (identical vectors cannot be split).
    * At 100 TB each pass touches only fat-cell members — compaction
    * cost scales with the skew, not the corpus. */
  private[queries] def rebalanceIndex(s: SparkSession, d: String,
      p: String, bound: Long, maxPasses: Int = 5): Unit = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    if (!pathExists(s"$p/cellmap/_SUCCESS"))
      s.read.parquet(s"$p/centroids")
        .select(col("cell").cast("int").as("cell"),
          col("cell").cast("int").as("parent"))
        .coalesce(1).write.mode("overwrite").parquet(s"$p/cellmap")
    val prevMode =
      s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def fatCells(): Seq[Int] =
        s.read.parquet(s"$p/assign").groupBy(col("cell"))
          .agg(count(lit(1)).as("n")).filter(col("n") > bound)
          .orderBy(col("cell")).collect()
          .map(_.getInt(0)).toSeq
      var pass = 0
      var stuck = Set.empty[Int]
      var fat = fatCells().filterNot(stuck)
      while (pass < maxPasses && fat.nonEmpty) {
        fat.foreach { c =>
          val cm = s.read.parquet(s"$p/cellmap")
            .as[(Int, Int)].collect().toMap
          val newId = cm.keys.max + 1
          if (splitCell(s, d, p, c, newId)) {
            ((cm.toSeq :+ (newId -> cm(c))): Seq[(Int, Int)])
              .toDF("cell", "parent").coalesce(1)
              .write.mode("overwrite").parquet(s"$p/cellmap")
          } else stuck += c
        }
        pass += 1
        fat = fatCells().filterNot(stuck)
      }
    } finally
      s.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** One deterministic 2-means split of cell `c` into (c, newId).
    * Returns false (no write) when the split degenerates to one side. */
  private def splitCell(s: SparkSession, d: String, p: String,
      c: Int, newId: Int): Boolean = {
    import s.implicits._
    val m = s.read.parquet(s"$p/assign").filter(col("cell") === c)
      .select("vec_id")
      .join(t(s, d, "embeddings").hint("shuffle_hash"), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"))
      // read by the seed picks, both Lloyd rounds, and the final
      // assignment — materialize the fat cell's members once
      .localCheckpoint(true)
    val seedA = m.orderBy("vec_id").select(col("embedding"))
      .as[Seq[Float]].head.toArray
    val dim = seedA.length
    // second seed: the member LEAST cosine-similar to seedA
    // (deterministic vec_id tie-break) — the farthest-point heuristic
    val seedB = m
      .withColumn("cs",
        call_function("float_dot", col("embedding"),
          typedlit(LlmSim.unit(seedA))) /
          sqrt(LlmSim.norm2("embedding")))
      .orderBy(col("cs"), col("vec_id")).select(col("embedding"))
      .as[Seq[Float]].head.toArray
    var subs = Array(seedA, seedB)
    // two Lloyd rounds; dimension sums in exact DECIMAL (order-
    // independent across partitions) so the sub-centroids — and hence
    // the split — are bit-stable run to run
    for (_ <- 0 until 2) {
      val agg = m.withColumn("sub", LlmSim.cellOf(subs))
        .select(col("sub"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("pos"))
        .agg(sum(expr("CAST(ROUND(x, 9) AS DECIMAL(28,9))")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val next = Array(subs(0).clone(), subs(1).clone())
      agg.foreach { r =>
        val sub = r.getInt(0)
        next(sub)(r.getInt(1)) =
          (r.getDecimal(2).doubleValue() / r.getLong(3)).toFloat
      }
      subs = next
    }
    val assigned = m.withColumn("sub", LlmSim.cellOf(subs))
      .select(col("vec_id"),
        when(col("sub") === 0, lit(c)).otherwise(lit(newId)).as("cell"))
      .localCheckpoint(true)
    val sides = assigned.groupBy(col("cell")).agg(count(lit(1)))
      .count()
    if (sides < 2) false
    else {
      // dynamic partition overwrite: only partitions cell=c and
      // cell=newId are rewritten; every other cell's files untouched
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$p/assign")
      true
    }
  }

  /** The rebalanced-lifecycle index: base build + delta append (its own
    * copy — q_sim_index_delta's artifact stays append-only), then a
    * compaction pass bounding every cell at the average postings size. */
  private[queries] def buildRebalanced(s: SparkSession, d: String): String = {
    val p = buildIncIndex(s, d, "sim_ivf_reb")
    if (!pathExists(s"$p/rebalanced")) {
      val total = s.read.parquet(s"$p/assign").count()
      rebalanceIndex(s, d, p, bound = math.max(1L, total / Cells))
      val (fs, done) = hfs(s"$p/rebalanced")
      fs.create(done).close()
    }
    p
  }

  /** Search the stored index: rank each probe's nprobe cells from the
    * centroid TABLE (cells rows, collected — bounded model state), prune
    * the assignment table to the probed cells (partition pruning on the
    * stored layout), then score only those members' embeddings. On a
    * rebalanced index, routing stays on the PARENT centroids and the
    * bounded `cellmap` fans each probed parent out to its sub-cells —
    * candidate sets are identical to the un-rebalanced index. */
  private[queries] def searchIndex(s: SparkSession, d: String,
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
    val probeDf = probeCells.toDF("p_label", "pe", "cell")
    val routed =
      if (pathExists(s"$p/cellmap/_SUCCESS")) {
        val cm = s.read.parquet(s"$p/cellmap") // (cell, parent) — bounded
        probeDf.withColumnRenamed("cell", "parent")
          .join(broadcast(cm), Seq("parent"))
          .select(col("p_label"), col("pe"), col("cell"))
      } else probeDf
    val members = s.read.parquet(s"$p/assign")
      .join(broadcast(routed), Seq("cell"))
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

  /** Search over the compacted (base + delta + rebalance) index — must
    * equal the append-only index's search row-for-row (parent-routed
    * candidate sets are identical by construction). */
  private def qSimIndexRebalance(s: SparkSession, d: String): DataFrame =
    searchIndex(s, d, buildRebalanced(s, d))

  val defs: Map[String, Relational.Q] = Map(
    "q_sim_index_search" -> (qSimIndexSearch _),
    "q_sim_index_delta" -> (qSimIndexDelta _),
    "q_sim_index_rebalance" -> (qSimIndexRebalance _),
  )

  val sql: Map[String, String] = Map()
}
