package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** The stored-index search must be row-for-row identical to the inline
  * IVF variant (same quantizer, same routing, same exact scoring on
  * candidates) — the lifecycle split may not change a single result.
  * Second run hits the persisted index without rebuilding (the
  * write-once guard). */
class LlmSim4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("stored-index search == inline IVF search, row for row") {
    val stored = SparkEntry.queries("q_sim_index_search")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val inline = SparkEntry.queries("q_sim_ann_ivf")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(stored.nonEmpty && stored.toSeq == inline.toSeq,
      s"stored/inline divergence: stored=${stored.take(5).toSeq} " +
        s"inline=${inline.take(5).toSeq}")
  }

  test("incrementally-maintained index (base build + delta append " +
      "against the stored centroids) searches row-for-row like the " +
      "full rebuild; maintenance appends, never rewrites base files") {
    val p = LlmSim4.buildIncIndex(spark, sf)
    val inc = SparkEntry.queries("q_sim_index_delta")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val full = SparkEntry.queries("q_sim_index_search")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(inc.nonEmpty && inc.toSeq == full.toSeq,
      s"delta-maintained/full-rebuild divergence: inc=${inc.take(5).toSeq} " +
        s"full=${full.take(5).toSeq}")
    // the maintained index holds BOTH slices (base + appended delta)...
    val assigned = spark.read.parquet(s"$p/assign").count()
    val corpus = spark.read
      .parquet(s"$sf/embeddings.parquet").count()
    assert(assigned == corpus,
      s"maintained index covers $assigned of $corpus vectors")
    // ...and a re-query must not rebuild it (write-once guard on the
    // done marker)
    val f = new java.io.File(s"$p/done")
    assert(f.exists)
    val t0 = f.lastModified()
    SparkEntry.queries("q_sim_index_delta")(spark, sf).collect()
    assert(f.lastModified() == t0, "inc index was rebuilt on re-query")
  }

  test("cell rebalance: compaction restores the per-cell bound by " +
      "splitting only fat cells, and parent-routed search is row-for-row " +
      "identical pre/post") {
    import org.apache.spark.sql.functions.{col, count, lit}
    // FRESH scratch copy of the append-only index (a stale one from a
    // previous run would re-split already-split cells down to
    // singletons), then force a split of the biggest cell:
    // bound = preMax - 1 guarantees the rebalance works regardless of
    // how skewed this corpus's cells happen to be
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(
      s"/root/repo/target/qtmp/sim_ivf_rebspec_${math.abs(sf.hashCode)}"))
    val p = LlmSim4.buildIncIndex(spark, sf, "sim_ivf_rebspec")
    def cellSizes() = spark.read.parquet(s"$p/assign")
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val pre = cellSizes()
    val preMax = pre.values.max
    val before = LlmSim4.searchIndex(spark, sf, p)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    LlmSim4.rebalanceIndex(spark, sf, p, bound = preMax - 1)
    val post = cellSizes()
    // the bound is restored and the postings universe is preserved
    assert(post.values.max <= preMax - 1,
      s"per-cell bound not restored: pre=$pre post=$post")
    assert(post.values.sum == pre.values.sum,
      s"rebalance lost/duplicated postings: pre=$pre post=$post")
    assert(post.size > pre.size, "no new sub-cell was created")
    // cells UNDER the bound were never touched (same sizes, same ids)
    pre.filter(_._2 <= preMax - 1).foreach { case (c, n) =>
      assert(post.get(c).exists(_ <= n), s"untouched cell $c changed")
    }
    // search parity: parent routing reads every sub-cell of a probed
    // parent, so the candidate set — and every result row — is identical
    val after = LlmSim4.searchIndex(spark, sf, p)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(after.nonEmpty && after.toSeq == before.toSeq,
      s"rebalance changed search results: before=${before.take(5).toSeq} " +
        s"after=${after.take(5).toSeq}")
    // the production id (average-postings bound) also matches the
    // append-only index's search row-for-row
    val reb = SparkEntry.queries("q_sim_index_rebalance")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val inc = SparkEntry.queries("q_sim_index_delta")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(reb.nonEmpty && reb.toSeq == inc.toSeq,
      s"rebalanced/append-only divergence: reb=${reb.take(5).toSeq} " +
        s"inc=${inc.take(5).toSeq}")
  }

  test("the index builds once: a second search reuses the artifact " +
      "(assignment table mtime unchanged)") {
    val p = LlmSim4.buildIndex(spark, sf)
    val f = new java.io.File(s"$p/assign/_SUCCESS")
    assert(f.exists)
    val t0 = f.lastModified()
    SparkEntry.queries("q_sim_index_search")(spark, sf).collect()
    assert(f.lastModified() == t0, "index was rebuilt on re-query")
  }
}
