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
