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
