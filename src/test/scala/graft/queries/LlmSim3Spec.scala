package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Filtered vector search (round 9): predicate containment, the
  * nprobe=cells exactness limit of the filtered IVF funnel, and recall
  * at the operating point. */
class LlmSim3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def enIds: Set[Long] =
    LlmSim3.keepEn(spark, sf).collect().map(_.getLong(0)).toSet

  test("exact filtered top-k returns only predicate-passing vectors, " +
      "every label answered, ranks dense from 1") {
    val rows = SparkEntry.queries("q_sim_filtered")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val keep = enIds
    assert(rows.nonEmpty)
    assert(rows.forall(r => keep.contains(r._2)),
      s"non-English vectors retrieved: ${rows.filterNot(r => keep.contains(r._2)).toSeq}")
    val byLabel = rows.groupBy(_._1)
    assert(byLabel.keySet.size == 10, s"labels answered: ${byLabel.keySet}")
    byLabel.foreach { case (lab, rs) =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length),
        s"label $lab ranks not dense: ${rs.toSeq}")
      // sims non-increasing with rank
      val sorted = rs.sortBy(_._4).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
        s"label $lab sims not ranked: ${sorted.toSeq}")
    }
  }

  test("filtered results differ from unfiltered exactly where the " +
      "unfiltered top-k contains non-English vectors") {
    val unfiltered = SparkEntry.queries("q_sim_cosine_topk")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val filtered = SparkEntry.queries("q_sim_filtered")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val keep = enIds
    // every unfiltered hit that passes the predicate AND whose label kept
    // k slots must still be present is a stronger claim than needed; the
    // sound invariant: unfiltered hits on English vectors remain top-k
    // candidates, so any unfiltered (label, vec) with vec English must
    // appear in the filtered result (removing competitors only promotes)
    val enHits = unfiltered.filter(t => keep.contains(t._2))
    assert(enHits.subsetOf(filtered),
      s"filter demoted English hits: ${enHits -- filtered}")
  }

  test("filtered IVF with nprobe = cells equals the exact filtered " +
      "baseline (the funnel's exactness limit)") {
    val exact = SparkEntry.queries("q_sim_filtered")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val full = LlmSim.annIvf(spark, sf, cells = 8, nprobe = 8, k = 5,
      keep = Some(LlmSim3.keepEn(spark, sf)))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(full == exact,
      s"unpruned filtered IVF diverged: missing ${exact -- full}, " +
        s"extra ${full -- exact}")
  }

  test("filtered IVF at the operating point: only predicate-passing " +
      "vectors; recall >= 0.8 vs exact filtered top-3") {
    val ann = SparkEntry.queries("q_sim_filtered_ivf")(spark, sf).collect()
    val keep = enIds
    assert(ann.nonEmpty)
    assert(ann.forall(r => keep.contains(r.getLong(1))),
      "predicate leaked inside the probed cells")
    val exact = SparkEntry.queries("q_sim_filtered")(spark, sf).collect()
      .filter(_.getInt(3) <= 3).map(r => (r.getInt(0), r.getLong(1))).toSet
    val approx = ann.map(r => (r.getInt(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"filtered-IVF recall $recall < 0.8 " +
        s"(hits ${(exact intersect approx).size}/${exact.size})")
  }
}
