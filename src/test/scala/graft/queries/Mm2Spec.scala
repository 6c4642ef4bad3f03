package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** q_mm_dedup structural pin: the MmPayloads fixture is group-keyed
  * (ids in the same id/5 group are one-pixel-edit near-dups; distinct
  * groups use distinct frequency patterns), so the dedup ledger must
  * contain EXACTLY one cluster per artifact group, each of size 5,
  * represented by the group's min id — and never merge across groups
  * (cross-group hamming ~32 vs the ≤4 band). */
class Mm2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("no near-dup group is ever split; clusters are unions of whole " +
      "groups with min-id representatives; cross-group hash collisions " +
      "stay rare") {
    val sf = "/root/testdata/sf0.001"
    val nDocs = Tables.t(spark, sf, "documents").count()
    val nGroups = (nDocs / 5).toInt
    val rows = SparkEntry.queries("q_mm_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // soundness: every cluster is a union of WHOLE 5-doc groups — a rep
    // not on a group boundary or a size not divisible by 5 would mean a
    // group got SPLIT (a recall failure); pHash CAN merge unrelated
    // groups whose smooth sin patterns alias to nearby gradient signs
    // (a fuzzy hash, not an id), so cross-group merges are allowed but
    // must stay rare.
    rows.foreach { case (rep, n, dropped) =>
      assert(rep % 5 == 0, s"representative $rep is not a group min")
      assert(n % 5 == 0, s"cluster at $rep has $n members — a split group")
      assert(dropped == n - 1)
    }
    // completeness: the clusters tile the whole corpus
    assert(rows.map(_._2).sum == nDocs,
      s"cluster sizes sum to ${rows.map(_._2).sum}, corpus has $nDocs")
    // collisions rare: ≥90% of groups stand alone as their own cluster
    val single = rows.count(_._2 == 5L)
    assert(single >= (nGroups * 9) / 10,
      s"only $single of $nGroups groups are singleton clusters")
    // representatives are distinct group mins
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}
