package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 embedding-health + rich-club wave: structural
  * invariants of the dimension profile, the isotropy report's pairing
  * arithmetic, and an exact rich-club answer on a clique+pair graph. */
class Analytics64Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("dimstats: one row per dimension, var_rank is a permutation, " +
      "n equals the vector count, deterministic") {
    val rows = SparkEntry.queries("q_embed_dimstats")(spark, sf).collect()
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 64))
    assert(rows.forall(_.getLong(1) == nVec))
    assert(rows.map(_.getInt(6)).sorted.toSeq == (1 to 64),
      "var_rank must be a permutation of 1..64")
    assert(rows.forall(r => r.getDouble(4) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(5)), "mean outside [min, max]")
    val again = SparkEntry.queries("q_embed_dimstats")(spark, sf)
      .collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("isotropy: pairs halve the capped sample, cosines are bounded, " +
      "norms are positive") {
    val r = SparkEntry.queries("q_embed_isotropy")(spark, sf).head
    val nVecs = r.getLong(1)
    assert(r.getLong(0) == nVecs / 2, s"pairing: $r")
    assert(math.abs(r.getDouble(2)) <= 1.0 &&
      r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"cos: $r")
    assert(r.getDouble(4) > 0.0 && r.getDouble(6) >= 0.0, s"norms: $r")
  }

  test("richclub: a K4 clique plus a pendant pair gives phi(2) = 1 " +
      "and no rows past the clique degree") {
    import spark.implicits._
    val dir = Tables.freshDir("a64_rc")
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val edges = k4 ++ Seq((11L, 12L))
    var ok = 9000L
    val rows = edges.flatMap { case (a, b) =>
      (0 until 2).flatMap { _ => ok += 1; Seq((ok, a), (ok, b)) }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_richclub")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // k=2: the 4 clique nodes (deg 3) with all 6 edges → phi = 1;
    // k=4/8: no nodes above threshold → no rows
    assert(out.toSeq == Seq((2L, 4L, 6L, 1.0)), s"got: ${out.toSeq}")
  }
}
