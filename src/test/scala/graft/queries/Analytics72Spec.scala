package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 graph-structure wave: bipartite projection
  * weights on a hand-computed overlap fixture, and 4-truss peeling
  * keeping a K4 while shedding its pendant edge. */
class Analytics72Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bipartite: shared-user counts and cosine/jaccard match the " +
      "hand-computed overlap fixture") {
    import spark.implicits._
    val dir = Tables.freshDir("a72_bp")
    // A: users {1,2}; B: {2,3}; C: {2}
    Seq((1L, "A"), (2L, "A"), (2L, "B"), (3L, "B"), (2L, "C"))
      .map { case (u, t) =>
        (new java.sql.Timestamp(86400000L * 19723), u, t, 1.0)
      }
      .toDF("ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q_graph_bipartite")(spark, dir)
      .collect()
    assert(rows.length == 3)
    val byPair = rows.map(r => (r.getString(1), r.getString(0)) -> r).toMap
    val ab = byPair(("B", "A"))
    assert(ab.getLong(2) == 1 && ab.getDouble(5) == 0.5 &&
      ab.getDouble(6) == 0.333333, s"AB: $ab")
    val ac = byPair(("C", "A"))
    assert(ac.getDouble(5) == 0.707107 && ac.getDouble(6) == 0.5,
      s"AC: $ac")
    val bc = byPair(("C", "B"))
    assert(bc.getDouble(5) == 0.707107 && bc.getDouble(6) == 0.5,
      s"BC: $bc")
  }

  test("ktruss: K4 plus pendant edge -> pendant dropped in round 1, " +
      "K4 stable through round 2") {
    import spark.implicits._
    val dir = Tables.freshDir("a72_kt")
    // orders 1,2: full K4 {1,2,3,4} twice -> all 6 pairs cn = 2;
    // orders 3,4: {1,5} twice -> pendant edge (1,5) with cn = 2.
    val rows =
      (for (ok <- 1L to 2L; pk <- 1L to 4L) yield (ok, pk)) ++
        (for (ok <- 3L to 4L; pk <- Seq(1L, 5L)) yield (ok, pk))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_ktruss")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 7L, 1L -> 6L, 2L -> 6L), s"rounds: $out")
  }
}
