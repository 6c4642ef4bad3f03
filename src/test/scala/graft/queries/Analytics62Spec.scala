package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture gates for the r11 graph/data-ops reports: exact
  * clustering-coefficient summary on a triangle+path+pair graph and an
  * exact freshness report on a two-type staggered calendar. */
class Analytics62Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("clustcoef: triangle + 10-node path + pair → exact avg lcc, " +
      "zero share, and transitivity") {
    import spark.implicits._
    val dir = Tables.freshDir("a62_cc")
    val pathEdges = (101L to 109L).map(i => (i, i + 1))
    val edges = pathEdges ++ Seq((201L, 202L), (201L, 203L),
      (202L, 203L), (301L, 302L))
    var ok = 7000L
    val rows = edges.flatMap { case (a, b) =>
      (0 until 2).flatMap { _ => ok += 1; Seq((ok, a), (ok, b)) }
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_graph_clustcoef")(spark, dir).head
    // deg≥2 nodes: 3 triangle nodes (lcc 1) + 8 path interiors (lcc 0);
    // pair + path ends have deg 1 and are excluded
    assert(r.getLong(0) == 11, s"n_nodes: $r")
    assert(r.getLong(1) == 1, s"n_triangles: $r")
    assert(math.abs(r.getDouble(2) - 3.0 / 11.0) < 1e-6,
      s"avg_lcc: ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 8.0 / 11.0) < 1e-6,
      s"zero_share: ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - 3.0 / 11.0) < 1e-6,
      s"transitivity: ${r.getDouble(4)}")
  }

  test("freshness: staggered two-type calendar reports exact staleness " +
      "and coverage") {
    import spark.implicits._
    val dir = Tables.freshDir("a62_fr")
    val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)
    // click: days 0..9 (10 active days, fresh); error: days 0 and 4
    // only (2 active days, stale by 5)
    val rows =
      (0 until 10).map(d => ((d + 1).toLong, base.plusDays(d.toLong),
        1L, "click", 1.0, "{}")) ++
        Seq((100L, base, 2L, "error", 1.0, "{}"),
          (101L, base.plusDays(4), 2L, "error", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_quality_freshness")(spark, dir)
      .collect()
    assert(out.length == 2)
    val click = out(0); val err = out(1)
    assert(click.getString(0) == "click" && err.getString(0) == "error")
    assert(click.getLong(3) == 0 && click.getLong(4) == 10 &&
      click.getDouble(6) == 1.0, s"click: $click")
    assert(err.getLong(3) == 5 && err.getLong(4) == 2 &&
      err.getDouble(6) == 0.2 && err.getDouble(7) == 1.0,
      s"error: $err")
  }
}
