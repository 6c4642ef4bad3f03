package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the communities/seasonality/projection
  * wave: two disjoint triangles collapse to two 3-communities, a
  * uniform hourly stream has seasonal index 1 in every slot, and the JL
  * projection is linear and deterministic. */
class Analytics10Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("labelprop: two disjoint co-purchase triangles converge to two " +
      "communities of size 3 labelled by their smallest node") {
    import spark.implicits._
    val dir = Tables.freshDir("a10_lp")
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (11L, 12L), (11L, 13L), (12L, 13L))
    // two orders per edge → pair support 2 (the cn >= 2 gate)
    val rows = tri.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2 + 100L, a), (i * 2 + 100L, b),
        (i * 2 + 101L, a), (i * 2 + 101L, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_labelprop")(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (11L, 3L)), s"communities: $out")
  }

  test("seasonal: a uniform 3-events-per-hour stream over 48 hours " +
      "scores idx = 1.0 in all 24 slots") {
    import spark.implicits._
    val dir = Tables.freshDir("a10_seasonal")
    val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)
    val rows = (0 until 48).flatMap { h =>
      (0 until 3).map { i =>
        (h.toLong * 10 + i, base.plusHours(h.toLong).plusMinutes(i.toLong),
          1L, "click", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_seasonal")(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(out.size == 24)
    assert(out.forall { case (_, _, nh, mc, idx) =>
      nh == 2L && mc == 3.0 && idx == 1.0 }, s"profile: $out")
  }

  test("randproj: projection is linear (doubling the vector doubles " +
      "every component) and deterministic") {
    import spark.implicits._
    val dir = Tables.freshDir("a10_rp")
    val v = (1 to 64).map(i => (i % 7).toFloat - 3.0f).toArray
    val v2 = v.map(_ * 2.0f)
    Seq((1L, v, "a"), (2L, v2, "a"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_randproj")(spark, dir)
      .as[(Long, Int, Double)].collect().toSeq
    assert(out.size == 32)
    val y1 = out.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    val y2 = out.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    (1 to 16).foreach { j =>
      assert(math.abs(y2(j) - 2.0 * y1(j)) < 1e-6,
        s"j=$j y1=${y1(j)} y2=${y2(j)}")
    }
    val again = SparkEntry.queries("q_embed_randproj")(spark, dir)
      .as[(Long, Int, Double)].collect().toSeq
    assert(out == again)
  }
}
