package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the modularity/OLS2 wave: two disjoint
  * uniform triangles score the textbook Q = 0.5, and a noise-free plane
  * is recovered exactly by the two-regressor closed form. */
class Analytics12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("modularity: two disjoint triangles under label propagation " +
      "score exactly Q = 0.5") {
    import spark.implicits._
    val dir = Tables.freshDir("a12_mod")
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (11L, 12L), (11L, 13L), (12L, 13L))
    val rows = tri.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2 + 100L, a), (i * 2 + 100L, b),
        (i * 2 + 101L, a), (i * 2 + 101L, b))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((nc, m2, q)) =
      SparkEntry.queries("q_graph_modularity")(spark, dir)
        .as[(Long, Long, Double)].collect()
    assert(nc == 2L && m2 == 24L, s"nc=$nc m2=$m2")
    // per community: 12/24 - (12/24)^2 = 0.25; Q = 0.5
    assert(q == 0.5, s"Q=$q")
  }

  test("ols2: a noise-free plane value = 2 + 3*hod + 4*dow is " +
      "recovered exactly") {
    import spark.implicits._
    val dir = Tables.freshDir("a12_ols2")
    val rows = for {
      day <- 0 until 7
      hour <- 0 until 24
    } yield {
      val sec = day.toLong * 86400 + hour.toLong * 3600
      val ts = java.time.LocalDateTime.ofEpochSecond(
        sec, 0, java.time.ZoneOffset.UTC)
      val dow = day % 7
      (day.toLong * 100 + hour, ts, 1L, "click",
        2.0 + 3.0 * hour + 4.0 * dow, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((n, b0, b1, b2)) =
      SparkEntry.queries("q_agg_ols2")(spark, dir)
        .as[(Long, Double, Double, Double)].collect()
    assert(n == 168L)
    assert(b0 == 2.0 && b1 == 3.0 && b2 == 4.0,
      s"plane: b0=$b0 b1=$b1 b2=$b2")
  }
}
