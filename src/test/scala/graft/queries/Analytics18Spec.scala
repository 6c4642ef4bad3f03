package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the HITS/Theil/period-over-period wave:
  * a 2×2 bipartite graph reproduces hand-computed integer authority
  * scores, a 1-vs-3 revenue pair hits the closed-form Theil T, and a
  * 10→15 weekly step yields delta 5 / +50%. */
class Analytics18Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("hits: c1→{p10,p20}, c2→{p10} gives a2(p10)=5, a2(p20)=3 " +
      "with max hub 3") {
    import spark.implicits._
    val dir = Tables.freshDir("a18_hits")
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (1L, 20L), (2L, 10L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_hits")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 2L, 5L, 3L), (20L, 1L, 3L, 3L)), s"hits: $out")
  }

  test("theil: a 1-vs-3 revenue pair hits the closed-form " +
      "(0.5·ln0.5 + 1.5·ln1.5)/2") {
    import spark.implicits._
    val dir = Tables.freshDir("a18_theil")
    Seq((0, "R1")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((0, "N1", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    // region R1: customers 1 (rev 1.0) and 2 (rev 3.0)
    Seq((1L, "c1", 0, 0.0, "SEG"), (2L, "c2", 0, 0.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 1.0), (2L, 2L, 3.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_agg_theil")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    def r9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = ((r9(0.5 * math.log(0.5)) + r9(1.5 * math.log(1.5)))
      / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(("R1", 2L, expected)), s"theil: $out")
  }

  test("pop: weekly counts 10 then 15 report delta 5 and +50%") {
    import spark.implicits._
    val dir = Tables.freshDir("a18_pop")
    val wk = 604800L
    var id = 0L
    val rows = (Seq.fill(10)(0L) ++ Seq.fill(15)(1L)).map { w =>
      id += 1
      (id, ts(w * wk + 60), 1L, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_pop")(spark, dir)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().toSeq
    assert(out == Seq(("view", 0L, 10L, None, None, None),
      ("view", 1L, 15L, Some(10L), Some(5L), Some(0.5))), s"pop: $out")
  }
}
