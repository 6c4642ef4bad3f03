package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture gates for the r11 second stats/series wave:
  * Bartlett's zero on equal variances, the dispersion index's exact
  * constant/bursty answers, hand-checked peak rows, and a hand-replayed
  * EWMA variance fold. */
class Analytics63Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  private def writeCounts(dir: String, counts: Seq[(Int, Int)]): Unit = {
    import spark.implicits._
    val rows = counts.flatMap { case (d, c) =>
      (0 until c).map(j => ((d * 1000 + j).toLong,
        base.plusDays(d.toLong).plusMinutes(j.toLong), 1L, "click",
        1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("bartlett: equal group variances give T = 0; a widened group " +
      "gives T > 0") {
    import spark.implicits._
    val dir = Tables.freshDir("a63_ba")
    def write(qB: Seq[Double]): Unit =
      (Seq((1.0, "A"), (2.0, "A"), (3.0, "A")) ++ qB.map((_, "B")))
        .toDF("l_quantity", "l_returnflag")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    write(Seq(11.0, 12.0, 13.0)) // var 1 vs var 1
    val eq = SparkEntry.queries("q_agg_bartlett")(spark, dir).head
    assert(eq.getLong(0) == 2 && eq.getDouble(2) == 1.0, s"eq: $eq")
    assert(eq.getDouble(3) == 0.0, s"T: ${eq.getDouble(3)}")
    write(Seq(9.0, 12.0, 15.0)) // var 9 — heterogeneous
    val ne = SparkEntry.queries("q_agg_bartlett")(spark, dir).head
    assert(ne.getDouble(3) > 0.0, s"T: ${ne.getDouble(3)}")
  }

  test("dispersion: constant dailies give VMR 0, bursty alternation " +
      "gives the exact VMR 3") {
    val dir = Tables.freshDir("a63_di")
    writeCounts(dir, (0 until 4).map(d => (d, 4)))
    val const = SparkEntry.queries("q_time_dispersion")(spark, dir).head
    assert(const.getDouble(2) == 4.0 && const.getDouble(4) == 0.0,
      s"const: $const")
    // {1,7,1,7}: mean 4, var 12, VMR 3, chi2 = 3·3 = 9
    writeCounts(dir, Seq((0, 1), (1, 7), (2, 1), (3, 7)))
    val burst = SparkEntry.queries("q_time_dispersion")(spark, dir).head
    assert(burst.getDouble(3) == 12.0 && burst.getDouble(4) == 3.0 &&
      burst.getDouble(5) == 9.0, s"burst: $burst")
  }

  test("peaks: [1,5,2,2,9,3,1] yields exactly the day-4 and day-1 " +
      "local maxima with their rise/fall") {
    val dir = Tables.freshDir("a63_pk")
    writeCounts(dir, Seq((0, 1), (1, 5), (2, 2), (3, 2), (4, 9),
      (5, 3), (6, 1)))
    val out = SparkEntry.queries("q_time_peaks")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.length == 2, s"rows: ${out.toSeq}")
    // rk 1 → the day-4 peak (9; rise 7, fall 6); rk 2 → day-1 (5; 4, 3)
    assert(out(0)._3 == 9 && out(0)._4 == 7 && out(0)._5 == 6,
      s"rk1: ${out(0)}")
    assert(out(1)._3 == 5 && out(1)._4 == 4 && out(1)._5 == 3,
      s"rk2: ${out(1)}")
  }

  test("ewvar: counts [4,8,2] replay to m=4, v=6, vol=sqrt(6)") {
    val dir = Tables.freshDir("a63_ew")
    writeCounts(dir, Seq((0, 4), (1, 8), (2, 2)))
    val r = SparkEntry.queries("q_time_ewvar")(spark, dir).head
    assert(r.getLong(1) == 3)
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 6.0, s"state: $r")
    assert(math.abs(r.getDouble(4) - math.sqrt(6.0)) < 1e-6)
  }
}
