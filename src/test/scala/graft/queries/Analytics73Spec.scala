package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 nonparametric monitoring wave: Mann–Kendall at
  * its closed form on a monotone series and NULL-gated on a constant
  * one, Pettitt finding the planted step, Cliff's delta at ±1/0
  * extremes. */
class Analytics73Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkSeries(tag: String, tpe: String,
      vals: Seq[Double]): String = {
    import spark.implicits._
    val dir = Tables.freshDir(tag)
    vals.zipWithIndex
      .map { case (v, d) =>
        (new Timestamp(86400000L * (19723 + d)), tpe, v)
      }
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("mannkendall: strictly rising 5-day series gives S = 10, " +
      "var18 = 300, z = 2.204541; constant series gates z to NULL") {
    val up = SparkEntry.queries("q_agg_mannkendall")(
      spark, mkSeries("a73_up", "alpha", Seq(1, 2, 3, 4, 5))).head
    assert(up.getLong(1) == 5 && up.getLong(2) == 10 &&
      up.getLong(3) == 300, s"up: $up")
    assert(up.getDouble(4) == 2.204541, s"z: $up")
    val fl = SparkEntry.queries("q_agg_mannkendall")(
      spark, mkSeries("a73_fl", "alpha", Seq.fill(5)(7.0))).head
    assert(fl.getLong(2) == 0 && fl.getLong(3) == 0 && fl.isNullAt(4),
      s"flat: $fl")
  }

  test("pettitt: planted step at day index 2 is found with K = 9") {
    val r = SparkEntry.queries("q_agg_pettitt")(
      spark, mkSeries("a73_pt", "alpha",
        Seq(1, 1, 1, 9, 9, 9))).head
    assert(r.getLong(1) == 6 && r.getLong(2) == 9, s"pettitt: $r")
    assert(r.getLong(3) == 19723L + 2, s"t_star: $r")
    assert(r.getDouble(4) < 0.5, s"p: $r")
  }

  test("cliffsdelta: disjoint click/view supports give delta = 1, " +
      "identical give 0") {
    import spark.implicits._
    def mk(tag: String, base: Double): String = {
      val dir = Tables.freshDir(tag)
      (for {
        (t, off) <- Seq(("click", base), ("view", 0.0))
        d <- 0 until 4
      } yield (new Timestamp(86400000L * (19723 + d)), t, off + d))
        .toDF("ts", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    val hi = SparkEntry.queries("q_agg_cliffsdelta")(
      spark, mk("a73_ch", 100.0)).head
    assert(hi.getLong(0) == 16 && hi.getDouble(3) == 1.0, s"hi: $hi")
    val eq = SparkEntry.queries("q_agg_cliffsdelta")(
      spark, mk("a73_ce", 0.0)).head
    assert(eq.getDouble(3) == 0.0, s"eq: $eq")
  }
}
