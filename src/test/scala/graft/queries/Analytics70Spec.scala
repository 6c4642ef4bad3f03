package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 technical-indicator wave: Bollinger on a flat
  * series (zero-width band, no breakouts), RSI at its 100/0/50
  * extremes, MACD at zero on a flat series and positive on a rising
  * one. */
class Analytics70Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One event per day with value = f(day). */
  private def mkDaily(tag: String, n: Int, f: Int => Double): String = {
    import spark.implicits._
    val dir = Tables.freshDir(tag)
    (0 until n)
      .map(d => (new Timestamp(86400000L * (19723 + d)), "alpha", f(d)))
      .toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("bollinger: flat series has zero-width band and no breakouts; " +
      "row count = days - 6") {
    val rows = SparkEntry.queries("q_time_bollinger")(
      spark, mkDaily("a70_bb", 10, _ => 10.0)).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getDouble(2) == 10.0 && r.getDouble(3) == 10.0)
      assert(r.getDouble(4) == 0.0 && !r.getBoolean(5), s"row: $r")
    }
  }

  test("rsi: monotone up = 100, monotone down = 0, flat = 50") {
    val up = SparkEntry.queries("q_time_rsi")(
      spark, mkDaily("a70_ru", 16, d => 10.0 + d)).collect()
    assert(up.nonEmpty && up.forall(_.getDouble(2) == 100.0))
    val dn = SparkEntry.queries("q_time_rsi")(
      spark, mkDaily("a70_rd", 16, d => 100.0 - d)).collect()
    assert(dn.nonEmpty && dn.forall(_.getDouble(2) == 0.0))
    val fl = SparkEntry.queries("q_time_rsi")(
      spark, mkDaily("a70_rf", 16, _ => 10.0)).collect()
    assert(fl.nonEmpty && fl.forall(_.getDouble(2) == 50.0))
  }

  test("macd: zero everywhere on a flat series, strictly positive " +
      "line once a rising series has history") {
    val fl = SparkEntry.queries("q_time_macd")(
      spark, mkDaily("a70_mf", 12, _ => 10.0)).collect()
    assert(fl.length == 12)
    fl.foreach { r =>
      assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
        r.getDouble(4) == 0.0, s"flat macd row: $r")
    }
    val up = SparkEntry.queries("q_time_macd")(
      spark, mkDaily("a70_mu", 12, d => 10.0 * d)).collect()
    // after the kernels fill (day >= 8), fast EMA sits above slow
    val tail = up.filter(_.getLong(1) >= 19723L + 8)
    assert(tail.nonEmpty && tail.forall(_.getDouble(2) > 0.0))
  }
}
