package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Gates for the r11 autocorrelation-structure wave: PACF degenerate
  * gating on a perfectly alternating series, spectral entropy exactly
  * 1 on an equal-peak periodic series and empty on a flat one, range
  * sanity on real data. */
class Analytics71Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** counts(b) events in bucket b (bucketSec-wide buckets). */
  private def mkCounts(tag: String, bucketSec: Long,
      counts: Seq[Int]): String = {
    import spark.implicits._
    val dir = Tables.freshDir(tag)
    val rows = for {
      (c, b) <- counts.zipWithIndex
      i <- 0 until c
    } yield (new Timestamp((19723L * 86400 + b * bucketSec) * 1000 + i),
      "alpha", 1.0)
    rows.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("pacf: perfectly alternating daily counts give r1 = -1 and " +
      "NULL-gated pacf2/pacf3; real data stays in [-1, 1]") {
    val dir = mkCounts("a71_alt", 86400L,
      Seq.tabulate(20)(d => if (d % 2 == 0) 10 else 1))
    val r = SparkEntry.queries("q_time_pacf")(spark, dir).head
    assert(r.getDouble(1) == -1.0, s"r1: $r")
    assert(r.isNullAt(5) && r.isNullAt(6), s"pacf2/3 not gated: $r")
    SparkEntry.queries("q_time_pacf")(spark, sf).collect().foreach { x =>
      for (i <- 1 to 6 if !x.isNullAt(i))
        assert(math.abs(x.getDouble(i)) <= 1.000001, s"range: $x")
    }
  }

  test("spectral: period-2 hourly series has equal positive peaks at " +
      "even lags -> norm_entropy = 1 over n_pos = 12; flat series " +
      "emits nothing") {
    val dir = mkCounts("a71_p2", 3600L,
      Seq.tabulate(48)(h => if (h % 2 == 0) 10 else 1))
    val r = SparkEntry.queries("q_time_spectral")(spark, dir).head
    assert(r.getLong(1) == 12, s"n_pos: $r")
    assert(r.getDouble(3) == 1.0, s"norm_entropy: $r")
    val flat = mkCounts("a71_fl", 3600L, Seq.fill(48)(5))
    assert(SparkEntry.queries("q_time_spectral")(spark, flat)
      .collect().isEmpty)
    SparkEntry.queries("q_time_spectral")(spark, sf).collect()
      .foreach { x =>
        if (!x.isNullAt(3)) {
          val h = x.getDouble(3)
          assert(h >= 0.0 && h <= 1.000001, s"norm range: $x")
        }
      }
  }
}
