package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture contracts for change-point detection (a clean level
  * shift must win with the exact between-segment gain, ties break to
  * the earlier day) and the seeded DP count release (independent
  * reimplementation of the md5→uniform→Laplace chain). */
class Analytics46Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  test("changepoint: [2,2,2,8,8,8] splits at the level shift with " +
      "gain 54; the 27.0 tie resolves to the earlier day") {
    import spark.implicits._
    val dir = Tables.freshDir("a46_cpt")
    val counts = Seq(2, 2, 2, 8, 8, 8)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 100 + j).toLong,
        base.plusDays(d.toLong).plusMinutes(j.toLong), 1L, "click",
        1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d0 = java.time.LocalDate.of(2024, 7, 1).toEpochDay
    val out = SparkEntry.queries("q_time_changepoint")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(
      (1, d0 + 2, 3L, 3L, 2.0, 8.0, 54.0),
      (2, d0 + 1, 2L, 4L, 2.0, 6.5, 27.0),
      (3, d0 + 3, 4L, 2L, 3.5, 8.0, 27.0)),
      s"changepoint ranking wrong: ${out.toSeq}")
  }

  test("dpcount: released counts match an independent md5→uniform→" +
      "Laplace reimplementation, clamped at zero") {
    import spark.implicits._
    val dir = Tables.freshDir("a46_dp")
    val rows = (1 to 100).map(i => (i.toLong, 1)) ++
      (1 to 3).map(i => (200L + i, 2))
    rows.toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    def expected(nat: Int, eps: String, b: Double, nTrue: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$nat:$eps".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
      val k = java.lang.Long.parseLong(hex.take(8), 16)
      val u = (k.toDouble + 0.5) / 4294967296.0
      val noise = -b * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      math.max(math.round(nTrue.toDouble + noise), 0L)
    }
    val out = SparkEntry.queries("q_quality_dpcount")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = Seq(("0.5", 1, 100L), ("0.5", 2, 3L),
      ("1.0", 1, 100L), ("1.0", 2, 3L)).map { case (e, nat, n) =>
      val b = if (e == "0.5") 2.0 else 1.0
      val rel = expected(nat, e, b, n)
      (e, nat, n, rel, rel - n)
    }
    assert(out.toSeq === want, s"dp release wrong: ${out.toSeq} vs $want")
    assert(out.forall(_._4 >= 0L))
  }
}
