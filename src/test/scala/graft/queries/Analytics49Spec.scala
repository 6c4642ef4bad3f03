package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Hand-computed coalition values for the exact Shapley attribution
  * (efficiency and the textbook two-channel worked example) and a
  * step-by-step Scala replay of the Kalman local-level fold. */
class Analytics49Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("shapley: two-channel worked example — v(∅)=0, v({c})=1, " +
      "v({v})=0, v({c,v})=2 gives φ(click)=1.5, φ(view)=0.5") {
    import spark.implicits._
    val dir = Tables.freshDir("a49_shap")
    // u1: click + purchase; u2: view only; u3: click + view + purchase
    val rows = Seq(
      (1L, base, 1L, "click", 1.0, "{}"),
      (2L, base.plusMinutes(1), 1L, "purchase", 1.0, "{}"),
      (3L, base, 2L, "view", 1.0, "{}"),
      (4L, base, 3L, "click", 1.0, "{}"),
      (5L, base.plusMinutes(1), 3L, "view", 1.0, "{}"),
      (6L, base.plusMinutes(2), 3L, "purchase", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_win_shapley")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("click", 1.5, 0.75), ("view", 0.5, 0.25)),
      s"shapley mismatch: ${out.toSeq}")
  }

  test("shapley: efficiency — Σφ equals v(full) − v(∅) on a " +
      "four-channel fixture with purchase-only and no-touch users") {
    import spark.implicits._
    val dir = Tables.freshDir("a49_shap_eff")
    val types = Seq("click", "view", "signup", "error")
    var eid = 0L
    def ev(u: Long, t: String) = { eid += 1
      (eid, base.plusMinutes(eid), u, t, 1.0, "{}") }
    val rows = (1 to 20).flatMap { u =>
      val touches = types.filter(tp => (u + tp.length) % 3 != 0)
      val purch = if (u % 2 == 0) Seq(ev(u.toLong, "purchase")) else Nil
      touches.map(tp => ev(u.toLong, tp)) ++ purch
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // v(full) = all conversions; v(∅) = conversions of users with NO
    // touches at all
    val conv = (1 to 20).filter(_ % 2 == 0)
    val vFull = conv.size
    val vEmpty = conv.count(u => types.forall(tp => (u + tp.length) % 3 == 0))
    val out = SparkEntry.queries("q_win_shapley")(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq === types.sorted)
    val sum = out.map(_._2).sum
    assert(math.abs(sum - (vFull - vEmpty)) < 1e-6,
      s"efficiency violated: Σφ=$sum vs ${vFull - vEmpty}")
  }

  test("kalman: fold matches a step-by-step Scala replay and the gain " +
      "approaches the steady-state Riccati fixed point") {
    import spark.implicits._
    val dir = Tables.freshDir("a49_kal")
    val counts = Seq(10, 20, 30, 25, 40, 35, 30, 28, 33, 31)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 1000 + j).toLong,
        base.plusDays(d.toLong).plusMinutes(j.toLong), 1L, "click",
        1.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    var x = counts.head.toDouble; var p = 16.0; var k = 0.0
    counts.tail.foreach { y =>
      val pp = p + 4.0
      k = pp / (pp + 16.0)
      x = x + k * (y - x)
      p = (1.0 - k) * pp
    }
    val out = SparkEntry.queries("q_time_kalman")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(("click", 10L, r6(x), r6(p), r6(k))),
      s"kalman mismatch: ${out.toSeq} vs ${(r6(x), r6(p), r6(k))}")
    // steady-state gain for q=4, r=16: P* = (−q + sqrt(q² + 4qr))/2,
    // K* = (P*+q)/(P*+q+r)
    val pStar = (-4.0 + math.sqrt(16.0 + 4.0 * 4.0 * 16.0)) / 2.0
    val kStar = (pStar + 4.0) / (pStar + 4.0 + 16.0)
    assert(math.abs(k - kStar) < 0.01,
      s"gain $k not converged to Riccati fixed point $kStar")
  }
}
