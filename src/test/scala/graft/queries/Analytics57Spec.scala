package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Exact Scala replay of the Granger F chain on a fixture where
  * clicks strictly lead purchases (with a wiggle so the unrestricted
  * fit is not perfect), and the directional asymmetry check. */
class Analytics57Spec extends AnyFunSuite {

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

  private def cOf(d: Int): Int = 10 + (d * 7) % 13
  private def pOf(d: Int): Int =
    if (d == 0) 5 else cOf(d - 1) + (d % 2)

  test("granger: F chain matches an exact-moment Scala replay; the " +
      "click→purchase direction dominates when clicks lead") {
    import spark.implicits._
    val dir = Tables.freshDir("a57_gr")
    var eid = 0L
    val rows = (0 until 21).flatMap { d =>
      val cs = (0 until cOf(d)).map { j =>
        eid += 1
        (eid, base.plusDays(d.toLong).plusMinutes(j.toLong), 1L,
          "click", 1.0, "{}")
      }
      val ps = (0 until pOf(d)).map { j =>
        eid += 1
        (eid, base.plusDays(d.toLong).plusMinutes(500L + j), 1L,
          "purchase", 1.0, "{}")
      }
      cs ++ ps
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // replay with exact integer moments (days 1..20 carry a lag row)
    def fit(y: Seq[Long], x1: Seq[Long], x2: Seq[Long]):
        (Double, Double, Double, Double, Double) = {
      val n = y.size.toDouble
      def s(a: Seq[Long]) = a.sum.toDouble
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (u, v) => u * v }.sum.toDouble
      val (s1, s2, sy) = (s(x1), s(x2), s(y))
      val (s11, s22, s12) = (sp(x1, x1), sp(x2, x2), sp(x1, x2))
      val (s1y, s2y, syy) = (sp(x1, y), sp(x2, y), sp(y, y))
      val detM = n * (s11 * s22 - s12 * s12) -
        s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
      val det0 = sy * (s11 * s22 - s12 * s12) -
        s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
      val det1 = n * (s1y * s22 - s12 * s2y) -
        sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
      val det2 = n * (s11 * s2y - s1y * s12) -
        s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
      val detR = n * s11 - s1 * s1
      val a1 = (n * s1y - s1 * sy) / detR
      val a0 = (sy - a1 * s1) / n
      val rssR = syy - (a0 * sy + a1 * s1y)
      val (b0, b1, b2) = (det0 / detM, det1 / detM, det2 / detM)
      val rssU = syy - (b0 * sy + b1 * s1y + b2 * s2y)
      val f = (rssR - rssU) / (rssU / (n - 3.0))
      (b1, b2, rssR, rssU, f)
    }
    val days = 1 to 20
    val c = days.map(d => cOf(d).toLong)
    val p = days.map(d => pOf(d).toLong)
    val lc = days.map(d => cOf(d - 1).toLong)
    val lp = days.map(d => pOf(d - 1).toLong)
    val cp = fit(p, lp, lc)
    val pc = fit(c, lc, lp)
    val out = SparkEntry.queries("q_time_granger")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(
      ("c_to_p", 20L, r6(cp._1), r6(cp._2), r6(cp._3), r6(cp._4),
        r6(cp._5)),
      ("p_to_c", 20L, r6(pc._1), r6(pc._2), r6(pc._3), r6(pc._4),
        r6(pc._5))),
      s"granger mismatch: ${out.toSeq} vs ${(cp, pc)}")
    // clicks lead by construction: the c→p F must dwarf p→c
    val fCp = out.find(_._1 == "c_to_p").get._7
    val fPc = out.find(_._1 == "p_to_c").get._7
    assert(fCp > 10 * math.max(fPc, 1.0),
      s"no directional asymmetry: c_to_p=$fCp p_to_c=$fPc")
  }
}
