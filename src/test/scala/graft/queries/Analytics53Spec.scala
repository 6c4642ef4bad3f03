package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Independent Scala replay of the beta-binomial MoM shrinkage chain
  * and the full uplift/Qini decile pipeline. */
class Analytics53Spec extends AnyFunSuite {

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
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ebayes: MoM prior and shrinkage match a Scala replay; the " +
      "tiny segment shrinks hardest and lands between raw and prior") {
    import spark.implicits._
    val dir = Tables.freshDir("a53_eb")
    // (nation, n, positives)
    val spec = Seq((1, 3, 2), (2, 100, 40), (3, 100, 60), (4, 50, 25))
    val rows = spec.flatMap { case (nat, n, x) =>
      (1 to n).map(i =>
        (nat * 1000L + i, nat, if (i <= x) 5.0 else -5.0))
    }
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rates = spec.map { case (nat, n, x) =>
      (nat, n.toLong, x.toLong, x.toDouble / n) }
    val g = rates.size
    // mirror the engine's exact-DECIMAL sums before the double division
    val m = rates.map(r => BigDecimal(r9(r._4))).sum.toDouble / g
    val v = rates.map(r => BigDecimal(r9(r._4 * r._4))).sum.toDouble / g -
      m * m
    val k = m * (1.0 - m) / v - 1.0
    val want = rates.map { case (nat, n, x, r) =>
      (nat, n, x, r6(r), r6((x + m * k) / (n + k)), r6(m), r6(k))
    }
    val out = SparkEntry.queries("q_agg_ebayes")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === want, s"ebayes mismatch: ${out.toSeq} vs $want")
    // the 3-customer segment (raw 2/3) must land strictly between the
    // prior mean and its raw rate, closer to the prior than the
    // 100-customer segment with the same-side deviation
    val tiny = out.find(_._1 == 1).get
    assert(tiny._5 > tiny._6 && tiny._5 < tiny._4)
  }

  test("uplift: decile assignment, uplift, and Qini match a full " +
      "Scala replay with a planted top-decile treatment effect") {
    import spark.implicits._
    val dir = Tables.freshDir("a53_up")
    var eid = 0L
    // 40 users; score = user_id % 20 clicks; treated (even) users
    // convert when score ≥ 15, controls when score ≥ 19
    val rows = (1L to 40L).flatMap { u =>
      val score = (u % 20).toInt
      val conv =
        if (u % 2 == 0) score >= 15 else score >= 19
      val clicks = (1 to score).map { _ =>
        eid += 1; (eid, base.plusMinutes(eid), u, "click", 1.0, "{}") }
      val pur = if (conv) { eid += 1
        Seq((eid, base.plusMinutes(eid), u, "purchase", 1.0, "{}")) }
        else Nil
      clicks ++ pur
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // replay
    case class U(id: Long, score: Int, y: Long, t: Boolean)
    val us = (1L to 40L).map { u =>
      val score = (u % 20).toInt
      val conv = if (u % 2 == 0) score >= 15 else score >= 19
      U(u, score, if (conv) 1L else 0L, u % 2 == 0)
    }.filter(u => u.score > 0 || u.y > 0) // event-less users don't exist
      // in the stream the engine aggregates
    val nu = us.size
    val ranked = us.sortBy(u => (-u.score, u.id)).zipWithIndex
      .map { case (u, i) => (u, (10 * (i + 1) + nu - 1) / nu) }
    val want = ranked.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (dec, xs) =>
        val nt = xs.count(_._1.t).toLong
        val nc = xs.count(!_._1.t).toLong
        val yt = xs.filter(_._1.t).map(_._1.y).sum
        val yc = xs.filter(!_._1.t).map(_._1.y).sum
        (dec.toLong, nt, nc, yt, yc)
    }
    var cnt = 0L; var cnc = 0L; var cyt = 0L; var cyc = 0L
    val wantRows = want.map { case (dec, nt, nc, yt, yc) =>
      cnt += nt; cnc += nc; cyt += yt; cyc += yc
      val uplift = if (nt > 0 && nc > 0)
        r6(yt.toDouble / nt - yc.toDouble / nc) else Double.NaN
      val qini = if (cnc > 0)
        r6(cyt.toDouble - cyc.toDouble * cnt / cnc) else Double.NaN
      (dec, nt, nc, uplift, qini)
    }
    val out = SparkEntry.queries("q_win_uplift")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    assert(out.length === wantRows.length)
    out.zip(wantRows).foreach { case (o, w) =>
      assert(o._1 == w._1 && o._2 == w._2 && o._3 == w._3,
        s"decile counts: $o vs $w")
      assert((o._4.isNaN && w._4.isNaN) || o._4 == w._4,
        s"uplift: $o vs $w")
      assert((o._5.isNaN && w._5.isNaN) || o._5 == w._5,
        s"qini: $o vs $w")
    }
    // the planted effect concentrates in the top deciles: cumulative
    // Qini at full depth is positive
    assert(out.last._5 > 0, s"final qini ${out.last._5} not positive")
  }
}
