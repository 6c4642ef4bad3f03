package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Hand-computed Chapman estimate on a crafted two-window fixture and
  * a Good–Turing spectrum whose r* values are exact fractions. */
class Analytics56Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("capture: 30 first-window, 20 second-window, 10 overlap users " +
      "give the textbook Chapman estimate") {
    import spark.implicits._
    val dir = Tables.freshDir("a56_cap")
    val day1 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0) // << 19738
    val day2 = java.time.LocalDateTime.of(2024, 7, 1, 0, 0) // >= 19738
    var eid = 0L
    def ev(u: Long, ts: java.time.LocalDateTime) = { eid += 1
      (eid, ts.plusMinutes(eid), u, "click", 1.0, "{}") }
    // users 1..30 in window 1; users 21..40 in window 2 (overlap 21..30)
    val rows = (1L to 30L).map(ev(_, day1)) ++ (21L to 40L).map(ev(_, day2))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val nHat = 31.0 * 21.0 / 11.0 - 1.0
    val out = SparkEntry.queries("q_agg_capture")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq((30L, 20L, 10L, 40L, r6(nHat),
      r6(40.0 / nHat))), s"capture mismatch: ${out.toSeq}")
  }

  test("goodturing: a corpus with spectrum N1=3, N2=2, N3=1 yields " +
      "r*(1)=4/3, r*(2)=3/2, P0=3/10") {
    import spark.implicits._
    val dir = Tables.freshDir("a56_gt")
    // shingles (one per 3-word doc): a,b,c once; d,e twice; f three
    // times → N=3·1+2·2+1·3=10 tokens, 6 types
    val texts = Seq("a1 a2 a3", "b1 b2 b3", "c1 c2 c3",
      "d1 d2 d3", "d1 d2 d3", "e1 e2 e3", "e1 e2 e3",
      "f1 f2 f3", "f1 f2 f3", "f1 f2 f3")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, t, "en", "web", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_goodturing")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4),
        r.getDouble(5)))
    val p0 = 0.3
    assert(out.toSeq === Seq(
      (1L, 3L, 10L, 6L, r6(2.0 * 2.0 / 3.0), p0),
      (2L, 2L, 10L, 6L, r6(3.0 * 1.0 / 2.0), p0),
      (3L, 1L, 10L, 6L, Double.NaN, p0)) ||
      // NaN != NaN under ===; compare piecewise
      (out.length == 3 && out(2)._5.isNaN &&
        out.take(2).map(x => (x._1, x._2, x._5)).toSeq ===
          Seq((1L, 3L, r6(4.0 / 3.0)), (2L, 2L, 1.5)) &&
        out.forall(x => x._3 == 10L && x._4 == 6L && x._6 == p0)),
      s"goodturing mismatch: ${out.toSeq}")
  }
}
