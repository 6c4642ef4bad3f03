package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Hand-computed κ on a 2×2 confusion fixture and a step-by-step
  * replay of the group-sequential cumulative-z chain with a planted
  * mid-experiment effect. */
class Analytics50Spec extends AnyFunSuite {

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

  test("kappa: 2 en hits, 1 es hit, 1 es→en miss gives accuracy 0.75, " +
      "κ = 0.5, macro-F1 = (0.8 + 2/3)/2") {
    import spark.implicits._
    val dir = Tables.freshDir("a50_kappa")
    val docs = Seq(
      (1L, "the cat of the house is a pet", "en", "web", 30L),
      (2L, "to be in the garden is a joy", "en", "web", 28L),
      (3L, "el perro de la casa y los gatos", "es", "web", 31L),
      // labeled es, but stopword-English text → predicted en
      (4L, "the dog of the yard is a friend", "es", "web", 31L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_kappa")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // grid: (en,en)=2 (es,es)=1 (es,en)=1; rows en=2 es=2; cols en=3
    // es=1; po=0.75; pe=(2·3+2·1)/16=0.5; κ=0.5;
    // F1(en)=4/5, F1(es)=2/3
    val wantMacro = r6((2.0 * 2 / (2 + 3) + 2.0 * 1 / (2 + 1)) / 2.0)
    assert(out.toSeq === Seq((4L, 2L, 0.75, 0.5, wantMacro)),
      s"kappa mismatch: ${out.toSeq}")
  }

  test("gst: planted day-4 effect — z chain matches a Scala replay " +
      "and first_cross_day is the earliest crossing") {
    import spark.implicits._
    val dir = Tables.freshDir("a50_gst")
    var eid = 0L
    // days 0..2: both arms ~N(10); days 3..5: treatment jumps to ~30
    val rows = (0 to 5).flatMap { d =>
      (0 until 40).map { j =>
        eid += 1
        val uid = j.toLong // parity = arm
        val v =
          (if (uid % 2 == 0 && d >= 3) 30.0 else 10.0) + (j % 5) - 2
        (eid, base.plusDays(d.toLong).plusMinutes(j.toLong), uid,
          "click", v, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // replay
    val byDay = rows.groupBy(r => r._2.toLocalDate.toEpochDay)
      .toSeq.sortBy(_._1)
    val nFinal = rows.size
    var cnt = 0L; var cnc = 0L
    var cst = 0.0; var csc = 0.0; var cqt = 0.0; var cqc = 0.0
    val want = byDay.map { case (day, xs) =>
      xs.foreach { r =>
        val v = r._5
        if (r._3 % 2 == 0) { cnt += 1; cst += v; cqt += v * v }
        else { cnc += 1; csc += v; cqc += v * v }
      }
      val mt = cst / cnt; val mc = csc / cnc
      val vt = (cqt - cst * cst / cnt) / (cnt - 1)
      val vc = (cqc - csc * csc / cnc) / (cnc - 1)
      val z = (mt - mc) / math.sqrt(vt / cnt + vc / cnc)
      val tf = (cnt + cnc).toDouble / nFinal
      val bound = 1.96 / math.sqrt(tf)
      (day, cnt + cnc, r6(tf), r6(z), r6(bound),
        math.abs(z) >= bound)
    }
    val firstCross = want.filter(_._6).map(_._1).min
    val out = SparkEntry.queries("q_agg_gst")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getLong(6)))
    assert(out.map(x => (x._1, x._2, x._3, x._4, x._5, x._6)).toSeq
      === want, s"gst mismatch: ${out.toSeq} vs $want")
    assert(out.forall(_._7 == firstCross))
    // sanity: the pre-effect days must NOT cross, the post-effect tail
    // must
    assert(!out.take(3).exists(_._6) && out.last._6)
  }
}
