package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture gates for the r11 robust-location/survival ops:
  * a hand-computable Hodges–Lehmann pick and a symmetric-arms log-rank
  * that must land on exactly z = 0. */
class Analytics60Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  private def writeEvents(dir: String,
      rows: Seq[(Long, Int, Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, dayOff, uid, typ) =>
      (id, base.plusDays(dayOff.toLong), uid, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** The engine's md5-parity arm for a user id (mirrors the query). */
  private def arm(uid: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(uid.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 6)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
  }

  test("hodges-lehmann: daily counts {1,2,9} give the Walsh-average " +
      "lower median 2.0 (robust against the 9 outlier)") {
    val dir = Tables.freshDir("a60_hl")
    // one event type; day 0 → 1 event, day 1 → 2, day 2 → 9
    val rows = (1 to 1).map(i => (i.toLong, 0, i.toLong, "click")) ++
      (2 to 3).map(i => (i.toLong, 1, i.toLong, "click")) ++
      (4 to 12).map(i => (i.toLong, 2, i.toLong, "click"))
    writeEvents(dir, rows)
    val r = SparkEntry.queries("q_agg_hodgeslehmann")(spark, dir).head
    // Walsh 2×sums sorted: 2,3,4,10,11,18 → rank 3 of 6 → 4 → HL 2.0
    assert(r.getLong(1) == 3 && r.getLong(2) == 6, s"sizes: $r")
    assert(r.getDouble(3) == 2.0, s"hl: ${r.getDouble(3)}")
  }

  test("logrank: mirror-image arms (same death/censor times in both) " +
      "give O1 = E1 and z = 0 exactly") {
    val dir = Tables.freshDir("a60_lr")
    val as = (1L to 60L).filter(arm(_) == "A").take(2)
    val bs = (1L to 60L).filter(arm(_) == "B").take(2)
    assert(as.length == 2 && bs.length == 2, "need 2 users per arm")
    def userRows(uid: Long, off: Long): Seq[(Long, Int, Long, String)] = {
      // first event day 0; one user per arm purchases at t=5, the
      // other stays censored at its last view on day 10
      if (off == 0)
        Seq((uid * 100, 0, uid, "view"), (uid * 100 + 1, 5, uid,
          "purchase"))
      else
        Seq((uid * 100, 0, uid, "view"), (uid * 100 + 1, 10, uid, "view"))
    }
    writeEvents(dir,
      userRows(as(0), 0) ++ userRows(as(1), 1) ++
        userRows(bs(0), 0) ++ userRows(bs(1), 1))
    val r = SparkEntry.queries("q_agg_logrank")(spark, dir).head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, s"arm sizes: $r")
    assert(r.getLong(2) == 1, s"O1: ${r.getLong(2)}")
    assert(r.getDouble(3) == 1.0, s"E1: ${r.getDouble(3)}")
    assert(r.getDouble(5) == 0.0, s"z: ${r.getDouble(5)}")
  }
}
