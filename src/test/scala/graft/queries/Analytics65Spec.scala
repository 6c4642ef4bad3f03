package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-fixture gates for the r11 causal/reliability wave: perfect
  * compliance (LATE = ITT = first stage = 1), a constant-step RDD jump,
  * a confounded stratification where blocking recovers the true effect,
  * Cronbach's alpha = 1 on perfectly parallel items, a hand-computable
  * Nelson–Aalen increment, and exact lexicon sentiment scores. */
class Analytics65Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  /** md5-parity arm, mirroring the queries. */
  private def z1(id: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 6)
    java.lang.Long.parseLong(hex, 16) % 2 == 0
  }

  private def writeEvents(dir: String,
      rows: Seq[(Long, Int, Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, dayOff, uid, typ) =>
      (id, base.plusDays(dayOff.toLong), uid, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("iv: perfect compliance gives first_stage = itt = late = 1") {
    val dir = Tables.freshDir("a65_iv")
    val enc = (1L to 40L).filter(z1).take(3)
    val ctl = (1L to 40L).filter(!z1(_)).take(3)
    var id = 0L
    val rows = enc.flatMap { u =>
      id += 10
      Seq((id, 0, u, "click"), (id + 1, 1, u, "purchase"))
    } ++ ctl.map { u => id += 10; (id, 0, u, "view") }
    writeEvents(dir, rows)
    val r = SparkEntry.queries("q_agg_iv")(spark, dir).head
    assert(r.getLong(0) == 6 && r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 &&
      r.getDouble(5) == 1.0, s"iv: $r")
  }

  test("rdd: constant 1-vs-5 order counts across the cutoff give " +
      "effect = 4 with zero slopes") {
    import spark.implicits._
    val dir = Tables.freshDir("a65_rdd")
    Seq((1L, -100.0), (2L, -200.0), (3L, 100.0), (4L, 200.0))
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val orders = Seq(1L -> 1, 2L -> 1, 3L -> 5, 4L -> 5).flatMap {
      case (ck, n) => (1 to n).map(i => (ck * 100 + i, ck))
    }
    orders.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("q_agg_rdd")(spark, dir).head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0, s"left: $r")
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 0.0, s"right: $r")
    assert(r.getDouble(6) == 4.0, s"effect: ${r.getDouble(6)}")
  }

  test("ate: confounded strata — blocking recovers the true effect 2 " +
      "where the naive difference reads 6") {
    import spark.implicits._
    val dir = Tables.freshDir("a65_ate")
    val t1 = (1L to 200L).filter(z1)
    val c0 = (1L to 200L).filter(!z1(_))
    // stratum 0: 3 treated at 10, 1 control at 8;
    // stratum 1: 1 treated at 2, 3 controls at 0 — diff 2 in both
    val rows =
      t1.take(3).map(k => (k, 0L, 10.0)) ++
        c0.take(1).map(k => (k, 0L, 8.0)) ++
        t1.slice(3, 4).map(k => (k, 1L, 2.0)) ++
        c0.slice(1, 4).map(k => (k, 1L, 0.0))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q_agg_ate")(spark, dir).head
    assert(r.getLong(0) == 2 && r.getLong(1) == 8, s"strata: $r")
    assert(r.getDouble(2) == 6.0, s"naive: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 2.0, s"stratified: ${r.getDouble(3)}")
  }

  test("cronbach: perfectly parallel items give alpha = 1") {
    val dir = Tables.freshDir("a65_cr")
    // users 1..4 with i1 = i2 = i3 = u occurrences of each item
    val rows = (1L to 4L).flatMap { u =>
      (1L to u).flatMap { j =>
        Seq((u * 1000 + j * 10, 0, u, "view"),
          (u * 1000 + j * 10 + 1, 1, u, "click"),
          (u * 1000 + j * 10 + 2, 2, u, "signup"))
      }
    }
    writeEvents(dir, rows)
    val r = SparkEntry.queries("q_agg_cronbach")(spark, dir).head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getDouble(6) == 1.0, s"alpha: ${r.getDouble(6)}")
  }

  test("nelson-aalen: 2 deaths at t=1 among 4 at risk give hazard 0.5, " +
      "var 0.125, and censored users never add increments") {
    val dir = Tables.freshDir("a65_na")
    writeEvents(dir, Seq(
      (1L, 0, 1L, "view"), (2L, 1, 1L, "purchase"),
      (3L, 0, 2L, "view"), (4L, 1, 2L, "purchase"),
      (5L, 0, 3L, "view"), (6L, 2, 3L, "view"),
      (7L, 0, 4L, "view"), (8L, 2, 4L, "view")))
    val rows = SparkEntry.queries("q_agg_nelsonaalen")(spark, dir)
      .collect()
    assert(rows.length == 1, s"rows: ${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(0) == 1 && r.getLong(1) == 2 && r.getLong(2) == 4)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5 &&
      r.getDouble(5) == 0.125, s"na: $r")
  }

  test("sentiment: crafted pos/neg documents score exactly") {
    import spark.implicits._
    val dir = Tables.freshDir("a65_se")
    Seq(
      (1L, "good great day", "en", "s1", 14L),     // np=2 nn=0 → +1
      (2L, "bad outcome wrong call", "en", "s1", 22L), // np=0 nn=2 → −1
      (3L, "good and bad", "en", "s1", 12L),       // 1/1 → 0
      (4L, "nothing notable here", "en", "s1", 20L), // unscored
      (5L, "love win", "de", "s2", 8L))             // +1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_sentiment")(spark, dir)
      .collect()
    assert(out.length == 2)
    val de = out.head; val en = out(1)
    assert(de.getString(0) == "de" && de.getLong(2) == 1 &&
      de.getDouble(8) == 1.0, s"de: $de")
    assert(en.getString(0) == "en" && en.getLong(1) == 4 &&
      en.getLong(2) == 1 && en.getLong(3) == 1 && en.getLong(4) == 1 &&
      en.getLong(5) == 1, s"en: $en")
    assert(en.getDouble(8) == 0.0, s"en mean: ${en.getDouble(8)}")
  }
}
