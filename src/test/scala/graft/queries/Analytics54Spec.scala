package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Independent replay of the seeded permutation chain (MessageDigest →
  * hex fold → parity) and Heaps'-law recovery on a corpus built to
  * have exactly V = 3N (β = 1, ln k = ln 3). */
class Analytics54Spec extends AnyFunSuite {

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

  private def hex6fold(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString
    java.lang.Long.parseLong(hex.take(6), 16)
  }

  test("permtest: p-value matches a MessageDigest replay of all 100 " +
      "seeded reassignments on a planted-effect fixture") {
    import spark.implicits._
    val dir = Tables.freshDir("a54_perm")
    var eid = 0L
    // 30 users; treated (even) click values are shifted up strongly
    val rows = (1L to 30L).flatMap { u =>
      (1 to 3).map { j =>
        eid += 1
        val v = (if (u % 2 == 0) 50.0 else 10.0) + j
        (eid, base.plusMinutes(eid), u, "click", v, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val m = (1L to 30L).map(u =>
      u -> (1 to 3).map(j =>
        (if (u % 2 == 0) 50.0 else 10.0) + j).sum).toMap
    val t0 = (1L to 30L).filter(_ % 2 == 0)
    val c0 = (1L to 30L).filter(_ % 2 != 0)
    val obs = t0.map(m).sum / t0.size - c0.map(m).sum / c0.size
    val extreme = (1 to 100).count { b =>
      val byArm = (1L to 30L).groupBy(u => hex6fold(s"$u:$b") % 2)
      val pt = byArm.getOrElse(0L, Nil)
      val pc = byArm.getOrElse(1L, Nil)
      pt.nonEmpty && pc.nonEmpty && {
        val pd = pt.map(m).sum / pt.size - pc.map(m).sum / pc.size
        r9(math.abs(pd)) >= r9(math.abs(obs))
      }
    }
    val out = SparkEntry.queries("q_agg_permtest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq((15L, 15L, r6(obs), 100L, extreme.toLong,
      r6((extreme + 1.0) / 101.0))),
      s"permtest mismatch: ${out.toSeq} vs obs=$obs extreme=$extreme")
    // the planted effect is strong: very few reassignments can match it
    assert(out.head._6 <= 0.05, s"p ${out.head._6} not small")
  }

  test("heaps: a corpus with doc-unique shingles (V = 3N exactly) " +
      "recovers beta = 1 and ln k = ln 3") {
    import spark.implicits._
    val dir = Tables.freshDir("a54_heaps")
    // every doc: 5 tokens unique to that doc → exactly 3 unique
    // 3-gram shingles per doc, shared with no other doc
    val docs = (1L to 200L).map { i =>
      val text = (0 until 5).map(j => s"w${i}x$j").mkString(" ")
      (i, text, "en", "web", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_heaps")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // every bucket: vocab = 3 × n_docs
    assert(out.forall(r => r._3 == 3 * r._2),
      s"V != 3N: ${out.toSeq}")
    val beta = out.head._4
    val logk = out.head._5
    assert(math.abs(beta - 1.0) < 1e-4, s"beta $beta != 1")
    assert(math.abs(logk - math.log(3.0)) < 1e-3,
      s"log_k $logk != ${math.log(3.0)}")
  }
}
