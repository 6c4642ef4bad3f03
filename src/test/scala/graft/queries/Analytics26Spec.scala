package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the entropy-rate/burstiness/Simpson
  * wave: a hand-built 3-transition chain hits −(2/3)ln(1/2), per-doc
  * count moments give exact VMRs, and a single-doc language gates its
  * diversity to NULL. */
class Analytics26Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  private def r9(v: Double): Double =
    BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("entropy rate: view,click,view,view = −(2/3)·ln(1/2) nats") {
    import spark.implicits._
    val dir = Tables.freshDir("a26_er")
    val rows = Seq("view", "click", "view", "view").zipWithIndex.map {
      case (ty, i) => (i.toLong + 1, ts(100 + i * 10), 1L, ty, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_entropy_rate")(spark, dir)
      .as[(Long, Double, Double)].collect().toSeq
    val st = 2 * r9((1.0 / 3.0) * math.log(0.5)) // the c→v term is 0
    assert(out == Seq((3L, r6(-st), r6(math.exp(-st)))), s"er: $out")
  }

  test("burstiness: 'a a b' + 'a c' give a VMR 1/6 and b,c VMR 0.5") {
    import spark.implicits._
    val dir = Tables.freshDir("a26_burst")
    Seq((0L, "a a b", "en", "src0", 5L), (1L, "a c", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_burstiness")(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 3L, 2L, r6(0.25 / 1.5)),
      ("b", 1L, 1L, 0.5), ("c", 1L, 1L, 0.5)), s"vmr: $out")
  }

  test("simpson: 2-vs-1 sources hit 1 − 2/6; a single-doc language " +
      "gates to NULL") {
    import spark.implicits._
    val dir = Tables.freshDir("a26_simpson")
    Seq((0L, "x", "en", "src0", 1L), (1L, "y", "en", "src0", 1L),
      (2L, "z", "en", "src1", 1L), (3L, "w", "zz", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_agg_simpson")(spark, dir)
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(("en", 3L, 2L, Some(r6(1.0 - 2.0 / 6.0))),
      ("zz", 1L, 1L, None)), s"simpson: $out")
  }
}
