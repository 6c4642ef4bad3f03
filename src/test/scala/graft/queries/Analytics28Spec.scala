package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the AUC/odds-ratio/graph-summary wave:
  * interleaved, separated, and tied score sets hit 0.5 / 1.0 / 0.5
  * AUC exactly, a hand-built 2×2 hits OR 4 with its log CI, and a
  * 3-clique summarizes to density 1. */
class Analytics28Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.map { case (e, t, u, ty, v) => (e, ts(t), u, ty, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("auc: a sandwiched positive scores 0.5, separation scores 1.0, " +
      "a pure tie scores 0.5") {
    import spark.implicits._
    val dir = Tables.freshDir("a28_auc")
    writeEvents(dir, Seq(
      (1L, 100L, 1L, "view", 1.0), (2L, 200L, 1L, "purchase", 2.0),
      (3L, 300L, 1L, "view", 3.0)))
    val mid = SparkEntry.queries("q_agg_auc")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(mid == Seq((1L, 2L, 0.5)), s"sandwich: $mid")
    writeEvents(dir, Seq(
      (1L, 100L, 1L, "view", 1.0), (2L, 200L, 1L, "purchase", 5.0),
      (3L, 300L, 1L, "purchase", 6.0)))
    val sep = SparkEntry.queries("q_agg_auc")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(sep == Seq((2L, 1L, 1.0)), s"separated: $sep")
    writeEvents(dir, Seq(
      (1L, 100L, 1L, "view", 1.0), (2L, 200L, 1L, "purchase", 1.0)))
    val tie = SparkEntry.queries("q_agg_auc")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(tie == Seq((1L, 1L, 0.5)), s"tied: $tie")
  }

  test("odds ratio: a 2/1/1/2 table scores OR 4 with the log-scale CI") {
    import spark.implicits._
    val dir = Tables.freshDir("a28_or")
    val am = 10L * 3600L; val pm = 14L * 3600L
    writeEvents(dir, Seq(
      (1L, pm, 1L, "click", 60.0), (2L, pm + 60, 1L, "click", 70.0), // a=2
      (3L, am, 1L, "click", 80.0),                                   // b=1
      (4L, pm + 120, 1L, "click", 10.0),                             // c=1
      (5L, am + 60, 1L, "click", 20.0), (6L, am + 120, 1L, "click", 30.0))) // d=2
    val out = SparkEntry.queries("q_agg_oddsratio")(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    val se = math.sqrt(1.0 / 2 + 1.0 / 1 + 1.0 / 1 + 1.0 / 2)
    assert(out == Seq((2L, 1L, 1L, 2L, 4.0,
      r6(math.exp(math.log(4.0) - 1.96 * se)),
      r6(math.exp(math.log(4.0) + 1.96 * se)))), s"or: $out")
  }

  test("graph summary: a part 3-clique reports density 1.0") {
    import spark.implicits._
    val dir = Tables.freshDir("a28_gs")
    val rows = for (ok <- Seq(1L, 2L); pk <- Seq(1L, 2L, 3L)) yield (ok, pk)
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_summary")(spark, dir)
      .as[(Long, Long, Long, Double, Option[Double])].collect().toSeq
    assert(out == Seq((3L, 3L, 2L, 2.0, Some(1.0))), s"summary: $out")
  }
}
