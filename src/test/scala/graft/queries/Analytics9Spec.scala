package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the classical-inference wave: zero
  * chi-square on an independent contingency table, an exact closed-form
  * Mann–Whitney z on separated groups, and ln 2 mutual information on a
  * deterministic type↔hour mapping. */
class Analytics9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val base = java.time.LocalDateTime.of(2024, 7, 1, 0, 0, 0)

  test("chisq: a perfectly independent 2x2 table scores chi2 = 0, " +
      "cramers_v = 0, dof = 1") {
    import spark.implicits._
    val dir = Tables.freshDir("a9_chisq")
    Seq((1L, "S1"), (2L, "S1"), (3L, "S2"), (4L, "S2"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (1L to 4L).flatMap(c => Seq((c * 10 + 1, c, "P1"), (c * 10 + 2, c, "P2")))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val Array((n, dof, chi2, v)) = SparkEntry.queries("q_agg_chisq")(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
    assert(n == 8L && dof == 1L, s"n=$n dof=$dof")
    assert(chi2 == 0.0 && v == 0.0, s"chi2=$chi2 v=$v")
  }

  test("mannwhitney: 4 clicks at 1.0 below 6 views at 2.0 gives " +
      "U1 = 0 and the closed-form z = -3") {
    import spark.implicits._
    val dir = Tables.freshDir("a9_mw")
    val rows = (0 until 4).map(i =>
      (i.toLong, base.plusMinutes(i.toLong), 1L, "click", 1.0, "{}")) ++
      (0 until 6).map(i =>
        (100L + i, base.plusMinutes(i.toLong), 2L, "view", 2.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((n1, n2, u1, u2, z)) =
      SparkEntry.queries("q_agg_mannwhitney")(spark, dir)
        .as[(Long, Long, Double, Double, Double)].collect()
    assert(n1 == 4L && n2 == 6L, s"n1=$n1 n2=$n2")
    assert(u1 == 0.0 && u2 == 24.0, s"u1=$u1 u2=$u2")
    // z = (0 - 12) / sqrt(2 * ((10+1) - 270/90)) = -12/4 = -3 exactly
    assert(z == -3.0, s"z=$z")
  }

  test("mutualinfo: event type determined by hour-of-day gives " +
      "MI = H = ln 2 and NMI = 1") {
    import spark.implicits._
    val dir = Tables.freshDir("a9_mi")
    val rows = (0 until 10).map(i =>
      (i.toLong, base.plusMinutes(i.toLong), 1L, "alpha", 1.0, "{}")) ++
      (0 until 10).map(i =>
        (100L + i, base.plusHours(1L).plusMinutes(i.toLong), 1L, "beta",
          1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val Array((n, mi, ht, hh, nmi)) =
      SparkEntry.queries("q_agg_mutualinfo")(spark, dir)
        .as[(Long, Double, Double, Double, Double)].collect()
    assert(n == 20L)
    val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(mi == ln2 && ht == ln2 && hh == ln2, s"mi=$mi ht=$ht hh=$hh")
    assert(nmi == 1.0, s"nmi=$nmi")
  }
}
