package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts + plan gates for the round-7 third wave:
  * the DPP runtime-skip plan shape, exact linear interpolation on a
  * hand-built gap, HHI closed forms, and the hashed-TF mass-conservation
  * invariant. */
class Analytics4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("dpp: the fact scan carries a dynamicpruning partition filter " +
      "(runtime year subset, not a static literal)") {
    val df = SparkEntry.queries("q_join_dpp")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression partition filter:\n$plan")
    assert(df.count() > 0)
  }

  test("interpolate: a 3-hour gap between anchors 10 and 20 fills " +
      "12.5 / 15 / 17.5; leading+trailing gaps clamp to the anchor") {
    import spark.implicits._
    val dir = Tables.freshDir("a4_interp")
    val base = java.time.LocalDateTime.of(2024, 3, 1, 0, 30, 0)
    Seq((1L, base, 7L, "view", 10.0, "{}"),
      (2L, base.plusHours(4), 7L, "view", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_interpolate")(spark, dir)
      .as[(Long, Long, Boolean, Double)].collect().toSeq
    assert(out.length == 5)
    val vals = out.map { case (_, _, gap, v) => (gap, v) }
    assert(vals == Seq((false, 10.0), (true, 12.5), (true, 15.0),
      (true, 17.5), (false, 20.0)), s"got $vals")
  }

  test("hhi: a monopolist region scores 1.0, four equal customers 0.25") {
    import spark.implicits._
    val dir = Tables.freshDir("a4_hhi")
    Seq((1, "AMERICA"), (2, "ASIA"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((10, 1), (20, 2))
      .toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 10), (2L, 20), (3L, 20), (4L, 20), (5L, 20))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // AMERICA: customer 1 only (monopoly). ASIA: 4 equal customers.
    Seq((100L, 1L, 50.0), (101L, 1L, 30.0),
      (102L, 2L, 25.0), (103L, 3L, 25.0), (104L, 4L, 25.0),
      (105L, 5L, 25.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_agg_hhi")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map { case (r, n, h) => r -> ((n, h)) }.toMap
    assert(out("AMERICA") == ((1L, 1.0)), s"monopoly: ${out("AMERICA")}")
    assert(out("ASIA") == ((4L, 0.25)), s"equal-4: ${out("ASIA")}")
  }

  test("hashtf: bucket mass equals the token count, zeros materialized " +
      "to a full 64-bucket grid, deterministic") {
    import spark.implicits._
    val dir = Tables.freshDir("a4_hashtf")
    Seq((1L, "a b c a", "en", "s", 0L), (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_hashtf")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length == 128, s"grid rows: ${out.length}") // 2 docs x 64
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._3).sum == 4L, "doc 1 has 4 tokens")
    assert(out.filter(_._1 == 2L).forall(_._3 == 0L),
      "empty doc is all-zero features")
    val again = SparkEntry.queries("q_text_hashtf")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == again)
  }

  test("kgram profile: 10 rows per language on the real corpus, ranks " +
      "dense 1..10, counts non-increasing") {
    import spark.implicits._
    val out = SparkEntry.queries("q_text_kgram_profile")(spark, sf)
      .as[(String, Int, String, Long)].collect().toSeq
    val byLang = out.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted == (1 to 10), s"$lang ranks")
      val cnts = rows.sortBy(_._2).map(_._4)
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
        s"$lang counts not sorted: $cnts")
    }
  }
}
