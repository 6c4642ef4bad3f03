package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Mergeable-partial proof for the sketch family (round 9): the
  * no-oracle sketch ops' real at-scale risk is MERGE correctness — a
  * sketch whose result depends on how partials were grouped would give
  * a 1000-executor cluster different answers than local[32]. Two
  * angles:
  *
  *  1. the declared queries re-run under shuffle.partitions ∈
  *     {1, 4, 13} (different merge fan-ins) must emit identical rows;
  *  2. the underlying aggregates re-run over explicitly repartitioned
  *     input (different PARTIALS, not just different merge grouping)
  *     must agree: exactly for the register-max / counter merges
  *     (HLL++, DataSketches HLL, approx_top_k over a vocab below the
  *     tracking cap), within the documented rank-error bound for
  *     percentile_approx (GK summaries are mergeable with bounded,
  *     not zero, merge drift).
  */
class SketchInvarianceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def withShufflePartitions[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("declared sketch queries are invariant to shuffle partitioning") {
    for (q <- Seq("q_agg_approx", "q_agg_sketch", "q_agg_heavyhitters")) {
      val results = Seq(1, 4, 13).map { p =>
        p -> withShufflePartitions(p) {
          SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
        }
      }
      val (_, base) = results.head
      results.tail.foreach { case (p, r) =>
        assert(r == base,
          s"$q: result at shuffle.partitions=$p diverged from =1:\n" +
            s"base=$base\ngot =$r")
      }
    }
  }

  test("sketch aggregates agree across explicitly repartitioned input " +
      "(different partials, same answer)") {
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"), col("l_quantity"))
    def run(parts: Int) = {
      val src = li.repartition(parts)
      val hll = src.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("acd"),
          expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("ds"))
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      val pct = src.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(1000))
          .as("p50"))
        .orderBy("l_returnflag")
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      (hll, pct)
    }
    val (h1, p1) = run(1)
    val (h5, p5) = run(5)
    val (h32, p32) = run(32)
    // register-max merges: bit-identical estimates regardless of how
    // the stream was cut into partials
    assert(h5 == h1 && h32 == h1,
      s"HLL estimates moved under repartitioning:\n1=$h1\n5=$h5\n32=$h32")
    // GK quantile summaries: mergeable within rank error eps=1/accuracy;
    // on l_quantity (1..50 integers) that bounds the p50 drift to ~1
    (p1 zip p5 zip p32).foreach { case (((g, a), (_, b)), (_, c)) =>
      assert(math.abs(a - b) <= 1.0 && math.abs(a - c) <= 1.0,
        s"p50($g) drifted past the rank-error bound: $a / $b / $c")
    }
  }

  test("approx_top_k below the tracking cap is an exact, " +
      "partition-invariant counter merge") {
    val words = Tables.t(spark, sf, "documents")
      .select(explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("w"))
    def top(parts: Int) = words.repartition(parts)
      .agg(expr("approx_top_k(w, 20, 10000)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .orderBy(desc("count"), col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = words.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val t1 = top(1)
    assert(top(5) == t1 && top(32) == t1,
      "approx_top_k diverged under repartitioning")
    // vocab << maxItemsTracked=10000 → the sketch never evicts, so the
    // 'approximate' counts are the exact ones
    assert(t1 == exact, s"approx_top_k not exact below cap:\n$t1\n$exact")
  }
}
