package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts + plan gates for the round-7 second wave.
  * The oracled ids all hash-verify against DuckDB at sf0.01; this spec
  * pins the closed-form math on inputs with known answers (Gini of a
  * uniform population, OLS on an exact line, a planted anomaly spike, a
  * hand-computable Jaccard graph, the winnowing guarantee) and the
  * scale-defining plan shapes (winnowing shuffle-free, Jaccard
  * BNLJ-free). */
class Analytics3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("gini: equal balances -> 0; one-holder concentration -> (n-1)/n") {
    import spark.implicits._
    val dir = Tables.freshDir("a3_gini")
    // region AMERICA: 4 equal balances; region ASIA: one customer holds
    // everything -> G = (n-1)/n = 0.75
    Seq((1, "AMERICA"), (2, "ASIA"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((10, 1), (20, 2))
      .toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 10, 50.0), (2L, 10, 50.0), (3L, 10, 50.0), (4L, 10, 50.0),
      (5L, 20, 0.0), (6L, 20, 0.0), (7L, 20, 0.0), (8L, 20, 100.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val out = SparkEntry.queries("q_agg_gini")(spark, dir)
      .as[(String, Long, Double)].collect()
      .map { case (r, n, g) => r -> ((n, g)) }.toMap
    assert(out("AMERICA") == ((4L, 0.0)), s"uniform: ${out("AMERICA")}")
    assert(out("ASIA") == ((4L, 0.75)), s"concentrated: ${out("ASIA")}")
  }

  test("ols: exact line y = 3x + 7 -> slope 3, intercept 7, r2 = 1") {
    import spark.implicits._
    val dir = Tables.freshDir("a3_ols")
    Seq((1.0, 10.0), (2.0, 13.0), (3.0, 16.0), (4.0, 19.0), (5.0, 22.0))
      .map { case (x, y) => ("A", x, y) }
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val Array((flag, n, slope, icept, r2)) =
      SparkEntry.queries("q_agg_ols")(spark, dir)
        .as[(String, Long, Double, Double, Double)].collect()
    assert((flag, n) == (("A", 5L)))
    assert(slope == 3.0 && icept == 7.0 && r2 == 1.0,
      s"fit: slope=$slope intercept=$icept r2=$r2")
  }

  test("anomaly: a planted 10x spike after 24 flat hours is the only " +
      "flagged row, and its baseline excludes the spike itself") {
    import spark.implicits._
    val dir = Tables.freshDir("a3_anomaly")
    // 30 hours of signup events: 4/hour everywhere except hour 27 = 40.
    // Counts vary 3..5 in the baseline (nonzero variance) via a
    // deterministic pattern so z is defined.
    val rows = (0 until 30).flatMap { h =>
      val c = if (h == 27) 40 else 4 + (h % 3) - 1 // 3,4,5 cycle
      (0 until c).map { i =>
        (h.toLong * 100 + i,
          java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
            .plusHours(h.toLong).plusMinutes(i.toLong),
          i.toLong, "signup", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_time_anomaly")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(out.length == 1, s"flagged: ${out.mkString(", ")}")
    val (et, _, c, z) = out.head
    assert(et == "signup" && c == 40L && z > 10.0,
      s"spike row: type=$et n=$c z=$z")
  }

  test("jaccard: hand-built co-purchase graph gives exact similarity " +
      "and the support floor drops one-off pairs") {
    import spark.implicits._
    val dir = Tables.freshDir("a3_jac")
    // orders 1,2 both contain {A=100, B=200}; order 3 = {A, C=300}.
    // cn(A,B)=2 kept: deg(A)=3 orders... per-order distinct pairs:
    // edges per order: (A,B) x2, (A,C) x1. deg counts ORDERS per part:
    // A in 3, B in 2, C in 1. J(A,B) = 2/(3+2-2) = 2/3.
    Seq((1L, 100L), (1L, 200L), (2L, 100L), (2L, 200L), (3L, 100L),
      (3L, 300L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_jaccard")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((100L, 200L, 2L, 3L, 2L, 0.666667)),
      s"got: ${out.mkString(", ")}")
  }

  test("winnowing: guarantee (every w-window selects) bounds density, " +
      "and an 8-char shared substring shares a fingerprint") {
    import spark.implicits._
    val dir = Tables.freshDir("a3_winnow")
    val shared = "XQZWVYKJ" // 8 chars = k + w - 1: must share a print
    Seq((1L, s"aaaa bbbb $shared cccc", "en", "s", 0L),
      (2L, s"dddd $shared eeee ffff", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val winnowed = SparkEntry.queries("q_text_winnowing")(spark, dir)
      .as[(Long, Int, Long, Double)].collect()
    assert(winnowed.length == 2)
    // density of DISTINCT selected hashes is at most 1 and, by the
    // winnowing guarantee (>=1 selection per window, selections can
    // repeat across overlapping windows), at least 1/w of windows
    winnowed.foreach { case (id, nFp, _, density) =>
      assert(nFp >= 1 && density > 0.0 && density <= 1.0,
        s"doc $id: n_fp=$nFp density=$density")
    }
    // cross-doc match: recompute each doc's fingerprint hash set via
    // the same query's per-doc plumbing is opaque; instead assert via
    // a direct recompute of winnowing on the shared substring: both
    // docs must have selected at least one k-gram wholly inside the
    // shared 8-char run. Equivalent observable: fingerprint sets
    // intersect -> sum of pairwise-distinct counts < sum of counts
    // when unioned. Here: rerun query on single-doc corpora and
    // compare checksum overlap via the distinct-union trick.
    val fpSets = Seq(1L, 2L).map { id =>
      val d1 = Tables.freshDir(s"a3_winnow_$id")
      Seq((1L, if (id == 1L) s"aaaa bbbb $shared cccc"
               else s"dddd $shared eeee ffff", "en", "s", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d1/documents.parquet")
      // fingerprint hashes are n_fp + checksum only; to see the sets,
      // derive them with the same expression inline
      spark.read.parquet(s"$d1/documents.parquet")
        .selectExpr(
          """array_distinct(transform(
            |  transform(sequence(1, length(text) - 7), i ->
            |    array_min(slice(transform(sequence(1, length(text) - 4),
            |      i2 -> CAST(conv(substring(md5(substring(text, i2, 5)),
            |        1, 6), 16, 10) AS BIGINT) * 10000000 + i2), i, 4))),
            |  x -> x div 10000000)) AS fps""".stripMargin)
        .as[Seq[Long]].head().toSet
    }
    assert(fpSets.head.intersect(fpSets(1)).nonEmpty,
      "8-char shared substring must share at least one fingerprint")
  }

  test("plan gates: winnowing is shuffle-free before its presentation " +
      "sort; jaccard has no nested-loop join; fuse broadcasts both " +
      "bounded rank lists' inputs without a cartesian blowup") {
    val winnow = SparkEntry.queries("q_text_winnowing")(spark, sf)
      .queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(winnow).length
    assert(nEx <= 1, s"winnowing should only exchange for the final " +
      s"sort, saw $nEx:\n$winnow")
    val jac = SparkEntry.queries("q_graph_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!jac.contains("BroadcastNestedLoopJoin")
      && !jac.contains("CartesianProduct"), s"jaccard plan:\n$jac")
    val fuse = SparkEntry.queries("q_sim_fuse")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!fuse.contains("CartesianProduct"), s"fuse plan:\n$fuse")
    assert(fuse.contains("TakeOrderedAndProject"),
      s"fuse rank lists should be distributed top-k cuts:\n$fuse")
  }

  test("zipf + fuse: deterministic across runs; zipf slope negative on " +
      "real text-like frequencies") {
    val z1 = SparkEntry.queries("q_text_zipf")(spark, sf).collect().toSeq
    val z2 = SparkEntry.queries("q_text_zipf")(spark, sf).collect().toSeq
    assert(z1 == z2)
    val slope = z1.head.getDouble(1)
    assert(slope < 0.0, s"zipf slope should be negative, got $slope")
    val f1 = SparkEntry.queries("q_sim_fuse")(spark, sf).collect().toSeq
    val f2 = SparkEntry.queries("q_sim_fuse")(spark, sf).collect().toSeq
    assert(f1 == f2)
    assert(f1.size == 20, s"fuse rows: ${f1.size}")
    // rrf is non-increasing down the result
    val rrfs = f1.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }
}
