package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Degenerate-input behavior for the round-9 late wave (governance
  * reports, dedup sweep, connected components) plus the ADVICE-r8
  * zero-click TOST case: empty or structureless inputs must degrade to
  * empty tables or NULL-stat rows — never throw, and never diverge
  * from the DuckDB oracle's row-count semantics (global aggregates
  * emit exactly one row on empty input; grouped aggregates emit
  * none). */
class DegenerateInput5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(sec: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(sec, 0, java.time.ZoneOffset.UTC)

  test("kanon + datacard on empty tables: zero rows, no throw (grouped " +
      "aggregates emit nothing on empty input in both engines)") {
    import spark.implicits._
    val dir = Tables.freshDir("degen5_gov")
    Seq.empty[(Long, Int, Double, String)]
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ka = SparkEntry.queries("q_quality_kanon")(spark, dir).collect()
    assert(ka.isEmpty, s"kanon on empty customer: ${ka.toSeq}")
    val dc = SparkEntry.queries("q_quality_datacard")(spark, dir).collect()
    assert(dc.isEmpty, s"datacard on empty documents: ${dc.toSeq}")
  }

  test("dedup sweep with no repeated shingle (every df = 1): the " +
      "capped index is empty, the sweep emits zero rows") {
    import spark.implicits._
    val dir = Tables.freshDir("degen5_sweep")
    Seq((1L, "a b c d e f g"), (2L, "h i j k l m n"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_sweep")(spark, dir).collect()
    assert(out.isEmpty, s"sweep without candidates: ${out.toSeq}")
  }

  test("connected components with every pair below the support floor: " +
      "empty component table, no throw") {
    import spark.implicits._
    val dir = Tables.freshDir("degen5_cc")
    Seq((100L, 1L), (100L, 2L), (101L, 3L), (101L, 4L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_cc")(spark, dir).collect()
    assert(out.isEmpty, s"cc below support floor: ${out.toSeq}")
  }

  test("TOST on a zero-click corpus: exactly one row with na=nb=0 and " +
      "NULL stats (the global-aggregate row-count contract, ADVICE r8)") {
    import spark.implicits._
    val dir = Tables.freshDir("degen5_tost")
    val rows = (0 until 4).map { i =>
      (i.toLong, ts(i * 3600L), i.toLong, "view", 10.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_agg_tost")(spark, dir).collect()
    assert(out.length == 1, s"tost must emit ONE row: ${out.toSeq}")
    val r = out(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L,
      s"na/nb must be 0: $r")
    assert((2 to 7).forall(r.isNullAt),
      s"zero-click stats must all be NULL: $r")
  }
}
