package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** JSON profiling (ADVICE r8 regression): keys containing JSONPath
  * metacharacters must profile correctly — the map-parse extraction has
  * no path language to corrupt. Invalid JSON rows drop; non-numeric
  * values count as present but not numeric. */
class Analytics39Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val dir: String = {
    import spark.implicits._
    val t0 = new java.sql.Timestamp(1704067200000L)
    val d = Files.createTempDirectory("graft-jsonprof").toString
    Seq(
      (1L, t0, 1L, "click", 1.0, """{"a.b": 1, "x": "y"}"""),
      // every JSONPath metachar class: quote (JSON-escaped \"), brackets,
      // dollar — tools/oracle_regress.py runs the DuckDB ORACLE over this
      // same corpus and must produce the same table (ADVICE r9)
      (2L, t0, 2L, "click", 1.0,
        """{"a.b": 2, "qu\"ote": "z", "br[ack]et": 3, "$d": 4}"""),
      (3L, t0, 3L, "click", 1.0, """not json"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("metacharacter keys profile exactly; invalid JSON drops; " +
      "non-numeric values are present but not numeric") {
    val rows = SparkEntry.queries("q_fn_json_profile")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), Option(r.get(4)), Option(r.get(5))))
    assert(rows.toSeq == Seq(
      ("$d", 1L, 0.333333, 1L, Some(4.0), Some(4.0)),
      // a dotted key would be '$.a.b' under path concat — a lookup of
      // b inside a, i.e. NULL — but profiles correctly via the map
      ("a.b", 2L, 0.666667, 2L, Some(1.0), Some(2.0)),
      ("br[ack]et", 1L, 0.333333, 1L, Some(3.0), Some(3.0)),
      ("qu\"ote", 1L, 0.333333, 0L, None, None),
      ("x", 1L, 0.333333, 0L, None, None)), s"got ${rows.toSeq}")
  }
}
