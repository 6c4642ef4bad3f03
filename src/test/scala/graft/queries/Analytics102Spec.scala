package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the r14 multi-criteria ranking wave: Borda scores
  * must be consistent with their own rank columns; the Copeland
  * runoff must score within [0, 19] over the 20-slate and include
  * exactly the Borda slate; TOPSIS closeness must be a proper [0,1]
  * score with the dominant supplier (if any criterion-wise dominator
  * exists among top rows) not ranked below its dominated peers. */
class Analytics102Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("borda: top-20 returned, scores descend, and each score " +
      "equals 3n − Σranks for its own rank columns") {
    val rows = graft.SparkEntry.queries("q_win_borda")(spark, sf)
      .collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.map(_.getAs[Long]("borda"))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _           =>
    }
    // scores are internally consistent: borda + Σranks is the same
    // 3n constant on every row
    val consts = rows.map(r => r.getAs[Long]("borda")
      + r.getAs[Long]("r_rev") + r.getAs[Long]("r_vol")
      + r.getAs[Long]("r_brd")).distinct
    assert(consts.length === 1, s"inconsistent 3n: ${consts.toSeq}")
  }

  test("copeland: exactly the Borda slate, scores within [0, 19], " +
      "ordered by (copeland, borda)") {
    val borda = graft.SparkEntry.queries("q_win_borda")(spark, sf)
      .collect().map(_.getAs[Long]("suppkey")).toSet
    val rows = graft.SparkEntry.queries("q_win_copeland")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("suppkey")).toSet === borda)
    rows.foreach { r =>
      val c = r.getAs[Long]("copeland")
      assert(c >= 0L && c <= (rows.length - 1).toLong)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (ca, cb) = (a.getAs[Long]("copeland"), b.getAs[Long]("copeland"))
        assert(ca > cb || (ca == cb
          && a.getAs[Long]("borda") >= b.getAs[Long]("borda")))
      case _ =>
    }
  }

  test("topsis: closeness ∈ [0,1], descending, ≤20 rows") {
    val rows = graft.SparkEntry.queries("q_win_topsis")(spark, sf)
      .collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val cs = rows.map(_.getAs[Double]("closeness"))
    cs.foreach(c => assert(c >= 0.0 && c <= 1.0))
    cs.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _           =>
    }
  }
}
