package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Finals-type lint gate (VERDICT r7 item 2).
  *
  * Repo convention (Tables.dbl, Tables.scala): DECIMAL is for INTERNAL
  * exactness (order-independent sums on the value lattice); FINAL output
  * columns cast to DOUBLE, because a decimal final survives to the
  * driver's pandas compare with engine-specific physical types (pyarrow
  * decimal128 object on the Spark side vs float64 from DuckDB) and
  * hash-mismatches despite equal values — exactly the q_time_drawdown
  * defect in CORRECTNESS_r07. This gate walks EVERY registered query's
  * result schema and fails on any top-level DecimalType column, so the
  * class of miss cannot recur.
  *
  * Schema-only: each query is constructed (analysis runs, eager prep of a
  * few graph/ANN builders runs at sf0.001) but never executed/collected.
  */
class FinalsTypeLintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("no query emits a top-level DECIMAL final column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val decCols =
          try fn(spark, sf).schema.fields.toSeq
            .collect { case f if f.dataType.isInstanceOf[DecimalType] =>
              s"${f.name}: ${f.dataType.simpleString}" }
          catch { case e: Throwable =>
            // construction failures are the oracle gate's job, not this
            // lint's — but surface them so a schema break is visible here
            Seq(s"<construction failed: ${e.getClass.getSimpleName}>")
          }
        if (decCols.isEmpty) None
        else Some(s"$name -> ${decCols.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "DECIMAL survives to a final output column (cast finals through " +
        s"Tables.dbl):\n  ${offenders.mkString("\n  ")}")
  }
}
