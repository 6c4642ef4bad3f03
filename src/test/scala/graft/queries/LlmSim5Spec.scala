package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contracts for the Matryoshka truncation-fidelity report: the
  * dim=64 row is the identity control (mae 0, recall 1), fidelity
  * improves monotonically toward the full dimension on a crafted
  * corpus whose tail dims carry the discriminating signal, and the
  * probe side stays broadcast. */
class LlmSim5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("matryoshka on sf0.001: identity control at dim 64, pair " +
      "counts constant, mae nonincreasing in dim, recalls in (0,1]") {
    val out = SparkEntry.queries("q_embed_matryoshka")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq === Seq(8, 16, 32, 64))
    val d64 = out.find(_._1 == 64).get
    assert(d64._4 === 0.0, s"dim-64 mae must be 0: $d64")
    assert(d64._6 === 1.0, s"dim-64 recall must be 1: $d64")
    assert(out.map(_._2).distinct.length === 1,
      "n_pairs must not vary by dim")
    val maes = out.sortBy(_._1).map(_._4)
    assert(maes.zip(maes.tail).forall { case (lo, hi) => lo >= hi },
      s"mae must not increase with dim: ${maes.toSeq}")
    assert(out.forall(r => r._6 > 0.0 && r._6 <= 1.0),
      s"recalls out of range: ${out.toSeq}")
  }

  test("matryoshka plan: probe side broadcast (no shuffle of the " +
      "corpus against probes)") {
    val df = SparkEntry.queries("q_embed_matryoshka")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"),
      s"expected broadcast probe join in:\n$plan")
  }

  test("matryoshka crafted fixture: prefix-identical vectors are " +
      "indistinguishable at dim 8 (mae > 0) but separate at 64") {
    import spark.implicits._
    val dir = Tables.freshDir("sim5_mat")
    // 12 vectors, 2 labels; dims 0-7 identical across all vectors,
    // dims 8-63 carry the label signal.
    val rows = (0 until 12).map { i =>
      val lbl = i % 2
      val head = Array.fill(8)(1.0f)
      val tail = Array.tabulate(56)(j =>
        if (lbl == 0) math.sin(j * 0.3 + i * 0.01).toFloat
        else math.cos(j * 0.41 + i * 0.01).toFloat)
      (i.toLong, head ++ tail, lbl)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_embed_matryoshka")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getDouble(3), r.getDouble(5)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m(8)._2 > m(64)._2, s"dim-8 mae must exceed dim-64: $out")
    assert(m(8)._2 > 0.01,
      s"prefix-identical dims must hide the signal at dim 8: ${m(8)}")
    assert(m(64)._3 === 1.0)
  }
}
