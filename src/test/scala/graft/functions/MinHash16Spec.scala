package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the native one-pass 16-way minhash: it equals the
  * 16-independent-minima reference computed in plain Scala, similar
  * sets share most signature slots while disjoint sets share almost
  * none, and the empty array degrades to null. */
class MinHash16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def sig(hs: Seq[Long]): Seq[Long] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(Tuple1(hs)).toDF("hs")
      .select(expr("graft_minhash16(hs)").as("sig"))
      .as[Seq[Long]].collect().head
  }

  test("one-pass signature equals the 16-independent-minima reference") {
    val hs = Seq(3L, 99L, -7L, 123456789L, Long.MinValue + 5)
    val expected = (0 until 16).map { k =>
      hs.map(h => MinHash16.mix(h ^ MinHash16.seeds(k))).min
    }
    assert(sig(hs) == expected)
  }

  test("jaccard-similar sets agree on most slots; disjoint sets don't") {
    val base = (1L to 40L)
    val near = base.drop(2) ++ Seq(1000L, 1001L) // ~90% overlap
    val far = (500L to 540L)
    val sBase = sig(base)
    val agreeNear = sBase.zip(sig(near)).count { case (a, b) => a == b }
    val agreeFar = sBase.zip(sig(far)).count { case (a, b) => a == b }
    assert(agreeNear >= 10, s"near agreement only $agreeNear/16")
    assert(agreeFar <= 4, s"disjoint agreement $agreeFar/16")
  }

  test("empty input degrades to null, not a garbage signature") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(expr("graft_minhash16(hs)").as("sig"))
      .collect().head
    assert(out.isNullAt(0))
  }
}
