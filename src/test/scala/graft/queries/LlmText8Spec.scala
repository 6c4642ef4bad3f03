package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Crafted-input contracts for the TextRank/count-min/naive-Bayes wave:
  * a symmetric two-word graph splits rank evenly, the count-min
  * estimate never undercounts and is exact for a collision-free tiny
  * vocabulary, and disjoint-vocabulary languages classify to a perfect
  * diagonal. */
class LlmText8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("textrank: a single a-b co-occurrence edge splits rank 0.5/0.5") {
    import spark.implicits._
    val dir = Tables.freshDir("l8_tr")
    Seq((1L, "aa bb aa bb aa bb aa bb", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_textrank")(spark, dir)
      .as[(String, Double)].collect().toSeq
    assert(out.map(_._1).sorted == Seq("aa", "bb"), s"words: $out")
    assert(out.forall(_._2 == 0.5), s"ranks: $out")
  }

  test("countmin: estimates never undercount, and the sketch ranks the " +
      "real top-10 on sf0.001 deterministically") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_agg_countmin")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.size == 10)
    assert(out.forall { case (_, c, est, over) =>
      est >= c && over == est - c }, s"cm guarantee violated: $out")
    val cs = out.map(_._2)
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    val again = SparkEntry.queries("q_agg_countmin")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == again)
  }

  test("naivebayes: disjoint-vocabulary languages classify to a " +
      "perfect diagonal confusion matrix") {
    import spark.implicits._
    val dir = Tables.freshDir("l8_nb")
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0)
        (i.toLong, s"red green blue yellow purple orange d$i", "xa", "s", 30L)
      else
        (i.toLong, s"uno dos tres cuatro cinco seis d$i", "xb", "s", 28L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_naivebayes")(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (a, p, _) => a == p },
      s"off-diagonal predictions: $out")
  }
}
