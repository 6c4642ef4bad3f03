package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for the native CDC chunker: `graft_cdc_chunks` must
  * reproduce the original higher-order SQL fold EXACTLY (that fold is
  * what the DuckDB lag-window oracle pins), across random word soups
  * and the edge shapes — short docs (< 4 words, no boundary possible),
  * consecutive boundaries, repeated words, and non-ASCII code points.
  * (Generators driven with deterministic seeds — the
  * scalatest-scalacheck bridge isn't in the offline cache.) */
class CdcChunksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the ORIGINAL interpreted fold, verbatim from pre-r8 q_text_cdc
  private val wh =
    "aggregate(split(w, ''), 0L, (h, c) -> (h * 31L + ascii(c)) % 1000003L)"
  private val isB = s"acc.pos + 1 >= 4 AND ((acc.p1 * 29791L + " +
    s"acc.p2 * 961L + acc.p3 * 31L + $wh) % 1000003L) % 8L = 0L"
  private val foldSql =
    s"""aggregate(
       |  ws,
       |  named_struct(
       |    'p1', 0L, 'p2', 0L, 'p3', 0L, 'pos', 0,
       |    'cur', CAST(array() AS ARRAY<STRING>),
       |    'done', CAST(array() AS ARRAY<ARRAY<STRING>>)),
       |  (acc, w) -> named_struct(
       |    'p1', acc.p2,
       |    'p2', acc.p3,
       |    'p3', $wh,
       |    'pos', acc.pos + 1,
       |    'cur', IF($isB,
       |      CAST(array() AS ARRAY<STRING>),
       |      concat(acc.cur, array(w))),
       |    'done', IF($isB,
       |      concat(acc.done, array(concat(acc.cur, array(w)))),
       |      acc.done)),
       |  acc -> IF(size(acc.cur) > 0,
       |    concat(acc.done, array(acc.cur)), acc.done))""".stripMargin

  private def both(docs: Seq[Seq[String]]): Seq[(Seq[Seq[String]],
      Seq[Seq[String]])] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    docs.zipWithIndex.map(_.swap).toDF("id", "ws")
      .selectExpr("id", s"$foldSql AS ref", "graft_cdc_chunks(ws) AS got")
      .orderBy("id")
      .as[(Int, Seq[Seq[String]], Seq[Seq[String]])]
      .collect().toSeq.map { case (_, r, g) => (r, g) }
  }

  test("native chunker matches the SQL fold on edge shapes") {
    val docs: Seq[Seq[String]] = Seq(
      Seq.empty[String],
      Seq("one"),
      Seq("a", "b", "c"), // < 4 words: single chunk, never a boundary
      Seq.fill(40)("same"), // repeated word: periodic boundaries
      "the fast key order sort table scan merge part window".split(" ").toSeq,
      Seq("héllo", "wörld", "日本語", "emoji😀mix", "ascii"))
    both(docs).foreach { case (ref, got) =>
      assert(got == ref, s"native=$got fold=$ref")
    }
  }

  test("native chunker matches the SQL fold on 150 random word soups " +
      "and every word is preserved in order") {
    val genWord = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaLowerChar),
      Gen.stringOfN(5, Gen.alphaNumChar),
      Gen.oneOf("table", "scan", "merge", "join", "the", "ünïcødé"))
    val genDoc = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, genWord))
    val docs = (1 to 150).flatMap(i =>
      genDoc.apply(Gen.Parameters.default, Seed(i.toLong))).map(_.toSeq)
    both(docs).zip(docs).foreach { case ((ref, got), ws) =>
      assert(got == ref, s"input=$ws native=$got fold=$ref")
      assert(got.flatten == ws, s"chunking lost/reordered words: $ws")
    }
  }
}
