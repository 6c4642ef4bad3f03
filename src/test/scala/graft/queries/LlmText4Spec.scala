package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Properties of the round-5 text operators that the DuckDB oracle can't
  * express: content-defined chunking's edit locality (THE reason CDC
  * exists), and the weighted sampler's weight sensitivity. */
class LlmText4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-llmtext4").toString
    rows.map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("CDC chunk boundaries realign after an insertion (edit locality)") {
    val rng = new scala.util.Random(3)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    val words = Vector.fill(120)(vocab(rng.nextInt(vocab.length)))
    val edited = (words.take(5) :+ "INSERTED") ++ words.drop(5)
    val dir = writeDocs(Seq(1L -> words.mkString(" "),
      2L -> edited.mkString(" ")))
    val chunks = SparkEntry.queries("q_text_cdc")(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getInt(1)).map(_.getString(3)).toVector }
    val (base, mod) = (chunks(1L), chunks(2L))
    // fixed-size chunking would shift EVERY chunk after the insertion;
    // content-anchored boundaries must realign, so the two chunkings
    // share their entire tail beyond the edited region
    val commonTail = base.reverse.zip(mod.reverse).takeWhile(p => p._1 == p._2).length
    assert(commonTail >= base.length - 3,
      s"boundaries did not realign after the edit: only $commonTail of " +
        s"${base.length} tail chunks shared\nbase=$base\nmod=$mod")
    assert(mod.mkString(" ") == edited.mkString(" "),
      "chunks must reassemble the edited document exactly")
    assert(base.mkString(" ") == words.mkString(" "),
      "chunks must reassemble the base document exactly")
  }

  test("heavy-hitter sketch is exact when capacity covers the vocabulary") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_agg_heavyhitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("w"))
      .groupBy("w").count()
      .orderBy(col("count").desc, col("w"))
      .limit(20).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq,
      s"sketch diverged from exact top-20:\n got=${got.toSeq}\n want=${exact.toSeq}")
  }

  test("weighted sampler favors heavier docs and stays deterministic") {
    // two weight classes in one source: heavy docs (5000 chars) must be
    // overrepresented vs light docs (50 chars) in the top-10
    val docs = (0L until 100L).map { i =>
      val len = if (i < 50) 5000 else 50
      i -> ("w" * len)
    }
    val dir = writeDocs(docs)
    def run() = SparkEntry.queries("q_sample_weighted")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val got = run()
    assert(got.length == 10, s"expected k=10 sample, got ${got.length}")
    val heavy = got.count(_._3 < 50L)
    assert(heavy >= 8,
      s"100x weight should dominate the sample: $heavy/10 heavy in ${got.toSeq}")
    assert(run().toSeq == got.toSeq, "sample not deterministic")
  }
}
