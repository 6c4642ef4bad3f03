package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Iterated BPE (round 9): hand-computed merge chain on a crafted
  * corpus, exercising exactly what sf0.01 doesn't — a later round
  * merging a MARKER pair (round 3 merges "AA") and the decode chain
  * mapping it back to the surface token ("aaaa"), plus BPE's greedy
  * leftmost-first overlap semantics ("aaa" → [aa, a], never [a, aa]). */
class LlmText12Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 10 docs × "aaaa aaaa aaaa bcbc bcbc aaa":
    * vocab {aaaa:30, bcbc:20, aaa:10}.
    * R1: aa = 3·30 + 2·10 = 110 wins → aaaa→AA, aaa→Aa  (total 160)
    * R2: bc = 2·20 = 40 wins (AA only 30)  → bcbc→BB    (total 120)
    * R3: AA = 30 wins (BB 20, Aa 10)       → AA→C       (total 90) */
  private lazy val dir: String = {
    import spark.implicits._
    val text = "aaaa aaaa aaaa bcbc bcbc aaa"
    val d = Files.createTempDirectory("graft-bpe").toString
    (0L to 9L).map(i => (i, text, "en", "src", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("three merge rounds: counts, marker-pair merge, decode chain") {
    val rows = SparkEntry.queries("q_text_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      (1, "aa", "aa", 110L, 160L),
      (2, "bc", "bc", 40L, 120L),
      // round 3 merges the MARKER pair "AA"; decoded token is "aaaa"
      (3, "AA", "aaaa", 30L, 90L)), s"got ${rows.toSeq}")
  }

  test("fixpoint trainer: step-for-step parity with the 3-round unroll, " +
      "correct continuation beyond, convergence before the budget") {
    // hand continuation: R4 merges BB (bcbc→D, cnt 20, total 70);
    // R5 merges Aa (aaa→E, cnt 10, total 60); R6 no word has 2 symbols
    // left → converged at 5 merges, well under the budget of 8
    val fix = SparkEntry.queries("q_text_bpe_fixpoint")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val unroll = SparkEntry.queries("q_text_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(fix.take(3).toSeq == unroll.toSeq,
      s"fixpoint diverged from the unroll: ${fix.toSeq} vs ${unroll.toSeq}")
    assert(fix.toSeq.drop(3) == Seq(
      (4, "BB", "bcbc", 20L, 70L),
      (5, "Aa", "aaa", 10L, 60L)), s"continuation: ${fix.toSeq}")
    assert(fix.length == 5, "must converge (no repeating pair) before " +
      s"the 8-merge budget: ${fix.length} steps")
    // the budget is a hard clamp: asking for 2 merges stops at 2
    val clamped = LlmText12.bpeFixpoint(spark, dir, vocabBudget = 2)
      .collect().map(_.getInt(0))
    assert(clamped.toSeq == Seq(1, 2))
  }

  test("fixpoint trainer parity with the unroll on real data (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val fix = SparkEntry.queries("q_text_bpe_fixpoint")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3), r.getLong(4)))
    val unroll = SparkEntry.queries("q_text_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(fix.take(3).toSeq == unroll.toSeq,
      s"real-data divergence: ${fix.take(3).toSeq} vs ${unroll.toSeq}")
    assert(fix.length > 3, "sf0.001 corpus must support merges past the " +
      "unroll's three rounds")
  }

  test("apply: greedy leftmost overlap (aaa -> Aa, 2 tokens) and " +
      "per-doc compression") {
    val rows = SparkEntry.queries("q_text_bpe_apply")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // only doc 0 passes doc_id % 53 = 0; 6 words, 23 symbols;
    // aaaa→C (1) ×3, bcbc→BB (2) ×2, aaa→Aa (2) ×1 = 9 tokens
    assert(rows.toSeq == Seq((0L, 6L, 23L, 9L, 2.555556)),
      s"got ${rows.toSeq}")
  }
}
