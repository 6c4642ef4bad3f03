package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-9 tokenizer-training wave: ITERATED BPE — three unrolled
  * merge rounds (q_text_bpe_pairs stops at pair counting, i.e. round
  * one's argmax input) plus application of the learned merges to
  * re-tokenize a document sample. This is the loop a real tokenizer
  * trainer (SentencePiece, HF tokenizers) runs to convergence; three
  * rounds is the q_embed_pca unrolled-iteration discipline — enough to
  * exercise the learn→rewrite→recount dependency chain while keeping
  * the whole computation one oracled dataflow.
  *
  * Representation trick: every symbol stays ONE character. The corpus
  * alphabet is lowercase a-y (+ space), so each learned merge rewrites
  * its two-character pair to an unused single-char marker ('A', 'B',
  * 'C'). Pair extraction is then always "all 2-char substrings", merge
  * application is plain `replace` (non-overlapping, left-to-right in
  * both engines — exactly BPE's greedy scan order), and the learned
  * tokens decode back through the marker chain for the report.
  *
  * Scale notes: the corpus collapses to the (distinct word, freq)
  * vocabulary FIRST (the q_text_bpe_pairs trick) and is persisted; the
  * three rounds each run one vocab-sized pair count (map-side-combined,
  * shuffle bounded by the pair alphabet) and a map-only rewrite under a
  * broadcast 1-row argmax. No driver round trips — each round's winner
  * is a 1-row relation cross-joined back in (the q_text_burstiness
  * convention). Apply is one map-only pass over the sampled docs with
  * the three broadcast merges. Exact integer counts everywhere; ties
  * break (cnt DESC, pair ASC) — engine-portable binary string order. */
object LlmText12 {

  /** (w, f) vocabulary with persisted lineage: words len >= 2. */
  private def vocab(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** The round's winning pair over word column `wc`: 1 row
    * (pair, cnt). Words shorter than 2 symbols (fully merged) carry no
    * pairs — the length guard also keeps Spark's descending
    * `sequence(1, 0)` surprise out of the expression. */
  private def argmaxPair(df: DataFrame, wc: String): DataFrame =
    df.filter(length(col(wc)) >= 2)
      .select(explode(expr(
        s"transform(sequence(1, length($wc) - 1), i -> substring($wc, i, 2))"))
        .as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
      .orderBy(desc("cnt"), col("pair")).limit(1)

  /** The three learned merges as one broadcastable row:
    * (p1, c1, p2, c2, p3, c3) with markers A/B/C standing for merges
    * 1/2/3, plus the rewritten vocab after each round and the persisted
    * intermediates (callers MUST unpersist them after eagerly
    * materializing their result — a lingering vocab cache would be
    * silently substituted into OTHER queries' matching subplans, e.g.
    * q_text_bpe_pairs' vocab aggregate; the q_graph_pagerank no-leak
    * discipline). */
  private def train(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, Seq[DataFrame]) = {
    // persisted: feeds round-1 counting and the round-1 rewrite; each
    // later round chains on the previous rewrite
    val wf = vocab(s, d).persist()
    val m1 = argmaxPair(wf, "w")
      .select(col("pair").as("p1"), col("cnt").as("c1"))
    val w1 = wf.crossJoin(broadcast(m1))
      .withColumn("w", expr("replace(w, p1, 'A')")).persist()
    val m2 = argmaxPair(w1, "w")
      .select(col("pair").as("p2"), col("cnt").as("c2"))
    val w2 = w1.crossJoin(broadcast(m2))
      .withColumn("w", expr("replace(w, p2, 'B')")).persist()
    val m3 = argmaxPair(w2, "w")
      .select(col("pair").as("p3"), col("cnt").as("c3"))
    val w3 = w2.crossJoin(broadcast(m3))
      .withColumn("w", expr("replace(w, p3, 'C')"))
    val merges = m1.crossJoin(m2).crossJoin(m3)
    (merges, w1, w2, w3, Seq(wf, w1, w2))
  }

  /** Eagerly materialize a (small) result, then drop the training
    * caches so nothing leaks past the query build. */
  private def sealed_(res: DataFrame, caches: Seq[DataFrame]): DataFrame = {
    val out = res.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  /** Three rows — one per merge round: the raw winning pair (marker
    * encoding), the decoded token it merges to, its weighted count, and
    * the corpus token total after applying rounds 1..step. */
  private def qTextBpeTrain(s: SparkSession, d: String): DataFrame = {
    val (merges, w1, w2, w3, caches) = train(s, d)
    def tot(df: DataFrame): DataFrame =
      df.agg(sum(col("f") * length(col("w"))).as("total_tokens"))
    val step1 = merges.crossJoin(tot(w1))
      .select(lit(1).as("step"), col("p1").as("pair"),
        col("p1").as("merge_token"), col("c1").as("pair_count"),
        col("total_tokens"))
    val step2 = merges.crossJoin(tot(w2))
      .select(lit(2).as("step"), col("p2").as("pair"),
        expr("replace(p2, 'A', p1)").as("merge_token"),
        col("c2").as("pair_count"), col("total_tokens"))
    val step3 = merges.crossJoin(tot(w3))
      .select(lit(3).as("step"), col("p3").as("pair"),
        expr("replace(replace(p3, 'B', replace(p2, 'A', p1)), 'A', p1)")
          .as("merge_token"),
        col("c3").as("pair_count"), col("total_tokens"))
    sealed_(step1.unionAll(step2).unionAll(step3), caches)
      .orderBy(col("step"))
  }

  /** Apply the learned merges to re-tokenize a deterministic document
    * sample (doc_id % 53 = 0): per doc, word count, symbol count before,
    * token count after the three merges, and the compression ratio. */
  private def qTextBpeApply(s: SparkSession, d: String): DataFrame = {
    val (merges, _, _, _, caches) = train(s, d)
    val res = t(s, d, "documents")
      .filter(col("doc_id") % 53 === 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .crossJoin(broadcast(merges))
      .withColumn("tw",
        expr("replace(replace(replace(w, p1, 'A'), p2, 'B'), p3, 'C')"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w")).cast("long")).as("n_symbols"),
        sum(length(col("tw")).cast("long")).as("n_tokens"))
      .withColumn("compression",
        when(col("n_tokens") > 0,
          round(dbl(col("n_symbols")) / dbl(col("n_tokens")), 6)))
    sealed_(res, caches).orderBy(col("doc_id"))
  }

  /** PRODUCTION trainer (r12): the accumulator-gated fixpoint variant
    * of the 3-round unroll — trains until a vocab budget or until no
    * pair repeats, the q_graph_cc_fixpoint discipline applied to BPE.
    * Per round the only driver state is the 1-row argmax (pair, cnt)
    * — collected like the CC driver's 1-row label sum — and the vocab
    * rewrite is one map-only pass under that broadcast literal; round
    * count is data-driven, never hard-coded. Markers walk 'A'..'Z'
    * (the corpus alphabet is a-y + space), so merge i's pair may
    * contain earlier markers and `expand` decodes the token through
    * the marker chain. Returns one row per learned merge:
    * (step, pair, merge_token, pair_count, total_tokens). Rule-4 (no
    * SQL oracle: the round count is data-driven); LlmText12Spec pins
    * step-for-step parity with q_text_bpe_train on the first three
    * merges and known continuation beyond on a crafted corpus. */
  private[queries] def bpeFixpoint(s: SparkSession, d: String,
      vocabBudget: Int): DataFrame = {
    import s.implicits._
    var w = vocab(s, d).localCheckpoint(true)
    val markers = ('A' to 'Z').map(_.toString)
    val expand = scala.collection.mutable.Map[String, String]()
    def decode(pair: String): String =
      pair.flatMap(c => expand.getOrElse(c.toString, c.toString))
    val steps = scala.collection.mutable.ListBuffer[
      (Int, String, String, Long, Long)]()
    var step = 0
    var done = false
    while (!done && step < vocabBudget && step < markers.size) {
      val top = argmaxPair(w, "w").collect() // 1 bounded row, gate + merge
      if (top.isEmpty || top(0).getLong(1) < 2L) done = true
      else {
        val (pair, cnt) = (top(0).getString(0), top(0).getLong(1))
        val marker = markers(step)
        // lit() keeps corpus-derived pairs (quotes, backslashes) out
        // of the SQL parser; the rewrite stays a map-only literal scan.
        w = w.withColumn("w",
            replace(col("w"), lit(pair), lit(marker)))
          .localCheckpoint(true)
        val total = w.agg(sum(col("f") * length(col("w"))))
          .head.getLong(0)
        expand(marker) = decode(pair)
        step += 1
        steps += ((step, pair, expand(marker), cnt, total))
      }
    }
    steps.toSeq.toDF("step", "pair", "merge_token", "pair_count",
      "total_tokens").orderBy(col("step"))
  }

  private def qTextBpeFixpoint(s: SparkSession, d: String): DataFrame =
    bpeFixpoint(s, d, vocabBudget = 8)

  val defs: Map[String, Relational.Q] = Map(
    "q_text_bpe_train" -> (qTextBpeTrain _),
    "q_text_bpe_apply" -> (qTextBpeApply _),
    "q_text_bpe_fixpoint" -> (qTextBpeFixpoint _),
  )

  /** Shared oracle prefix: vocabulary + three unrolled merge rounds.
    * Scalar subqueries stand in for the broadcast 1-row argmaxes; the
    * len(w) >= 2 guard inside each round mirrors Spark's (and keeps
    * generate_series away from fully-merged 1-char words). */
  private val trainSql =
    """wf AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) z
      |  WHERE len(w) >= 2 GROUP BY w),
      |m1 AS (
      |  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(list_transform(
      |        generate_series(1, CAST(len(w) - 1 AS INT)),
      |        i -> substr(w, i, 2))) AS pair, f
      |    FROM wf WHERE len(w) >= 2) p
      |  GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      |w1 AS (SELECT replace(w, (SELECT pair FROM m1), 'A') AS w, f
      |       FROM wf),
      |m2 AS (
      |  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(list_transform(
      |        generate_series(1, CAST(len(w) - 1 AS INT)),
      |        i -> substr(w, i, 2))) AS pair, f
      |    FROM w1 WHERE len(w) >= 2) p
      |  GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      |w2 AS (SELECT replace(w, (SELECT pair FROM m2), 'B') AS w, f
      |       FROM w1),
      |m3 AS (
      |  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(list_transform(
      |        generate_series(1, CAST(len(w) - 1 AS INT)),
      |        i -> substr(w, i, 2))) AS pair, f
      |    FROM w2 WHERE len(w) >= 2) p
      |  GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
      |w3 AS (SELECT replace(w, (SELECT pair FROM m3), 'C') AS w, f
      |       FROM w2)
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_text_bpe_train" ->
      s"""WITH $trainSql
        |SELECT 1 AS step, (SELECT pair FROM m1) AS pair,
        |  (SELECT pair FROM m1) AS merge_token,
        |  (SELECT cnt FROM m1) AS pair_count,
        |  (SELECT CAST(sum(f * len(w)) AS BIGINT) FROM w1)
        |    AS total_tokens
        |UNION ALL
        |SELECT 2 AS step, (SELECT pair FROM m2) AS pair,
        |  replace((SELECT pair FROM m2), 'A', (SELECT pair FROM m1))
        |    AS merge_token,
        |  (SELECT cnt FROM m2) AS pair_count,
        |  (SELECT CAST(sum(f * len(w)) AS BIGINT) FROM w2)
        |    AS total_tokens
        |UNION ALL
        |SELECT 3 AS step, (SELECT pair FROM m3) AS pair,
        |  replace(replace((SELECT pair FROM m3), 'B',
        |      replace((SELECT pair FROM m2), 'A', (SELECT pair FROM m1))),
        |    'A', (SELECT pair FROM m1)) AS merge_token,
        |  (SELECT cnt FROM m3) AS pair_count,
        |  (SELECT CAST(sum(f * len(w)) AS BIGINT) FROM w3)
        |    AS total_tokens
        |ORDER BY step""".stripMargin,
    "q_text_bpe_apply" ->
      s"""WITH $trainSql,
        |sample AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE doc_id % 53 = 0),
        |tok AS (
        |  SELECT doc_id, w,
        |    replace(replace(replace(w,
        |      (SELECT pair FROM m1), 'A'),
        |      (SELECT pair FROM m2), 'B'),
        |      (SELECT pair FROM m3), 'C') AS tw
        |  FROM sample),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |    CAST(sum(len(w)) AS BIGINT) AS n_symbols,
        |    CAST(sum(len(tw)) AS BIGINT) AS n_tokens
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id, n_words, n_symbols, n_tokens,
        |  CASE WHEN n_tokens > 0 THEN
        |    round(CAST(n_symbols AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |  END AS compression
        |FROM agg ORDER BY doc_id""".stripMargin,
  )
}
