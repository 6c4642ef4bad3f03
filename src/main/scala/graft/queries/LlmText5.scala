package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Fifth LLM-pipeline wave: retrieval scoring (BM25), tokenizer training
  * (BPE pair counting), collocation mining (PMI), and temperature-balanced
  * multilingual sampling — the curation stages between dedup and training.
  *
  * Scale notes:
  *  - BM25 deliberately avoids the textbook explode→(doc,term) shuffle for
  *    a FIXED query-term set: per-term tf comes from a codegen'd
  *    higher-order `filter` inside the row (map-only over the corpus), the
  *    corpus stats (N, Σdl, df per term) are ONE tiny global aggregate
  *    broadcast back. Net: two corpus passes, zero wide shuffles, no
  *    vocabulary-sized state anywhere — at 100 TB the only cost is the
  *    scan. (An ad-hoc-query engine would maintain an inverted index; for
  *    a batch curation pass over every document this plan is optimal.)
  *  - BPE pair counting uses the real tokenizer-training trick: aggregate
  *    the corpus to (distinct word, frequency) FIRST — vocab-sized, orders
  *    of magnitude smaller than the token stream — then expand each
  *    distinct word once into its symbol pairs weighted by frequency.
  *    The expensive explode runs over the vocabulary, not the corpus.
  *  - PMI collocations: unigram and bigram count tables are vocab-bounded
  *    (the corpus passes are plain hash aggregates with map-side
  *    combine); the scoring joins run on those bounded tables and are
  *    broadcast. Counts stay exact integers; only the final ln() is
  *    floating point, rounded to 6 dp on both engines.
  *  - Temperature sampling is the UniMax/mT5-style α=0.5 rebalance: lang
  *    histogram (tiny agg) → per-lang acceptance rate → map-only
  *    md5-threshold keep. Deterministic (md5 of doc_id), single corpus
  *    pass, per-lang state is #languages rows broadcast.
  *
  * Cross-engine determinism: all double arithmetic is written with the
  * SAME textual expression tree on both sides (IEEE ops on identical
  * inputs are bit-identical; only summation ORDER differs between
  * engines, and every order-sensitive reduction here is either an exact
  * integer/decimal sum or a fixed-arity `a + b + c` expression).
  */
object LlmText5 {

  /** The fixed BM25 query-term set (mid-frequency words of the synthetic
    * corpus so tf/df variation is non-trivial at sf0.01). */
  private val BmTerms = Seq("join", "vector", "scan")
  private val BmK1 = "1.2"
  private val BmB075 = "0.75"

  /** Okapi BM25 top-20 for a fixed query — the retrieval/quality-scoring
    * primitive of data-curation pipelines (e.g. "select documents similar
    * to high-quality seed corpora"). k1=1.2, b=0.75,
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)). */
  private def qTextBm25(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val withTf = BmTerms.zipWithIndex.foldLeft(
      base.withColumn("dl", size(col("ws")))) { case (df, (term, i)) =>
      df.withColumn(s"tf$i", expr(s"size(filter(ws, x -> x = '$term'))"))
    }.drop("ws")
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"),
      sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"))
    // One contribution per term, identical expression text in the oracle;
    // the per-document score is the fixed-order sum c0 + c1 + c2 (no
    // engine-ordered aggregation touches a double anywhere).
    def contrib(i: Int): String =
      s"""CASE WHEN tf$i > 0 THEN
         |  ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
         |           / (CAST(df$i AS DOUBLE) + 0.5))
         |  * (CAST(tf$i AS DOUBLE) * 2.2)
         |  / (CAST(tf$i AS DOUBLE) + $BmK1 * (0.25 + $BmB075
         |      * CAST(dl AS DOUBLE)
         |      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
         |ELSE 0.0 END""".stripMargin
    withTf.crossJoin(broadcast(stats))
      .withColumn("score",
        expr(s"(${contrib(0)} + ${contrib(1)}) + ${contrib(2)}"))
      .filter(col("score") > 0.0)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(desc("score"), col("doc_id")).limit(20)
  }

  /** One BPE-training iteration: adjacent symbol-pair frequencies over the
    * corpus, weighted by word frequency (the argmax pair is what a real
    * BPE trainer would merge next). The corpus collapses to (word, freq)
    * before any pair expansion — the scale trick every production
    * tokenizer trainer (SentencePiece, HF tokenizers) relies on. */
  private def qTextBpePairs(s: SparkSession, d: String): DataFrame = {
    val wf = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    wf.select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("f"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
      .orderBy(desc("cnt"), col("pair")).limit(30)
  }

  /** Corpus-trained bigram-LM scorer: add-1-smoothed conditional
    * p(b|a) = (c2(a,b) + 1) / (c1(a) + V), per-document average negative
    * log-likelihood over its bigrams — the context-sensitive upgrade of
    * q_text_unigram_lm and the standard fluency/quality signal. Same
    * determinism discipline: per-bigram ln rounds to 9 dp then sums as
    * DECIMAL (order-independent); same unbounded-vocabulary story: the
    * bigram stream joins its count tables via shuffle_hash, never a
    * broadcast of the (unbounded) vocab. Docs with < 2 words drop from
    * BOTH engines identically (inner joins on the bigram stream). */
  private def qTextBigramLm(s: SparkSession, d: String): DataFrame = {
    val w = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val tok = w.select(explode(col("ws")).as("w"))
    val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bg = w.select(col("doc_id"), explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |         (a, b) -> named_struct('a', a, 'b', b))""".stripMargin))
        .as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"))
    val b2 = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val tot = uni.agg(count(lit(1)).cast("double").as("V"))
    bg.join(b2.hint("shuffle_hash"), Seq("a", "b"))
      .join(uni.hint("shuffle_hash").withColumnRenamed("w", "a"), "a")
      .crossJoin(broadcast(tot))
      .withColumn("lp", expr(
        "cast(round(ln((c2 + 1.0) / (c1 + V)), 9) as decimal(18,9))"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lp")).as("s"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-(col("s").cast("double")) / col("n_bigrams"), 6)
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  /** PMI-scored collocations: bigrams with count ≥ 10 ranked by pointwise
    * mutual information ln(p(ab) / (p(a)·p(b))) — the phrase-mining /
    * multi-word-expression detector (word2vec's phrase pass, quality
    * signals for n-gram LMs). Exact integer counts; one ln at the end. */
  private def qTextCollocations(s: SparkSession, d: String): DataFrame = {
    val w = t(s, d, "documents").select(split(col("text"), " ").as("ws"))
    val uni = w.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("uc"))
    val bc = w.select(explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |         (a, b) -> named_struct('a', a, 'b', b))""".stripMargin))
        .as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("bc"))
    val tot = uni.agg(sum(col("uc")).as("t_tok"))
      .crossJoin(bc.agg(sum(col("bc")).as("t_big")))
    bc.filter(col("bc") >= 10)
      .join(broadcast(uni.select(col("w").as("a"), col("uc").as("ua"))), "a")
      .join(broadcast(uni.select(col("w").as("b"), col("uc").as("ub"))), "b")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("bc").as("cnt"),
        round(expr(
          """ln((CAST(bc AS DOUBLE) * CAST(t_tok AS DOUBLE)
            |     * CAST(t_tok AS DOUBLE))
            |   / (CAST(t_big AS DOUBLE) * CAST(ua AS DOUBLE)
            |      * CAST(ub AS DOUBLE)))""".stripMargin), 6).as("pmi"))
      .orderBy(desc("pmi"), col("a"), col("b")).limit(30)
  }

  /** Temperature-balanced multilingual sampling (α = 0.5, target 200
    * docs): per-language weight n_l^α / Σ n_l^α, acceptance rate
    * min(1, target·w_l / n_l), deterministic md5-fraction keep. The
    * mT5/UniMax rebalance that keeps low-resource languages from being
    * drowned by the head language. The Σ sqrt reduction is routed through
    * DECIMAL so engine summation order cannot perturb the rates. */
  private def qSampleTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val lc = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      .withColumn("s_l",
        expr("CAST(sqrt(CAST(n_l AS DOUBLE)) AS DECIMAL(28,10))"))
    val tot = lc.agg(sum(col("s_l")).as("s_tot"))
    val rates = lc.crossJoin(broadcast(tot))
      .withColumn("rate", expr(
        """least(CAST(1.0 AS DOUBLE),
          |  CAST(200 AS DOUBLE)
          |  * (CAST(s_l AS DOUBLE) / CAST(s_tot AS DOUBLE))
          |  / CAST(n_l AS DOUBLE))""".stripMargin))
      .select(col("lang"), col("rate"))
    // md5-fraction in [0, 1): first 12 hex chars as an integer out of
    // 16^12 — the same uniform-key idiom as q_sample_weighted.
    docs.join(broadcast(rates), "lang")
      .withColumn("v", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10)" +
          " as bigint)"))
      .filter(col("v") <
        expr("CAST(floor(rate * 281474976710656.0) AS BIGINT)"))
      .select(col("doc_id"), col("lang"), round(col("rate"), 6).as("rate"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_text_bm25" -> (qTextBm25 _),
    "q_text_bigram_lm" -> (qTextBigramLm _),
    "q_text_bpe_pairs" -> (qTextBpePairs _),
    "q_text_collocations" -> (qTextCollocations _),
    "q_sample_temperature" -> (qSampleTemperature _),
  )

  val sql: Map[String, String] = Map(
    // Same expression tree as the Spark side (ln args, cast points, and
    // the fixed (c0 + c1) + c2 association are textually mirrored).
    "q_text_bm25" ->
      """WITH d2 AS (
        |  SELECT doc_id, len(ws) AS dl,
        |    len(list_filter(ws, x -> x = 'join')) AS tf0,
        |    len(list_filter(ws, x -> x = 'vector')) AS tf1,
        |    len(list_filter(ws, x -> x = 'scan')) AS tf2
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents)),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(dl) AS BIGINT) AS sum_dl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM d2),
        |sc AS (
        |  SELECT doc_id,
        |    (CASE WHEN tf0 > 0 THEN
        |       ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
        |                / (CAST(df0 AS DOUBLE) + 0.5))
        |       * (CAST(tf0 AS DOUBLE) * 2.2)
        |       / (CAST(tf0 AS DOUBLE) + 1.2 * (0.25 + 0.75
        |           * CAST(dl AS DOUBLE)
        |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |     ELSE 0.0 END
        |     + CASE WHEN tf1 > 0 THEN
        |       ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
        |                / (CAST(df1 AS DOUBLE) + 0.5))
        |       * (CAST(tf1 AS DOUBLE) * 2.2)
        |       / (CAST(tf1 AS DOUBLE) + 1.2 * (0.25 + 0.75
        |           * CAST(dl AS DOUBLE)
        |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |     ELSE 0.0 END)
        |     + CASE WHEN tf2 > 0 THEN
        |       ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
        |                / (CAST(df2 AS DOUBLE) + 0.5))
        |       * (CAST(tf2 AS DOUBLE) * 2.2)
        |       / (CAST(tf2 AS DOUBLE) + 1.2 * (0.25 + 0.75
        |           * CAST(dl AS DOUBLE)
        |           / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
        |     ELSE 0.0 END AS score
        |  FROM d2, st)
        |SELECT doc_id, round(score, 6) AS score FROM sc
        |WHERE score > 0.0 ORDER BY round(score, 6) DESC, doc_id
        |LIMIT 20""".stripMargin,
    "q_text_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
        |uni AS (SELECT w, COUNT(*) AS c1 FROM tok GROUP BY w),
        |bg AS (SELECT doc_id, unnest(list_transform(
        |         generate_series(1, CAST(len(ws) - 1 AS INT)),
        |         i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS g
        |       FROM w),
        |b2 AS (SELECT g.a AS a, g.b AS b, COUNT(*) AS c2
        |       FROM bg GROUP BY 1, 2),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS V FROM uni),
        |lp AS (SELECT bg.doc_id,
        |    CAST(ROUND(ln((b2.c2 + 1.0) / (uni.c1 + tot.V)), 9)
        |      AS DECIMAL(18,9)) AS lp
        |  FROM bg JOIN b2 ON bg.g.a = b2.a AND bg.g.b = b2.b
        |          JOIN uni ON bg.g.a = uni.w CROSS JOIN tot),
        |agg AS (SELECT doc_id, SUM(lp) AS s, COUNT(*) AS n
        |  FROM lp GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
        |  ROUND(-CAST(s AS DOUBLE) / n, 6) AS avg_nll
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_text_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) z
        |  WHERE len(w) >= 2 GROUP BY w),
        |p AS (
        |  SELECT unnest(list_transform(
        |      generate_series(1, CAST(len(w) - 1 AS INT)),
        |      i -> substr(w, i, 2))) AS pair, f
        |  FROM wf)
        |SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM p
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,
    "q_text_collocations" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS uc FROM
        |        (SELECT unnest(ws) AS w FROM w) z GROUP BY w),
        |b0 AS (SELECT unnest(list_transform(
        |         generate_series(1, CAST(len(ws) - 1 AS INT)),
        |         i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS bg
        |       FROM w),
        |bc AS (SELECT bg.a AS a, bg.b AS b, CAST(count(*) AS BIGINT) AS bc
        |       FROM b0 GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(uc) AS BIGINT) AS t_tok,
        |               (SELECT CAST(sum(bc) AS BIGINT) FROM bc) AS t_big
        |        FROM uni)
        |SELECT a, b, bc AS cnt,
        |  round(ln((CAST(bc AS DOUBLE) * CAST(t_tok AS DOUBLE)
        |            * CAST(t_tok AS DOUBLE))
        |          / (CAST(t_big AS DOUBLE) * CAST(ua.uc AS DOUBLE)
        |             * CAST(ub.uc AS DOUBLE))), 6) AS pmi
        |FROM bc JOIN uni ua ON bc.a = ua.w JOIN uni ub ON bc.b = ub.w, tot
        |WHERE bc >= 10
        |ORDER BY pmi DESC, a, b LIMIT 30""".stripMargin,
    "q_sample_temperature" ->
      """WITH lc AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_l,
        |         CAST(sqrt(CAST(count(*) AS DOUBLE)) AS DECIMAL(28,10))
        |           AS s_l
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT sum(s_l) AS s_tot FROM lc),
        |rates AS (
        |  SELECT lang,
        |    least(CAST(1.0 AS DOUBLE),
        |      CAST(200 AS DOUBLE)
        |      * (CAST(s_l AS DOUBLE) / CAST(s_tot AS DOUBLE))
        |      / CAST(n_l AS DOUBLE)) AS rate
        |  FROM lc, tot),
        |k AS (
        |  SELECT doc_id, d.lang, rate,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) AS v
        |  FROM documents d JOIN rates USING (lang))
        |SELECT doc_id, lang, round(rate, 6) AS rate FROM k
        |WHERE v < CAST(floor(rate * 281474976710656.0) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
  )
}
