package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Fourth LLM-pipeline wave: PII detection/redaction, URL-canonicalization
  * dedup, and per-document entropy quality signals.
  *
  * Scale notes: PII and entropy are per-row map-only operators — no
  * shuffle at any corpus size, whole-stage codegen'd regex/higher-order
  * expressions. URL dedup is the canonical one-shuffle exact-dedup shape
  * (groupBy on a bounded-length canonical key), the same plan as
  * q_dedup_exact but keyed on a normalized URL instead of normalized
  * text — the first stage of every web-crawl ingestion pipeline. The
  * entropy operator deliberately avoids the explode→shuffle form: run
  * lengths over a per-row sorted token array give Σ c·log2 c in one
  * higher-order `aggregate`, O(len·log len) per document and bounded by
  * document length (the same per-doc-bounded argument as
  * q_text_repetition), where the naive per-distinct-token `filter` count
  * would be O(distinct × tokens).
  *
  * The documents table carries no real PII or URLs, so both engines
  * derive the same deterministic synthetic columns (doc_id-seeded) before
  * applying the operator — the detection/redaction/canonicalization logic
  * is what the oracle pins, over inputs with known per-class densities.
  */
object LlmText4 {

  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+"
  private val PhoneRe = "555-[0-9]{4}"
  private val IpRe = "10\\.0\\.[0-9]+\\.[0-9]+"

  /** PII detection + redaction (the privacy-scrub stage of a training
    * pipeline, cf. BigScience ROOTS / CCNet): typed match counts per
    * class (email / phone / IPv4) and a class-tagged redacted text.
    * Map-only: regexp_count + a regexp_replace chain per row; zero
    * shuffles, codegen'd, scales with bytes scanned. */
  private def qTextPii(s: SparkSession, d: String): DataFrame = {
    val ptext = concat(
      col("text"),
      when(col("doc_id") % 2 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com"))).otherwise(""),
      when(col("doc_id") % 3 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(col("doc_id") % 5 === 0,
        concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") % 100).cast("string"))).otherwise(""))
    t(s, d, "documents")
      .select(col("doc_id"), ptext.as("ptext"))
      .select(
        col("doc_id"),
        regexp_count(col("ptext"), lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count(col("ptext"), lit(PhoneRe)).cast("int").as("n_phones"),
        regexp_count(col("ptext"), lit(IpRe)).cast("int").as("n_ips"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("ptext"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          IpRe, "<IP>").as("redacted"))
      .orderBy("doc_id")
  }

  /** URL-canonicalization dedup — the first dedup stage of a web-crawl
    * pipeline: lowercase scheme+host, strip default port, drop the
    * fragment, drop `utm_*` tracking params, sort the surviving query
    * params, then keep the first document per canonical URL. One shuffle
    * on the canonical key (bounded-length string), identical plan shape
    * to q_dedup_exact; everything before the groupBy is per-row codegen'd
    * string/array work. Synthetic URLs are doc_id-seeded so ~200 id pairs
    * at distance 300 collide only after canonicalization (case, :443,
    * utm param, fragment all differ). */
  private def qDedupUrl(s: SparkSession, d: String): DataFrame = {
    val url = concat(
      lit("HTTPS://WWW.Example-"), (col("doc_id") % 20).cast("string"),
      lit(".COM:443/Docs/"), (col("doc_id") % 25).cast("string"),
      lit("?b="), (col("doc_id") % 3).cast("string"),
      lit("&utm_source=feed"),
      when(col("doc_id") % 2 === 0,
        concat(lit("&a="), (col("doc_id") % 4).cast("string"))).otherwise(""),
      lit("#sec"), col("doc_id").cast("string"))
    t(s, d, "documents")
      .select(col("doc_id"), url.as("url"))
      .withColumn("nofrag", expr("split_part(url, '#', 1)"))
      .withColumn("host",
        lower(expr("replace(regexp_extract(nofrag, '://([^/]+)', 1), ':443', '')")))
      .withColumn("pathq", regexp_extract(col("nofrag"), "://[^/]+(/.*)", 1))
      .withColumn("path",
        regexp_replace(expr("split_part(pathq, '?', 1)"), "/$", ""))
      .withColumn("params", array_join(array_sort(
        filter(split(expr("split_part(pathq, '?', 2)"), "&"),
          x => !startswith(x, lit("utm_")) && x =!= "")), "&"))
      .withColumn("canonical_url", concat(lit("https://"), col("host"),
        col("path"),
        when(col("params") =!= "", concat(lit("?"), col("params")))
          .otherwise("")))
      .groupBy("canonical_url")
      .agg(min("doc_id").cast("long").as("keeper_doc_id"),
        count(lit(1)).as("n_docs"))
      .orderBy("canonical_url")
  }

  /** Σ c·log2(c) over token run lengths of a per-row sorted array — the
    * shuffle-free building block for per-document entropy:
    * H = log2(n) − Σ c·log2(c) / n. */
  private def runSumCLogC(arr: String): Column = expr(
    s"""aggregate(
       |  array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L,
       |               'acc', CAST(0.0 AS DOUBLE)),
       |  (s, w) -> IF(s.prev IS NOT NULL AND w = s.prev,
       |    named_struct('prev', s.prev, 'run', s.run + 1L, 'acc', s.acc),
       |    named_struct('prev', w, 'run', 1L,
       |      'acc', s.acc + IF(s.run > 0L,
       |        s.run * log2(CAST(s.run AS DOUBLE)), CAST(0.0 AS DOUBLE)))),
       |  s -> s.acc + IF(s.run > 0L,
       |    s.run * log2(CAST(s.run AS DOUBLE)), CAST(0.0 AS DOUBLE)))"""
      .stripMargin)

  /** Per-document Shannon entropy at character and word level — the
    * compression-style quality signal (low char entropy = repetitive
    * boilerplate, abnormal word entropy = keyword stuffing / garbled
    * text). Map-only: both entropies come from run lengths over per-row
    * sorted arrays (no explode, no shuffle) via the H = log2(n) −
    * Σ c·log2 c / n identity; cost is O(len·log len) per document,
    * bounded by document length. */
  private def qTextEntropy(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("cs", split(col("text"), ""))
      .withColumn("ws", filter(split(col("text"), " "), x => x =!= ""))
      // Empty inputs are an EXPLICIT NULL on both engines: a
      // whitespace-only doc has no words, and without the guard Spark
      // emits a NULL-entropy row while the oracle's inner joins dropped
      // the doc entirely (rows_match breaks the moment such a doc
      // enters a corpus); the oracle mirrors the guard with LEFT joins
      // from `documents`. Char split never yields an empty array (both
      // engines return [''] for ''), so its guard is defensive only.
      .select(
        col("doc_id"),
        when(size(col("cs")) === 0, lit(null)).otherwise(
          round(log2(size(col("cs"))) - runSumCLogC("cs") / size(col("cs")),
            6)).as("char_entropy"),
        when(size(col("ws")) === 0, lit(null)).otherwise(
          round(log2(size(col("ws"))) - runSumCLogC("ws") / size(col("ws")),
            6)).as("word_entropy"))
      .orderBy("doc_id")

  /** Content-defined chunking (the FastCDC/Rabin idea over words): a
    * chunk boundary lands after word i whenever the rolling hash of the
    * last 4 words ≡ 0 (mod 8) — so boundaries are anchored to CONTENT,
    * not positions, and an insertion early in a document only reshapes
    * the chunks it touches (fixed-size chunking shifts every later
    * chunk, defeating downstream chunk-level dedup). Entirely per-row:
    * word hashes, boundary positions, and chunk slices are higher-order
    * expressions over the token array — no shuffle before the
    * presentation sort, O(words × wordlen) per document. Expected chunk
    * length = the mask modulus (8 words; measured 7.4). The oracle
    * computes the same boundaries with lag windows over an exploded
    * token stream — the per-row ⇄ relational equivalence is what's
    * pinned.
    *
    * Implementation note: this is ONE fold over the token array carrying
    * (last three word hashes, current chunk, finished chunks) — not a
    * multi-column pipeline of whs/boundaries/slices. Catalyst's
    * projection collapse INLINES a referenced column's expression into
    * every use site, so a `bounds`→`bpos`→`whs` column chain re-evaluates
    * the full word-hash transform per element_at probe — measured
    * minutes per partition at sf0.1 vs sub-second for the fold. */
  private def qTextCdc(s: SparkSession, d: String): DataFrame = {
    // One pass over the word array via the native CdcChunks expression
    // (graft.functions.CdcChunks — same boundary algebra the original
    // SQL fold used: word hash (h·31+cp) mod 1000003, boundary after
    // word i≥4 when the 31-polynomial of the last 4 word hashes ≡ 0
    // mod 8). The higher-order fold ran INTERPRETED and hashed every
    // word twice (boundary predicate + state update) — measured 4.2 s
    // → 0.6 s at sf0.1. The DuckDB lag-window oracle is unchanged and
    // still pins the boundary semantics.
    graft.functions.GraftFunctions.register(s)
    t(s, d, "documents")
      .withColumn("ws", filter(split(col("text"), " "), x => x =!= ""))
      .withColumn("chunks", expr("graft_cdc_chunks(ws)"))
      .select(col("doc_id"),
        posexplode(col("chunks")).as(Seq("ci0", "cw")))
      .select(col("doc_id"), (col("ci0") + 1).cast("int").as("chunk_idx"),
        size(col("cw")).as("n_words"),
        array_join(col("cw"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Deterministic weighted sampling without replacement, k per group
    * (Efraimidis–Spirakis A-ES): each doc draws a uniform u from the
    * first 48 bits of md5(doc_id) and ranks by ln(u)/weight (the
    * monotone image of u^(1/w)); the top-k per source are the sample.
    * Longer documents (weight = n_chars) are proportionally likelier —
    * the exact-k counterpart to q_sample_mixture's expected-rate
    * sampling. Deterministic on any engine: the uniform is content-
    * derived (no RNG state), the key is rounded to 12 dp before
    * ranking, and doc_id breaks ties. One shuffle keyed by the group;
    * every partition keeps only its k best via the window rank. */
  private def qSampleWeighted(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("v", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"))
      .withColumn("skey",
        round(log((col("v") + lit(1.0)) / lit(281474976710657.0)) /
          col("n_chars"), 12))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("skey").desc, col("doc_id"))).cast("int"))
      .filter(col("rnk") <= 10)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy("source", "rnk")

  /** Heavy hitters over the corpus token stream via the native
    * `approx_top_k` sketch aggregate (DataSketches frequent-items) —
    * the sublinear-memory answer to "what are the most common tokens"
    * that an exact groupBy can't give at web scale (its state is
    * maxItemsTracked, not the vocabulary). Map-side partial sketches
    * merge associatively, so the shuffle carries one sketch per
    * partition. With tracked capacity ≥ the live vocabulary the
    * estimates are exact — the spec pins that against an exact count;
    * the explicit (est desc, w) sort makes tie order deterministic. */
  private def qAggHeavyHitters(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(explode(filter(split(col("text"), " "), x => x =!= ""))
        .as("w"))
      .agg(expr("approx_top_k(w, 20, 10000)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("w"), col("e.count").as("est"))
      .orderBy(col("est").desc, col("w"))

  /** Edit-distance verification between candidate document pairs — the
    * exact-similarity scalar a fuzzy-dedup funnel applies AFTER blocking
    * (CCNet-style): levenshtein distance + normalized similarity on
    * bounded 48-char prefixes. Adjacent ids stand in for the candidate
    * list here; in the funnel the input is LSH candidates, so the cost
    * is O(candidates × prefix²) — the prefix cap bounds the per-pair
    * quadratic, and the join key is whatever blocking produced. */
  private def qTextEditdist(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "documents")
      .select(col("doc_id").as("a"), substring(col("text"), 1, 48).as("ta"))
    val b = t(s, d, "documents")
      .select((col("doc_id") - 1).as("a"), col("doc_id").as("b"),
        substring(col("text"), 1, 48).as("tb"))
    a.join(b, "a")
      .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("bigint"))
      .withColumn("sim", round(lit(1.0) - col("dist").cast("double") /
        greatest(length(col("ta")), length(col("tb"))), 6))
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("dist"),
        col("sim"))
      .orderBy("doc_a")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_heavyhitters" -> (qAggHeavyHitters _),
    "q_text_editdist" -> (qTextEditdist _),
    "q_sample_weighted" -> (qSampleWeighted _),
    "q_text_pii" -> (qTextPii _),
    "q_dedup_url" -> (qDedupUrl _),
    "q_text_entropy" -> (qTextEntropy _),
    "q_text_cdc" -> (qTextCdc _),
  )

  val sql: Map[String, String] = Map(
    "q_text_editdist" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(substr(a.text, 1, 48), substr(b.text, 1, 48))
        |    AS BIGINT) AS dist,
        |  round(1.0 - levenshtein(substr(a.text, 1, 48),
        |      substr(b.text, 1, 48)) * 1.0 /
        |    greatest(length(substr(a.text, 1, 48)),
        |      length(substr(b.text, 1, 48))), 6) AS sim
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin,
    // hex→int via list_reduce (DuckDB has no conv()); ln IS natural log
    // in DuckDB; 12-dp key round + doc_id tie-break make the rank
    // boundary engine-portable
    "q_sample_weighted" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 12), ''),
        |        c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))),
        |      (h, d) -> h * 16 + d) AS v
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((v + 1.0) / 281474976710657.0) / n_chars, 12) AS skey
        |  FROM k),
        |r AS (
        |  SELECT source, doc_id, n_chars, skey,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY skey DESC, doc_id) AS rnk
        |  FROM s)
        |SELECT source, CAST(rnk AS INT) AS rnk, doc_id, n_chars
        |FROM r WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin,
    // regexp_extract_all+len = Spark's regexp_count; 'g' flag = Spark's
    // replace-all default
    "q_text_pii" ->
      """WITH pii AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' contact user' ||
        |      CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' call 555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |      CAST(doc_id % 100 AS VARCHAR) ELSE '' END AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(ptext, '[a-z0-9]+@[a-z0-9.]+'))
        |    AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(ptext, '555-[0-9]{4}'))
        |    AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(ptext, '10\.0\.[0-9]+\.[0-9]+'))
        |    AS INT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(ptext,
        |    '[a-z0-9]+@[a-z0-9.]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'),
        |    '10\.0\.[0-9]+\.[0-9]+', '<IP>', 'g') AS redacted
        |FROM pii ORDER BY doc_id""".stripMargin,
    "q_dedup_url" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.Example-' || CAST(doc_id % 20 AS VARCHAR) ||
        |    '.COM:443/Docs/' || CAST(doc_id % 25 AS VARCHAR) ||
        |    '?b=' || CAST(doc_id % 3 AS VARCHAR) || '&utm_source=feed' ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '&a=' || CAST(doc_id % 4 AS VARCHAR) ELSE '' END ||
        |    '#sec' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |parts AS (SELECT doc_id, split_part(url, '#', 1) AS nofrag
        |  FROM urls),
        |comp AS (SELECT doc_id,
        |    lower(replace(regexp_extract(nofrag, '://([^/]+)', 1),
        |      ':443', '')) AS host,
        |    regexp_replace(split_part(
        |      regexp_extract(nofrag, '://[^/]+(/.*)', 1), '?', 1),
        |      '/$', '') AS path,
        |    array_to_string(list_sort(list_filter(
        |      string_split(split_part(
        |        regexp_extract(nofrag, '://[^/]+(/.*)', 1), '?', 2), '&'),
        |      x -> x NOT LIKE 'utm_%' AND x <> '')), '&') AS params
        |  FROM parts),
        |canon AS (SELECT doc_id, 'https://' || host || path ||
        |    CASE WHEN params <> '' THEN '?' || params ELSE '' END
        |    AS canonical_url
        |  FROM comp)
        |SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,
    // lag-window boundary detection over an exploded token stream —
    // equivalence with Spark's per-row higher-order form is the point;
    // BIGINT hash arithmetic both sides (INT32 would overflow at *29791)
    "q_text_cdc" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w,
        |    generate_subscripts(
        |      list_filter(string_split(text, ' '), x -> x <> ''), 1)
        |      AS idx
        |  FROM documents),
        |wh AS (
        |  SELECT doc_id, idx, w,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(w, ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (h, a) -> (h * 31 + a) % 1000003) AS BIGINT) AS wh
        |  FROM w),
        |r AS (
        |  SELECT doc_id, idx, w,
        |    (lag(wh, 3) OVER win * 29791 + lag(wh, 2) OVER win * 961 +
        |     lag(wh, 1) OVER win * 31 + wh) % 1000003 AS rh,
        |    max(idx) OVER (PARTITION BY doc_id) AS n
        |  FROM wh WINDOW win AS (PARTITION BY doc_id ORDER BY idx)),
        |b AS (
        |  SELECT doc_id, idx, w,
        |    CASE WHEN (idx >= 4 AND rh % 8 = 0) OR idx = n
        |      THEN 1 ELSE 0 END AS isb
        |  FROM r),
        |c AS (
        |  SELECT doc_id, idx, w,
        |    1 + COALESCE(sum(isb) OVER (PARTITION BY doc_id ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
        |  FROM b)
        |SELECT doc_id, CAST(cid AS INT) AS chunk_idx,
        |  CAST(COUNT(*) AS INT) AS n_words,
        |  string_agg(w, ' ' ORDER BY idx) AS chunk_text
        |FROM c GROUP BY doc_id, cid ORDER BY doc_id, chunk_idx""".stripMargin,
    // the explode→group form — equivalence with Spark's run-length
    // per-row form is exactly what this oracle pins
    "q_text_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars
        |  GROUP BY doc_id, ch),
        |tot AS (SELECT doc_id, sum(c) AS n FROM cc GROUP BY doc_id),
        |ce AS (SELECT cc.doc_id,
        |    round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 6)
        |      AS char_entropy
        |  FROM cc JOIN tot ON cc.doc_id = tot.doc_id
        |  GROUP BY cc.doc_id, n),
        |words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM words
        |  WHERE w <> '' GROUP BY doc_id, w),
        |wtot AS (SELECT doc_id, sum(c) AS n FROM wc GROUP BY doc_id),
        |we AS (SELECT wc.doc_id,
        |    round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)), 6)
        |      AS word_entropy
        |  FROM wc JOIN wtot ON wc.doc_id = wtot.doc_id
        |  GROUP BY wc.doc_id, n)
        |SELECT d.doc_id, char_entropy, word_entropy
        |FROM documents d
        |LEFT JOIN ce ON d.doc_id = ce.doc_id
        |LEFT JOIN we ON d.doc_id = we.doc_id
        |ORDER BY d.doc_id""".stripMargin,
  )
}
