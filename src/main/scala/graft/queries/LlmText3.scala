package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Third LLM-pipeline wave: benchmark decontamination, repetition-based
  * quality signals (Gopher-style), corpus-adaptive boilerplate removal,
  * URL parsing, and audio (WAV/RIFF) metadata extraction.
  *
  * Scale notes: repetition and URL ops are per-row, shuffle-free, and
  * whole-stage codegen'd. Decontamination is the canonical funnel — the
  * eval-set shingle table is tiny by construction and broadcast, so the
  * 100 TB training side streams through one map-side join, never a
  * shuffle of the corpus. Boilerplate removal exploits a counting bound:
  * a token with document frequency > 50% must appear in > n/2 docs, so
  * (by sum-of-df ≤ n × avg-distinct-per-doc) at most 2 × avg-distinct
  * tokens can qualify — the "common" set is broadcastable at any corpus
  * size. Audio metadata is batched mapPartitions over opaque binary, the
  * same distributed shape as q_mm_decode. */
object LlmText3 {

  /** Unigram-LM quality scoring — the corpus-trained language-model
    * scorer behind perplexity-style quality filters: train a unigram LM
    * on the corpus itself (Laplace-smoothed p(w) = (c+1)/(T+V)), score
    * each document by its average negative log-likelihood. Common-word
    * documents score low, rare/garbled ones high.
    *
    * Scale shape: the vocabulary joins back onto the exploded token
    * stream with a plain SHUFFLE join on `w` — on web-scale noisy text
    * the distinct-token set (garbled strings included) is effectively
    * unbounded, so a vocabulary broadcast has no safe size; the shuffle
    * join is keyed by the same column the vocab aggregate already
    * hashed on, spills, and AQE skew-splits hot tokens. The per-doc
    * reduce is a partial-agg'd one-row-per-doc shuffle. Determinism:
    * each token's log-prob is rounded to 9 dp and summed in DECIMAL
    * (exact, order-independent — a double sum would depend on summation
    * order and differ between engines). */
  private def qTextUnigramLm(s: SparkSession, d: String): DataFrame = {
    val tok = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = tok.agg(count(lit(1)).cast("double").as("T"))
      .crossJoin(vocab.agg(count(lit(1)).cast("double").as("V")))
    tok.join(vocab.hint("shuffle_hash"), "w")
      .crossJoin(broadcast(totals))
      .withColumn("lp", expr(
        "cast(round(ln((c + 1.0) / (T + V)), 9) as decimal(18,9))"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lp")).as("s"), count(lit(1)).as("n_toks"))
      .select(col("doc_id"), col("n_toks"),
        round(-(col("s").cast("double")) / col("n_toks"), 6).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** Perceptual-hash image near-dup — pixel-level multimodal dedup:
    * each document's 32×32 grayscale 24-bpp BMP is SCANNED from the
    * binaryFile-ingested payload table ([[MmPayloads]] — groups of 5
    * consecutive doc_ids share a base pattern, variants get one-pixel
    * edits → true near-dups), the REAL BMP pixel decoder
    * (`ImageHeader.bmpGray` — bfOffBits, bottom-up
    * rows, 4-byte stride) recovers the raster, and a 64-bit dHash
    * (9×8 block-mean gradient sign) fingerprints it. A one-pixel edit
    * moves one block mean → ≤2 hash bits, so within-group pairs sit at
    * hamming ≤4 while unrelated patterns scatter ~32.
    *
    * The fingerprint is 128 bits — dHash of the image ‖ dHash of its
    * TRANSPOSE (vertical gradients): the second word costs nothing extra
    * (the raster is already decoded) and doubles the bits available to
    * the blocking stage. Pair generation is pigeonhole-blocked for
    * hamming ≤ 8: the 128 bits split into 9 disjoint blocks (4×16 from
    * the horizontal word, 13+13+13+13+12 from the vertical); ≤8
    * differing bits dirty ≤8 blocks, so every qualifying pair agrees
    * exactly on ≥1 block and collides in that equi-join — full recall,
    * never an O(n²) self-join. Per-block key space is 2¹²–2¹⁶ (vs 2⁷–2⁸
    * for 9 blocks of a 64-bit hash), so on dispersed hashes candidate
    * volume drops ~2⁶ per block — the difference between workable and
    * quadratic at billions of images. Hashing is batched mapPartitions
    * (binary in, 16 hash bytes out: at 100 TB only hashes and ids ever
    * shuffle, never pixels). xxhash-free and deterministic; no SQL
    * oracle (pixel decode + bit blocks are not DuckDB-expressible) →
    * structural ScalaTest. */
  private def qMmPhash(s: SparkSession, d: String): DataFrame =
    phashPairs(s, d).orderBy("a", "b")

  /** The blocked near-dup pair table behind q_mm_phash — also consumed
    * by q_mm_dedup (Mm2), which clusters these pairs into dedup groups. */
  private[queries] def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.ImageHeader
    // Scan the ingest-once binary payload table (r11 — bytes enter via
    // a real binaryFile ingest of on-disk .bmp artifacts, MmPayloads)
    // and repartition BEFORE the decode stage: parquet file count would
    // otherwise cap the pixel-decode parallelism (idle cpu/wall ≈1.5 on
    // 32 cores at sf0.1). At 100 TB only ids + 16 hash bytes leave this
    // stage — pixels never shuffle past the decode.
    val hashed = MmPayloads.payloads(s, d).select(col("doc_id"), col("img"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[(Long, Array[Byte])].mapPartitions(_.map { case (id, img) =>
        val gray = ImageHeader.bmpGray(img).getOrElse(Array(Array(0)))
        (id, ImageHeader.dhash64(gray), ImageHeader.dhash64(gray.transpose))
      }).toDF("doc_id", "ph1", "ph2")
      // the blocking self-join reads this twice — checkpoint the tiny
      // (id, hash) table so pixels are synthesized/decoded exactly once
      .localCheckpoint(true)
    val blockCols: Seq[Column] =
      Seq((16, 0), (16, 16), (16, 32), (16, 48)).map { case (wd, off) =>
        shiftrightunsigned(col("ph1"), off).bitwiseAND(lit((1L << wd) - 1))
      } ++
      Seq((13, 0), (13, 13), (13, 26), (13, 39), (12, 52)).map {
        case (wd, off) =>
          shiftrightunsigned(col("ph2"), off).bitwiseAND(lit((1L << wd) - 1))
      }
    val blocks = hashed.select(col("doc_id"), col("ph1"), col("ph2"),
      posexplode(array(blockCols: _*)).as(Seq("blk", "bkey")))
    val a = blocks.select(col("blk"), col("bkey"), col("doc_id").as("a"),
      col("ph1").as("pa1"), col("ph2").as("pa2"))
    val b = blocks.select(col("blk"), col("bkey"), col("doc_id").as("b"),
      col("ph1").as("pb1"), col("ph2").as("pb2"))
    a.join(b, Seq("blk", "bkey")).filter(col("a") < col("b"))
      .withColumn("hamming",
        bit_count(col("pa1").bitwiseXOR(col("pb1"))) +
          bit_count(col("pa2").bitwiseXOR(col("pb2"))))
      .filter(col("hamming") <= 8)
      .dropDuplicates("a", "b")
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Training-mixture materialization: per-source sampling rates (2×
    * upsample / keep / 0.5 / 0.25 by source group) applied
    * deterministically — the integer part of the rate replicates rows
    * (explode over a sequence), the fractional part keeps a row iff its
    * md5 nibble-pair clears the rate threshold (uniform in 0..255,
    * engine-portable, reproducible run-to-run — a seeded `sample()`
    * is not, across engines). Map-only per row; no shuffle except the
    * presentation sort. At 100 TB this is how a weighted data mixture
    * ships to training without ever materializing an intermediate
    * shuffled copy. */
  private def qSampleMixture(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("grp", expr("cast(substring(source, 4) as int) % 4"))
      .withColumn("rate", expr(
        "CASE grp WHEN 0 THEN 2.0D WHEN 1 THEN 1.0D WHEN 2 THEN 0.5D" +
          " ELSE 0.25D END"))
      .withColumn("u", expr("substring(md5(cast(doc_id as string)), 1, 2)"))
      .withColumn("n_copies", expr(
        """cast(floor(rate) as int) +
          | IF(u < CASE grp WHEN 2 THEN '80' WHEN 3 THEN '40' ELSE '00' END,
          |    1, 0)""".stripMargin))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("rate"),
        explode(expr("sequence(1, n_copies)")).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")

  /** Data-quality expectations — the pre-training corpus gate: seven
    * constraint metrics (null/empty text, char-count range, language
    * domain, n_chars↔length consistency, doc_id uniqueness) computed in
    * ONE aggregation pass (count_if row-level checks share the scan;
    * the distinct-count rides the same partial-agg shuffle via Spark's
    * Expand), then unpivoted to a constant-size (check, violations,
    * pass) report. At 100 TB this is one corpus scan regardless of how
    * many expectations are declared — the shape that matters vs one
    * pass per check. */
  private def qQualityExpectations(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .agg(
        expr("cast(count(*) as bigint)").as("n_rows"),
        expr("cast(count_if(text IS NULL) as bigint)").as("null_text"),
        expr("cast(count_if(length(trim(text)) = 0) as bigint)")
          .as("empty_text"),
        expr("cast(count_if(n_chars < 1 OR n_chars > 100000) as bigint)")
          .as("chars_range"),
        expr("cast(count_if(lang NOT IN ('de','en','es','fr','zh')) as bigint)")
          .as("lang_domain"),
        expr("cast(count_if(n_chars <> length(text)) as bigint)")
          .as("chars_consistent"),
        expr("cast(count(*) - count(DISTINCT doc_id) as bigint)")
          .as("dup_doc_id"))
      .selectExpr("n_rows",
        """stack(6,
          |  'chars_consistent', chars_consistent,
          |  'chars_range', chars_range,
          |  'dup_doc_id', dup_doc_id,
          |  'empty_text', empty_text,
          |  'lang_domain', lang_domain,
          |  'null_text', null_text) AS (check_name, n_violations)"""
          .stripMargin)
      .select(col("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"), col("n_rows"))
      .orderBy("check_name")

  /** Leakage-proof train/holdout split: the split key is the CONTENT
    * fingerprint (md5 of whitespace-normalized text), not the doc id, so
    * byte-identical duplicates can never straddle the boundary and leak
    * eval data into training — the assignment mistake dedup-then-split
    * pipelines make when they split first. First hex nibble ≤ 'b' →
    * train (12/16 = 75%); deterministic, uniform, and engine-portable
    * (both engines emit lowercase-hex md5 over the same utf8 bytes).
    * Map-only assignment + one aggregation shuffle; no corpus-size
    * state anywhere. */
  private def qSplitHoldout(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ck", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("split",
        when(substring(col("ck"), 1, 1) <= "b", "train")
          .otherwise("holdout"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("ck")).as("n_groups"),
        sum(col("n_chars")).as("chars"))
      .orderBy("split", "lang")

  /** Benchmark decontamination: flag training documents sharing any
    * 8-token shingle with the held-out eval set (docs with
    * doc_id % 97 == 0 stand in for a benchmark). The eval shingle set is
    * distinct'd (small — eval sets are thousands of docs, not billions)
    * and broadcast; training shingles stream through a map-side
    * broadcast join. Output: contaminated doc ids + overlap counts.
    *
    * The corpus is the documents table plus PLANTED contamination: each
    * eval doc's text re-enters as a training doc under doc_id + 1000000
    * (1000000 % 97 = 27, so planted ids are never eval ids). The
    * synthetic corpus has no natural 8-shingle cross-doc overlap at any
    * test SF, so without planting the result is empty and its
    * hash-match is vacuous — any bug yielding zero rows would "pass".
    * With planting, every eval doc of ≥ 8 tokens is guaranteed to
    * contaminate exactly its planted twin (6 docs at sf0.01), the way a
    * leaked benchmark actually shows up in a crawl. */
  private def qTextDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.unionAll(
      docs.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val grams = corpus
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 8
          |  THEN transform(sequence(1, size(ws) - 7),
          |                 i -> array_join(slice(ws, i, 8), ' '))
          |  ELSE array() END""".stripMargin)).as("g8"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0)
      .select("g8").distinct()
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), "g8")
      .groupBy("doc_id")
      .agg(countDistinct(col("g8")).as("n_overlap"))
      .orderBy("doc_id")
  }

  /** Repetition signals (Gopher-style quality filtering): duplicate-token
    * and duplicate-bigram fractions plus the most-frequent-token/bigram
    * share. Computed entirely per-row with nested higher-order functions
    * (distinct tokens × membership count) — zero shuffles, so the op maps
    * over 100 TB at scan speed; the O(distinct × tokens) inner loop is
    * bounded by document length, not corpus size. */
  private def qTextRepetition(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("bg", expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin))
      .withColumn("top_tok", expr(
        "array_max(transform(array_distinct(ws), x -> size(filter(ws, w -> w = x))))"))
      .withColumn("top_bg", expr(
        "array_max(transform(array_distinct(bg), x -> size(filter(bg, b -> b = x))))"))
      .select(col("doc_id"),
        size(col("ws")).cast("bigint").as("n_tokens"),
        round(lit(1.0) - size(array_distinct(col("ws"))).cast("double") /
          size(col("ws")), 6).as("dup_token_ratio"),
        round(col("top_tok").cast("double") / size(col("ws")), 6)
          .as("top_token_share"),
        // single-token docs have no bigrams; ANSI mode (Spark 4 default)
        // turns the /0 into an error, so the ratios are explicitly NULL
        when(size(col("bg")) > 0,
          round(lit(1.0) - size(array_distinct(col("bg"))).cast("double") /
            size(col("bg")), 6)).as("dup_bigram_ratio"),
        when(size(col("bg")) > 0,
          round(col("top_bg").cast("double") / size(col("bg")), 6))
          .as("top_bigram_share"))
      .orderBy("doc_id")

  /** Corpus-adaptive boilerplate removal (C4-style): drop tokens whose
    * document frequency exceeds 50% of the corpus. The high-DF vocabulary
    * is provably small (≤ 2 × avg distinct tokens per doc, see object
    * doc), so it collects to one array and broadcasts; the rewrite pass
    * is then per-row. Two tiny aggregates + one map over the corpus. */
  private def qTextBoilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfTab = docs
      .select(col("doc_id"), explode(array_distinct(col("ws"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val common = dfTab.crossJoin(broadcast(nDocs))
      .filter(col("df") * 2 > col("n_docs"))
      .agg(sort_array(collect_list(col("tok"))).as("common"))
    docs.crossJoin(broadcast(common))
      .select(col("doc_id"),
        expr("array_join(filter(ws, w -> NOT array_contains(common, w)), ' ')")
          .as("kept"),
        expr("""cast(size(ws) -
                |size(filter(ws, w -> NOT array_contains(common, w))) as int)"""
          .stripMargin).as("n_removed"))
      .orderBy("doc_id")
  }

  /** URL parsing with Spark's codegen'd parse_url (host/path/query and a
    * single query parameter): the normalization step before per-domain
    * grouping or URL-based dedup. URLs are synthesized from document
    * fields so the DuckDB oracle can recompute every component
    * arithmetically — a parse_url semantics drift hash-mismatches. */
  private def qFnUrl(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("url", concat(lit("https://"), col("source"),
        lit(".example.org/"), col("lang"), lit("/doc/"), col("doc_id"),
        lit("?ref="), col("doc_id") % 7, lit("&v=2")))
      .select(col("doc_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
      .orderBy("doc_id")

  /** Audio metadata over an opaque binary column: each task synthesizes a
    * spec-correct PCM WAV (rate/channels/frames derived from doc fields,
    * with a LIST/INFO chunk before data so parsing must walk the RIFF
    * chunk stream) and the lib-free parser (graft.functions.AudioHeader)
    * reads the fields back out of the real byte layout. Batched
    * mapPartitions — binary in, typed metadata out — the shape a real
    * soundfile-backed extractor keeps at 100 TB. The DuckDB oracle
    * recomputes the expected metadata arithmetically, so any chunk-walk /
    * endianness / alignment bug hash-mismatches. */
  private def qMmAudioMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.AudioHeader
    val src = t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { batch =>
      batch.map { case (id, nChars) =>
        val rate = 8000 << (id % 3).toInt
        val channels = 1 + (id % 2).toInt
        val frames = 100 + (nChars % 900).toInt
        val payload = AudioHeader.wav(channels, rate, 16, frames)
        val m = AudioHeader.parse(payload).getOrElse(
          AudioHeader.Meta(0, 1, 0, 0L, 0L))
        (id, m.channels, m.sampleRate, m.bitsPerSample, m.nFrames,
          m.durationMs)
      }
    }.toDF("doc_id", "channels", "sample_rate", "bits_per_sample",
        "n_frames", "duration_ms")
      .orderBy("doc_id")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_quality_expectations" -> (qQualityExpectations _),
    "q_sample_mixture" -> (qSampleMixture _),
    "q_mm_phash" -> (qMmPhash _),
    "q_text_unigram_lm" -> (qTextUnigramLm _),
    "q_split_holdout" -> (qSplitHoldout _),
    "q_text_decontaminate" -> (qTextDecontaminate _),
    "q_text_repetition" -> (qTextRepetition _),
    "q_text_boilerplate" -> (qTextBoilerplate _),
    "q_fn_url" -> (qFnUrl _),
    "q_mm_audio_meta" -> (qMmAudioMeta _),
  )

  val sql: Map[String, String] = Map(
    // per-token round(ln, 9) → DECIMAL sum: exact and order-independent
    // on both engines (ln IS natural log in DuckDB; log() is log10)
    "q_text_unigram_lm" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |v AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS T,
        |    CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS V FROM tok),
        |lp AS (SELECT t.doc_id,
        |    CAST(ROUND(ln((v.c + 1.0) / (tot.T + tot.V)), 9)
        |      AS DECIMAL(18,9)) AS lp
        |  FROM tok t JOIN v USING (w) CROSS JOIN tot),
        |agg AS (SELECT doc_id, SUM(lp) AS s, COUNT(*) AS n
        |  FROM lp GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_toks,
        |  ROUND(-CAST(s AS DOUBLE) / n, 6) AS avg_nll
        |FROM agg ORDER BY doc_id""".stripMargin,
    // rate literals land as DECIMAL in DuckDB's CASE — cast to DOUBLE;
    // unnest(range(...)) is the row-wise explode (1-based upper-exclusive)
    "q_sample_mixture" ->
      """WITH x AS (SELECT doc_id, source,
        |    CAST(substr(source, 4) AS INTEGER) % 4 AS grp,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS u
        |  FROM documents),
        |r AS (SELECT doc_id, source, grp,
        |    CASE grp WHEN 0 THEN 2.0 WHEN 1 THEN 1.0 WHEN 2 THEN 0.5
        |      ELSE 0.25 END AS rate,
        |    CAST(FLOOR(CASE grp WHEN 0 THEN 2.0 WHEN 1 THEN 1.0
        |        WHEN 2 THEN 0.5 ELSE 0.25 END) AS INTEGER)
        |      + CASE WHEN u < (CASE grp WHEN 2 THEN '80' WHEN 3 THEN '40'
        |          ELSE '00' END) THEN 1 ELSE 0 END AS n
        |  FROM x)
        |SELECT doc_id, source, CAST(rate AS DOUBLE) AS rate,
        |  CAST(unnest(range(1, n + 1)) AS INTEGER) AS copy_idx
        |FROM r WHERE n > 0
        |ORDER BY doc_id, copy_idx""".stripMargin,
    // COUNT(*) FILTER = Spark's count_if; every metric cast BIGINT on
    // both sides
    "q_quality_expectations" ->
      """WITH m AS (SELECT
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) FILTER (WHERE text IS NULL) AS BIGINT) AS null_text,
        |  CAST(COUNT(*) FILTER (WHERE length(trim(text)) = 0) AS BIGINT)
        |    AS empty_text,
        |  CAST(COUNT(*) FILTER (WHERE n_chars < 1 OR n_chars > 100000)
        |    AS BIGINT) AS chars_range,
        |  CAST(COUNT(*) FILTER (WHERE lang NOT IN
        |    ('de','en','es','fr','zh')) AS BIGINT) AS lang_domain,
        |  CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
        |    AS chars_consistent,
        |  CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS dup_doc_id
        |  FROM documents)
        |SELECT check_name, n_violations, n_violations = 0 AS pass, n_rows
        |FROM (
        |  SELECT 'chars_consistent' AS check_name,
        |         chars_consistent AS n_violations, n_rows FROM m
        |  UNION ALL SELECT 'chars_range', chars_range, n_rows FROM m
        |  UNION ALL SELECT 'dup_doc_id', dup_doc_id, n_rows FROM m
        |  UNION ALL SELECT 'empty_text', empty_text, n_rows FROM m
        |  UNION ALL SELECT 'lang_domain', lang_domain, n_rows FROM m
        |  UNION ALL SELECT 'null_text', null_text, n_rows FROM m)
        |ORDER BY check_name""".stripMargin,
    // SUM(BIGINT) widens to HUGEINT in DuckDB — cast back; 'g' flag =
    // replace-all (Spark's regexp_replace default)
    "q_split_holdout" ->
      """WITH k AS (SELECT lang, n_chars,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS ck
        |  FROM documents),
        |s AS (SELECT *, CASE WHEN substr(ck, 1, 1) <= 'b'
        |    THEN 'train' ELSE 'holdout' END AS split FROM k)
        |SELECT split, lang, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT ck) AS n_groups,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q_text_decontaminate" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 97 = 0),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
        |g AS (SELECT doc_id,
        |        unnest(CASE WHEN len(ws) >= 8
        |          THEN list_transform(range(1, len(ws) - 6),
        |                              i -> array_to_string(ws[i:i+7], ' '))
        |          ELSE [] END) AS g8
        |      FROM w),
        |e AS (SELECT DISTINCT g8 FROM g WHERE doc_id % 97 = 0)
        |SELECT g.doc_id, CAST(COUNT(DISTINCT g.g8) AS BIGINT) AS n_overlap
        |FROM g JOIN e USING (g8) WHERE g.doc_id % 97 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id, ws,
        |        CASE WHEN len(ws) >= 2
        |          THEN list_transform(range(1, len(ws)),
        |                              i -> ws[i] || ' ' || ws[i+1])
        |          ELSE [] END AS bg
        |      FROM w)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        |  round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6)
        |    AS dup_token_ratio,
        |  round(CAST(list_max(list_transform(list_distinct(ws),
        |      x -> len(list_filter(ws, w -> w = x)))) AS DOUBLE) / len(ws), 6)
        |    AS top_token_share,
        |  CASE WHEN len(bg) > 0 THEN
        |    round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
        |  END AS dup_bigram_ratio,
        |  CASE WHEN len(bg) > 0 THEN
        |    round(CAST(list_max(list_transform(list_distinct(bg),
        |      x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg), 6)
        |  END AS top_bigram_share
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_text_boilerplate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |d AS (SELECT doc_id, unnest(list_distinct(ws)) AS tok FROM w),
        |f AS (SELECT tok, COUNT(*) AS df FROM d GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |c AS (SELECT COALESCE(list(tok ORDER BY tok), []) AS common
        |      FROM f, n WHERE df * 2 > n_docs)
        |SELECT doc_id,
        |  -- DuckDB array_to_string of an empty list yields NULL; Spark's
        |  -- array_join yields '' — coalesce to the Spark semantics
        |  COALESCE(array_to_string(
        |    list_filter(ws, x -> NOT list_contains(c.common, x)), ' '),
        |    '') AS kept,
        |  CAST(len(ws) -
        |       len(list_filter(ws, x -> NOT list_contains(c.common, x)))
        |       AS INT) AS n_removed
        |FROM w, c ORDER BY doc_id""".stripMargin,
    "q_fn_url" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.org/' || lang || '/doc/' || doc_id
        |    || '?ref=' || (doc_id % 7) || '&v=2' AS url,
        |  source || '.example.org' AS host,
        |  '/' || lang || '/doc/' || doc_id AS path,
        |  'ref=' || (doc_id % 7) || '&v=2' AS query,
        |  CAST(doc_id % 7 AS VARCHAR) AS ref
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the Spark side round-trips real RIFF/WAVE bytes through the
    // AudioHeader chunk walker; the oracle recomputes the metadata
    // directly from the synthesis arithmetic
    "q_mm_audio_meta" ->
      """SELECT doc_id,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(8000 * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
        |       AS INT) AS sample_rate,
        |  CAST(16 AS INT) AS bits_per_sample,
        |  CAST(100 + n_chars % 900 AS BIGINT) AS n_frames,
        |  CAST((100 + n_chars % 900) * 1000 //
        |       (8000 * (CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END))
        |       AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
