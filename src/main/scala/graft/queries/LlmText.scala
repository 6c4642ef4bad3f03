package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SimHash64
import Tables._

/** Text-analysis + dedup operators over `documents` (SURVEY §2.C LLM
  * ops): exact dedup, minhash/simhash/n-gram near-dup, language ID,
  * quality scoring, token counting, fingerprinting, multimodal-column
  * plumbing. All shuffle-light: per-doc work is map-side; pair
  * generation is always blocked (band/bucket/prefix) — never an
  * unblocked O(n²) self-join, which is what survives a 100 TB corpus. */
object LlmText {

  private val enStop = Seq("the", "of", "and", "a", "to", "in", "is")
  private val esStop = Seq("el", "la", "de", "que", "y", "los", "un")
  private val deStop = Seq("der", "die", "und", "das", "ist", "ein", "zu")

  private def words(c: Column): Column = split(c, " ")

  private def stopHits(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(stops)))

  // ------------------------------------------------------------- dedup

  /** Exact dedup on normalized text, keep-lowest-doc_id (deterministic
    * keep-first). */
  private def qDedupExact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("norm")).orderBy(col("doc_id"))
    t(s, d, "documents")
      .withColumn("norm", lower(trim(col("text"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** 3-word shingles, distinct (shared by minhash + ngram jaccard). */
  private def shingled(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .withColumn("shingles", array_distinct(expr(
        "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))

  /** (doc_id, sig, band, bkey) rows: 16 seeded minhashes — hash each
    * shingle string ONCE, then derive all 16 signature minima in ONE
    * pass over the hash array via the native `graft_minhash16`
    * expression (the SQL `array_min(transform(...))×16` formulation
    * walked the array 16 times and allocated 16 transient arrays per
    * doc) — exploded into 4 bands of 4 rows each. */
  private def bandedSigs(sh: DataFrame): DataFrame =
    bandedSigsFromHashes(sh
      .withColumn("hs", transform(col("shingles"), x => xxhash64(x)))
      .select(col("doc_id"), col("hs")))

  /** [[bandedSigs]] over PRE-HASHED shingle arrays (doc_id, hs) — the
    * entry point for callers that already materialized the xxhash64
    * shingle table (q_dedup_eval's pooled-truth table): the signature
    * derivation is order-independent (minima), so feeding the same hash
    * sets yields the identical index without a second corpus
    * tokenize+hash pass. */
  private[queries] def bandedSigsFromHashes(hashed: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(hashed.sparkSession)
    hashed
      .withColumn("sig", expr("graft_minhash16(hs)"))
      .select(col("doc_id"), col("sig"),
        posexplode(array((0 until 4).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * 4 + 1, 4))): _*))
          .as(Seq("band", "bkey")))
  }

  /** Sig-agreement fraction between two 16-hash signatures. */
  private def sigAgreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), bb => bb)) / lit(16.0)

  /** Candidate pairs (a < b, sig agreement ≥ 0.5) from banded-signature
    * rows: pair generation only inside band buckets, never all-pairs. */
  private def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("bkey"), col("doc_id").as("a"),
      col("sig").as("sig_a"))
    val b = bands.select(col("band"), col("bkey"), col("doc_id").as("b"),
      col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey")).filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("est_sim", sigAgreement(col("sig_a"), col("sig_b")))
      .filter(col("est_sim") >= 0.5)
      .select(col("a"), col("b"), col("est_sim"))
  }

  /** MinHash+LSH candidate pairs from a pre-shingled input. Shared by
    * q_dedup_minhash and q_dedup_ngram (the verify stage reuses these
    * candidates instead of re-deriving them). */
  private def minhashCandidates(sh: DataFrame): DataFrame =
    candidatePairs(bandedSigs(sh))

  /** MinHash+LSH candidate pairs from pre-hashed shingle arrays —
    * identical output to [[minhashCandidates]] on the same corpus
    * (same hash sets → same minima → same bands). */
  private[queries] def minhashCandidatesFromHashes(
      hashed: DataFrame): DataFrame =
    candidatePairs(bandedSigsFromHashes(hashed))

  /** Incremental dedup — the shape that matters at 100 TB, where the
    * corpus is already deduped and only the DELTA is new: band the
    * delta, join it against the corpus band index (in production a
    * pre-materialized table — here derived in-query from the doc_id%5
    * split), and drop delta docs that near-dup any corpus doc (either
    * id order) or a lower-id delta doc. The corpus is never self-joined
    * again — per-batch cost tracks the delta size and its collision
    * count, not the corpus. xxhash-based → no DuckDB oracle; the spec
    * cross-checks the drop set against q_dedup_minhash's pair list. */
  private def qDedupIncremental(s: SparkSession, d: String): DataFrame = {
    // eager localCheckpoint, NOT persist: the banded-signature stage
    // feeds four branches (both sides of the corpus join, the
    // within-delta pair scan) — without materialization the
    // scan+shingle+hash pipeline re-runs per branch (same discipline as
    // qDedupNgram). Checkpoint blocks are RDD-level (ContextCleaner
    // reclaims them once unreferenced); Dataset.persist would sit in
    // the CacheManager until explicit unpersist (VERDICT r9).
    val bands = bandedSigs(shingled(s, d)).localCheckpoint(true)
    val corpus = bands.filter(col("doc_id") % 5 =!= 0)
    val delta = bands.filter(col("doc_id") % 5 === 0)
    val vsCorpus = delta
      .select(col("band"), col("bkey"), col("doc_id").as("x"),
        col("sig").as("sig_x"))
      .join(corpus.select(col("band"), col("bkey"), col("sig").as("sig_c")),
        Seq("band", "bkey"))
      .filter(sigAgreement(col("sig_x"), col("sig_c")) >= 0.5)
      .select(col("x")).distinct()
    val withinDelta = candidatePairs(delta).select(col("b").as("x")).distinct()
    val dropped = vsCorpus.union(withinDelta).distinct()
    // status for EVERY delta doc, including ones too short to shingle
    // (< 3 words — no shingles means nothing to collide with → kept)
    t(s, d, "documents").filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      .join(dropped, col("doc_id") === dropped("x"), "left_outer")
      .select(col("doc_id"),
        when(col("x").isNotNull, lit("dup")).otherwise(lit("kept"))
          .as("status"))
      .orderBy("doc_id")
  }

  private def qDedupMinhash(s: SparkSession, d: String): DataFrame =
    minhashCandidates(shingled(s, d)).orderBy("a", "b")

  /** Exact n-gram Jaccard over the minhash candidates (verify stage of
    * the dedup funnel: cheap LSH candidates → exact similarity). The
    * shingled input is eagerly checkpointed so the scan + shingling +
    * hashing runs once and feeds both the candidate stage and the exact
    * verify join, with no CacheManager entry left past the op. */
  private def qDedupNgram(s: SparkSession, d: String): DataFrame = {
    val sh = shingled(s, d).localCheckpoint(true)
    val cand = minhashCandidates(sh).select(col("a"), col("b"))
    cand
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sh_a")),
        Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sh_b")),
        Seq("b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("a", "b")
  }

  /** SimHash near-dup via the native Catalyst expression; pairs kept at
    * Hamming distance ≤ 6.
    *
    * Blocking is the pigeonhole standard: the 64 bits split into 7
    * disjoint blocks (10+9×6). A pair within distance 6 has ≤ 6
    * differing bits, which can dirty at most 6 of the 7 blocks — so the
    * pair agrees *exactly* on at least one block and collides in that
    * block's equi-join. Full recall by construction; a single prefix
    * block (the previous design) missed every pair whose differing bits
    * touched the prefix (~4/5 of random hamming-6 pairs). Cost is 7
    * same-shaped equi-joins via one posexplode — same shuffle class,
    * never all-pairs. */
  private def qDedupSimhash(s: SparkSession, d: String): DataFrame = {
    SimHash64.register(s)
    val h = t(s, d, "documents")
      .select(col("doc_id"), words(lower(col("text"))).as("ws"))
      .withColumn("sh", expr("simhash64(ws)"))
      .select(col("doc_id"), col("sh"))
    val widths = Seq(10, 9, 9, 9, 9, 9, 9)
    val offsets = widths.scanLeft(0)(_ + _).init
    val blocks = h.select(col("doc_id"), col("sh"),
      posexplode(array(widths.zip(offsets).map { case (wd, off) =>
        shiftrightunsigned(col("sh"), off).bitwiseAND(lit((1L << wd) - 1))
      }: _*)).as(Seq("blk", "bkey")))
    val a = blocks.select(col("blk"), col("bkey"), col("doc_id").as("a"),
      col("sh").as("sh_a"))
    val b = blocks.select(col("blk"), col("bkey"), col("doc_id").as("b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("blk", "bkey")).filter(col("a") < col("b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 6)
      .dropDuplicates("a", "b") // a ≤6 pair can collide in several blocks
      .select(col("a"), col("b"), col("hamming"))
      .orderBy("a", "b")
  }

  // ------------------------------------------------------ text analysis

  private def qTextStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("toks", size(words(col("text"))).cast("bigint"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("toks")).cast("double") / count(lit(1))).as("avg_tokens"))
      .orderBy("lang")

  private def qTextFilter(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("toks", size(words(col("text"))).cast("bigint"))
      .filter(col("n_chars").between(100, 400) &&
        col("lang").isInCollection(Seq("en", "es", "de")) &&
        (col("toks").cast("double") / col("n_chars")) > 0.1)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("toks"))
      .orderBy("doc_id")

  /** Stopword-lexicon language ID (n-gram heuristic class). The verdict
    * is a deterministic function of the text — orthogonal to the stored
    * `lang` label, which the query reports alongside for comparison. */
  private def qTextLangid(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", words(lower(col("text"))))
      .withColumn("en_n", stopHits(col("ws"), enStop))
      .withColumn("es_n", stopHits(col("ws"), esStop))
      .withColumn("de_n", stopHits(col("ws"), deStop))
      .withColumn("pred",
        when(col("en_n") >= col("es_n") && col("en_n") >= col("de_n"), "en")
          .when(col("es_n") >= col("de_n"), "es")
          .otherwise("de"))
      .select(col("doc_id"), col("lang"), col("pred"), col("en_n"),
        col("es_n"), col("de_n"))
      .orderBy("doc_id")

  /** Quality score: length window + stopword density + mean word length
    * (all integer-exact inputs → one deterministic double formula). */
  private def qTextQuality(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", words(lower(col("text"))))
      .withColumn("toks", size(col("ws")).cast("bigint"))
      .withColumn("stop_n", stopHits(col("ws"), enStop).cast("bigint"))
      .withColumn("len_ok",
        when(col("n_chars").between(150, 600), 1.0).otherwise(0.0))
      .withColumn("stop_ratio",
        col("stop_n").cast("double") / col("toks"))
      .withColumn("mean_wlen",
        (col("n_chars") - col("toks") + 1).cast("double") / col("toks"))
      .withColumn("wlen_ok",
        when(col("mean_wlen") >= 3.0 && col("mean_wlen") <= 8.0, 1.0)
          .otherwise(0.0))
      .withColumn("quality",
        col("len_ok") * 0.4 + least(col("stop_ratio") * lit(5.0), lit(1.0)) * 0.3 +
          col("wlen_ok") * 0.3)
      .select(col("doc_id"), col("toks"), col("stop_n"), col("len_ok"),
        round(col("stop_ratio"), 6).as("stop_ratio"), col("wlen_ok"),
        round(col("quality"), 6).as("quality"))
      .orderBy("doc_id")

  /** TF-IDF top-3 terms per document. Term counts are LINEAR in doc
    * length: explode the token stream once, then one hash aggregate on
    * (doc_id, w) with map-side partial combine — per-row cost O(tokens),
    * not O(distinct×tokens) (a 100k-token document costs 100k aggregate
    * probes, never 10⁹ array comparisons). Document frequency derives
    * from that same aggregate and joins back with a plain SHUFFLE join
    * on `w` — the same vocabulary story as q_text_unigram_lm
    * (LlmText3): on web-scale noisy text the distinct-token set
    * (garbled strings, random ids, binary spill) grows with the corpus
    * and has no safe broadcast bound, and unlike stopword/boilerplate
    * vocabularies there is no df-threshold that prunes it (a SINGLETON
    * term is exactly the one with maximal IDF, so df ≥ 2 filtering
    * would drop the terms most likely to rank top-3). The join is
    * keyed by the column the dfreq aggregate already hashed on, so the
    * planner reuses that exchange; AQE skew-splits hot tokens. Corpus
    * size joins in as a broadcast 1-row aggregate (no driver scalar).
    * Corpus shuffles: the (doc_id, w) hash agg + the w-keyed
    * dfreq join + the per-doc top-3 window. Scores are exact-int
    * ratios × ln of exact-int ratios (6-dp pre-round keeps ranking
    * portable). */
  private def qTextTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents").filter(col("doc_id") < 200)
    // (doc_id, w, cnt, toks): one explode, one hash aggregate. toks is
    // functionally dependent on doc_id so grouping by it is free.
    // Eagerly checkpointed because BOTH consumers below (tf scores and
    // document frequency) re-aggregate it — the MLlib-IDF discipline:
    // tokenize the corpus once, materialize the (doc, term) table, run
    // the two cheap follow-up aggregates over the materialized form
    // instead of re-tokenizing per consumer (column pruning specializes
    // the two subplans, so exchange reuse can never dedupe them
    // unaided). localCheckpoint, not persist: RDD-level blocks the
    // ContextCleaner reclaims, no CacheManager entry past the op
    // (VERDICT r9).
    val wc = docs
      .withColumn("ws", words(lower(col("text"))))
      .withColumn("toks", size(col("ws")).cast("bigint"))
      .select(col("doc_id"), col("toks"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("toks"), col("w"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val dfreq = wc.groupBy(col("w")).agg(count(lit(1)).as("dfreq"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = wc.join(dfreq.hint("shuffle_hash"), "w")
      .crossJoin(broadcast(n))
      .withColumn("score", round(
        (col("cnt").cast("double") / col("toks")) *
          log((col("n_docs") + 1).cast("double") / (col("dfreq") + 1)), 6))
    val wnd = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("w").asc)
    scored.withColumn("rnk", row_number().over(wnd)).filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("w"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** Token counting: whitespace tokens + a BPE-ish alnum-run split. */
  private def qTextTokens(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws_toks", size(words(col("text"))).cast("bigint"))
      .withColumn("bpe_toks",
        size(filter(split(col("text"), "[^a-zA-Z0-9]+"),
          x => length(x) > 0)).cast("bigint"))
      .select(col("doc_id"), col("ws_toks"), col("bpe_toks"),
        (col("bpe_toks").cast("double") * 100.0 / col("n_chars"))
          .as("toks_per_100c"))
      .orderBy("doc_id")

  /** Document fingerprints: order-sensitive rolling hash (xxhash64
    * chain — ANSI-safe, no overflow) + min-shingle hash. xxhash64 has no
    * DuckDB equivalent → ScalaTest-verified, no oracle. */
  private def qTextFingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", words(col("text")))
      .withColumn("poly_fp", expr(
        "aggregate(ws, 0L, (acc, w) -> xxhash64(acc, w))"))
      .withColumn("min_fp",
        array_min(transform(col("ws"), w => xxhash64(w))))
      .select(col("doc_id"), col("poly_fp"), col("min_fp"))
      .orderBy("doc_id")

  /** Context-window chunking: 100-char windows with 20-char overlap
    * (stride 80) — the standard long-document preprocessing step. Pure
    * generator: posexplode over a computed index sequence, no shuffle. */
  private def qTextChunk(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").filter(col("doc_id") < 100)
      .withColumn("n_chunks",
        greatest(ceil((col("n_chars") - lit(20)) / lit(80.0)), lit(1))
          .cast("int"))
      .select(col("doc_id"), col("text"),
        posexplode(expr("sequence(0, n_chunks - 1)")).as(Seq("k", "idx")))
      .select(col("doc_id"), col("idx").cast("int").as("chunk_idx"),
        expr("substring(text, idx * 80 + 1, 100)").as("chunk"),
        length(expr("substring(text, idx * 80 + 1, 100)")).cast("int")
          .as("chunk_len"))
      .orderBy("doc_id", "chunk_idx")

  /** Greedy sequence packing: documents in doc_id order accumulate into
    * 4096-token bins (bin = floor of the pre-document running total /
    * budget) — how training examples get packed into fixed context
    * windows.
    *
    * The running total is a two-phase prefix sum, NOT a global
    * `Window.orderBy` (which funnels the whole corpus through one task —
    * the one outright scale-killer flagged at 100 TB): documents
    * range-bucket by doc_id, each bucket cumsums locally under a
    * *partitioned* window, bucket subtotals (≤ 32 rows) turn into prefix
    * offsets via a tiny self-join, and the broadcast offsets shift each
    * bucket's local cumsum. Identical output, no single-partition
    * exchange anywhere (PlanSpec gates this). */
  private def qTextPack(s: SparkSession, d: String): DataFrame = {
    val nb = 32 // range buckets; the offset table stays ≤ nb rows
    val docs = t(s, d, "documents")
      .withColumn("toks", size(words(col("text"))).cast("bigint"))
      .select(col("doc_id"), col("toks"))
    val bounds = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
    // integer-div bucket arithmetic: safe for doc_ids up to Long range
    // (no multiply that could overflow under ANSI)
    val bucketed = docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(s"(doc_id - lo) div ((hi - lo) div $nb + 1)"))
    val localW = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("lcum", sum(col("toks")).over(localW))
    val totals = bucketed.groupBy(col("bucket")).agg(sum(col("toks")).as("btot"))
    val prior = totals.select(col("bucket").as("pb"), col("btot").as("ptot"))
    val offsets = totals.join(prior, col("pb") < col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("ptot")), lit(0L)).as("off"))
    local.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", col("off") + col("lcum"))
      // explicit floor: DuckDB CAST(double AS BIGINT) rounds-to-nearest
      // while Spark truncates — floor is the portable form
      .withColumn("bin", floor((col("cum") - col("toks")) / lit(4096.0))
        .cast("bigint"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  // ------------------------------------------------- multimodal columns

  /** Multimodal metadata over an opaque binary column (text bytes stand
    * in for image/audio payloads — the container has no media libs). */
  private def qMmMeta(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("bigint").as("n_bytes"),
        md5(col("payload")).as("digest"))
      .orderBy("doc_id")

  /** Image-metadata decode over an opaque binary column. The decoder is
    * a REAL byte-format parser (graft.functions.ImageHeader): PNG/GIF/BMP
    * headers parsed with pure byte arithmetic — signature check, then
    * width/height at the spec offsets (big-endian IHDR for PNG, LE u16
    * screen descriptor for GIF, LE i32 info header for BMP). The corpus
    * has no media files, so each task synthesizes a spec-correct header
    * (format by doc_id mod 3, dims derived from doc_id/n_chars — PNG
    * includes its genuine IHDR CRC32) and the parser decodes it back;
    * the DuckDB oracle recomputes the expected metadata arithmetically,
    * so a parser regression hash-mismatches. Executes as batched
    * mapPartitions — binary in, typed metadata schema out — the exact
    * shape a vectorized pixel decoder would keep at 100 TB. */
  private def qMmDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.ImageHeader
    val src = t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { batch =>
      batch.map { case (id, nChars) =>
        val w = 64 + (id % 448).toInt
        val h = 64 + (nChars % 448).toInt
        val payload = (id % 3) match {
          case 0 => ImageHeader.png(w, h)
          case 1 => ImageHeader.gif(w, h)
          case _ => ImageHeader.bmp(w, h)
        }
        val m = ImageHeader.parse(payload).getOrElse(
          ImageHeader.Meta("raw", 0, 0))
        (id, m.format, m.width, m.height, m.width.toLong * m.height)
      }
    }.toDF("doc_id", "format", "width", "height", "n_pixels")
      .orderBy("doc_id")
  }

  /** Frame sampling over an animated-GIF block stream: each task
    * synthesizes a spec-correct multi-frame GIF (frame count/dims derived
    * from doc_id/n_chars), walks its real block structure — 0x2C image
    * descriptors, 0x21 extension sub-blocks, 0x3B trailer — with the
    * lib-free parser (graft.functions.ImageHeader.gifFrames), and keeps
    * every 4th frame. Batched mapPartitions + flatMap: one video-ish
    * binary in, a typed frame row per sample out — the distributed shape
    * a real ffmpeg-backed sampler would keep; the DuckDB oracle
    * recomputes the expected frames arithmetically, so a block-walk bug
    * hash-mismatches. */
  private def qMmFramesample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.ImageHeader
    val src = t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
    src.mapPartitions { batch =>
      batch.flatMap { case (id, nChars) =>
        val n = 1 + (nChars % 12).toInt
        val dims = (0 until n).map(i =>
          (16 + ((id + i) % 32).toInt, 16 + ((nChars + i) % 24).toInt))
        val payload = ImageHeader.animatedGif(320, 240, dims)
        ImageHeader.gifFrames(payload)
          .filter(_.index % 4 == 0)
          .map(f => (id, f.index, f.width, f.height))
      }
    }.toDF("doc_id", "frame_idx", "width", "height")
      .orderBy("doc_id", "frame_idx")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_dedup_ngram" -> (qDedupNgram _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_text_stats" -> (qTextStats _),
    "q_text_filter" -> (qTextFilter _),
    "q_text_langid" -> (qTextLangid _),
    "q_text_quality" -> (qTextQuality _),
    "q_text_tokens" -> (qTextTokens _),
    "q_text_tfidf" -> (qTextTfidf _),
    "q_text_chunk" -> (qTextChunk _),
    "q_text_pack" -> (qTextPack _),
    "q_text_fingerprint" -> (qTextFingerprint _),
    "q_mm_meta" -> (qMmMeta _),
    "q_mm_decode" -> (qMmDecode _),
    "q_mm_framesample" -> (qMmFramesample _),
  )

  private def stopSql(stops: Seq[String]): String =
    stops.map(w => s"'$w'").mkString(", ")

  val sql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lower(trim(text)) ORDER BY doc_id) AS rn
        |  FROM documents) z
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_filter" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |FROM documents
        |WHERE n_chars BETWEEN 100 AND 400 AND lang IN ('en', 'es', 'de')
        |  AND CAST(len(string_split(text, ' ')) AS DOUBLE) / n_chars > 0.1
        |ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""WITH z AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(ws, w -> w IN (${stopSql(enStop)}))) AS INT) AS en_n,
        |  CAST(len(list_filter(ws, w -> w IN (${stopSql(esStop)}))) AS INT) AS es_n,
        |  CAST(len(list_filter(ws, w -> w IN (${stopSql(deStop)}))) AS INT) AS de_n
        |  FROM z)
        |SELECT doc_id, lang,
        |  CASE WHEN en_n >= es_n AND en_n >= de_n THEN 'en'
        |       WHEN es_n >= de_n THEN 'es' ELSE 'de' END AS pred,
        |  en_n, es_n, de_n
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH z AS (
        |  SELECT doc_id, n_chars, string_split(lower(text), ' ') AS ws FROM documents),
        |m AS (SELECT doc_id, n_chars,
        |  CAST(len(ws) AS BIGINT) AS toks,
        |  CAST(len(list_filter(ws, w -> w IN (${stopSql(enStop)}))) AS BIGINT) AS stop_n
        |  FROM z),
        |f AS (SELECT doc_id, toks, stop_n,
        |  CASE WHEN n_chars BETWEEN 150 AND 600 THEN 1.0 ELSE 0.0 END AS len_ok,
        |  CAST(stop_n AS DOUBLE) / toks AS stop_ratio,
        |  CAST(n_chars - toks + 1 AS DOUBLE) / toks AS mean_wlen
        |  FROM m)
        |SELECT doc_id, toks, stop_n, len_ok, ROUND(stop_ratio, 6) AS stop_ratio,
        |  CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 8.0 THEN 1.0 ELSE 0.0 END AS wlen_ok,
        |  ROUND(len_ok * 0.4 + least(stop_ratio * 5.0, 1.0) * 0.3 +
        |    (CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 8.0 THEN 1.0 ELSE 0.0 END) * 0.3, 6) AS quality
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_toks,
        |  CAST(len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
        |    x -> len(x) > 0)) AS BIGINT) AS bpe_toks,
        |  CAST(len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
        |    x -> len(x) > 0)) AS DOUBLE) * 100.0 / n_chars AS toks_per_100c
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_tfidf" ->
      """WITH docs AS (SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id < 200),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM docs),
        |wc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
        |dlen AS (SELECT doc_id, COUNT(*) AS toks FROM toks GROUP BY 1),
        |dfreq AS (SELECT w, COUNT(*) AS dfreq FROM wc GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM docs),
        |scored AS (
        |  SELECT wc.doc_id, wc.w,
        |    ROUND((CAST(cnt AS DOUBLE) / toks) *
        |          ln(CAST(n_docs + 1 AS DOUBLE) / (dfreq + 1)), 6) AS score
        |  FROM wc JOIN dlen USING (doc_id) JOIN dfreq USING (w) CROSS JOIN n),
        |r AS (SELECT doc_id, w, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, w ASC) AS INT) AS rnk
        |      FROM scored)
        |SELECT doc_id, rnk, w, score FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "q_text_chunk" ->
      """WITH d AS (SELECT doc_id, text,
        |  CAST(greatest(ceil((n_chars - 20) / 80.0), 1) AS INT) AS n_chunks
        |  FROM documents WHERE doc_id < 100),
        |z AS (SELECT doc_id, text,
        |        unnest(range(0, n_chunks)) AS idx FROM d)
        |SELECT doc_id, CAST(idx AS INT) AS chunk_idx,
        |  substring(text, CAST(idx * 80 + 1 AS INT), 100) AS chunk,
        |  CAST(length(substring(text, CAST(idx * 80 + 1 AS INT), 100)) AS INT) AS chunk_len
        |FROM z ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS toks FROM documents),
        |c AS (SELECT doc_id, toks,
        |  SUM(toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
        |SELECT CAST(floor((cum - toks) / 4096.0) AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the Spark side round-trips real PNG/GIF/BMP header bytes through the
    // ImageHeader parser; the oracle recomputes the metadata directly, so
    // any parse/offset/endianness bug in the decoder hash-mismatches
    "q_mm_decode" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'bmp' END AS format,
        |  CAST(64 + doc_id % 448 AS INT) AS width,
        |  CAST(64 + n_chars % 448 AS INT) AS height,
        |  CAST((64 + doc_id % 448) * (64 + n_chars % 448) AS BIGINT) AS n_pixels
        |FROM documents ORDER BY doc_id""".stripMargin,
    // every 4th frame of a synthesized (1 + n_chars%12)-frame GIF whose
    // per-frame dims the Spark side reads back out of real descriptor bytes
    "q_mm_framesample" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |  CAST(16 + (doc_id + i) % 32 AS INT) AS width,
        |  CAST(16 + (n_chars + i) % 24 AS INT) AS height
        |FROM (SELECT doc_id, n_chars,
        |        unnest(range(0, 1 + n_chars % 12)) AS i
        |      FROM documents)
        |WHERE i % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
