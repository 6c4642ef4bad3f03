package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Non-oracled surface: real streaming semantics (watermark drops,
  * streaming dedup, arbitrary state), near-dup detection on crafted
  * fixtures, approximate aggregates' error bounds, sampling determinism
  * (SURVEY §5.B / FIXTURES §B.4). */
class StreamingLlmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val usBase = StreamingQ.t0 * 1000000L

  test("watermark drops the 55-min-late straggler, keeps on-time rows") {
    val rows = SparkEntry.queries("q_stream_watermark")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // window [0,5m): the late ev6 was dropped, so n=1 not 2
    assert(rows.toSeq == Seq(
      (usBase, 1L, 1L),
      (usBase + 300000000L, 2L, 2L),
      (usBase + 900000000L, 1L, 1L)))
  }

  test("streaming top-k: SpaceSaving bounds hold (true ≤ est ≤ true+err), " +
      "alpha leads, and every above-threshold item survives eviction") {
    val rows = SparkEntry.queries("q_stream_topk")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = Map("alpha" -> 10L, "beta" -> 5L, "gamma" -> 3L,
      "noise1" -> 1L, "noise2" -> 1L, "noise3" -> 1L, "noise4" -> 1L,
      "noise5" -> 1L)
    assert(rows.head._1 == "alpha" && rows.head._2 >= 10L,
      s"alpha must lead with est >= its true count 10: ${rows.toSeq}")
    rows.foreach { case (item, est, err) =>
      val t = truth(item)
      assert(est >= t && est - err <= t,
        s"SpaceSaving bound violated for $item: est=$est err=$err true=$t")
    }
    // the two genuinely frequent items can never be evicted at cap 4
    assert(rows.map(_._1).take(2).toSet == Set("alpha", "beta"),
      s"frequent items missing from the summary top-2: ${rows.toSeq}")
  }

  test("streaming quantiles: per-key digest state folds across batches " +
      "(exact at singleton-centroid n) and the latest emission wins") {
    val rows = SparkEntry.queries("q_stream_quantiles")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // uid 1 folded 1..9 across two batches: p50 = 5 (rank midpoint),
    // p95 lands in the max-endpoint segment = 9; uid 2 folded {10,30,20}
    assert(rows.toSeq == Seq((1L, 9L, 5.0, 9.0), (2L, 3L, 20.0, 30.0)),
      s"streaming quantiles wrong: ${rows.toSeq}")
  }

  test("streaming dedup emits each event_id once across batches") {
    val rows = SparkEntry.queries("q_stream_dedup")(spark, sf)
      .collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("transformWithState keeps RocksDB-backed running aggregates") {
    val rows = SparkEntry.queries("q_stream_tws")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // batch1: u1 {2.5, 0.5}, u2 {1.0}; batch2: u1 {3.0}, u3 {4.0}
    // append mode → one row per user per batch it appears in
    assert(rows.toSeq == Seq(
      (1L, 2L, 3.0), (1L, 3L, 6.0), (2L, 1L, 1.0), (3L, 1L, 4.0)))
  }

  test("flatMapGroupsWithState keeps running per-user counts across batches") {
    val rows = SparkEntry.queries("q_stream_stateful")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((1L, 0L, 2L), (1L, 2L, 3L), (2L, 0L, 1L),
      (3L, 0L, 1L)))
  }

  test("streaming CDC apply: upserts/deletes fold to latest state, a " +
      "stale replayed seq is rejected, and the transition log is exact") {
    def od(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val rows = SparkEntry.queries("q_stream_cdc_apply")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        od(r, 3), od(r, 4), r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      // key 1: upsert 1 → upsert 3 (batch 1); stale seq-2 replay
      // rejected without touching state; delete 4 applies
      (1L, 1L, "upsert", None, Some(1.0), true),
      (1L, 2L, "upsert", Some(3.0), Some(3.0), false),
      (1L, 3L, "upsert", Some(1.0), Some(3.0), true),
      (1L, 4L, "delete", Some(3.0), None, true),
      // key 2: upsert then delete
      (2L, 1L, "upsert", None, Some(5.0), true),
      (2L, 2L, "delete", Some(5.0), None, true),
      // key 3: delete of an absent key applies as a no-op transition
      (3L, 1L, "delete", None, None, true)), s"got: ${rows.toSeq}")
  }

  test("update-mode session agg: sessions merge and re-emit, the " +
      "watermark evicts closed state, late events cannot resurrect it") {
    val metrics = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    case class Phase(in: Long, removed: Long, total: Long)
    val phases = scala.collection.mutable.ArrayBuffer[Phase]()
    val log = StreamingQ.runSessionAgg(spark, q => {
      val p = Option(q.lastProgress)
      p.foreach { pr =>
        val so = pr.stateOperators
        if (so.nonEmpty)
          metrics += ((so(0).numRowsTotal, so(0).numRowsRemoved))
      }
      // r13: the observe() ledger — cumulative observed-in + evictions
      // against the live state size after each batch
      val ps = q.recentProgress.toSeq
      val in = ps
        .flatMap(p2 => Option(p2.observedMetrics.get("graft_sess_in")))
        .map(_.getAs[Long]("n_rows")).sum
      val led = ps.filter(_.stateOperators.nonEmpty)
        .map(p2 => (p2.stateOperators.map(_.numRowsRemoved).sum,
          p2.stateOperators.map(_.numRowsTotal).sum))
      phases += Phase(in, led.map(_._1).sum,
        led.lastOption.map(_._2).getOrElse(-1L))
    }).orderBy("user_id", "s_end", "finalized").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    def abs(off: Long) = usBase + off * 1000000L
    // the full update LOG: u1's session re-emitted after its batch-2
    // merge, then finalized by the batch-3 watermark; u2 updated once
    // (batch 1), finalized in batch 3, and its straggler changed
    // NOTHING (no post-eviction update, no resurrected session)
    assert(log.toSeq == Seq(
      (1L, abs(0), abs(1860), 2L, false),
      (1L, abs(0), abs(2100), 3L, false),
      (1L, abs(0), abs(2100), 3L, true),
      (2L, abs(100), abs(1900), 1L, false),
      (2L, abs(100), abs(1900), 1L, true),
      (3L, abs(7200), abs(9000), 1L, false),
      (3L, abs(7200), abs(9060), 2L, false)), s"got ${log.toSeq}")
    // state eviction: only u3's open session survives the final
    // watermark (+110 min); u1/u2's closed sessions were removed
    assert(metrics.nonEmpty)
    assert(metrics.last._1 == 1L,
      s"expected 1 surviving state row, got $metrics")
    assert(metrics.map(_._2).sum >= 2L,
      s"expected >= 2 evicted state rows, got $metrics")
    // r13: the state-size equation closes per batch — (in, evicted,
    // live state): b1 opens u1/u2; b2 merges u1, opens u3, AND evicts
    // u1/u2 — the +110min watermark advance triggers the timeout pass
    // in b2's trailing no-data micro-batch (included in b2's progress),
    // not in b3; b3's straggler adds NO state. Sessions ever created
    // (3 distinct users in the update log) − evicted (2) = final
    // state (1).
    assert(phases.toSeq == Seq(Phase(3, 0, 2), Phase(5, 2, 1),
      Phase(7, 2, 1)), s"session ledger: $phases")
    val created = log.map(_._1).distinct.length
    assert(created - phases.last.removed == phases.last.total,
      s"created $created - removed ${phases.last.removed} != " +
        s"total ${phases.last.total}")
  }

  /** Crafted near-dup corpus: doc 1 = base, 2 = one word changed,
    * 3 = exact duplicate of 1, 4 = unrelated. */
  private lazy val craftedDir: String = {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i")
      .mkString(" ")
    val other = (1 to 40).map(i => s"zzz$i").mkString(" ")
    val dir = Files.createTempDirectory("graft-dedup").toString
    Seq(
      (1L, base, "en", "srcA", base.length.toLong),
      (2L, near, "en", "srcA", near.length.toLong),
      (3L, base, "en", "srcB", base.length.toLong),
      (4L, other, "en", "srcA", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup eval: pooled-truth precision/recall of the LSH index " +
      "are high and the pool is non-degenerate") {
    val r = SparkEntry.queries("q_dedup_eval")(spark, sf).collect()
    assert(r.length == 1)
    val (nTruth, nPred) = (r(0).getLong(0), r(0).getLong(1))
    assert(nTruth > 0, "pooled truth is empty — nothing was measured")
    assert(nPred > 0, "LSH produced no candidates")
    assert(r(0).getDouble(3) >= 0.9, s"precision: ${r(0).getDouble(3)}")
    assert(r(0).getDouble(4) >= 0.9, s"recall: ${r(0).getDouble(4)}")
  }

  test("minhash LSH finds the near and exact dup, not the unrelated doc") {
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, craftedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), "exact dup must collide")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)),
      "one-word-off near dup must collide")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc must not pair")
  }

  test("ngram jaccard confirms candidates exactly") {
    val rows = SparkEntry.queries("q_dedup_ngram")(spark, craftedDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(rows(( 1L, 3L)) == 1.0)
    assert(rows((1L, 2L)) > 0.8 && rows((1L, 2L)) < 1.0)
  }

  test("simhash hamming distance separates near-dups from unrelated") {
    val rows = SparkEntry.queries("q_dedup_simhash")(spark, craftedDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2).toLong))
      .toMap
    assert(rows((1L, 3L)) == 0L, "exact dup → identical simhash")
    assert(rows.get((1L, 2L)).forall(_ <= 6L))
    assert(!rows.contains((1L, 4L)) && !rows.contains((3L, 4L)))
  }

  /** Adversarial recall check for the pigeonhole blocking: one-word
    * variants of a base doc give hamming-≤6 pairs whose differing bits
    * land anywhere in the 64 — including the top 16, which the previous
    * prefix-only blocking provably missed. Ground truth is brute-force
    * over all pairs of the small fixture. */
  test("simhash blocking finds EVERY hamming<=6 pair (incl. prefix-bit diffs)") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"word$i")
    val docs = (0 to 8).map { v =>
      val text =
        if (v == 0) base.mkString(" ")
        else base.updated(v * 4 - 1, s"CHANGED$v").mkString(" ")
      (v.toLong, text, "en", "srcA", text.length.toLong)
    }
    val dir = Files.createTempDirectory("graft-simhash-adv").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    graft.functions.SimHash64.register(spark)
    val hashes = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "simhash64(split(lower(text), ' ')) AS sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 6
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "fixture produced no close pairs")
    assert(expected.exists { case (a, b) =>
      ((hashes(a) ^ hashes(b)) >>> 48) != 0L },
      "fixture not adversarial: no close pair differs in a top-16 bit")

    val found = SparkEntry.queries("q_dedup_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == expected,
      s"blocking recall broken: missed ${expected -- found}, extra ${found -- expected}")
  }

  test("holdout split is content-keyed: exact dups never straddle the boundary") {
    // craftedDir docs 1 and 3 are byte-identical: with a content-keyed
    // split they MUST land on the same side, so across the whole corpus
    // exactly one duplicate collapses into its group (4 docs, 3 groups).
    // A doc_id-keyed split would show 4 groups whenever 1 and 3 diverge.
    val rows = SparkEntry.queries("q_split_holdout")(spark, craftedDir)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).sum == 4 && rows.map(_._2).sum == 3,
      s"content grouping broken: $rows")
  }

  test("exact dedup keeps lowest doc_id per normalized text") {
    val kept = SparkEntry.queries("q_dedup_exact")(spark, craftedDir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"got $kept") // 3 is the dup of 1
  }

  test("cosine top-k: rank 1 per label is the probe itself at sim 1.0") {
    val rows = SparkEntry.queries("q_sim_cosine_topk")(spark, sf)
      .collect().filter(_.getInt(3) == 1)
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10)
    assert(rows.forall(_._3 == 1.0), s"probe self-sim must be 1.0: ${rows.toSeq}")
  }

  test("IVF ANN: probe self-hit at rank 1; recall >= 0.9 vs exact top-3; " +
      "nprobe dial is monotone") {
    val ann = SparkEntry.queries("q_sim_ann_ivf")(spark, sf).collect()
    val top1 = ann.filter(_.getInt(3) == 1).map(r => (r.getInt(0), r.getDouble(2)))
    assert(top1.length == 10 && top1.forall(_._2 == 1.0),
      s"probe not found in its own probed cells: ${top1.toSeq}")
    // recall vs the exact brute-force baseline's top 3 per label
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, sf).collect()
      .filter(_.getInt(3) <= 3).map(r => (r.getInt(0), r.getLong(1))).toSet
    val approx = ann.map(r => (r.getInt(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall < 0.9 (hits ${(exact intersect approx).size}/${exact.size})")
    // fewer probed cells must never find more of the exact set (the
    // isotropic synthetic corpus makes recall track nprobe/cells; a real
    // clustered corpus answers with nprobe << cells)
    val narrow = LlmSim.annIvf(spark, sf, cells = 8, nprobe = 2, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert((exact intersect narrow).size <= (exact intersect approx).size,
      "shrinking nprobe increased recall")
  }

  test("IVF-PQ ANN: degrades to exact when nothing is pruned; " +
      "recall holds at the operating point; self-hit survives quantization") {
    // exactness limit: searching every cell with a corpus-wide shortlist
    // leaves only the exact rerank → must EQUAL the brute-force baseline
    val exact = SparkEntry.queries("q_sim_cosine_topk")(spark, sf).collect()
      .filter(_.getInt(3) <= 3)
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val full = LlmSim.annIvfPq(spark, sf, cells = 8, nprobe = 8,
      subspaces = 8, codeBook = 16, shortlist = 1000, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full == exact,
      s"unpruned IVF-PQ diverged from exact: missing ${exact -- full}, extra ${full -- exact}")

    // operating point (the q_sim_ann_ivfpq defaults): ADC over 8-byte
    // codes + nprobe 6/8 + shortlist 32 + exact rerank. The isotropic
    // synthetic corpus is PQ's worst case (no cluster structure to
    // quantize); the shortlist width is the recall dial
    val ann = SparkEntry.queries("q_sim_ann_ivfpq")(spark, sf).collect()
    val top1 = ann.filter(_.getInt(3) == 1).map(r => (r.getInt(0), r.getDouble(2)))
    assert(top1.length == 10 && top1.forall(_._2 == 1.0),
      s"probe lost its own vector to quantization: ${top1.toSeq}")
    val exactIds = exact.map(t => (t._1, t._2))
    val approx = ann.map(r => (r.getInt(0), r.getLong(1))).toSet
    val recall = (exactIds intersect approx).size.toDouble / exactIds.size
    assert(recall >= 0.7,
      s"IVF-PQ recall $recall < 0.7 (hits ${(exactIds intersect approx).size}/${exactIds.size})")
  }

  /** OR-amplification check for the multi-band embedding LSH: a near-dup
    * that flips a sign in band 0 (one of the first 12 dims) must still be
    * found via bands 1-3 — the previous single-band design provably
    * missed it. */
  test("embedding LSH finds a near-dup that flips a band-0 sign bit") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = Array.fill(64)(rng.nextFloat() * 2f - 1f)
    base(2) = 0.02f // small positive component in band 0
    val flipped = base.clone()
    flipped(2) = -0.02f // sign flip in band 0; cosine stays ~1
    val unrelated = Array.fill(64)(rng.nextFloat() * 2f - 1f)
    val dir = Files.createTempDirectory("graft-embed-band").toString
    Seq((1L, base, 0), (2L, flipped, 0), (3L, unrelated, 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("q_dedup_embed")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(3)))
      .toMap
    assert(rows.get((1L, 2L)).contains(true),
      s"band-0 sign-flip near-dup not found as dup: $rows")
  }

  /** SemDeDup composition: a planted chain of near-dups (a≈b, b≈c where
    * a and c may not even collide directly) must collapse into ONE
    * cluster keeping exactly its min-id member; singletons keep
    * themselves; the result is deterministic across runs. */
  test("semantic dedup keeps one representative per near-dup cluster") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val base = Array.fill(64)(rng.nextFloat() * 2f - 1f)
    def jitter(eps: Float): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + eps * (i % 3) * 0.001f }
    val far = Array.fill(64)(rng.nextFloat() * 2f - 1f)
    val dir = Files.createTempDirectory("graft-semdedup").toString
    // 10≈11≈12 (chain), 20 and 21 unrelated singletons
    Seq((10L, base, 0), (11L, jitter(1f), 0), (12L, jitter(2f), 0),
      (20L, far, 1), (21L, far.map(-_), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    def run() = SparkEntry.queries("q_dedup_semantic")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2),
        r.getBoolean(3)))
    val rows = run()
    assert(rows.map(_._2).toSet == Set(10L, 11L, 12L, 20L, 21L),
      s"every vector must appear exactly once: ${rows.toSeq}")
    val cluster10 = rows.filter(_._1 == 10L)
    assert(cluster10.map(_._2).toSet == Set(10L, 11L, 12L) &&
      cluster10.forall(_._3 == 3L),
      s"chain didn't collapse into one cluster: ${rows.toSeq}")
    assert(rows.count(_._4) == 3 &&
      rows.filter(_._4).map(_._2).toSet == Set(10L, 20L, 21L),
      s"survivors must be exactly the cluster minima: ${rows.toSeq}")
    assert(run().toSeq == rows.toSeq, "semantic dedup not deterministic")
  }

  test("connected components survives doc_ids near 2^62 (no Long-sum overflow)") {
    import spark.implicits._
    val huge = Long.MaxValue / 2
    val vertices = Seq(huge, huge + 1, huge + 2, huge + 10)
      .toDF("doc_id")
    val pairs = Seq((huge, huge + 1), (huge + 1, huge + 2))
      .toDF("x", "y")
    val got = LlmText2.connectedComponents(vertices, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      huge -> huge, (huge + 1) -> huge, (huge + 2) -> huge,
      (huge + 10) -> (huge + 10)), s"got $got")
  }

  test("image header codec: golden bytes parse to the right metadata") {
    import graft.functions.ImageHeader
    // golden 1×1 PNG prefix (signature + IHDR) from a real file
    val png1x1 = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // 1 × 1
      0x08, 0x02, 0x00, 0x00, 0x00).map(_.toByte)
    assert(ImageHeader.parse(png1x1).contains(ImageHeader.Meta("png", 1, 1)))
    assert(ImageHeader.parse(ImageHeader.png(640, 480))
      .contains(ImageHeader.Meta("png", 640, 480)))
    assert(ImageHeader.parse(ImageHeader.gif(320, 200))
      .contains(ImageHeader.Meta("gif", 320, 200)))
    assert(ImageHeader.parse(ImageHeader.bmp(1920, 1080))
      .contains(ImageHeader.Meta("bmp", 1920, 1080)))
    assert(ImageHeader.parse("not an image".getBytes).isEmpty)
    // PNG encoder emits a genuine IHDR CRC32
    val enc = ImageHeader.png(2, 3)
    val crc = new java.util.zip.CRC32()
    crc.update(enc, 12, 17)
    val stored = java.nio.ByteBuffer.wrap(enc, 29, 4).getInt
    assert(stored == crc.getValue.toInt, "IHDR CRC mismatch")
    // GIF block walk: frames round-trip, extensions skipped
    val frames = Seq((10, 20), (11, 21), (12, 22))
    val walked = ImageHeader.gifFrames(ImageHeader.animatedGif(99, 98, frames))
    assert(walked.map(f => (f.width, f.height)) == frames)
    assert(walked.map(_.index) == Seq(0, 1, 2))
    assert(ImageHeader.gifFrames("GIF89a".getBytes).isEmpty)
  }

  test("approx_count_distinct within 10% of exact; quantiles in range") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("q_agg_approx")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.1, s"$k: $ap vs $ex")
    }
  }

  test("hash-fed LSH generator (minhashCandidatesFromHashes) emits the " +
      "identical candidate set as the string-fed q_dedup_minhash") {
    import org.apache.spark.sql.functions._
    val viaStrings = graft.SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // same derivation q_dedup_eval materializes as its sh3 table
    val hashed = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(ws)-3), " +
          "i -> xxhash64(concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"))
        .as("hs"))
    val viaHashes = LlmText.minhashCandidatesFromHashes(hashed)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStrings.nonEmpty && viaHashes == viaStrings,
      s"divergence: onlyStrings=${(viaStrings -- viaHashes).take(5)} " +
        s"onlyHashes=${(viaHashes -- viaStrings).take(5)}")
  }

  test("seeded sample is deterministic across runs") {
    val a = SparkEntry.queries("q_sample")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_sample")(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("stream-stream join keeps the in-window click, drops the late one") {
    val rows = SparkEntry.queries("q_stream_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2) - r.getLong(1)))
    // only ad 1 joins: within 10 min; ad 2's click is 24 min late,
    // ad 4 has no impression
    assert(rows.toSeq == Seq((1L, 300000000L)), s"got ${rows.toSeq}")
  }

  test("left-outer stream-stream join: matches emit immediately, " +
      "unmatched impressions null-pad only AFTER the watermark passes " +
      "their window, each row exactly once") {
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val phases = scala.collection.mutable.Map[Int,
      Seq[(Long, Long, Option[Long])]]()
    val fin = snap(StreamingQ.runStreamJoinOuter(spark,
      (i, df) => phases(i) = snap(df)))
    // phase 1: the in-window click matched and emitted; impressions 2/3
    // are BUFFERED, not null-emitted — their windows aren't closed yet
    assert(phases(1).toSet == Set((1L, usBase, Some(usBase + 300000000L))),
      s"phase 1: ${phases(1)}")
    // final: the phase-2 pair matched; 2/3 null-padded exactly once when
    // the watermark passed +10min-after-impression; the flush impression
    // (ad 10, window still open at stop) must NOT have emitted
    val expect = Seq(
      (1L, usBase, Some(usBase + 300000000L)),
      (2L, usBase + 60000000L, None),
      (3L, usBase + 120000000L, None),
      (9L, usBase + 4000000000L, Some(usBase + 4200000000L)))
    assert(fin.sortBy(_._1) == expect, s"final sink: ${fin.sortBy(_._1)}")
    // exactly-once: no row (matched or null-padded) appears twice
    assert(fin.distinct.size == fin.size, s"duplicate emission: $fin")
  }

  test("full-outer stream-stream join: both null-pad directions appear " +
      "only after watermark passage, each exactly once, and open-window " +
      "flush rows on both sides never emit") {
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val phases = scala.collection.mutable.Map[Int,
      Seq[(Option[Long], Option[Long], Option[Long], Option[Long])]]()
    val fin = snap(StreamingQ.runStreamJoinFull(spark,
      (i, df) => phases(i) = snap(df)))
    // phase 1: ONLY the match emitted — impressions 2/3 and the orphan
    // click 4 are all buffered (their windows aren't watermark-closed)
    assert(phases(1).toSet == Set(
      (Some(1L), Some(1L), Some(usBase), Some(usBase + 300000000L))),
      s"phase 1: ${phases(1)}")
    // final: impression-side null-pads for 2/3 (no click), the
    // CLICK-side null-pad for orphan click 4 (no impression — the
    // direction left-outer never emits), the two matches, and neither
    // flush row (imp 10 / clk 11 windows still open at stop)
    val expect = Set(
      (Some(1L), Some(1L), Some(usBase), Some(usBase + 300000000L)),
      (Some(2L), None, Some(usBase + 60000000L), None),
      (Some(3L), None, Some(usBase + 120000000L), None),
      (None, Some(4L), None, Some(usBase + 200000000L)),
      (Some(9L), Some(9L), Some(usBase + 4000000000L),
        Some(usBase + 4200000000L)))
    assert(fin.toSet == expect, s"final sink: ${fin.sortBy(_._1)}")
    // exactly-once: no row (matched or either-side null-padded) twice
    assert(fin.distinct.size == fin.size, s"duplicate emission: $fin")
  }

  test("consolidated feed schedule (the registered bench path) emits the " +
      "identical final table to the 3-phase schedule for both outer rigs " +
      "(r16: same events, same final watermark => same emit/evict sets)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    val outer3 = rows(StreamingQ.runStreamJoinOuter(spark)
      .orderBy("ad_id"))
    val outer1 = rows(StreamingQ.runStreamJoinOuter(spark,
      consolidated = true).orderBy("ad_id"))
    assert(outer1 == outer3 && outer1.nonEmpty,
      s"outer diverged: consolidated=$outer1 phased=$outer3")
    val full3 = rows(StreamingQ.runStreamJoinFull(spark)
      .orderBy("ad_id", "c_ad_id"))
    val full1 = rows(StreamingQ.runStreamJoinFull(spark,
      consolidated = true).orderBy("ad_id", "c_ad_id"))
    assert(full1 == full3 && full1.nonEmpty,
      s"full diverged: consolidated=$full1 phased=$full3")
  }

  test("full-outer join observability: observe() input counters and the " +
      "state store's removed-rows metrics reconcile — both sides evict, " +
      "and final state size equals rows-in minus rows-removed") {
    case class Phase(impIn: Long, clkIn: Long, removed: Long, total: Long)
    val phases = scala.collection.mutable.Map[Int, Phase]()
    StreamingQ.runStreamJoinFull(spark, (_, _) => (), (i, q) => {
      val ps = q.recentProgress.toSeq
      def obs(name: String) = ps
        .flatMap(p => Option(p.observedMetrics.get(name)))
        .map(_.getAs[Long]("n_rows")).sum
      val ledger = ps.filter(_.stateOperators.nonEmpty)
        .map(p => (p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.numRowsUpdated).sum))
      // symmetricHashJoin leaves numRowsRemoved at 0 (Spark reports
      // join-state eviction only through the numRowsTotal ledger), so
      // per-batch removals derive as prevTotal + updated − total
      val removed = (0L +: ledger.map(_._1)).zip(ledger)
        .map { case (prev, (tot, upd)) => prev + upd - tot }.sum
      phases(i) = Phase(obs("graft_jf_imp"), obs("graft_jf_clk"),
        removed, ledger.lastOption.map(_._1).getOrElse(-1L))
    })
    // phase 1: 3 impressions + 2 clicks observed in, ALL buffered (the
    // join state holds every input row), nothing watermark-evicted yet
    assert(phases(1) == Phase(3, 2, 0, 5), s"phase 1: ${phases(1)}")
    // phase 2: the +~67min pair drags the watermark to 3400s — the
    // impression side evicts 1/2/3 (imp_ts + 10min < wm) AND the click
    // side evicts 1/4 (clk_ts < wm): removed = 5 proves BOTH directions
    // (the imp side alone only ever held 3 rows); survivors imp 9 +
    // clk 9 = state 2
    assert(phases(2) == Phase(4, 3, 5, 2), s"phase 2: ${phases(2)}")
    // phase 3: flush rows buffer (wm 4000 closes neither side's window:
    // imp 9 matches clicks to 4600, clk 9 sits at 4200) — no further
    // eviction, and the state-size ledger closes exactly:
    // rows_in (5 imp + 4 clk) − removed (5) = 4 rows in state
    assert(phases(3) == Phase(5, 4, 5, 4), s"phase 3: ${phases(3)}")
    val p = phases(3)
    assert(p.impIn + p.clkIn - p.removed == p.total,
      s"state ledger broken: ${p.impIn}+${p.clkIn}-${p.removed} != ${p.total}")
  }

  test("watermark observability: observe() input counter and the " +
      "engine's numRowsDroppedByWatermark reconcile with the crafted " +
      "feed (7 in, exactly the 1 straggler dropped)") {
    val (df, obs) = StreamingQ.runWatermarkObserved(spark)
    val emitted = df.collect().map(_.getLong(1)).sum
    assert(obs.observedRows == 7L,
      s"observe() saw ${obs.observedRows} input rows, crafted feed has 7")
    assert(obs.droppedByWatermark == 1L,
      s"engine dropped ${obs.droppedByWatermark} rows, crafted 1 straggler")
    // the live late-data ledger: rows_in − rows_dropped = rows kept;
    // append mode emitted the 4 rows whose windows the watermark closed,
    // and the remaining 2 kept rows (ev5/ev7, +60min windows) were still
    // in open windows at stop
    assert(emitted == 4L, s"closed-window rows emitted: $emitted != 4")
    assert(obs.observedRows - obs.droppedByWatermark - emitted == 2L,
      s"open-window remainder: ${obs.observedRows} - " +
        s"${obs.droppedByWatermark} - $emitted != 2")
  }

  test("session agg min-merge: an above-watermark but out-of-order " +
      "event earlier than the open session's start moves s_start back") {
    import StreamingQ.ev
    val log = StreamingQ.runSessionAggFeed(spark, Seq(
      Seq(ev(1, 1200, uid = 7)),  // session [20m, 50m) n=1
      // +15min event: above the watermark (20m − 10m = 10m) but BEFORE
      // the open session's start — must merge and move s_start to 15m
      Seq(ev(2, 900, uid = 7))))
      .orderBy("n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    def abs(off: Long) = usBase + off * 1000000L
    assert(log.toSeq == Seq(
      (7L, abs(1200), abs(3000), 1L, false),
      (7L, abs(900), abs(3000), 2L, false)), s"got ${log.toSeq}")
  }

  test("batch session windows merge at <30min gaps and split at >=30min") {
    val rows = SparkEntry.queries("q_stream_session")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, sess) =>
      val sorted = sess.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(s1, s2) =>
          // next session starts at least 30 min after the previous end-30min
          assert(s2.getLong(1) >= s1.getLong(2) - 1800000000L + 1800000000L)
        case _ => ()
      }
      sorted.foreach(r => assert(r.getLong(2) - r.getLong(1) >= 1800000000L))
    }
  }
}
