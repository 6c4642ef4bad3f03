package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Boundary-adversarial recall fixtures for every rule-4 ANN id
  * (VERDICT r13 #7): the existing recall specs measure on isotropic
  * corpora, which a generous funnel can pass; this corpus is built so
  * the TRUE top-3 neighbors of probe 0 are "straddlers" — vectors
  * whose direction is closest to the probe by cosine but whose cell
  * assignment lands OUTSIDE the probe's nprobe=6 routing (they sit
  * across the cell boundary, in the probe's 7th/8th-ranked cells).
  *
  * The spec asserts three things per ANN id, all on the SAME corpus:
  *  1. PRECONDITIONS hold against the ACTUALLY-TRAINED quantizer
  *     (hash-seed + one Lloyd round, the production code path) — the
  *     straddlers' cells are outside probe 0's probed set and their
  *     cosine dominates every base vector's. If quantizer drift ever
  *     breaks the geometry, the spec fails loudly instead of silently
  *     weakening into a generous fixture.
  *  2. At the operating point (nprobe=6/8) the funnel MISSES all three
  *     — recall@3 for probe 0 is 0, the maximally adversarial case.
  *  3. At the exactness limit (nprobe=cells, and full-width shortlist
  *     for PQ) the same funnel returns exactly the straddlers — the
  *     approximation, not the machinery, is what missed them.
  *
  * The index-lifecycle ids must additionally stay ROW-FOR-ROW equal to
  * the inline search on this corpus — and the straddlers all carry
  * vec_id ≡ 0 (mod 5), so for q_sim_index_delta they arrive as
  * "today's ingest": the stored-centroid delta assignment must route
  * adversarial newcomers identically to a full rebuild. */
class AnnAdversarialSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Dim = 16
  private val StraddlerIds = Seq(90000L, 90005L, 90010L)

  /** 8 clusters: cluster 0 on e0, clusters 1..7 at 60°..90° from e0 in
    * mutually orthogonal planes (so no foreign cluster's member gets a
    * cosine above 0.5 to probe 0); probe j = cluster j's min-vec_id
    * member, exactly on the cluster direction. Members spread 60° off
    * axis (cos 0.5 to their probe); straddlers sit at 50° from probe 0
    * TOWARD d7's plane — cos 0.643 to probe 0, dominating every base
    * vector except the probe itself, yet closer to cell 7's direction
    * (cos 40° = 0.766) than to cell 0's (0.643), so they assign across
    * the boundary into probe 0's lowest-ranked cells. */
  private def buildCorpus(): (String,
      Seq[(Long, Array[Float], Int)]) = {
    def vec(parts: (Int, Double)*): Array[Float] = {
      val a = new Array[Float](Dim)
      parts.foreach { case (i, x) => a(i) = (a(i) + x).toFloat }
      a
    }
    val rows = scala.collection.mutable.ArrayBuffer[
      (Long, Array[Float], Int)]()
    for (j <- 0 until 8) {
      val phi = math.toRadians(55.0 + 5.0 * j)
      val dj: Seq[(Int, Double)] =
        if (j == 0) Seq(0 -> 1.0)
        else Seq(0 -> math.cos(phi), j -> math.sin(phi))
      rows += ((j * 1000L + 1L, vec(dj: _*), j)) // the probe member
      val theta = math.toRadians(60.0)
      for (i <- 1 until 40) {
        val sign = if (i % 2 == 0) 1.0 else -1.0
        val spread = 8 + (i % 7)
        val jit = 0.003 * i / 40.0
        val m = dj.map { case (k, x) => (k, x * math.cos(theta)) } ++
          Seq(spread -> sign * math.sin(theta), 15 -> jit)
        rows += ((j * 1000L + 5L * i + 1L, vec(m: _*), j))
      }
    }
    val psi = math.toRadians(50.0)
    StraddlerIds.zipWithIndex.foreach { case (id, m) =>
      rows += ((id,
        vec(0 -> math.cos(psi), 7 -> math.sin(psi),
          15 -> 0.002 * m), 7))
    }
    val dir = Files.createTempDirectory("graft-ann-adv").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    import spark.implicits._
    rows.toSeq.map { case (id, v, lab) => (id, v.toSeq, lab) }
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>"), $"label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // documents drive the filtered variant: everything English except
    // straddler 90005 (the middle one by cosine), which the predicate
    // must exclude — promoting 90010 into the filtered exact top-3
    rows.toSeq.map { case (id, _, _) =>
      (id, if (id == 90005L) "de" else "en")
    }.toDF("doc_id", "lang").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    (d, rows.toSeq)
  }

  private lazy val (dir, rows) = buildCorpus()

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def n(v: Array[Float]) =
      math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x))
    val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
      s + x.toDouble * y.toDouble }
    dot / (n(a) * n(b))
  }

  private def probe0: Array[Float] =
    rows.find(_._1 == 1L).get._2

  test("preconditions vs the TRAINED quantizer: straddler cells are " +
      "outside probe 0's nprobe=6 routing; straddler cosine dominates " +
      "every base vector") {
    val cents = LlmSim.coarseCentroids(spark, dir, 8)
    val units = cents.map(LlmSim.unit)
    def cellRank(v: Array[Float]): Seq[Int] =
      units.zipWithIndex.map { case (u, i) =>
        (v.zip(u).foldLeft(0.0) { case (s, (x, y)) =>
          s + x.toDouble * y }, i)
      }.sortBy(tc => (-tc._1, tc._2)).map(_._2).toSeq
    val probed = cellRank(probe0).take(6).toSet
    val strads = rows.filter(r => StraddlerIds.contains(r._1))
    strads.foreach { case (id, v, _) =>
      val cell = cellRank(v).head
      assert(!probed.contains(cell),
        s"straddler $id landed in PROBED cell $cell (probed=$probed) " +
          "— the fixture is no longer adversarial")
    }
    // the probe is its own cosine-1 nearest neighbor (it is in the
    // corpus), so dominance is over every OTHER base vector: true
    // top-3 for probe 0 = (itself, straddler, straddler)
    val maxBase = rows.filterNot(r => StraddlerIds.contains(r._1))
      .filterNot(_._1 == 1L).map(r => cos(r._2, probe0)).max
    val minStrad = strads.map(r => cos(r._2, probe0)).min
    assert(minStrad > maxBase + 0.05,
      s"straddler cos $minStrad must dominate base cos $maxBase")
  }

  test("q_sim_ann_ivf: misses all 3 straddlers at nprobe=6 (recall@3 " +
      "= 0 for probe 0); nprobe=cells returns exactly the straddlers") {
    val op = LlmSim.annIvf(spark, dir, cells = 8, nprobe = 6, k = 3)
      .filter(org.apache.spark.sql.functions.col("label") === 0)
      .collect().map(_.getLong(1)).toSeq
    assert(op.nonEmpty && op.intersect(StraddlerIds).isEmpty,
      s"operating point must miss the boundary straddlers, got $op")
    val exact = LlmSim.annIvf(spark, dir, cells = 8, nprobe = 8, k = 3)
      .filter(org.apache.spark.sql.functions.col("label") === 0)
      .collect().map(_.getLong(1)).toSeq
    assert(exact == Seq(1L, 90000L, 90005L),
      s"nprobe=cells top-3 must be (self, straddler, straddler), " +
        s"got $exact")
  }

  test("q_sim_ann_ivfpq: same boundary miss at the operating point; " +
      "nprobe=cells + full shortlist recovers the straddlers exactly") {
    val op = LlmSim.annIvfPq(spark, dir, cells = 8, nprobe = 6,
        subspaces = 8, codeBook = 16, shortlist = 128, k = 3)
      .filter(org.apache.spark.sql.functions.col("label") === 0)
      .collect().map(_.getLong(1)).toSeq
    assert(op.nonEmpty && op.intersect(StraddlerIds).isEmpty,
      s"PQ operating point must miss the straddlers, got $op")
    val exact = LlmSim.annIvfPq(spark, dir, cells = 8, nprobe = 8,
        subspaces = 8, codeBook = 16, shortlist = 1000, k = 3)
      .filter(org.apache.spark.sql.functions.col("label") === 0)
      .collect().map(_.getLong(1)).toSeq
    assert(exact == Seq(1L, 90000L, 90005L),
      s"PQ exactness limit top-3 must be (self, straddler, straddler), " +
        s"got $exact")
  }

  test("q_sim_filtered_ivf: the predicate excludes the 'de' straddler " +
      "at the exactness limit; the operating point still misses all") {
    val keep = LlmSim3.keepEn(spark, dir)
    val op = LlmSim.annIvf(spark, dir, cells = 8, nprobe = 6, k = 3,
        keep = Some(keep))
      .filter(org.apache.spark.sql.functions.col("label") === 0)
      .collect().map(_.getLong(1)).toSeq
    assert(op.nonEmpty && op.intersect(StraddlerIds).isEmpty,
      s"filtered operating point must miss the straddlers, got $op")
    val exact = LlmSim.annIvf(spark, dir, cells = 8, nprobe = 8, k = 3,
        keep = Some(LlmSim3.keepEn(spark, dir)))
      .filter(org.apache.spark.sql.functions.col("label") === 0)
      .collect().map(_.getLong(1)).toSeq
    assert(exact.contains(90000L) && exact.contains(90010L) &&
      !exact.contains(90005L),
      s"filtered exactness limit must keep the en straddlers and drop " +
        s"the de one, got $exact")
  }

  test("index lifecycle on the adversarial corpus: stored, delta, and " +
      "rebalanced searches all equal the inline search row-for-row — " +
      "and the delta slice IS the straddlers") {
    import org.apache.spark.sql.functions.col
    val inline = LlmSim.annIvf(spark, dir, cells = 8, nprobe = 6, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val stored = LlmSim4.searchIndex(spark, dir,
        LlmSim4.buildIndex(spark, dir))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(stored == inline, "stored-index search diverged on the " +
      "adversarial corpus")
    val incPath = LlmSim4.buildIncIndex(spark, dir)
    val delta = LlmSim4.searchIndex(spark, dir, incPath)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(delta == inline, "delta-maintained search diverged on the " +
      "adversarial corpus")
    // the straddlers (vec_id % 5 == 0) really did arrive via the delta
    // append, and their stored cells match the trained quantizer
    val cents = LlmSim.coarseCentroids(spark, dir, 8)
    val units = cents.map(LlmSim.unit)
    def cellOf(v: Array[Float]): Int =
      units.zipWithIndex.map { case (u, i) =>
        (v.zip(u).foldLeft(0.0) { case (s, (x, y)) =>
          s + x.toDouble * y }, i)
      }.maxBy(tc => (tc._1, -tc._2))._2
    val assigned = spark.read.parquet(s"$incPath/assign")
      .filter(col("vec_id") >= 90000L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(assigned.keySet == StraddlerIds.toSet,
      s"delta slice must be exactly the straddlers, got $assigned")
    rows.filter(r => StraddlerIds.contains(r._1)).foreach {
      case (id, v, _) =>
        assert(assigned(id) == cellOf(v),
          s"delta-assigned cell for $id diverged from the quantizer")
    }
    val rebal = LlmSim4.searchIndex(spark, dir,
        LlmSim4.buildRebalanced(spark, dir))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(rebal == inline, "rebalanced search diverged on the " +
      "adversarial corpus")
  }
}
