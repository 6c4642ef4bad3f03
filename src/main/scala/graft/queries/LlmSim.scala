package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Similarity search over `embeddings` (array<float>, dim 64):
  * brute-force cosine top-k as the exact baseline, an IVF-style
  * partitioned variant as the scale path, and LSH-bucketed cosine
  * near-dup pairs. Dot products use the native `float_dot` expression
  * (codegen'd tight loop, sequential fold → deterministic double sums;
  * float×float in double is exact — same bits as the higher-order
  * zip_with formulation it replaced, ~10× less allocation). The probe
  * side is always tiny and broadcast; the big side streams — no shuffle
  * of the embedding table itself. */
object LlmSim {

  /** Sequential-fold dot product of two float array columns in double
    * (native expression; registered per session, idempotent). */
  private[queries] def dot(a: String, b: String): Column = expr(s"float_dot($a, $b)")

  private[queries] def norm2(a: String): Column = dot(a, a)

  /** One deterministic probe vector per label: the embedding of the
    * label's minimum vec_id — a min_by hash aggregate (partial-agg'd,
    * no per-partition sort), not a window: the shuffle carries one row
    * per (label, input partition) instead of the whole table. */
  private[queries] def probes(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .groupBy(col("label").as("p_label"))
      .agg(min_by(col("embedding"), col("vec_id")).as("pe"))

  /** Brute-force cosine top-5 per labeled probe. Exact baseline:
    * broadcast the 10 probes, stream the table once, rank per probe.
    * Similarity is rounded to 6 dp *before* ranking so the rank order is
    * engine-portable (sub-1e-6 double-noise can't flip it). */
  private def qSimCosineTopk(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, d, "embeddings")
    val scored = e.crossJoin(broadcast(probes(s, d)))
      .withColumn("sim", round(
        dot("pe", "embedding") /
          (sqrt(norm2("pe")) * sqrt(norm2("embedding"))), 6))
    val w = Window.partitionBy(col("p_label"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("p_label").as("label"), col("vec_id"), col("sim"), col("rn"))
      .orderBy("label", "rn")
  }

  /** IVF ANN with a real coarse quantizer: centroids start as a
    * deterministic hash-sample of the data and take one Lloyd
    * (sampled-kmeans) refinement; every vector is assigned to its
    * nearest centroid by a MAP-ONLY argmax over literal centroids (no
    * join, no window — the quantizer is model state, collected like
    * MLlib KMeans does, C×64 floats); each labeled probe then searches
    * its `nprobe` nearest cells and ranks candidates with the native
    * TopKPerGroup operator (bounded heaps, no full per-cell sort).
    *
    * Approximate by construction → no SQL oracle; the ScalaTest measures
    * recall against the exact q_sim_cosine_topk baseline. nprobe is the
    * recall/cost dial: the synthetic corpus is isotropic random, so
    * recall tracks the searched fraction (nprobe/cells); on a real
    * (clustered) embedding corpus the same index answers with
    * nprobe ≪ cells. At 100 TB everything here is one map-side pass +
    * one broadcast join + a ≤k-rows-per-group shuffle. */
  private def qSimAnnIvf(s: SparkSession, d: String): DataFrame =
    annIvf(s, d, cells = 8, nprobe = 6, k = 3)

  private[queries] def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    v.map(x => (x / n).toFloat)
  }

  /** Map-only nearest-centroid assignment over literal centroids.
    * Cosine argmax needs only dot(e, c/|c|) — |e| is a common positive
    * factor; struct max orders by (sim, -cell) so ties pick the lowest
    * cell. */
  private[queries] def cellOf(cents: Array[Array[Float]]): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        call_function("float_dot", col("embedding"), typedlit(unit(c)))
          .as("s"),
        lit(-i).as("negcell"))
    }: _*)
    (lit(0) - array_max(scored).getField("negcell")).as("cell")
  }

  // ------------------- shared, cached ANN model state -------------------
  // The bounded hash-sample, the collected probe set, and the refined
  // coarse quantizer are deterministic functions of the data dir (hash
  // orderings tie-break on vec_id), so IVF and IVF-PQ share ONE corpus
  // sampling pass and ONE probe aggregate between them instead of each
  // paying their own. Collected driver state is a few KB — exactly what
  // MLlib holds as a fitted model. Keyed by (dir, params): re-running
  // either query, or running both in one session (the bench sweep, the
  // recall specs), pays the corpus passes once.
  private val sampleCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), Array[(Long, Array[Float])]]()
  private val probeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, Array[Float])]]()
  private val coarseCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Int), Array[Array[Float]]]()

  /** ONE corpus pass: deterministic hash-sample of ≤trainCap vectors
    * (per-partition TakeOrdered heaps — no full sort), collected once.
    * At 100 TB quantizer training touches ≤trainCap vectors, exactly
    * like sampled k-means in production ANN builds. */
  private def hashSample(s: SparkSession, d: String,
      trainCap: Int): Array[(Long, Array[Float])] =
    sampleCache.computeIfAbsent((d, trainCap), _ => {
      import s.implicits._
      t(s, d, "embeddings")
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(trainCap)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
    })

  /** ONE probe aggregate (min_by per label), collected and shared by
    * every ANN variant in the session. */
  private[queries] def probesCollected(s: SparkSession,
      d: String): Seq[(Int, Array[Float])] =
    probeCache.computeIfAbsent(d, _ =>
      probes(s, d).collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)))

  /** Refined coarse quantizer from the shared sample: hash-ordered seed
    * + one Lloyd round, computed driver-side in deterministic sample
    * order (sequential double sums — bit-stable across runs, the same
    * reason the old Spark-side trainer routed means through DECIMAL).
    * Assignment mirrors `cellOf` exactly: argmax of dot(v, unit(c)),
    * ties to the lowest cell. */
  private[queries] def coarseCentroids(s: SparkSession, d: String, cells: Int,
      trainCap: Int = 4096): Array[Array[Float]] =
    coarseCache.computeIfAbsent((d, cells, trainCap), _ => {
      val sample = hashSample(s, d, trainCap)
      val seed = sample.take(cells).map(_._2)
      val dim = seed.head.length
      val units = seed.map(unit)
      val sums = Array.ofDim[Double](cells, dim)
      val counts = new Array[Long](cells)
      sample.foreach { case (_, v) =>
        var best = 0
        var bestS = Double.NegativeInfinity
        var c = 0
        while (c < cells) {
          val u = units(c)
          var acc = 0.0
          var i = 0
          while (i < dim) { acc += v(i).toDouble * u(i); i += 1 }
          if (acc > bestS) { bestS = acc; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      Array.tabulate(cells) { c =>
        if (counts(c) == 0) seed(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    })

  /** IVF search; `keep` (a one-column `vec_id` relation) optionally
    * restricts candidates INSIDE the probed cells — the filtered /
    * hybrid-retrieval variant. The semi-join prunes cell members
    * id-keyed (shuffle_hash, never broadcast: the allowed set scales
    * with the corpus) between cell assignment and probe scoring, so the
    * quantizer, the probe routing, and the per-cell candidate fetch are
    * shared verbatim with the unfiltered path. */
  private[queries] def annIvf(s: SparkSession, d: String, cells: Int,
      nprobe: Int, k: Int, keep: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = t(s, d, "embeddings")
    val refined = coarseCentroids(s, d, cells)
    val assigned0 = e.withColumn("cell", cellOf(refined))
    val assigned = keep.fold(assigned0)(ids =>
      assigned0.join(ids.hint("shuffle_hash"), Seq("vec_id"), "left_semi"))
    // each probe's nprobe nearest cells, ranked driver-side from the
    // cached probe set against the same quantizer and broadcast back as
    // a tiny local relation — no second corpus pass
    val units = refined.map(unit)
    val probeCells: Seq[(Int, Array[Float], Int)] =
      probesCollected(s, d).flatMap { case (lab, pe) =>
        val ranked = units.zipWithIndex.map { case (u, i) =>
          var acc = 0.0
          var j = 0
          while (j < u.length) { acc += pe(j).toDouble * u(j); j += 1 }
          (acc, i)
        }.sortBy(tc => (-tc._1, tc._2)).take(nprobe)
        ranked.map { case (_, cell) => (lab, pe, cell) }
      }
    val scored = assigned
      .join(broadcast(probeCells.toDF("p_label", "pe", "cell")), Seq("cell"))
      .withColumn("sim", round(
        dot("pe", "embedding") /
          (sqrt(norm2("pe")) * sqrt(norm2("embedding"))), 6))
      .select(col("p_label").as("label"), col("vec_id"), col("sim"))
    graft.plans.TopKPerGroup(scored, groupCols = Seq("label"),
      orderCol = "sim", tieCols = Seq("vec_id"), k = k)
      .select(col("label"), col("vec_id"), col("sim"), col("rnk").as("k"))
      .orderBy("label", "k")
  }

  /** IVF-PQ ANN — the memory architecture that actually fits 100 TB of
    * vectors: each vector is stored as `subspaces` small codebook indices
    * (8 bytes here vs 256 for the raw floats, 32×), and search scans the
    * codes with table lookups instead of touching the vectors.
    *
    * Pipeline (all model state driver-trained from the SHARED bounded
    * hash-sample, MLlib-KMeans-style — cells×dim + subspaces×codeBook×
    * dsub doubles, a few KB; the corpus itself is scanned EXACTLY ONCE,
    * by the encode+ADC pass):
    *   1. unit-normalize map-only (squared-L2 on unit vectors ranks
    *      exactly like cosine: ‖a−b‖² = 2 − 2·cos);
    *   2. product-quantize: split each unit vector into `subspaces`
    *      sub-vectors; per subspace, a `codeBook`-entry codebook
    *      (hash-sample seed + one Lloyd round over the ≤trainCap shared
    *      sample, sequential-deterministic driver arithmetic — bit-
    *      stable without the old DECIMAL routing) maps the sub-vector
    *      to its nearest-centroid index inside the single corpus scan;
    *   3. IVF routing reuses the shared cached coarse quantizer: probes
    *      search only their `nprobe` nearest cells;
    *   4. ADC (asymmetric distance): each probe precomputes a
    *      subspaces×codeBook table of exact sub-distances to every
    *      codebook centroid; a candidate's approximate distance is then
    *      `subspaces` table lookups summed — map-only over broadcast
    *      tables, no vector arithmetic in the scan;
    *   5. the native TopKPerGroup operator shortlists per probe
    *      (bounded heaps, ≤shortlist rows per partition shuffle). The
    *      shortlist rows carry their raw embedding out of the scan, so
    *      the exact cosine rerank runs on the tiny survivor set with NO
    *      second corpus pass — the standard prune→compress→rerank
    *      funnel at minimum I/O: one sample pass + one probe aggregate
    *      (both cached and shared with q_sim_ann_ivf) + one corpus scan.
    *
    * Approximate by construction → no SQL oracle; the ScalaTest pins the
    * funnel's exactness limit (nprobe=cells + full-width shortlist ≡ the
    * brute-force baseline) and recall at the operating point. */
  private def qSimAnnIvfPq(s: SparkSession, d: String): DataFrame =
    // shortlist 128, not 32: the ScaleProbe recall table showed recall@3
    // dropping to 0.60 at sf0.1's 5000 vectors with a 32-wide shortlist
    // (isotropic vectors are PQ's worst case — ADC ranks are noisy, so
    // the exact rerank needs a wider survivor set as the corpus grows;
    // measured 0.60 → 0.67 at 64 → 0.77 at 128, against the 0.93
    // nprobe-6/8 IVF ceiling). Widening only grows the rerank set
    // (≤ shortlist rows per probe cross the exchange) — at 100 TB the
    // shortlist is noise next to the scan either way.
    annIvfPq(s, d, cells = 8, nprobe = 6, subspaces = 8, codeBook = 16,
      shortlist = 128, k = 3)

  private def unitD(v: Array[Float]): Array[Double] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    v.map(_.toDouble / n)
  }

  private[queries] def annIvfPq(s: SparkSession, d: String, cells: Int,
      nprobe: Int, subspaces: Int, codeBook: Int, shortlist: Int, k: Int)
      : DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = t(s, d, "embeddings")

    // ---- model state: trained driver-side from the SHARED cached
    // sample (one corpus pass, amortized with q_sim_ann_ivf). The
    // corpus itself is scanned exactly once, by the encode+ADC job.
    val trainCap = 4096
    val coarse = coarseCentroids(s, d, cells)
    val sampleU: Array[Array[Double]] = hashSample(s, d, trainCap)
      .map(p => unitD(p._2))
    val dim = sampleU.head.length
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val dsub = dim / subspaces
    require(codeBook <= sampleU.length,
      s"codeBook $codeBook exceeds sample ${sampleU.length}")

    // PQ codebooks: hash-ordered seed + one Lloyd round per subspace,
    // sequential driver arithmetic in fixed sample order (bit-stable —
    // borderline sub-vectors can't flip codes between runs). Argmin
    // ties keep the lowest code, mirroring the min(struct) the encode
    // expression uses below.
    val cbArr: Array[Array[Array[Double]]] = {
      val seed = Array.tabulate(subspaces, codeBook)((m, j) =>
        sampleU(j).slice(m * dsub, (m + 1) * dsub))
      val sums = Array.ofDim[Double](subspaces, codeBook, dsub)
      val counts = Array.ofDim[Long](subspaces, codeBook)
      sampleU.foreach { v =>
        var m = 0
        while (m < subspaces) {
          var bj = 0
          var bd = Double.MaxValue
          var j = 0
          while (j < codeBook) {
            val c = seed(m)(j)
            var acc = 0.0
            var i = 0
            while (i < dsub) {
              val t0 = v(m * dsub + i) - c(i); acc += t0 * t0; i += 1
            }
            if (acc < bd) { bd = acc; bj = j }
            j += 1
          }
          counts(m)(bj) += 1
          var i = 0
          while (i < dsub) { sums(m)(bj)(i) += v(m * dsub + i); i += 1 }
          m += 1
        }
      }
      Array.tabulate(subspaces, codeBook) { (m, j) =>
        if (counts(m)(j) == 0) seed(m)(j) // empty cluster keeps its seed
        else Array.tabulate(dsub)(i => sums(m)(j)(i) / counts(m)(j))
      }
    }

    // THE corpus scan: map-only normalize + cell assign + packed codes
    // (one array<int> column — this plus the cell id is the entire
    // search-time representation). One transform-over-literal-codebook
    // per subspace (8 expressions, not 128): the 16-entry argmin loops
    // inside the higher-order function, keeping generated code small.
    // The raw embedding rides along so the bounded-heap shortlist can
    // hand the rerank its vectors directly — no second corpus pass.
    val en = e
      .withColumn("l2", sqrt(norm2("embedding")))
      .withColumn("un",
        expr("transform(embedding, x -> cast(x as double) / l2)"))
      .withColumn("cell", cellOf(coarse))
    val codesCol: Column = array((0 until subspaces).map { m =>
      val sl = slice(col("un"), m * dsub + 1, dsub)
      val cbm: Seq[(Seq[Double], Int)] =
        (0 until codeBook).map(j => (cbArr(m)(j).toSeq, j))
      array_min(transform(typedlit(cbm), c =>
        struct(
          aggregate(
            zip_with(sl, c.getField("_1"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, t) => a + t).as("d"),
          c.getField("_2").as("j")))).getField("j")
    }: _*)
    val packed = en.select(col("vec_id"), col("cell"), col("embedding"),
      codesCol.as("codes"))

    // per-probe: nprobe nearest cells + exact ADC distance table, both
    // computed driver-side from the shared cached probe set
    val probeArr = probesCollected(s, d)
    val probeRows: Seq[(Int, Int, Seq[Seq[Double]])] =
      probeArr.flatMap { case (lab, pe) =>
        val pu = unitD(pe)
        val dt: Seq[Seq[Double]] = (0 until subspaces).map { m =>
          val ps = pu.slice(m * dsub, (m + 1) * dsub)
          (0 until codeBook).map { j =>
            val c = cbArr(m)(j)
            var acc = 0.0; var i = 0
            while (i < dsub) { val t = ps(i) - c(i); acc += t * t; i += 1 }
            acc
          }
        }
        val nearCells = coarse.zipWithIndex.map { case (c, i) =>
          val cu = unitD(c)
          (pu.zip(cu).map { case (x, y) => x * y }.sum, i)
        }.sortBy(t => (-t._1, t._2)).take(nprobe).map(_._2)
        nearCells.map(c => (lab, c, dt))
      }
    val probeDf = probeRows.toDF("p_label", "cell", "dtable")

    // ADC: map-only table-lookup sum over the broadcast probe tables
    val adc = packed.join(broadcast(probeDf), Seq("cell"))
      .withColumn("adc", expr(
        """aggregate(zip_with(codes, dtable, (c, row) -> element_at(row, c + 1)),
          | cast(0.0 as double), (a, x) -> a + x)""".stripMargin))
      // TopKPerGroup ranks descending; negate for nearest-first
      .withColumn("negadc", lit(0.0) - col("adc"))
      .select(col("p_label"), col("vec_id"), col("embedding"), col("negadc"))

    // bounded-heap shortlist (embedding on board), exact rerank of the
    // ≤shortlist×probes survivor set — window input is tiny
    val short = graft.plans.TopKPerGroup(adc, groupCols = Seq("p_label"),
      orderCol = "negadc", tieCols = Seq("vec_id"), k = shortlist)
      .select(col("p_label"), col("vec_id"), col("embedding"))
    short.join(broadcast(probeArr.toDF("p_label", "pe")), Seq("p_label"))
      .withColumn("sim", round(
        dot("pe", "embedding") /
          (sqrt(norm2("pe")) * sqrt(norm2("embedding"))), 6))
      .withColumn("k", row_number().over(Window.partitionBy(col("p_label"))
        .orderBy(col("sim").desc, col("vec_id").asc)))
      .filter(col("k") <= k)
      .select(col("p_label").as("label"), col("vec_id"), col("sim"), col("k"))
      .orderBy("label", "k")
  }

  /** Embedding near-dup pairs: multi-band sign-bit LSH (OR-amplified) +
    * exact cosine verify inside the buckets. Four independent 12-bit
    * bands — band b keys on the sign bits of dims [12b+1, 12b+12] — so a
    * true near-dup whose perturbation flips a sign in one band still
    * collides in the other three (a single band, the previous design,
    * lost every pair that flipped any of its 12 signs). Bands carry only
    * (band, key, vec_id); the embeddings join back for the exact verify
    * on the (tiny) deduped candidate set — the same funnel shape as the
    * minhash pipeline, never all-pairs and never shuffling the vectors
    * through the band explode. */
  private def qDedupEmbed(s: SparkSession, d: String): DataFrame =
    embedDupPairs(s, d)
      .select(col("a"), col("b"), col("sim"), col("is_dup"))
      .orderBy("a", "b")

  /** The banded-LSH candidate funnel + exact cosine verify shared by
    * q_dedup_embed (pair report) and q_dedup_semantic (cluster+prune):
    * (a, b, sim, is_dup) for every bucket-colliding pair, a < b. */
  private def embedDupPairs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val nBands = 4
    val e = t(s, d, "embeddings")
    val banded = e.select(col("vec_id"),
      posexplode(array((0 until nBands).map(bnd => expr(
        s"aggregate(slice(embedding, ${bnd * 12 + 1}, 12), 0L," +
          " (acc, x) -> acc * 2 + IF(x > 0f, 1L, 0L))")): _*))
        .as(Seq("band", "bkey")))
    val a = banded.select(col("band"), col("bkey"), col("vec_id").as("a"))
    val b = banded.select(col("band"), col("bkey"), col("vec_id").as("b"))
    val cand = a.join(b, Seq("band", "bkey")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).dropDuplicates("a", "b")
    cand
      .join(e.select(col("vec_id").as("a"), col("embedding").as("ea")),
        Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")),
        Seq("b"))
      .withColumn("sim", round(
        dot("ea", "eb") /
          (sqrt(norm2("ea")) * sqrt(norm2("eb"))), 6))
      .withColumn("is_dup", col("sim") >= 0.85)
  }

  /** Semantic dedup (the SemDeDup stage of an LLM data pipeline): group
    * semantically-duplicate vectors into clusters and keep ONE
    * representative per cluster. Composition of the two scale-safe
    * primitives this engine already has — the banded-LSH→exact-verify
    * funnel (never all-pairs) feeds its confirmed duplicate edges into
    * min-label-propagation connected components (pointer doubling,
    * O(log diameter) rounds) — so the whole pipeline shuffles candidate
    * ids and labels, never the vectors. Representative = the cluster's
    * minimum vec_id: deterministic on any engine (SemDeDup's
    * closest-to-centroid variant derives by joining q_embed_centroids
    * against cluster members; min-id keeps the oracle-free contract
    * testable). Output: every vector with its cluster id, cluster size,
    * and the keep/drop decision. */
  private def qDedupSemantic(s: SparkSession, d: String): DataFrame = {
    val dupEdges = embedDupPairs(s, d).filter(col("is_dup"))
      .select(col("a").as("x"), col("b").as("y"))
    val vertices = t(s, d, "embeddings").select(col("vec_id").as("doc_id"))
    val comp = LlmText2.connectedComponents(vertices, dupEdges)
      .select(col("doc_id").as("vec_id"), col("grp").as("cluster_id"))
    val sizes = comp.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "cluster_id")
      .withColumn("is_kept", col("vec_id") === col("cluster_id"))
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        col("is_kept"))
      .orderBy("vec_id")
  }

  /** Embedding preprocessing stats: L2 norm, dimensionality, max
    * absolute component per vector — the normalization pass before
    * indexing/ANN. float→double casts are exact, per-element products
    * exact, and the 6-dp round absorbs summation-order noise (same
    * discipline as the cosine oracle). */
  private def qEmbedNorm(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "embeddings")
      .select(col("vec_id"),
        round(sqrt(norm2("embedding")), 6).as("l2"),
        size(col("embedding")).as("dim"),
        expr("round(cast(array_max(transform(embedding, x -> abs(x))) as double), 6)")
          .as("max_abs"))
      .orderBy("vec_id")
  }

  /** Int8 symmetric quantization: per-vector scale = 127/max|x|,
    * quantized sum (exact — small ints in double) and max reconstruction
    * error, 6-dp rounded. Both engines round() half-away-from-zero on
    * doubles, and every intermediate is double-exact from float inputs. */
  private def qEmbedQuantize(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .withColumn("scale",
        lit(127.0) /
          expr("cast(array_max(transform(embedding, x -> abs(x))) as double)"))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale6"),
        expr("""aggregate(transform(embedding,
          x -> cast(round(cast(x as double) * scale) as int)),
          cast(0 as double), (acc, q) -> acc + cast(q as double))""")
          .as("qsum"),
        expr("""round(array_max(transform(embedding,
          x -> abs(cast(x as double) -
               cast(round(cast(x as double) * scale) as int) / scale))), 6)""")
          .as("max_err"))
      .orderBy("vec_id")

  /** Per-label centroids: element-wise mean vector per label — the
    * cluster-statistics op behind k-means refinement / IVF codebook
    * training. posexplode fans each vector into (label, dim, value)
    * rows, one hash agg sums per (label, dim) with map-side partials
    * (the shuffle carries ≤ labels × dims rows regardless of corpus
    * size), and the centroid reassembles via a sorted collect_list —
    * bounded by the embedding dimension. 6-dp round before output (and
    * the norm computed FROM the rounded centroid) keeps the float-sum
    * ordering noise out of the hash compare. The centroid ships as a
    * comma-joined string of micro-units (round(m·10⁶) as int): the
    * driver compare can't hash array cells, and double→string rendering
    * differs between engines (Spark "1.0E-6" vs DuckDB "1e-06") —
    * integers are bit-identical text on both sides. */
  private def qEmbedCentroids(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vectors"),
        expr("""transform(array_sort(collect_list(named_struct('i', i, 'm', sx / n))),
                p -> round(p.m, 6))""").as("cvec"))
      .withColumn("centroid_norm", round(sqrt(expr(
        "aggregate(cvec, cast(0.0 as double), (acc, y) -> acc + y * y)")), 6))
      .select(col("label"), col("n_vectors"),
        expr("""concat_ws(',', transform(cvec,
                y -> cast(cast(round(y * 1000000) as bigint) as string)))""")
          .as("centroid_q6"),
        col("centroid_norm"))
      .orderBy("label")

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_centroids" -> (qEmbedCentroids _),
    "q_sim_cosine_topk" -> (qSimCosineTopk _),
    "q_sim_ann_ivf" -> (qSimAnnIvf _),
    "q_sim_ann_ivfpq" -> (qSimAnnIvfPq _),
    "q_dedup_embed" -> (qDedupEmbed _),
    "q_dedup_semantic" -> (qDedupSemantic _),
    "q_embed_norm" -> (qEmbedNorm _),
    "q_embed_quantize" -> (qEmbedQuantize _),
  )

  val sql: Map[String, String] = Map(
    // aligned unnest + generate_subscripts index the vector; per-(label,
    // dim) mean rounded 6dp, norm recomputed from the ROUNDED centroid so
    // both engines feed identical inputs to the final sqrt; the centroid
    // itself serializes as comma-joined micro-unit integers (see Spark
    // side — array cells and double rendering are not hash-portable)
    "q_embed_centroids" ->
      """WITH x AS (SELECT label, i, CAST(v AS DOUBLE) AS v FROM (
        |    SELECT label, unnest(embedding) AS v,
        |      generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |g AS (SELECT label, i, SUM(v) AS sx, COUNT(*) AS n
        |      FROM x GROUP BY 1, 2),
        |c AS (SELECT label, MAX(n) AS n_vectors,
        |        list(ROUND(sx / n, 6) ORDER BY i) AS centroid
        |      FROM g GROUP BY label)
        |SELECT label, CAST(n_vectors AS BIGINT) AS n_vectors,
        |  COALESCE(array_to_string(list_transform(centroid,
        |    y -> CAST(CAST(ROUND(y * 1000000) AS BIGINT) AS VARCHAR)), ','),
        |    '') AS centroid_q6,
        |  ROUND(sqrt(list_sum(list_transform(centroid, y -> y * y))), 6)
        |    AS centroid_norm
        |FROM c ORDER BY label""".stripMargin,
    // parallel unnest zips the two arrays; float→double casts are exact,
    // products exact, and the 6-dp round before ranking absorbs summation
    // order noise
    "q_sim_cosine_topk" ->
      """WITH probe AS (SELECT label, MIN(vec_id) AS pid FROM embeddings GROUP BY label),
        |pv AS (SELECT p.label AS p_label, e.embedding AS pe
        |       FROM probe p JOIN embeddings e ON e.vec_id = p.pid),
        |z AS (SELECT pv.p_label, e.vec_id,
        |        CAST(unnest(pv.pe) AS DOUBLE) AS px,
        |        CAST(unnest(e.embedding) AS DOUBLE) AS ex
        |      FROM pv CROSS JOIN embeddings e),
        |dots AS (SELECT p_label, vec_id, SUM(px*ex) AS dp,
        |                SUM(px*px) AS p2, SUM(ex*ex) AS n2
        |         FROM z GROUP BY 1, 2),
        |sims AS (SELECT p_label AS label, vec_id,
        |                ROUND(dp / (sqrt(p2) * sqrt(n2)), 6) AS sim FROM dots),
        |r AS (SELECT label, vec_id, sim,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY label
        |          ORDER BY sim DESC, vec_id ASC) AS INT) AS rn FROM sims)
        |SELECT label, vec_id, sim, rn FROM r WHERE rn <= 5
        |ORDER BY label, rn""".stripMargin,
    "q_embed_norm" ->
      """SELECT vec_id,
        |  ROUND(sqrt(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
        |  CAST(len(embedding) AS INT) AS dim,
        |  ROUND(list_max(list_transform(embedding,
        |        x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    127.0 / list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS scale,
        |    embedding FROM embeddings)
        |SELECT vec_id, ROUND(scale, 6) AS scale6,
        |  list_sum(list_transform(embedding,
        |    x -> CAST(CAST(round(CAST(x AS DOUBLE)*scale) AS INT) AS DOUBLE))) AS qsum,
        |  ROUND(list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE) -
        |         CAST(round(CAST(x AS DOUBLE)*scale) AS INT)/scale))), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
  )
}
