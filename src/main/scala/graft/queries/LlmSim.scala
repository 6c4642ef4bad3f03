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
  private def dot(a: String, b: String): Column = expr(s"float_dot($a, $b)")

  private def norm2(a: String): Column = dot(a, a)

  /** One deterministic probe vector per label: the embedding of the
    * label's minimum vec_id — a min_by hash aggregate (partial-agg'd,
    * no per-partition sort), not a window: the shuffle carries one row
    * per (label, input partition) instead of the whole table. */
  private def probes(s: SparkSession, d: String): DataFrame =
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

  private def unit(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
    v.map(x => (x / n).toFloat)
  }

  /** Map-only nearest-centroid assignment over literal centroids.
    * Cosine argmax needs only dot(e, c/|c|) — |e| is a common positive
    * factor; struct max orders by (sim, -cell) so ties pick the lowest
    * cell. */
  private def cellOf(cents: Array[Array[Float]]): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        call_function("float_dot", col("embedding"), typedlit(unit(c)))
          .as("s"),
        lit(-i).as("negcell"))
    }: _*)
    (lit(0) - array_max(scored).getField("negcell")).as("cell")
  }

  /** Deterministic coarse quantizer: hash-sample `cells` seed vectors,
    * one Lloyd refinement over a BOUNDED hash-sample of the corpus
    * (assign map-only, per-cell mean via a cell×dim aggregate — never a
    * whole-vector shuffle, and never a full-corpus training pass: at
    * 100 TB quantizer training touches ≤trainCap vectors, exactly like
    * sampled k-means in production ANN builds). Collected to the driver
    * like MLlib KMeans model state: cells×dim floats. */
  private def trainCoarse(s: SparkSession, e: DataFrame, cells: Int,
      trainCap: Int = 4096): Array[Array[Float]] = {
    import s.implicits._
    val train = e
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(trainCap)
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val seed: Array[Array[Float]] = train
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cells).select(col("embedding")).as[Array[Float]].collect()
    val dim = seed.head.length
    val means = train.withColumn("cell", cellOf(seed))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    train.unpersist(false)
    val cs = seed.map(_.clone())
    means.groupBy(_._1).foreach { case (c, rows) =>
      val v = new Array[Float](dim)
      rows.foreach { case (_, p, m) => v(p) = m.toFloat }
      cs(c) = v
    }
    cs
  }

  private[queries] def annIvf(s: SparkSession, d: String, cells: Int,
      nprobe: Int, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, d, "embeddings")
    val refined = trainCoarse(s, e, cells)
    val assigned = e.withColumn("cell", cellOf(refined))
    // each probe's nprobe nearest cells, from the same literal quantizer
    val probeCells = probes(s, d)
      .withColumn("ranked", slice(reverse(array_sort(array(
        refined.zipWithIndex.map { case (c, i) =>
          struct(
            call_function("float_dot", col("pe"), typedlit(unit(c))).as("s"),
            lit(i).as("cell"))
        }: _*))), 1, nprobe))
      .select(col("p_label"), col("pe"),
        explode(col("ranked.cell")).as("cell"))
    val scored = assigned.join(broadcast(probeCells), Seq("cell"))
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
    * Pipeline (all model state driver-collected, MLlib-KMeans-style —
    * cells×dim + subspaces×codeBook×dsub doubles, a few KB):
    *   1. unit-normalize map-only (squared-L2 on unit vectors ranks
    *      exactly like cosine: ‖a−b‖² = 2 − 2·cos);
    *   2. product-quantize: split each unit vector into `subspaces`
    *      sub-vectors; per subspace, a `codeBook`-entry codebook
    *      (deterministic hash-sample seed + one Lloyd round) maps the
    *      sub-vector to its nearest-centroid index. Assignment is a
    *      broadcast join against the ≤128-row codebook + a min(struct)
    *      per (vector, subspace) — the per-vector work is bounded by
    *      subspaces×codeBook, never by corpus size;
    *   3. IVF routing reuses the shared coarse quantizer: probes search
    *      only their `nprobe` nearest cells;
    *   4. ADC (asymmetric distance): each probe precomputes a
    *      subspaces×codeBook table of exact sub-distances to every
    *      codebook centroid; a candidate's approximate distance is then
    *      `subspaces` table lookups summed — map-only over broadcast
    *      tables, no vector arithmetic in the scan;
    *   5. the native TopKPerGroup operator shortlists per probe
    *      (bounded heaps, ≤shortlist rows per partition shuffle), and an
    *      exact cosine rerank over the tiny shortlist restores true
    *      similarities — the standard prune→compress→rerank funnel.
    *
    * Lloyd means route through DECIMAL(28,18) so the codebook is
    * bit-stable across runs (double SUM is summation-order-dependent;
    * discrete codes would flip on borderline sub-vectors).
    * Approximate by construction → no SQL oracle; the ScalaTest pins the
    * funnel's exactness limit (nprobe=cells + full-width shortlist ≡ the
    * brute-force baseline) and recall at the operating point. */
  private def qSimAnnIvfPq(s: SparkSession, d: String): DataFrame =
    annIvfPq(s, d, cells = 8, nprobe = 6, subspaces = 8, codeBook = 16,
      shortlist = 32, k = 3)

  private[queries] def annIvfPq(s: SparkSession, d: String, cells: Int,
      nprobe: Int, subspaces: Int, codeBook: Int, shortlist: Int, k: Int)
      : DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val e = t(s, d, "embeddings")

    def unitD(v: Array[Float]): Array[Double] = {
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
      v.map(_.toDouble / n)
    }

    // 1. map-only normalize
    val en = e
      .withColumn("l2", sqrt(norm2("embedding")))
      .withColumn("un", expr("transform(embedding, x -> cast(x as double) / l2)"))

    // PQ seed doubles as the dim probe AND the coarse-quantizer source —
    // one collect instead of three driver jobs (seed + Lloyd means +
    // dim): with nprobe close to cells, cell-boundary quality barely
    // moves recall, so a hash-sampled quantizer without the Lloyd
    // refinement is the right cost point here (the refined trainer
    // stays in annIvf where nprobe is the only recall dial)
    require(codeBook >= cells, s"codeBook $codeBook < cells $cells")
    val pqSeed: Array[Array[Double]] = en
      .orderBy(xxhash64(col("vec_id"), lit(1)), col("vec_id"))
      .limit(codeBook).select(col("un")).as[Array[Double]].collect()
    val dim = pqSeed.head.length
    require(dim % subspaces == 0, s"dim $dim not divisible by $subspaces")
    val dsub = dim / subspaces
    val coarse: Array[Array[Float]] = pqSeed.take(cells)
      .map(_.map(_.toFloat))
    val enc = en.withColumn("cell", cellOf(coarse))

    // long sub-vector form: subspaces rows per vector
    def subExplode(df: DataFrame): DataFrame = df.select(
      col("vec_id"), col("cell"),
      explode(array((0 until subspaces).map(m => struct(lit(m).as("m"),
        slice(col("un"), m * dsub + 1, dsub).as("sl"))): _*)).as("s"))
      .select(col("vec_id"), col("cell"), col("s.m").as("m"),
        col("s.sl").as("sl"))
    // Codebook TRAINING runs on a bounded hash-sample (per-partition
    // heaps via TakeOrdered — no full sort): at 100 TB the Lloyd pass
    // touches ≤trainCap vectors, never the corpus; only the single
    // final encode pass is corpus-sized.
    val trainCap = 4096
    val subTrain = subExplode(
      enc.orderBy(xxhash64(col("vec_id"), lit(2)), col("vec_id"))
        .limit(trainCap))

    // 2. PQ codebooks: hash-sample seed (salted differently from the
    // coarse seed), one Lloyd round with decimal-routed means
    def encode(sub: DataFrame, cb: Seq[(Int, Int, Seq[Double])]): DataFrame =
      sub.join(broadcast(cb.toDF("m", "j", "cv")), Seq("m"))
        .withColumn("dist", expr(
          """aggregate(zip_with(sl, cv, (x, y) -> (x - y) * (x - y)),
            | cast(0.0 as double), (a, t) -> a + t)""".stripMargin))
        .groupBy(col("vec_id"), col("cell"), col("m"))
        .agg(min(struct(col("dist"), col("j"))).getField("j").as("code"))
    val cb0: Seq[(Int, Int, Seq[Double])] = for {
      m <- 0 until subspaces; j <- 0 until codeBook
    } yield (m, j, pqSeed(j).slice(m * dsub, (m + 1) * dsub).toSeq)
    val cb1: Seq[(Int, Int, Seq[Double])] = {
      val means = subTrain.join(encode(subTrain, cb0), Seq("vec_id", "cell", "m"))
        .select(col("m"), col("code"), posexplode(col("sl")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg((sum(col("x").cast("decimal(28,18)")) / count(lit(1)))
          .cast("double").as("mu"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getInt(2), r.getDouble(3))))
        .groupBy(_._1)
      cb0.map { case (m, j, v0) =>
        means.get((m, j)) match {
          case Some(rows) =>
            val v = v0.toArray.clone()
            rows.foreach { case (_, (p, mu)) => v(p) = mu }
            (m, j, v.toSeq)
          case None => (m, j, v0) // empty cluster keeps its seed
        }
      }
    }
    val cbArr: Array[Array[Array[Double]]] = {
      val a = Array.ofDim[Array[Double]](subspaces, codeBook)
      cb1.foreach { case (m, j, v) => a(m)(j) = v.toArray }
      a
    }

    // packed codes: ONE array<int> column per vector — this (plus the
    // cell id) is the entire search-time representation of the corpus.
    // The corpus-wide encode is a PURE MAP (argmin over the literal
    // codebooks, the same fold arithmetic as the training encode): no
    // explode, no join, no shuffle touches the corpus before the
    // bounded-heap shortlist. Only training (≤trainCap rows) uses the
    // long/join form, which the Lloyd means need anyway.
    // one transform-over-literal-codebook per subspace (8 expressions,
    // not 128): the 16-entry argmin loops inside the higher-order
    // function, keeping the generated code small; the zip_with fold is
    // byte-identical arithmetic to the training encode
    val codesCol: Column = array((0 until subspaces).map { m =>
      val sl = slice(col("un"), m * dsub + 1, dsub)
      val cbm: Seq[(Seq[Double], Int)] =
        (0 until codeBook).map(j => (cb1(m * codeBook + j)._3, j))
      array_min(transform(typedlit(cbm), c =>
        struct(
          aggregate(
            zip_with(sl, c.getField("_1"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (a, t) => a + t).as("d"),
          c.getField("_2").as("j")))).getField("j")
    }: _*)
    val packed = enc.select(col("vec_id"), col("cell"),
      codesCol.as("codes"))

    // 3.+4. per-probe: nprobe nearest cells + exact ADC distance table,
    // both computed driver-side from the tiny collected probe set
    // (collected ONCE — the rerank reuses the same rows instead of
    // re-running the probe window over the corpus)
    val probeArr: Seq[(Int, Array[Float])] = probes(s, d).collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
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
      .select(col("p_label"), col("vec_id"), col("negadc"))

    // 5. bounded-heap shortlist, then exact rerank of the tiny survivor set
    val short = graft.plans.TopKPerGroup(adc, groupCols = Seq("p_label"),
      orderCol = "negadc", tieCols = Seq("vec_id"), k = shortlist)
      .select(col("p_label"), col("vec_id"))
    e.select(col("vec_id"), col("embedding")).join(broadcast(short), Seq("vec_id"))
      .join(broadcast(probeArr.toDF("p_label", "pe")), Seq("p_label"))
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
  private def qDedupEmbed(s: SparkSession, d: String): DataFrame = {
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
      .select(col("a"), col("b"), col("sim"), col("is_dup"))
      .orderBy("a", "b")
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
