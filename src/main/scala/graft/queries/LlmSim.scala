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
    * label's minimum vec_id. */
  private def probes(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
    t(s, d, "embeddings")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("label").as("p_label"), col("embedding").as("pe"))
  }

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

  /** IVF-style ANN: assign every vector to its nearest probe (the coarse
    * quantizer cell), then answer each probe's top-3 *within its own
    * cell only* (nprobe=1). Approximate by construction → no SQL oracle;
    * the ScalaTest checks recall against the exact baseline. At scale
    * the assignment is one broadcast-join pass and each query touches
    * 1/cells of the data. */
  private def qSimAnnIvf(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, d, "embeddings")
    val assigned = e.crossJoin(broadcast(probes(s, d)))
      .withColumn("sim", round(
        dot("pe", "embedding") /
          (sqrt(norm2("pe")) * sqrt(norm2("embedding"))), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("p_label").asc)))
      .filter(col("rn") === 1) // cell = nearest probe
      .select(col("vec_id"), col("p_label").as("cell"), col("sim"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    assigned.withColumn("k", row_number().over(w)).filter(col("k") <= 3)
      .select(col("cell"), col("vec_id"), col("sim"), col("k"))
      .orderBy("cell", "k")
  }

  /** Embedding near-dup pairs: random-hyperplane-style LSH bucket (sign
    * bits of the first 12 dims) + exact cosine inside the bucket.
    * Blocking keeps the pair space tiny on random data while true
    * near-dups (sign-stable) collide. */
  private def qDedupEmbed(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = t(s, d, "embeddings")
      .withColumn("bucket", expr(
        "aggregate(slice(embedding, 1, 12), 0L, (acc, x) -> acc * 2 + IF(x > 0f, 1L, 0L))"))
      .select(col("bucket"), col("vec_id"), col("embedding"))
    val a = e.select(col("bucket"), col("vec_id").as("a"),
      col("embedding").as("ea"))
    val b = e.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("eb"))
    a.join(b, Seq("bucket")).filter(col("a") < col("b"))
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

  val defs: Map[String, Relational.Q] = Map(
    "q_sim_cosine_topk" -> (qSimCosineTopk _),
    "q_sim_ann_ivf" -> (qSimAnnIvf _),
    "q_dedup_embed" -> (qDedupEmbed _),
    "q_embed_norm" -> (qEmbedNorm _),
    "q_embed_quantize" -> (qEmbedQuantize _),
  )

  val sql: Map[String, String] = Map(
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
