package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 eighth wave: diversity-aware subset selection and binary
  * embedding retrieval —
  *
  *  - q_sample_coreset: greedy k-center (farthest-point) selection
  *    over the embedding corpus — the diversity-sampling pass a
  *    training-data pipeline runs when it can afford k exemplars and
  *    wants coverage, not redundancy (the geometric complement of the
  *    temperature/weighted samplers the engine already has). Reports
  *    the selection order, each pick's selection distance, and the
  *    final covering radius (the 2-approximation certificate of the
  *    k-center objective).
  *  - q_embed_binary: sign-bit binary quantization (64 dims → two
  *    32-bit words) with Hamming-distance top-k retrieval, evaluated
  *    against exact cosine top-k — the cheap first-stage retrieval
  *    tier (32× smaller vectors, XOR+popcount instead of float dots)
  *    shipped with its own recall report (the q_sim_recall pattern).
  *
  * Scale notes:
  *  - Coreset: greedy k-center is inherently k rounds; each round is
  *    ONE corpus scan against the ≤k-row broadcast center set with a
  *    map-side-combinable min/argmax reduce — no shuffle grows with
  *    k², nothing is ever collected to the driver. Distances round to
  *    9 dp before the argmax ordering (ties → smallest vec_id), so
  *    the greedy trajectory is engine-portable.
  *  - Binary: packing folds sign bits into two exact BIGINT words
  *    (one 64-bit word would overflow ANSI BIGINT arithmetic at bit
  *    64); Hamming is xor+bit_count on codegen'd integers. The
  *    probe side is a bounded broadcast; the corpus is scanned once
  *    for both rankings, and per-probe top-k uses rank windows over
  *    probe-keyed partitions. */
object Analytics51 {

  /** Squared L2 distance between two 64-dim float array columns as an
    * identical sequential fold in both engines. */
  private def d2(a: String, b: String): Column = expr(
    s"""aggregate(transform(sequence(1, 64),
       |  i -> (CAST(element_at($a, i) AS DOUBLE)
       |        - CAST(element_at($b, i) AS DOUBLE))
       |     * (CAST(element_at($a, i) AS DOUBLE)
       |        - CAST(element_at($b, i) AS DOUBLE))), 0D,
       |  (acc, p) -> acc + p)""".stripMargin)

  /** Greedy k-center selection (k = 4, seed = smallest vec_id):
    * selection order, selection distance, and final covering radius. */
  private def qSampleCoreset(s: SparkSession, d: String): DataFrame = {
    // Eager checkpoint of the (≤4-row) center set per pick (r15): the
    // old `centers = centers.union(next)` lineage embedded the previous
    // centers plan TWICE per iteration (once under broadcast inside
    // `next`, once as the union branch), doubling the plan per pick and
    // re-scanning embeddings for every historical pick on each new one.
    // Materializing 4 rows kills the re-scans; picks are deterministic
    // argmaxes — values unchanged.
    val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val seed = e.agg(min(col("vec_id")).as("sid"))
    var centers = e.join(broadcast(seed), col("vec_id") === col("sid"))
      .select(lit(1L).as("pick"), col("vec_id"),
        col("embedding").as("cemb"), lit(null).cast("double").as("sel_d"))
      .localCheckpoint(true)
    for (k <- 2L to 4L) {
      // min distance of every point to the current center set, then a
      // deterministic farthest pick (9-dp round, ties → smallest id) as
      // a map-side-combinable struct argmax — NOT a global row_number
      // window, which would sort the whole corpus in one partition
      val mind = e.crossJoin(broadcast(
          centers.select(col("cemb"), col("vec_id").as("cid"))))
        .withColumn("dd", d2("embedding", "cemb"))
        .groupBy(col("vec_id"))
        .agg(expr("ROUND(min(dd), 9)").as("mind"))
      val next = mind
        .agg(max(struct(col("mind"), (-col("vec_id")).as("nid"))).as("m"))
        .select(col("m.mind").as("mind"), (-col("m.nid")).as("vec_id"))
        .join(e, Seq("vec_id"))
        .select(lit(k).as("pick"), col("vec_id"),
          col("embedding").as("cemb"), col("mind").as("sel_d"))
      centers = centers.union(next).localCheckpoint(true)
    }
    val radius = e.crossJoin(broadcast(
        centers.select(col("cemb"), col("vec_id").as("cid"))))
      .withColumn("dd", d2("embedding", "cemb"))
      .groupBy(col("vec_id"))
      .agg(expr("ROUND(min(dd), 9)").as("mind"))
      .agg(max(col("mind")).as("r2"))
    centers.crossJoin(broadcast(radius))
      .select(col("pick"), col("vec_id"),
        round(col("sel_d"), 6).as("sel_d2"),
        round(col("r2"), 6).as("cover_r2"))
      .orderBy(col("pick"))
  }

  /** Sign-bit binary quantization + Hamming top-5 retrieval for the 8
    * probe vectors, with recall against exact cosine top-5. */
  private def qEmbedBinary(s: SparkSession, d: String): DataFrame = {
    // two 32-bit words: acc*2 + sign-bit, folded high-to-low so word
    // values are canonical; one 64-bit word would overflow ANSI BIGINT
    def word(lo: Int, hi: Int, src: String): Column = expr(
      s"""aggregate(transform(sequence($lo, $hi),
         |  i -> CASE WHEN CAST(element_at($src, i) AS DOUBLE) >= 0.0
         |            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END),
         |  CAST(0 AS BIGINT), (acc, b) -> acc * 2 + b)""".stripMargin)
    val e = t(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"),
        word(1, 32, "embedding").as("w1"),
        word(33, 64, "embedding").as("w2"),
        expr("""SQRT(aggregate(transform(sequence(1, 64),
          |  i -> CAST(element_at(embedding, i) AS DOUBLE)
          |     * CAST(element_at(embedding, i) AS DOUBLE)), 0D,
          |  (acc, p) -> acc + p))""".stripMargin).as("nrm"))
    val probes = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("pid"), col("embedding").as("pemb"),
        col("w1").as("pw1"), col("w2").as("pw2"), col("nrm").as("pnrm"))
    val pairs = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("pid"))
      .withColumn("ham", expr(
        "bit_count(w1 ^ pw1) + bit_count(w2 ^ pw2)"))
      .withColumn("cos", expr(
        """ROUND(CASE WHEN nrm > 0 AND pnrm > 0 THEN
          |  aggregate(transform(sequence(1, 64),
          |    i -> CAST(element_at(embedding, i) AS DOUBLE)
          |       * CAST(element_at(pemb, i) AS DOUBLE)), 0D,
          |    (acc, p) -> acc + p) / nrm / pnrm
          |  ELSE CAST(0.0 AS DOUBLE) END, 9)""".stripMargin))
    val wHam = Window.partitionBy(col("pid"))
      .orderBy(col("ham"), col("vec_id"))
    val wCos = Window.partitionBy(col("pid"))
      .orderBy(col("cos").desc, col("vec_id"))
    // two SEPARATE rank→filter pipelines so each window qualifies for
    // WindowGroupLimit map-side pruning (a single pass filtered on the
    // OR of two ranks would have to rank the full corpus per probe)
    val topHam = pairs.withColumn("rh", row_number().over(wHam))
      .filter(col("rh") <= 5).select(col("pid"), col("vec_id"))
    val topCos = pairs.withColumn("rc", row_number().over(wCos))
      .filter(col("rc") <= 5).select(col("pid"), col("vec_id"))
    val hits = topCos.join(topHam, Seq("pid", "vec_id"), "left_semi")
      .groupBy(col("pid")).agg(count(lit(1)).as("n_hit"))
    // keep zero-overlap probes in the report
    val rec = probes.select(col("pid"))
      .join(hits, Seq("pid"), "left")
      .select(col("pid"), coalesce(col("n_hit"), lit(0L)).as("n_overlap"))
    val mean = rec.agg(
      sum(col("n_overlap")).as("tot"), count(lit(1)).as("np"))
    rec.crossJoin(broadcast(mean))
      .select(col("pid").as("probe_id"), col("n_overlap"),
        round(expr("CAST(n_overlap AS DOUBLE) / 5.0"), 6).as("recall_at5"),
        round(expr("CAST(tot AS DOUBLE) / (5.0 * CAST(np AS DOUBLE))"), 6)
          .as("mean_recall"))
      .orderBy(col("probe_id"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_sample_coreset" -> (qSampleCoreset _),
    "q_embed_binary" -> (qEmbedBinary _),
  )

  private val d2Sql =
    """list_reduce(list_transform(generate_series(1, 64),
      |      i -> (CAST(__P__[i] AS DOUBLE) - CAST(__C__[i] AS DOUBLE))
      |         * (CAST(__P__[i] AS DOUBLE) - CAST(__C__[i] AS DOUBLE))),
      |      (a, b) -> a + b)""".stripMargin

  val sql: Map[String, String] = Map(
    "q_sample_coreset" -> {
      def mind(cent: String) =
        s"""SELECT e.vec_id,
           |    ROUND(min(${d2Sql.replace("__P__", "e.embedding")
                .replace("__C__", "c.cemb")}), 9) AS mind
           |  FROM embeddings e, $cent c GROUP BY e.vec_id""".stripMargin
      def pick(m: String, k: Int) =
        s"""SELECT $k AS pick, vec_id, mind FROM (
           |  SELECT vec_id, mind,
           |    row_number() OVER (ORDER BY mind DESC, vec_id) AS rn
           |  FROM $m) z WHERE rn = 1""".stripMargin
      s"""WITH c1 AS (
        |  SELECT 1 AS pick, vec_id,
        |    CAST(NULL AS DOUBLE) AS mind, embedding AS cemb
        |  FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |m1 AS (${mind("c1")}),
        |p2 AS (${pick("m1", 2)}),
        |c2 AS (SELECT pick, vec_id, mind, cemb FROM c1
        |  UNION ALL SELECT p2.pick, p2.vec_id, p2.mind,
        |    e.embedding AS cemb
        |  FROM p2 JOIN embeddings e USING (vec_id)),
        |m2 AS (${mind("c2")}),
        |p3 AS (${pick("m2", 3)}),
        |c3 AS (SELECT pick, vec_id, mind, cemb FROM c2
        |  UNION ALL SELECT p3.pick, p3.vec_id, p3.mind,
        |    e.embedding AS cemb
        |  FROM p3 JOIN embeddings e USING (vec_id)),
        |m3 AS (${mind("c3")}),
        |p4 AS (${pick("m3", 4)}),
        |c4 AS (SELECT pick, vec_id, mind, cemb FROM c3
        |  UNION ALL SELECT p4.pick, p4.vec_id, p4.mind,
        |    e.embedding AS cemb
        |  FROM p4 JOIN embeddings e USING (vec_id)),
        |m4 AS (${mind("c4")}),
        |rad AS (SELECT max(mind) AS r2 FROM m4)
        |SELECT CAST(pick AS BIGINT) AS pick, vec_id,
        |  ROUND(mind, 6) AS sel_d2, ROUND(r2, 6) AS cover_r2
        |FROM c4 CROSS JOIN rad ORDER BY pick""".stripMargin
    },
    "q_embed_binary" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, 32),
        |        i -> CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0.0
        |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        |      (acc, b) -> acc * 2 + b) AS w1,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(33, 64),
        |        i -> CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0.0
        |             THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        |      (acc, b) -> acc * 2 + b) AS w2,
        |    SQRT(list_reduce(list_transform(generate_series(1, 64),
        |      i -> CAST(embedding[i] AS DOUBLE)
        |         * CAST(embedding[i] AS DOUBLE)), (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |probes AS (
        |  SELECT vec_id AS pid, embedding AS pemb, w1 AS pw1,
        |    w2 AS pw2, nrm AS pnrm
        |  FROM e WHERE vec_id < 8),
        |pairs AS (
        |  SELECT e.vec_id, pid,
        |    CAST(bit_count(xor(w1, pw1)) AS BIGINT)
        |      + CAST(bit_count(xor(w2, pw2)) AS BIGINT) AS ham,
        |    ROUND(CASE WHEN nrm > 0 AND pnrm > 0 THEN
        |      list_reduce(list_transform(generate_series(1, 64),
        |        i -> CAST(e.embedding[i] AS DOUBLE)
        |           * CAST(pemb[i] AS DOUBLE)), (a, b) -> a + b)
        |        / nrm / pnrm
        |      ELSE CAST(0.0 AS DOUBLE) END, 9) AS cos
        |  FROM e CROSS JOIN probes WHERE e.vec_id <> pid),
        |ranked AS (
        |  SELECT pid,
        |    row_number() OVER (PARTITION BY pid
        |      ORDER BY ham, vec_id) AS rh,
        |    row_number() OVER (PARTITION BY pid
        |      ORDER BY cos DESC, vec_id) AS rc
        |  FROM pairs),
        |rec AS (
        |  SELECT pid, CAST(sum(CASE WHEN rh <= 5 AND rc <= 5
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
        |  FROM ranked GROUP BY pid),
        |m AS (SELECT CAST(sum(n_overlap) AS BIGINT) AS tot,
        |  CAST(count(*) AS BIGINT) AS np FROM rec)
        |SELECT pid AS probe_id, n_overlap,
        |  ROUND(CAST(n_overlap AS DOUBLE) / 5.0, 6) AS recall_at5,
        |  ROUND(CAST(tot AS DOUBLE) / (5.0 * CAST(np AS DOUBLE)), 6)
        |    AS mean_recall
        |FROM rec CROSS JOIN m ORDER BY probe_id""".stripMargin,
  )
}
