package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import Tables._

/** Round-7 fifth wave: k-hop BFS reach over the support-pruned
  * co-purchase graph, median-absolute-deviation robust scale, and
  * STREAMING content-signature dedup (the ingestion-time near-dup gate
  * — the batch minhash family's streaming sibling).
  *
  * Scale notes:
  *  - k-hop BFS is the unrolled-frontier shape (3 rounds like
  *    PageRank): each round is frontier ⋈ edges → distinct → except
  *    visited, every shuffle on the node key; frontier size is bounded
  *    by the support-pruned graph, and nothing collects to the driver
  *    (the BFS source is itself a 1-row subquery, not a literal).
  *  - MAD is the two-pass robust-scale twin of q_agg_winsorize: a
  *    group-count-sized median table broadcasts back for the deviation
  *    pass.
  *  - Streaming dedup keys on the FULL 16-minhash content signature
  *    inside the watermark window: signature-identical documents (exact
  *    dups and heavy near-dups — same shingle set) are suppressed at
  *    ingestion with bounded state (watermark evicts), while the batch
  *    LSH family handles the long-tail near-dups offline. State per key
  *    is one signature string; the watermark bounds total state. */
object Analytics6 {

  /** BFS reach from the highest-degree node of the support-≥2
    * co-purchase graph: frontier and cumulative sizes for hops 0..3 —
    * the neighborhood-growth profile (how fast the graph closes over
    * its hub). */
  /** NOT loop-width-wrapped (r16): unlike the node-state fixpoints,
    * every hop joins the full edge-sized relation (the frontier closes
    * over the hub in 2 hops), so narrowing the shuffle serializes real
    * CPU work — measured 2.29 s session-width vs 3.89 s at loop width
    * (min-of-4, sf0.1/32c). */
  private def qGraphKhop(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2) // materialized (Tables)
      .select(col("u"), col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val f0 = deg.orderBy(desc("deg"), col("u")).limit(1).select(col("u"))
      .localCheckpoint(true)
    // Eager checkpoint per hop (r15): each frontier is referenced by the
    // next hop's join AND except AND its own count branch, and the final
    // plan unions 8 count branches — unmaterialized, the hop lineage
    // re-evaluates multiplicatively across references. Frontiers are
    // node-sized; BFS sets are exact — values unchanged.
    def step(frontier: DataFrame, visited: DataFrame): DataFrame =
      sym.join(frontier, Seq("u")).select(col("v").as("u")).distinct()
        .except(visited)
        .localCheckpoint(true)
    val v0 = f0
    val f1 = step(f0, v0);  val v1 = v0.union(f1)
    val f2 = step(f1, v1);  val v2 = v1.union(f2)
    val f3 = step(f2, v2);  val v3 = v2.union(f3)
    def cnt(hop: Int, f: DataFrame, v: DataFrame): DataFrame =
      f.agg(count(lit(1)).as("frontier"))
        .crossJoin(v.agg(count(lit(1)).as("reached")))
        .select(lit(hop).as("hop"), col("frontier"), col("reached"))
    cnt(0, f0, v0).union(cnt(1, f1, v1)).union(cnt(2, f2, v2))
      .union(cnt(3, f3, v3))
      .orderBy("hop")
  }

  /** Median absolute deviation of quantity per return flag — the
    * robust-scale companion to the winsorized mean (location). Both
    * medians interpolate identically across engines (q_agg_median
    * discipline), and |x − med| is a single exact IEEE op. */
  private def qAggMad(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("x"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(expr("median(x)").as("med"))
    li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("dev", abs(col("x") - col("med")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), min(col("med")).as("med"),
        expr("median(dev)").as("mad"))
      .orderBy(col("l_returnflag"))
  }

  private[graft] case class SDoc(doc_id: Long, ts: java.sql.Timestamp,
      text: String)

  /** Streaming content-signature dedup: 3-word shingles → 16 seeded
    * minhashes → signature string → `dropDuplicates` within a 10-minute
    * watermark. Signature-identical docs (exact dups + same-shingle-set
    * near-dups) are suppressed at ingestion; state is watermark-bounded.
    * Declared per SURVEY §2.C rule 4 (streaming, no oracle) — the
    * Analytics6Spec MemoryStream run pins the semantics. */
  private[graft] def streamDedupTransform(df: DataFrame): DataFrame =
    df.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .withColumn("hs", expr(
        """transform(sequence(0, size(ws) - 3), i ->
          |  xxhash64(concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"""
          .stripMargin))
      .withColumn("sig", concat_ws(",",
        (0 until 16).map(i =>
          array_min(transform(col("hs"), h => xxhash64(lit(i), h)))): _*))
      .withWatermark("ts", "10 minutes")
      // dropDuplicatesWithinWatermark, not dropDuplicates: the key has
      // no event-time column, so plain dedup state would never evict —
      // the WithinWatermark variant expires signature state once the
      // watermark passes (bounded state at any ingestion volume).
      .dropDuplicatesWithinWatermark("sig")
      .select(col("doc_id"), col("sig"))

  private def qStreamDedupMinhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t0 = 1704067200L
    def doc(id: Long, offSec: Long, text: String): SDoc =
      SDoc(id, new java.sql.Timestamp((t0 + offSec) * 1000L), text)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SDoc](s)
    val name = s"sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = streamDedupTransform(input.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(Seq(
          doc(1, 10, "the quick brown fox jumps over the lazy dog"),
          doc(2, 20, "an entirely different document about spark plans"),
          doc(3, 30, "the quick brown fox jumps over the lazy dog")))
        q.processAllAvailable()
        input.addData(Seq(
          doc(4, 40, "an entirely different document about spark plans"),
          doc(5, 50, "novel content arriving in the second batch")))
        q.processAllAvailable()
      } finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name).select(col("doc_id")).orderBy("doc_id")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_khop" -> (qGraphKhop _),
    "q_agg_mad" -> (qAggMad _),
    "q_stream_dedup_minhash" -> (qStreamDedupMinhash _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_khop" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |f0 AS MATERIALIZED (SELECT u FROM deg ORDER BY deg DESC, u LIMIT 1),
        |v0 AS MATERIALIZED (SELECT u FROM f0),
        |f1 AS MATERIALIZED (SELECT DISTINCT s.v AS u FROM sym s JOIN f0 ON s.u = f0.u
        |       EXCEPT SELECT u FROM v0),
        |v1 AS MATERIALIZED (SELECT u FROM v0 UNION SELECT u FROM f1),
        |f2 AS MATERIALIZED (SELECT DISTINCT s.v AS u FROM sym s JOIN f1 ON s.u = f1.u
        |       EXCEPT SELECT u FROM v1),
        |v2 AS MATERIALIZED (SELECT u FROM v1 UNION SELECT u FROM f2),
        |f3 AS MATERIALIZED (SELECT DISTINCT s.v AS u FROM sym s JOIN f2 ON s.u = f2.u
        |       EXCEPT SELECT u FROM v2),
        |v3 AS MATERIALIZED (SELECT u FROM v2 UNION SELECT u FROM f3)
        |SELECT 0 AS hop, (SELECT CAST(count(*) AS BIGINT) FROM f0)
        |    AS frontier, (SELECT CAST(count(*) AS BIGINT) FROM v0)
        |    AS reached
        |UNION ALL SELECT 1, (SELECT CAST(count(*) AS BIGINT) FROM f1),
        |  (SELECT CAST(count(*) AS BIGINT) FROM v1)
        |UNION ALL SELECT 2, (SELECT CAST(count(*) AS BIGINT) FROM f2),
        |  (SELECT CAST(count(*) AS BIGINT) FROM v2)
        |UNION ALL SELECT 3, (SELECT CAST(count(*) AS BIGINT) FROM f3),
        |  (SELECT CAST(count(*) AS BIGINT) FROM v3)
        |ORDER BY hop""".stripMargin,
    "q_agg_mad" ->
      """WITH li AS (SELECT l_returnflag,
        |              CAST(l_quantity AS DOUBLE) AS x FROM lineitem),
        |med AS (SELECT l_returnflag, median(x) AS med
        |        FROM li GROUP BY l_returnflag)
        |SELECT li.l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  min(med.med) AS med, median(abs(li.x - med.med)) AS mad
        |FROM li JOIN med ON li.l_returnflag = med.l_returnflag
        |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin,
  )
}
