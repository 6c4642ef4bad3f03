package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 tenth wave: multi-criteria ranking (MCDA) — how a
  * warehouse turns three incomparable metrics into ONE defensible
  * ranking, three oracled operators over the per-supplier criterion
  * table (revenue, order volume, part breadth — one lineitem scan):
  *
  *  - q_win_borda: Borda rank aggregation — each criterion ranks all
  *    suppliers (deterministic row_number, supplier-key tiebreak),
  *    a supplier's Borda score is Σ_c (n − rank_c); top-20 by the
  *    consensus. The positional voting rule: robust to outlier
  *    magnitudes because only ranks enter.
  *  - q_win_copeland: Copeland pairwise-majority RUNOFF over the
  *    Borda top-20 — candidate a scores +1 per opponent it beats on
  *    a strict majority (≥2 of 3) of criteria. Full Copeland is
  *    inherently O(n²) pairwise and unshippable at corpus scale, so
  *    the production form is exactly this: a cheap positional rule
  *    prunes to a BOUNDED slate, the expensive pairwise rule
  *    adjudicates the slate (20×20 comparisons, constant forever).
  *  - q_win_topsis: TOPSIS closeness — criteria vector-normalized
  *    (x/√Σx², exact-integer norms broadcast), distance to the ideal
  *    and anti-ideal points, closeness d⁻/(d⁺+d⁻); top-20. The
  *    magnitude-aware counterpart to Borda's rank-only view.
  *
  * Determinism: criterion values are exact BIGINT aggregates; ranks
  * are row_number with the supplier-key tiebreak; TOPSIS normalizers
  * are doubles of exact integers with 9dp-rounded normalized values
  * so distances are fixed double trees. Scale: one lineitem scan to
  * the supplier-universe-bounded criterion table; the rank windows
  * ride that aggregate (the q_win_rfm precedent); Copeland's
  * pairwise work is capped at the 20-row slate by construction. */
object Analytics102 {

  /** Per-supplier criterion table: revenue cents, lineitem volume,
    * distinct-part breadth — one scan. */
  private def criteria(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select(col("l_suppkey").as("sk"),
        expr("CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100" +
          " AS BIGINT) AS DECIMAL(19,0))").as("cents"),
        col("l_partkey"))
      .groupBy(col("sk"))
      .agg(sum(col("cents")).as("rev"), count(lit(1)).as("vol"),
        countDistinct(col("l_partkey")).as("brd"))

  /** Criterion table + the three deterministic rank columns.
    *
    * The three partition-less windows below are single-partition sorts,
    * but over the SUPPLIER UNIVERSE (a dimension table: the lineitem
    * fact stream has already collapsed to one row per supplier in
    * `criteria`), not the fact data — the same bounded-input contract
    * kruskal/dunn document for their lattices. At 100× fact volume the
    * sorted set does not grow. */
  private def ranked(c: DataFrame): DataFrame = {
    c.withColumn("r_rev", row_number().over(
        Window.orderBy(desc("rev"), col("sk"))).cast("bigint"))
      .withColumn("r_vol", row_number().over(
        Window.orderBy(desc("vol"), col("sk"))).cast("bigint"))
      .withColumn("r_brd", row_number().over(
        Window.orderBy(desc("brd"), col("sk"))).cast("bigint"))
  }

  private def qWinBorda(s: SparkSession, d: String): DataFrame = {
    // Checkpoint the criterion table once (r15): the crossJoin(broadcast
    // (r.agg(count))) supplier-count subquery raced the main job and
    // re-ran the whole lineitem scan+aggregate+3 rank sorts a second
    // time. One supplier-sized checkpoint feeds the ranks AND folds the
    // count into a literal — identical integer Borda scores, one scan.
    val c = criteria(s, d).localCheckpoint(true)
    val n = c.count()
    ranked(c)
      .select(col("sk").as("suppkey"),
        (lit(3L * n) - col("r_rev") - col("r_vol") - col("r_brd"))
          .as("borda"),
        col("r_rev"), col("r_vol"), col("r_brd"))
      .orderBy(desc("borda"), col("suppkey"))
      .limit(20)
  }

  /** Copeland's pairwise cost model, explicit (VERDICT r14 #8): the
    * runoff compares slate² ordered pairs — 20 → 380 comparisons,
    * 100 → 9,900, n suppliers → O(n²), which is why the FULL rule is
    * unshippable at corpus scale and the production form prunes to a
    * positional-rule slate first. `slateSize` parameterizes that
    * trade; the registered operator uses 20 (the documented default),
    * and the pair join's cost is slateSize²-bounded by construction
    * regardless of fact volume. */
  private[queries] def copelandRunoff(s: SparkSession, d: String,
      slateSize: Int): DataFrame = {
    // slate = Borda top-`slateSize` over the FULL consensus table (the
    // registered q_win_borda output is itself the top-20 cut of it)
    // one checkpointed criterion table feeds the slate ranks AND the
    // pairwise values — the old shape re-derived the lineitem aggregate
    // three times (ranked, the count subquery, the slate join)
    val c0 = criteria(s, d).localCheckpoint(true)
    val n = c0.count()
    val slate = ranked(c0)
      .select(col("sk"),
        (lit(3L * n) - col("r_rev") - col("r_vol") - col("r_brd"))
          .as("borda"))
      .orderBy(desc("borda"), col("sk"))
      .limit(slateSize)
    val c = c0.join(slate, Seq("sk"))
      .localCheckpoint(true) // slateSize-row slate
    val a = c.select(col("sk").as("a"), col("rev").as("ra"),
      col("vol").as("va"), col("brd").as("ba"), col("borda"))
    val b = c.select(col("sk").as("b"), col("rev").as("rb"),
      col("vol").as("vb"), col("brd").as("bb"))
    a.join(b, col("a") =!= col("b"))
      .select(col("a"), col("borda"),
        // strict-majority win: ≥2 of 3 criteria strictly greater
        when((when(col("ra") > col("rb"), 1).otherwise(0)
          + when(col("va") > col("vb"), 1).otherwise(0)
          + when(col("ba") > col("bb"), 1).otherwise(0)) >= 2, 1L)
          .otherwise(0L).as("win"))
      .groupBy(col("a"), col("borda"))
      .agg(sum(col("win")).as("copeland"))
      .select(col("a").as("suppkey"), col("copeland"), col("borda"))
      .orderBy(desc("copeland"), desc("borda"), col("suppkey"))
  }

  private def qWinCopeland(s: SparkSession, d: String): DataFrame =
    copelandRunoff(s, d, slateSize = 20)

  private def qWinTopsis(s: SparkSession, d: String): DataFrame = {
    // checkpointed once (r15): the norms and ideal-point broadcast
    // subqueries each re-ran the lineitem scan+aggregate (the ideal one
    // twice over, since z embeds norms) — ~4 scans for one logical scan
    val c = criteria(s, d).localCheckpoint(true)
    val norms = c.agg(
      sum(col("rev") * col("rev")).as("n2r"),
      sum(expr("CAST(vol AS DECIMAL(19,0)) * CAST(vol AS DECIMAL(19,0))"))
        .as("n2v"),
      sum(expr("CAST(brd AS DECIMAL(19,0)) * CAST(brd AS DECIMAL(19,0))"))
        .as("n2b"))
    val z = c.crossJoin(broadcast(norms))
      .filter(dbl(col("n2r")) > 0 && dbl(col("n2v")) > 0
        && dbl(col("n2b")) > 0)
      .select(col("sk"),
        round(dbl(col("rev")) / sqrt(dbl(col("n2r"))), 9).as("zr"),
        round(dbl(col("vol")) / sqrt(dbl(col("n2v"))), 9).as("zv"),
        round(dbl(col("brd")) / sqrt(dbl(col("n2b"))), 9).as("zb"))
    val ideal = z.agg(max(col("zr")).as("ir"), max(col("zv")).as("iv"),
      max(col("zb")).as("ib"), min(col("zr")).as("wr"),
      min(col("zv")).as("wv"), min(col("zb")).as("wb"))
    z.crossJoin(broadcast(ideal))
      .select(col("sk").as("suppkey"),
        sqrt((col("zr") - col("ir")) * (col("zr") - col("ir"))
          + (col("zv") - col("iv")) * (col("zv") - col("iv"))
          + (col("zb") - col("ib")) * (col("zb") - col("ib"))).as("dp"),
        sqrt((col("zr") - col("wr")) * (col("zr") - col("wr"))
          + (col("zv") - col("wv")) * (col("zv") - col("wv"))
          + (col("zb") - col("wb")) * (col("zb") - col("wb"))).as("dm"))
      .filter(col("dp") + col("dm") > 0)
      .select(col("suppkey"),
        round(col("dm") / (col("dp") + col("dm")), 6).as("closeness"))
      .orderBy(desc("closeness"), col("suppkey"))
      .limit(20)
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_win_borda" -> (qWinBorda _),
    "q_win_copeland" -> (qWinCopeland _),
    "q_win_topsis" -> (qWinTopsis _),
  )

  private val crit =
    """WITH c AS (
      |  SELECT l_suppkey AS sk,
      |    sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
      |      AS BIGINT) AS DECIMAL(19,0))) AS rev,
      |    CAST(count(*) AS BIGINT) AS vol,
      |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS brd
      |  FROM lineitem GROUP BY 1),
      |""".stripMargin

  private val rankedSql = crit +
    """r AS (
      |  SELECT sk, rev, vol, brd,
      |    CAST(row_number() OVER (ORDER BY rev DESC, sk) AS BIGINT)
      |      AS r_rev,
      |    CAST(row_number() OVER (ORDER BY vol DESC, sk) AS BIGINT)
      |      AS r_vol,
      |    CAST(row_number() OVER (ORDER BY brd DESC, sk) AS BIGINT)
      |      AS r_brd
      |  FROM c),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r),
      |borda AS (
      |  SELECT sk AS suppkey,
      |    3 * n.n - r_rev - r_vol - r_brd AS borda,
      |    r_rev, r_vol, r_brd
      |  FROM r CROSS JOIN n),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_win_borda" -> (rankedSql +
      """top AS (SELECT * FROM borda
        |        ORDER BY borda DESC, suppkey LIMIT 20)
        |SELECT suppkey, borda, r_rev, r_vol, r_brd FROM top
        |ORDER BY borda DESC, suppkey""".stripMargin),
    "q_win_copeland" -> (rankedSql +
      """slate AS (
        |  SELECT suppkey AS sk, borda FROM borda
        |  ORDER BY borda DESC, suppkey LIMIT 20),
        |sc AS (
        |  SELECT c.sk, c.rev, c.vol, c.brd, slate.borda
        |  FROM c JOIN slate ON slate.sk = c.sk),
        |pairs AS (
        |  SELECT a.sk AS a, a.borda,
        |    CASE WHEN (CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END
        |      + CASE WHEN a.vol > b.vol THEN 1 ELSE 0 END
        |      + CASE WHEN a.brd > b.brd THEN 1 ELSE 0 END) >= 2
        |    THEN 1 ELSE 0 END AS win
        |  FROM sc a JOIN sc b ON a.sk <> b.sk)
        |SELECT a AS suppkey, CAST(sum(win) AS BIGINT) AS copeland,
        |  borda
        |FROM pairs GROUP BY a, borda
        |ORDER BY copeland DESC, borda DESC, suppkey""".stripMargin),
    "q_win_topsis" -> (crit +
      """norms AS (
        |  SELECT sum(rev * rev) AS n2r,
        |    sum(CAST(vol AS DECIMAL(19,0)) * CAST(vol AS DECIMAL(19,0)))
        |      AS n2v,
        |    sum(CAST(brd AS DECIMAL(19,0)) * CAST(brd AS DECIMAL(19,0)))
        |      AS n2b
        |  FROM c),
        |z AS (
        |  SELECT sk,
        |    ROUND(CAST(rev AS DOUBLE) / sqrt(CAST(n2r AS DOUBLE)), 9)
        |      AS zr,
        |    ROUND(CAST(vol AS DOUBLE) / sqrt(CAST(n2v AS DOUBLE)), 9)
        |      AS zv,
        |    ROUND(CAST(brd AS DOUBLE) / sqrt(CAST(n2b AS DOUBLE)), 9)
        |      AS zb
        |  FROM c CROSS JOIN norms
        |  WHERE CAST(n2r AS DOUBLE) > 0 AND CAST(n2v AS DOUBLE) > 0
        |    AND CAST(n2b AS DOUBLE) > 0),
        |ideal AS (
        |  SELECT max(zr) AS ir, max(zv) AS iv, max(zb) AS ib,
        |    min(zr) AS wr, min(zv) AS wv, min(zb) AS wb
        |  FROM z),
        |dist AS (
        |  SELECT sk AS suppkey,
        |    sqrt((zr - ir) * (zr - ir) + (zv - iv) * (zv - iv)
        |      + (zb - ib) * (zb - ib)) AS dp,
        |    sqrt((zr - wr) * (zr - wr) + (zv - wv) * (zv - wv)
        |      + (zb - wb) * (zb - wb)) AS dm
        |  FROM z CROSS JOIN ideal)
        |SELECT suppkey, ROUND(dm / (dp + dm), 6) AS closeness
        |FROM dist WHERE dp + dm > 0
        |ORDER BY closeness DESC, suppkey LIMIT 20""".stripMargin),
  )
}
