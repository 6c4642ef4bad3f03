package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-first wave: triplet mining over embeddings (the
  * hard-positive / hard-negative / semi-hard report a metric-learning
  * trainer feeds on), the Wald–Wolfowitz runs test (randomness of the
  * hourly series' above-mean signs — autocorrelation's nonparametric
  * cousin), and the weekly movers report (rank + rank-change of top
  * parts by revenue — the BI staple).
  *
  * Scale notes:
  *  - Triplet mining broadcasts the ≤20-anchor probe set against the
  *    corpus (the q_sim_cosine_topk funnel shape) and computes each
  *    anchor's extremes with ONE argmin/argmax aggregation — no
  *    per-anchor sort, no corpus×corpus pair explosion. Similarity
  *    uses the codegen'd float_dot native expression.
  *  - Runs test: signs are EXACT integer comparisons (c·H > S — no
  *    rational mean materialized); one hour-ordered window per type
  *    over the bounded hourly table; the z finish is a fixed double
  *    tree over four exact integers.
  *  - Movers: one (week, part) revenue shuffle, a per-week rank
  *    window, a per-part lag window, and a 1-row broadcast max-week
  *    filter — no week×week self-join. */
object Analytics21 {

  /** Hard-positive/hard-negative/semi-hard triplet report for the
    * first 20 anchors: lowest same-label sim, highest cross-label
    * sim, and the count of negatives closer than the hardest
    * positive. */
  private def qEmbedTriplet(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // float_dot (idempotent)
    val emb = t(s, d, "embeddings")
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("a"), col("label").as("al"),
        col("embedding").as("ae"))
    val sims = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("a"))
      .select(col("a"), col("al"), col("vec_id").as("c"),
        col("label").as("cl"),
        expr("ROUND(CAST(float_dot(ae, embedding) AS DOUBLE) " +
          "/ (sqrt(CAST(float_dot(ae, ae) AS DOUBLE)) " +
          "* sqrt(CAST(float_dot(embedding, embedding) AS DOUBLE))), 6)")
          .as("sim"))
    val agg = sims.groupBy(col("a"), col("al"))
      .agg(
        min(when(col("cl") === col("al"),
          struct(col("sim"), col("c")))).as("hp"),
        max(when(col("cl") =!= col("al"),
          struct(col("sim"), col("c")))).as("hn"))
    // semi-hard: negatives with sim above the hardest positive's sim
    val semi = sims.join(
        agg.select(col("a"), col("hp.sim").as("hps")).hint("shuffle_hash"),
        Seq("a"))
      .filter(col("cl") =!= col("al") && col("sim") > col("hps"))
      .groupBy(col("a")).agg(count(lit(1)).as("n_semihard"))
    agg.join(semi, Seq("a"), "left")
      .select(col("a").as("vec_id"), col("al").as("label"),
        col("hp.c").as("hard_pos_id"), col("hp.sim").as("hard_pos_sim"),
        col("hn.c").as("hard_neg_id"), col("hn.sim").as("hard_neg_sim"),
        coalesce(col("n_semihard"), lit(0L)).as("n_semihard"))
      .orderBy(col("vec_id"))
  }

  /** Wald–Wolfowitz runs test per event type on the hourly series'
    * above-mean signs (sign via the exact c·H > S integer lattice). */
  private def qAggRuns(s: SparkSession, d: String): DataFrame = {
    val hr = events(s, d)
      .select(col("event_type").as("et"), expr("us div 3600000000").as("h"))
      .groupBy(col("et"), col("h")).agg(count(lit(1)).as("c"))
    val tot = hr.groupBy(col("et"))
      .agg(count(lit(1)).as("hh"), sum(col("c")).as("s"))
    val signed = hr.join(broadcast(tot), Seq("et"))
      .withColumn("sg", when(col("c") * col("hh") > col("s"), 1L)
        .otherwise(0L))
    val w = Window.partitionBy(col("et")).orderBy(col("h"))
    val runs = signed
      .withColumn("flip",
        when(lag(col("sg"), 1).over(w).isNull ||
          lag(col("sg"), 1).over(w) =!= col("sg"), 1L).otherwise(0L))
      .groupBy(col("et"))
      .agg(sum(col("flip")).as("r"), sum(col("sg")).as("n1"),
        sum(lit(1L) - col("sg")).as("n2"))
    val n1 = dbl(col("n1")); val n2 = dbl(col("n2"))
    val mu = lit(2.0) * n1 * n2 / (n1 + n2) + lit(1.0)
    val sig2 = (lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2)) /
      ((n1 + n2) * (n1 + n2) * (n1 + n2 - lit(1.0)))
    // a single hour or a one-sided sign series ⇒ σ² = 0 ⇒ z
    // undefined → NULL, not an ANSI divide-by-zero
    runs.select(col("et").as("event_type"), col("r").as("n_runs"),
      col("n1"), col("n2"), round(mu, 6).as("mu"),
      when(col("n1") > 0 && col("n2") > 0 && col("n1") + col("n2") > 1,
        round((dbl(col("r")) - mu) / sqrt(sig2), 6)).as("z"))
      .orderBy(col("event_type"))
  }

  /** Weekly movers: the latest week's top-20 parts by revenue with
    * their previous-week rank and the rank delta. */
  private def qWinMovers(s: SparkSession, d: String): DataFrame = {
    val wkRev = t(s, d, "lineitem")
      .select(col("l_partkey").as("part"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 604800000000")
          .as("wk"),
        dec(col("l_extendedprice")).as("rev"))
      .groupBy(col("part"), col("wk")).agg(sum(col("rev")).as("rev"))
    val wRank = Window.partitionBy(col("wk"))
      .orderBy(col("rev").desc, col("part"))
    val wPart = Window.partitionBy(col("part")).orderBy(col("wk"))
    val ranked = wkRev.withColumn("rk", rank().over(wRank))
      // one projection → one Window node for the two same-spec lags
      .select(col("*"),
        lag(col("rk"), 1).over(wPart).as("prev_rk"),
        lag(col("wk"), 1).over(wPart).as("prev_wk"))
    val maxWk = wkRev.agg(max(col("wk")).as("mw"))
    ranked.crossJoin(broadcast(maxWk))
      .filter(col("wk") === col("mw") && col("rk") <= 20)
      .select(col("part"), col("wk").as("week"), col("rk").as("rnk"),
        // only an IMMEDIATELY previous week counts as a prior ranking
        when(col("prev_wk") === col("wk") - 1, col("prev_rk"))
          .as("prev_rank"),
        when(col("prev_wk") === col("wk") - 1, col("prev_rk") - col("rk"))
          .as("rank_gain"),
        dbl(col("rev")).as("revenue"))
      .orderBy(col("rnk"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_triplet" -> (qEmbedTriplet _),
    "q_agg_runs" -> (qAggRuns _),
    "q_win_movers" -> (qWinMovers _),
  )

  val sql: Map[String, String] = Map(
    "q_embed_triplet" ->
      """WITH probes AS (
        |  SELECT vec_id AS a, label AS al, embedding AS ae
        |  FROM embeddings WHERE vec_id < 20),
        |z AS (SELECT p.a, p.al, e.vec_id AS c, e.label AS cl,
        |        CAST(unnest(p.ae) AS DOUBLE) AS px,
        |        CAST(unnest(e.embedding) AS DOUBLE) AS ex
        |      FROM probes p CROSS JOIN embeddings e
        |      WHERE e.vec_id <> p.a),
        |sims AS (
        |  SELECT a, al, c, cl,
        |    ROUND(SUM(px*ex) / (sqrt(SUM(px*px)) * sqrt(SUM(ex*ex))), 6)
        |      AS sim
        |  FROM z GROUP BY a, al, c, cl),
        |agg AS (
        |  SELECT a, al,
        |    min(CASE WHEN cl = al
        |             THEN struct_pack(sim := sim, c := c) END) AS hp,
        |    max(CASE WHEN cl <> al
        |             THEN struct_pack(sim := sim, c := c) END) AS hn
        |  FROM sims GROUP BY a, al),
        |sh AS (
        |  SELECT s.a, CAST(count(*) AS BIGINT) AS n_semihard
        |  FROM sims s JOIN agg ON s.a = agg.a
        |  WHERE s.cl <> s.al AND s.sim > (agg.hp).sim
        |  GROUP BY s.a)
        |SELECT agg.a AS vec_id, agg.al AS label,
        |  (hp).c AS hard_pos_id, (hp).sim AS hard_pos_sim,
        |  (hn).c AS hard_neg_id, (hn).sim AS hard_neg_sim,
        |  COALESCE(n_semihard, 0) AS n_semihard
        |FROM agg LEFT JOIN sh ON agg.a = sh.a
        |ORDER BY vec_id""".stripMargin,
    "q_agg_runs" ->
      """WITH hr AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT et, CAST(count(*) AS BIGINT) AS hh,
        |          CAST(sum(c) AS BIGINT) AS s
        |        FROM hr GROUP BY et),
        |signed AS (
        |  SELECT hr.et, hr.h,
        |    CASE WHEN hr.c * tot.hh > tot.s THEN 1 ELSE 0 END AS sg
        |  FROM hr JOIN tot ON hr.et = tot.et),
        |flips AS (
        |  SELECT et, sg,
        |    CASE WHEN lag(sg, 1) OVER (PARTITION BY et ORDER BY h)
        |           IS DISTINCT FROM sg THEN 1 ELSE 0 END AS flip
        |  FROM signed),
        |runs AS (
        |  SELECT et, CAST(sum(flip) AS BIGINT) AS r,
        |    CAST(sum(sg) AS BIGINT) AS n1,
        |    CAST(sum(1 - sg) AS BIGINT) AS n2
        |  FROM flips GROUP BY et)
        |SELECT et AS event_type, r AS n_runs, n1, n2,
        |  round(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0, 6) AS mu,
        |  round((CAST(r AS DOUBLE)
        |      - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
        |    / sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |        * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |          - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
        |      / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |        * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0))), 6)
        |    AS z
        |FROM runs ORDER BY event_type""".stripMargin,
    "q_win_movers" ->
      """WITH wkrev AS (
        |  SELECT l_partkey AS part,
        |    epoch_us(CAST(l_shipdate AS TIMESTAMP)) // 604800000000 AS wk,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |r2 AS (
        |  SELECT part, wk, rev,
        |    rank() OVER (PARTITION BY wk ORDER BY rev DESC, part) AS rk
        |  FROM wkrev),
        |r3 AS (
        |  SELECT part, wk, rev, rk,
        |    lag(rk, 1) OVER (PARTITION BY part ORDER BY wk) AS prev_rk,
        |    lag(wk, 1) OVER (PARTITION BY part ORDER BY wk) AS prev_wk
        |  FROM r2),
        |mx AS (SELECT max(wk) AS mw FROM wkrev)
        |SELECT part, wk AS week, CAST(rk AS INT) AS rnk,
        |  CAST(CASE WHEN prev_wk = wk - 1 THEN prev_rk END AS INT)
        |    AS prev_rank,
        |  CAST(CASE WHEN prev_wk = wk - 1 THEN prev_rk - rk END AS INT)
        |    AS rank_gain,
        |  CAST(rev AS DOUBLE) AS revenue
        |FROM r3, mx WHERE wk = mw AND rk <= 20
        |ORDER BY rnk""".stripMargin,
  )
}
