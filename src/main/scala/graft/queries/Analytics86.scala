package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-13 fourth wave: the centrality family beyond PageRank/HITS —
  * four oracled operators on the support-≥2 co-purchase graph:
  *
  *  - q_graph_katz: 3-term truncated Katz centrality — Σ_{l≤3} α^l ·
  *    (walks of length l ending at v), α = 0.1. Walk counts are exact
  *    BIGINT message-passing sums, so the weighted combination
  *    (100·w1 + 10·w2 + w3)/1000 is exact in both engines;
  *  - q_graph_eigen: eigenvector centrality, 3 power-iteration rounds
  *    with max-normalization per round on a floor-integer lattice
  *    (r ← ⌊Σ_nbr r · 1e6 / max⌋) — all-BIGINT, no float accumulation;
  *  - q_graph_ppr: personalized PageRank from the top-degree seed
  *    (teleport mass returns to the SEED, not uniformly) — "what is
  *    near the hub, weighted by random-walk proximity", the
  *    recommendation-seed primitive. Same 3-round unroll + BIGINT
  *    contribution lattice as q_graph_pagerank;
  *  - q_graph_powerlaw: continuous-MLE power-law exponent of the
  *    degree distribution (α̂ = 1 + n/Σ ln(d/(dmin−½))) with the
  *    degree extremes — the "is this graph scale-free" one-liner.
  *
  * Scale: every round is one node-keyed join against the bounded
  * co-pair edge table + a map-side-combined sum; normalization/seed
  * picks are 1-row broadcast aggregates; powerlaw is one degree
  * aggregate with a 12dp-ln DECIMAL sum. Round counts are fixed (3)
  * for oracle-expressibility — the convergence discipline lives in
  * q_graph_pagerank_fixpoint. */
object Analytics86 {

  private def symEdges(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    e.union(e.select(col("v").as("u"), col("u").as("v")))
  }

  /** 3-term Katz: exact integer walk counts. */
  private def qGraphKatz(s: SparkSession, d: String): DataFrame = {
    val sym = symEdges(s, d).localCheckpoint(true)
    val w1 = sym.groupBy(col("u")).agg(count(lit(1)).as("w1"))
    val w2 = sym.join(w1, Seq("u"))
      .groupBy(col("v")).agg(sum(col("w1")).as("w2"))
      .select(col("v").as("u"), col("w2"))
    val w3 = sym.join(w2, Seq("u"))
      .groupBy(col("v")).agg(sum(col("w2")).as("w3"))
      .select(col("v").as("u"), col("w3"))
    w1.join(w2, Seq("u"), "left").join(w3, Seq("u"), "left")
      .select(col("u").as("node"), col("w1"),
        coalesce(col("w2"), lit(0L)).as("w2"),
        coalesce(col("w3"), lit(0L)).as("w3"))
      .select(col("node"), col("w1"), col("w2"), col("w3"),
        round((lit(100L) * col("w1") + lit(10L) * col("w2") + col("w3"))
          .cast("decimal(38,0)") / lit(1000).cast("decimal(4,0)"), 6)
          .cast("double").as("katz"))
      .orderBy(desc("katz"), col("node")).limit(50)
  }

  /** Eigenvector centrality: 3 max-normalized power rounds, BIGINT. */
  private def qGraphEigen(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions)
    import s.implicits._
    val sym = symEdges(s, d).localCheckpoint(true)
    val r0 = sym.select(col("u")).distinct()
      .select(col("u"), lit(1000000L).as("r"))
    // Eager checkpoint of each round's message table (r15 — the
    // eigenFixpoint discipline applied to the oracled unroll): the max
    // subquery and the next round otherwise re-evaluate m's whole
    // join+agg lineage, compounding across the 3 nested rounds. The
    // 1-row max is FUSED into the checkpoint job via observe() (r16,
    // the eigenFixpoint pattern) and re-enters as a 1-row broadcast
    // local relation — one fewer job per round, exact integer lattice,
    // values unchanged (oracle-checked).
    def round1(rk: DataFrame): DataFrame = {
      val mPre = sym.join(rk, Seq("u"))
        .groupBy(col("v")).agg(sum(col("r")).as("s"))
        .select(col("v").as("u"), col("s"))
        .observe("eig_mx", max(col("s")).as("mx"))
      val m = mPre.localCheckpoint(true)
      val mx = mPre.queryExecution.observedMetrics("eig_mx")
        .getAs[Long]("mx")
      m.crossJoin(broadcast(Seq(mx).toDF("mx")))
        .select(col("u"), expr("(s * 1000000L) div mx").as("r"))
    }
    val r3 = round1(round1(round1(r0)))
    r3.select(col("u").as("node"), col("r").as("score"))
      .orderBy(desc("score"), col("node")).limit(50)
  }

  /** Personalized PageRank from the top-degree seed, 3 rounds. */
  private def qGraphPpr(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions)
    val sym = symEdges(s, d).localCheckpoint(true)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val seed = deg.orderBy(desc("deg"), col("u")).limit(1)
      .select(col("u").as("seed"))
    val nodes = deg.crossJoin(broadcast(seed))
      .select(col("u"), col("deg"),
        when(col("u") === col("seed"), 1.0).otherwise(0.0).as("ind"))
    var r = nodes.select(col("u"), col("deg"), col("ind"),
      col("ind").as("r"))
    for (_ <- 1 to 3) {
      val contrib = sym.join(r, Seq("u"))
        .select(col("v").as("u"),
          expr("CAST(floor(r * 1000000000000000.0 / CAST(deg AS DOUBLE))" +
            " AS BIGINT)").as("c"))
      val sums = contrib.groupBy(col("u")).agg(sum(col("c")).as("ss"))
      r = nodes.join(sums, Seq("u"), "left")
        .select(col("u"), col("deg"), col("ind"),
          expr("""0.15 * ind + 0.85
                | * (CAST(coalesce(ss, 0L) AS DOUBLE)
                |    / 1000000000000000.0)""".stripMargin).as("r"))
        .localCheckpoint(true)
    }
    r.filter(col("r") > 0.0)
      .select(col("u").as("node"), round(col("r"), 12).as("ppr"))
      .orderBy(desc("ppr"), col("node")).limit(50)
  }

  /** Power-law degree exponent (continuous MLE with the −½ offset). */
  private def qGraphPowerlaw(s: SparkSession, d: String): DataFrame = {
    val deg = symEdges(s, d).groupBy(col("u"))
      .agg(count(lit(1)).as("deg"))
    val mn = deg.agg(min(col("deg")).as("dmin"))
    deg.crossJoin(broadcast(mn))
      .select(col("deg"), col("dmin"),
        expr("""CAST(ROUND(ln(CAST(deg AS DOUBLE)
               |  / (CAST(dmin AS DOUBLE) - 0.5)), 12)
               | AS DECIMAL(30,12))""".stripMargin).as("lt"))
      .agg(count(lit(1)).as("n_nodes"), max(col("dmin")).as("dmin"),
        max(col("deg")).as("dmax"), sum(col("deg")).as("sdeg"),
        sum(col("lt")).as("slt"))
      .select(col("n_nodes"), col("dmin"), col("dmax"),
        round(dbl(col("sdeg")) / dbl(col("n_nodes")), 6).as("mean_deg"),
        when(dbl(col("slt")) > 0.0,
          round(lit(1.0) + dbl(col("n_nodes")) / dbl(col("slt")), 6))
          .as("alpha_mle"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_katz" -> (qGraphKatz _),
    "q_graph_eigen" -> (qGraphEigen _),
    "q_graph_ppr" -> (qGraphPpr _),
    "q_graph_powerlaw" -> (qGraphPowerlaw _),
  )

  private val head =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |            FROM lineitem),
      |e AS (SELECT a.pk AS u, b.pk AS v
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |      GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_graph_katz" -> (head +
      """w1 AS (SELECT u, CAST(count(*) AS BIGINT) AS w1
        |       FROM sym GROUP BY u),
        |w2 AS (SELECT s.v AS u, CAST(sum(w1.w1) AS BIGINT) AS w2
        |       FROM sym s JOIN w1 ON s.u = w1.u GROUP BY s.v),
        |w3 AS (SELECT s.v AS u, CAST(sum(w2.w2) AS BIGINT) AS w3
        |       FROM sym s JOIN w2 ON s.u = w2.u GROUP BY s.v)
        |SELECT w1.u AS node, w1.w1,
        |  CAST(coalesce(w2.w2, 0) AS BIGINT) AS w2,
        |  CAST(coalesce(w3.w3, 0) AS BIGINT) AS w3,
        |  CAST(ROUND(CAST(100 * w1.w1 + 10 * coalesce(w2.w2, 0)
        |      + coalesce(w3.w3, 0) AS DECIMAL(38,0))
        |    / CAST(1000 AS DECIMAL(4,0)), 6) AS DOUBLE) AS katz
        |FROM w1 LEFT JOIN w2 ON w1.u = w2.u LEFT JOIN w3 ON w1.u = w3.u
        |ORDER BY katz DESC, node LIMIT 50""".stripMargin),
    "q_graph_eigen" -> (head +
      """r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r
        |       FROM (SELECT DISTINCT u FROM sym)),
        |m1 AS MATERIALIZED (SELECT s.v AS u, CAST(sum(r) AS BIGINT) AS s
        |       FROM sym s JOIN r0 ON s.u = r0.u GROUP BY s.v),
        |r1 AS MATERIALIZED (SELECT u, CAST(s * 1000000 // (SELECT max(s) FROM m1)
        |         AS BIGINT) AS r FROM m1),
        |m2 AS MATERIALIZED (SELECT s.v AS u, CAST(sum(r) AS BIGINT) AS s
        |       FROM sym s JOIN r1 ON s.u = r1.u GROUP BY s.v),
        |r2 AS MATERIALIZED (SELECT u, CAST(s * 1000000 // (SELECT max(s) FROM m2)
        |         AS BIGINT) AS r FROM m2),
        |m3 AS MATERIALIZED (SELECT s.v AS u, CAST(sum(r) AS BIGINT) AS s
        |       FROM sym s JOIN r2 ON s.u = r2.u GROUP BY s.v),
        |r3 AS MATERIALIZED (SELECT u, CAST(s * 1000000 // (SELECT max(s) FROM m3)
        |         AS BIGINT) AS r FROM m3)
        |SELECT u AS node, r AS score FROM r3
        |ORDER BY score DESC, node LIMIT 50""".stripMargin),
    "q_graph_ppr" -> (head +
      """deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |seed AS (SELECT u AS seed FROM deg
        |         ORDER BY deg DESC, u LIMIT 1),
        |nodes AS (SELECT u, deg,
        |    CASE WHEN u = (SELECT seed FROM seed) THEN 1.0 ELSE 0.0 END
        |      AS ind
        |  FROM deg),
        |p0 AS (SELECT u, deg, ind, ind AS r FROM nodes),
        |c1 AS (SELECT s.v AS u, CAST(sum(CAST(floor(r
        |    * 1000000000000000.0 / CAST(p.deg AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS ss
        |  FROM sym s JOIN p0 p ON s.u = p.u GROUP BY s.v),
        |p1 AS (SELECT n.u, n.deg, n.ind,
        |    0.15 * n.ind + 0.85 * (CAST(coalesce(c1.ss, 0) AS DOUBLE)
        |      / 1000000000000000.0) AS r
        |  FROM nodes n LEFT JOIN c1 ON n.u = c1.u),
        |c2 AS (SELECT s.v AS u, CAST(sum(CAST(floor(r
        |    * 1000000000000000.0 / CAST(p.deg AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS ss
        |  FROM sym s JOIN p1 p ON s.u = p.u GROUP BY s.v),
        |p2 AS (SELECT n.u, n.deg, n.ind,
        |    0.15 * n.ind + 0.85 * (CAST(coalesce(c2.ss, 0) AS DOUBLE)
        |      / 1000000000000000.0) AS r
        |  FROM nodes n LEFT JOIN c2 ON n.u = c2.u),
        |c3 AS (SELECT s.v AS u, CAST(sum(CAST(floor(r
        |    * 1000000000000000.0 / CAST(p.deg AS DOUBLE)) AS BIGINT))
        |    AS BIGINT) AS ss
        |  FROM sym s JOIN p2 p ON s.u = p.u GROUP BY s.v),
        |p3 AS (SELECT n.u, n.deg, n.ind,
        |    0.15 * n.ind + 0.85 * (CAST(coalesce(c3.ss, 0) AS DOUBLE)
        |      / 1000000000000000.0) AS r
        |  FROM nodes n LEFT JOIN c3 ON n.u = c3.u)
        |SELECT u AS node, ROUND(r, 12) AS ppr FROM p3 WHERE r > 0.0
        |ORDER BY ppr DESC, node LIMIT 50""".stripMargin),
    "q_graph_powerlaw" -> (head +
      """deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |mn AS (SELECT CAST(min(deg) AS BIGINT) AS dmin FROM deg),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(max((SELECT dmin FROM mn)) AS BIGINT) AS dmin,
        |    CAST(max(deg) AS BIGINT) AS dmax,
        |    CAST(sum(deg) AS BIGINT) AS sdeg,
        |    sum(CAST(ROUND(ln(CAST(deg AS DOUBLE)
        |      / (CAST((SELECT dmin FROM mn) AS DOUBLE) - 0.5)), 12)
        |      AS DECIMAL(30,12))) AS slt
        |  FROM deg)
        |SELECT n_nodes, dmin, dmax,
        |  ROUND(CAST(sdeg AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
        |    AS mean_deg,
        |  CASE WHEN CAST(slt AS DOUBLE) > 0.0 THEN
        |    ROUND(1.0 + CAST(n_nodes AS DOUBLE) / CAST(slt AS DOUBLE), 6)
        |    END AS alpha_mle
        |FROM a""".stripMargin),
  )
}
