package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 first wave: the convergence discipline (Analytics83 —
  * data-driven round count, 1-row gate per round on checkpointed
  * state, eager lineage truncation) applied to the remaining
  * centralities, completing the family symmetry VERDICT r13 asked
  * for, plus the recommendation-production PPR form:
  *
  *  - q_graph_eigen_fixpoint: SHIFTED power iteration (m ← A·r + r,
  *    the NetworkX eigenvector_centrality convention) with per-round
  *    max-normalization on the unroll's ⌊s·1e6/max⌋ BIGINT lattice.
  *    The shift is load-bearing, not convention-following: pure-A
  *    max-normalized iteration PROVABLY enters a period-2 limit
  *    cycle on bipartite inputs (−λ₁ is an eigenvalue; the spec
  *    demonstrates the cycle on a star), so a convergent driver
  *    cannot reproduce q_graph_eigen's pure-A 3-round unroll
  *    bit-for-bit — A and A+I share eigenvectors (spectrum shifts
  *    by +1, making the gap strictly positive on connected graphs),
  *    so the CONVERGED scores agree with the true eigenvector,
  *    which the unroll only approximates anyway. Convergence is the
  *    n-scaled rule: Σ|r−prev| < n·tol·1e6 (MEAN per-node movement
  *    of the normalized score under tol — the convention the sf1
  *    rehearsal validated for PageRank; an absolute gate tightens
  *    with 1/n and burns rounds for no ranking change).
  *  - q_graph_hits_fixpoint: mutual-reinforcement iteration with BOTH
  *    vectors max-normalized per half-round on the 1e6 lattice (the
  *    oracled q_graph_hits unroll runs 2 rounds UNNORMALIZED for
  *    exact-integer oracle-checkability; unnormalized iterates grow
  *    like λ₁^k and overflow BIGINT near round 4-5 on the sf graphs,
  *    so the convergent form must normalize). Gate: n-scaled L1 on
  *    the authority lattice. A 1-round cap reproduces the in-degree
  *    ordering exactly (spec-pinned).
  *  - q_graph_katz_adaptive: Katz centrality with a DATA-DRIVEN
  *    attenuation and truncation depth — α = 1/(2·dmax) guarantees
  *    α·λ₁ ≤ α·dmax = ½ (λ₁ ≤ dmax for any graph), so the Neumann
  *    series converges at rate ≤ ½ and the iterate x ← 1 + α·A·x is
  *    a monotone-increasing BIGINT-lattice fixpoint (x on a 1e12
  *    lattice; x* ≤ 2 per node, message sums ≤ dmax·2e12 ≪ 2⁶³).
  *    The fixed-3-term q_graph_katz keeps the oracle; this is the
  *    form that answers "how deep do walks matter on THIS graph"
  *    instead of hard-coding 3. Monotone integers make zero
  *    movement the EXACT fixpoint, reached in ≤ ~40 rounds — the
  *    gate is exact, not a tolerance convention.
  *  - q_graph_ppr_multiseed: personalized PageRank from a seed SET
  *    (top-5 hubs by degree, teleport mass 1/5 each) — the
  *    recommendation-production form (a user's recent items, a
  *    topic's anchor pages). Kept as a fixed 3-round unroll on the
  *    q_graph_ppr contribution lattice so it stays ORACLED.
  *
  * Scale: identical to the Analytics83 story — per-round state is one
  * (node, score) row per node; the symmetric edge table is
  * hash-partitioned and persisted once so each round shuffles only
  * the node-sized score table; every gate and normalization is a
  * 1-row aggregate over already-checkpointed state. Round counts are
  * spectral-gap-driven and capped at 128 (eigen/HITS) / 64 (Katz,
  * rate ≤ ½ ⇒ ~30 rounds for 1e-9). */
object Analytics94 {

  private def symEdges(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    e.union(e.select(col("v").as("u"), col("u").as("v")))
  }

  /** Max-normalized SHIFTED power iteration (m ← A·r + r) on the
    * ⌊s·1e6/max⌋ lattice. Returns (final (u, r) lattice scores,
    * rounds run). `shift = false` gives the pure-A iteration — used
    * only by the spec to demonstrate the bipartite limit cycle the
    * shift exists to break. */
  /** `gateEvery`: pay the 1-row L1 gate job only every k-th round
    * after the `gateWarmup`-round warm-up (bounded staleness ≤ k−1
    * extra rounds). The r15 cadence experiment (EigenProbe, SCALE.md
    * "gate cadence" row) MEASURED on the sf0.1 graph (60 rounds):
    * k=1 12.1/12.9 s, k=2 10.1 s, k=4 8.9/8.8 s (−27%), k=8 9.4 s
    * (overshoots 60→64 rounds — the staleness cost becoming visible).
    * The gate job is ~0.07 s of driver-job latency per round; a
    * whole extra round is ~0.2 s, so k=4's ≤3-round worst-case
    * overshoot stays well under the ~45 saved gate jobs. The warm-up
    * keeps fast-converging graphs (HITS-class, ~5 rounds) exiting on
    * the exact round. Production default k=4. */
  private[graft] def eigenFixpoint(sym0: DataFrame, tol: Double = 1e-6,
      maxRounds: Int = 128, shift: Boolean = true,
      gateEvery: Int = 4, gateWarmup: Int = 8): (DataFrame, Int) = {
    val sess = sym0.sparkSession
    import sess.implicits._
    val e = sym0.repartition(col("u")).persist()
    var r = e.select(col("u")).distinct()
      .select(col("u"), lit(1000000L).as("r"))
      .localCheckpoint(true)
    val nNodes = r.agg(count(lit(1))).head.getLong(0)
    var rounds = 0
    var converged = nNodes == 0L
    while (!converged && rounds < maxRounds) {
      val nbr = e.join(r.select(col("u"), col("r")), "u")
        .groupBy(col("v")).agg(sum(col("r")).as("ns"))
        .select(col("v").as("u"), col("ns"))
      // checkpoint the message table FIRST; the 1-row max is FUSED into
      // the checkpoint job via observe() (r16, guide §2 job-count
      // reduction): the r15 form broadcast m.agg(max) OFF the
      // checkpoint, which still paid a separate 1-row job per execution
      // consuming r (up to 2× per round — the gate AND the next round
      // each re-materialize the BroadcastExchange). CollectMetrics
      // accumulates the max during materialization instead; the value
      // is read SYNCHRONOUSLY off the pre-checkpoint Dataset's
      // queryExecution (Observation.get waits on the ASYNC listener
      // bus — measured +4 s over 60 rounds). It then enters the plan
      // as a 1-row broadcast LOCAL relation — no job, and NOT a driver
      // literal: a per-round literal changes the generated source and
      // forces a janino recompile per round (measured SLOWER in r14);
      // the broadcast keeps one stable codegen shape. Same
      // (s * 1e6) div mx lattice — values bit-identical.
      val mPre = r.select(col("u"), col("r").as("pr"))
        .join(nbr, Seq("u"), "left")
        .select(col("u"), col("pr"),
          (coalesce(col("ns"), lit(0L)) +
            (if (shift) col("pr") else lit(0L))).as("s"))
        .observe("eig_mx", max(col("s")).as("mx"))
      val m = mPre.localCheckpoint(true)
      val mx = mPre.queryExecution.observedMetrics("eig_mx")
        .getAs[Long]("mx")
      r = m.crossJoin(broadcast(Seq(mx).toDF("mx")))
        .select(col("u"), expr("(s * 1000000L) div mx").as("r"),
          col("pr"))
      rounds += 1
      // ONE 1-row aggregate over node-sized checkpointed state:
      // mean normalized movement < tol (n-scaled stopping rule) —
      // per-round during warm-up, then only on-cadence rounds
      if (rounds <= gateWarmup || rounds % gateEvery == 0
          || rounds == maxRounds) {
        val l1 = r.agg(sum(abs(col("r") - col("pr"))).as("d"))
          .head.getLong(0)
        converged = l1 < tol * 1e6 * nNodes
      }
    }
    e.unpersist()
    (r.select(col("u"), col("r")), rounds)
  }

  /** Eigenvector centrality of the support-≥2 co-purchase graph,
    * iterated to the n-scaled mean-movement fixpoint on the unroll's
    * exact lattice (shifted iteration — see object doc). Same output
    * shape as q_graph_eigen (top-50 by score). Rule-4 (data-driven
    * round count); Analytics94Spec pins analytic star/cycle/
    * pendant-triangle fixtures against closed-form eigenvectors and
    * demonstrates the pure-A bipartite limit cycle the shift
    * breaks. */
  private def qGraphEigenFixpoint(s: SparkSession, d: String): DataFrame = {
    // loop-sized shuffle width (r16, Tables.loopPartitions): sf0.1/32c
    // 11.1 → 10.1 s min-of-3
    val (r, _) = withLoopParallelism(s, d) { eigenFixpoint(symEdges(s, d)) }
    r.select(col("u").as("node"), col("r").as("score"))
      .orderBy(desc("score"), col("node")).limit(50)
  }

  /** Max-normalized HITS on directed (c, p) edges. Returns
    * ((p, a) authority lattice, (c, h) hub lattice, rounds). */
  private[graft] def hitsFixpoint(e0: DataFrame, tol: Double = 1e-6,
      maxRounds: Int = 128): (DataFrame, DataFrame, Int) = {
    val sess = e0.sparkSession
    import sess.implicits._
    val e = e0.select(col("c"), col("p")).repartition(col("c")).persist()
    var h = e.select(col("c")).distinct()
      .select(col("c"), lit(1000000L).as("h")).localCheckpoint(true)
    var a = e.select(col("p")).distinct()
      .select(col("p"), lit(-1L).as("a")).localCheckpoint(true)
    val nAuth = a.agg(count(lit(1))).head.getLong(0)
    var rounds = 0
    var converged = nAuth == 0L
    while (!converged && rounds < maxRounds) {
      // same pattern as eigenFixpoint (r16): each half-round's 1-row max
      // is FUSED into its checkpoint job via observe() and read
      // synchronously off the pre-checkpoint queryExecution (never the
      // async-listener Observation.get), re-entering as a 1-row
      // broadcast local relation (no job, stable codegen shape — see
      // the eigen comment). Was 2 extra jobs/round.
      val asPre = e.join(h, "c").groupBy(col("p"))
        .agg(sum(col("h")).as("s"))
        .join(a.select(col("p"), col("a").as("pa")), "p")
        .observe("hits_amx", max(col("s")).as("mx"))
      val as = asPre.localCheckpoint(true)
      val amx = asPre.queryExecution.observedMetrics("hits_amx")
        .getAs[Long]("mx")
      val aNew = as.crossJoin(broadcast(Seq(amx).toDF("mx")))
        .select(col("p"), expr("(s * 1000000L) div mx").as("a"),
          col("pa"))
      // the per-round L1 gate rides the hub half-round's checkpoint job
      // too (r16): hs scans every aNew row (inner join above the metric
      // node; CollectMetrics is a pushdown barrier, so no filter can
      // drop rows beneath it), so sum|a − pa| accumulates for free
      // where it used to be a separate node-sized job per round. Same
      // gate value, same stopping decisions. `a` for the next round is
      // re-selected WITHOUT the metric node so the observation never
      // re-fires in later lineage.
      val aGate = aNew.observe("hits_l1",
        sum(abs(col("a") - col("pa"))).as("l1"))
      val hsPre = e.join(aGate.select(col("p"), col("a")), "p")
        .groupBy(col("c")).agg(sum(col("a")).as("s"))
        .observe("hits_hmx", max(col("s")).as("mx"))
      val hs = hsPre.localCheckpoint(true)
      val hmx = hsPre.queryExecution.observedMetrics("hits_hmx")
        .getAs[Long]("mx")
      h = hs.crossJoin(broadcast(Seq(hmx).toDF("mx")))
        .select(col("c"), expr("(s * 1000000L) div mx").as("h"))
      rounds += 1
      // r15 cadence note: the k=4 gate cadence was A/B'd here and
      // measured a WASH — HITS converges in few, individually expensive
      // rounds, so the gate reads per-round (it is free now anyway).
      val l1 = hsPre.queryExecution.observedMetrics("hits_l1")
        .getAs[Long]("l1")
      a = aNew.select(col("p"), col("a"))
      converged = l1 < tol * 1e6 * nAuth
    }
    e.unpersist()
    (a, h, rounds)
  }

  /** HITS hub/authority on the customer→part purchase graph, iterated
    * to the n-scaled authority fixpoint — same graph as the oracled
    * 2-round unroll q_graph_hits, but the scores are the converged
    * principal singular pair, not a 2-step partial. Top-20 authorities
    * with their hub-side maximum. Rule-4; Analytics94Spec pins the
    * 1-round cap to the exact in-degree ordering plus analytic
    * complete-bipartite/star fixtures. */
  private def qGraphHitsFixpoint(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
      .join(t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")),
        Seq("ok"))
      .select(col("c"), col("p")).distinct()
    // loop-sized shuffle width (r16, Tables.loopPartitions): sf0.1/32c
    // 7.8 → 6.3 s min-of-3
    val (a, h, _) = withLoopParallelism(s, d) { hitsFixpoint(e) }
    val maxHub = e.join(h, "c").groupBy(col("p"))
      .agg(max(col("h")).as("max_hub"))
    a.join(maxHub, Seq("p"))
      .select(col("p").as("part"), col("a").as("authority"),
        col("max_hub"))
      .orderBy(desc("authority"), col("part")).limit(20)
  }

  /** Monotone Katz fixpoint x ← 1 + A·x/(2·dmax) on a 1e12 lattice.
    * The iterate is monotone non-decreasing in exact integers and
    * bounded (contraction factor ≤ ½), so it reaches the EXACT
    * integer fixpoint in finitely many rounds — the default tol=0
    * gate stops on zero movement (~log₂(1e12) ≈ 40 rounds worst
    * case). Returns ((u, x) lattice scores, dmax, rounds). */
  private[graft] def katzAdaptive(sym0: DataFrame, tol: Double = 0.0,
      maxRounds: Int = 64): (DataFrame, Long, Int) = {
    val e = sym0.repartition(col("u")).persist()
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val dmaxRow = deg.agg(max(col("deg"))).head
    val dmax = if (dmaxRow.isNullAt(0)) 0L else dmaxRow.getLong(0)
    if (dmax == 0L) { e.unpersist(); return (deg.select(col("u"),
      lit(0L).as("x")), 0L, 0) }
    var x = deg.select(col("u"), lit(1000000000000L).as("x"))
      .localCheckpoint(true)
    val nNodes = x.agg(count(lit(1))).head.getLong(0)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val m = e.join(x.select(col("u"), col("x")), "u")
        .groupBy(col("v")).agg(sum(col("x")).as("s"))
        .select(col("v").as("u"), col("s"))
      // the movement gate Σ(x − px) uses only columns OF the checkpoint,
      // so it rides the checkpoint job as an observe() metric (r16) —
      // the r15 k=4 cadence existed to amortize a separate 1-row gate
      // job per round; with the gate free, it reads EVERY round again.
      // Output-identical: the iterate is a monotone EXACT integer
      // fixpoint, so stopping at the first zero-movement round returns
      // the same x as any later gated round — and the rounds counter no
      // longer overshoots (ADVICE r15: ScaleProbe/SCALE.md growth rows
      // read it as rounds-to-convergence).
      val xPre = x.select(col("u"), col("x").as("px"))
        .join(m, Seq("u"), "left")
        .select(col("u"),
          // integer div keeps the lattice exact (Spark's `/` on
          // BIGINT operands returns DOUBLE)
          expr(s"1000000000000L + coalesce(s, 0L) div ${2L * dmax}L")
            .as("x"),
          col("px"))
        .observe("katz_d", sum(col("x") - col("px")).as("d"))
      x = xPre.localCheckpoint(true)
      rounds += 1
      val d1 = xPre.queryExecution.observedMetrics("katz_d")
        .getAs[Long]("d")
      converged = d1 <= tol * 1e12 * nNodes
    }
    e.unpersist()
    (x.select(col("u"), col("x")), dmax, rounds)
  }

  /** Katz centrality with data-driven attenuation α = 1/(2·dmax) and
    * convergence-driven depth — the fixed-3-term q_graph_katz answers
    * the oracle; this answers the graph. Top-50 by the converged
    * score (exact lattice BIGINT; katz = x/1e12 at 9 dp). Rule-4;
    * Analytics94Spec pins closed-form path/star fixtures and the
    * monotone-convergence contract. */
  private def qGraphKatzAdaptive(s: SparkSession, d: String): DataFrame = {
    // loop-sized shuffle width (r16, Tables.loopPartitions): sf0.1/32c
    // 4.3 → 2.7 s min-of-3
    val (x, dmax, _) = withLoopParallelism(s, d) {
      katzAdaptive(symEdges(s, d))
    }
    x.select(col("u").as("node"),
        round(col("x").cast("decimal(38,0)")
          / lit(1000000000000L).cast("decimal(13,0)"), 9)
          .cast("double").as("katz"),
        lit(dmax).as("dmax"))
      .orderBy(desc("katz"), col("node")).limit(50)
  }

  /** Personalized PageRank from the top-5-degree seed SET (teleport
    * mass 1/5 to each seed), 3 unrolled rounds on the q_graph_ppr
    * contribution lattice — oracled. */
  private def qGraphPprMultiseed(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions); the whole
    // body is plan construction + eager checkpoints, so the wrapper
    // covers every unrolled round — oracled, results identical
    val sym = symEdges(s, d).localCheckpoint(true)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val seeds = deg.orderBy(desc("deg"), col("u")).limit(5)
      .select(col("u").as("seed"), lit(1).as("is_seed"))
    val nodes = deg.join(broadcast(seeds),
        col("u") === col("seed"), "left")
      .select(col("u"), col("deg"),
        when(col("is_seed") === 1, 0.2).otherwise(0.0).as("ind"))
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

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_eigen_fixpoint" -> (qGraphEigenFixpoint _),
    "q_graph_hits_fixpoint" -> (qGraphHitsFixpoint _),
    "q_graph_katz_adaptive" -> (qGraphKatzAdaptive _),
    "q_graph_ppr_multiseed" -> (qGraphPprMultiseed _),
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
    "q_graph_ppr_multiseed" -> (head +
      """deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |seeds AS (SELECT u AS seed FROM deg
        |          ORDER BY deg DESC, u LIMIT 5),
        |nodes AS (SELECT u, deg,
        |    CASE WHEN u IN (SELECT seed FROM seeds) THEN 0.2
        |      ELSE 0.0 END AS ind
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
  )
}
