package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-11 fifth wave: FULL core decomposition of the co-purchase
  * graph — the per-node core number (the largest k such that the node
  * survives k-core peeling), computed by the distributed h-index
  * fixpoint (Lü et al.: init c₀ = degree; iterate c_{t+1}(v) =
  * H-index of neighbors' c_t — provably converges to the core number,
  * monotonically non-increasing). This generalizes q_graph_kcore's
  * fixed-k unrolled peel to every k at once, with the same
  * accumulator-gated loop discipline as q_graph_cc_fixpoint: one
  * 1-row label-sum aggregate per round gates convergence, per-round
  * eager localCheckpoints keep analysis O(1) per round.
  *
  * At 100 TB: state is one (node, core) row per node; each round is
  * one node-keyed join + one aggregate whose per-node fold is bounded
  * by the node's degree; round count is data-driven (small in
  * practice), never hard-coded. No SQL oracle (data-driven round
  * count; SURVEY §2.C rule 4) — Analytics67Spec pins exact core
  * numbers on a clique+path+pair fixture and the kcore-consistency
  * property on real data. */
object Analytics67 {

  /** H-index fixpoint over an undirected symmetric edge list; returns
    * the converged (u, core) table and the round count.
    *
    * The per-round h-index is read off the bounded (u, cv, cnt) count
    * grid — NOT a collected neighbor array: with cum(cv) = #neighbors
    * whose core ≥ cv (a per-u cumulative count over distinct core
    * values, descending), h-index(u) = max over present cv of
    * min(cv, cum(cv)). Proof: for the true h*, the smallest present
    * value v ≥ h* has cum(v) = N(≥h*) ≥ h*, so min(v, cum(v)) ≥ h*;
    * conversely any m = min(cv, cum(cv)) has N(≥m) ≥ cum(cv) ≥ m, so
    * m ≤ h*. A degree-10⁷ hub therefore costs O(distinct core values)
    * grid rows instead of a 10⁷-element array sorted every round
    * (VERDICT r11 item 4). */
  /** Round structure (measured, r12 ×3-densification probe): per-round
    * cost is FLAT — the edge-keyed grid aggregate dominates and barely
    * moves whether 20k or 50 nodes changed that round (a frontier
    * variant that recomputes only neighbors-of-changed was built and
    * measured SLOWER: on the densified graph the dense core churns for
    * ~25 mid rounds, neighbors-of-changed covers most incident edges,
    * and the extra semi/merge joins cost more than they prune). So the
    * loop stays the lean recompute-all round and the cost model is
    * rounds × one edge aggregate, with the ROUND COUNT the data-driven
    * driver (5 on the real sf graph; 38 on the adversarial ×3 replica
    * whose near-complete co-pair graph peels slowly). The cap is 128 —
    * the old 32 cap silently returned UNCONVERGED cores on that ×3
    * graph (label sum still falling at exit). */
  private[queries] def coreFixpoint(sym0: DataFrame,
      maxRounds: Int = 128): (DataFrame, Int) = {
    import org.apache.spark.sql.expressions.Window
    val sym = sym0.localCheckpoint(true)
    var st = sym.groupBy(col("u")).agg(count(lit(1)).as("core"))
      .localCheckpoint(true)
    var prev = st.agg(sum(col("core"))).head.getLong(0)
    var rounds = 0
    var converged = false
    val wCum = Window.partitionBy(col("u")).orderBy(col("cv").desc)
    while (!converged && rounds < maxRounds) {
      // core-sum gate fused into the checkpoint job via observe()
      // (r16, the eigenFixpoint pattern): exact BIGINT sum, identical
      // stopping decisions, one fewer node-sized job per round.
      val stPre = sym
        .join(st.select(col("u").as("v"), col("core").as("cv")),
          Seq("v"))
        .groupBy(col("u"), col("cv"))
        .agg(count(lit(1)).as("cnt")) // bounded grid, map-side combined
        .withColumn("ge", sum(col("cnt")).over(wCum))
        .groupBy(col("u"))
        .agg(max(least(col("cv"), col("ge"))).as("core"))
        .observe("core_sum", sum(col("core")).as("sc"))
      st = stPre.localCheckpoint(true)
      rounds += 1
      val cur = stPre.queryExecution.observedMetrics("core_sum")
        .getAs[Long]("sc")
      converged = cur == prev
      prev = cur
    }
    (st, rounds)
  }

  /** Core-number histogram of the support-≥2 co-purchase graph. */
  private def qGraphCoreDecomp(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    // loop-sized shuffle width (r16, Tables.loopPartitions)
    val (fin, _) = withLoopParallelism(s, d) { coreFixpoint(sym) }
    fin.groupBy(col("core")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("core"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_coredecomp" -> (qGraphCoreDecomp _),
  )

  val sql: Map[String, String] = Map()
}
