package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-12 graph wave: DIAMETER estimation by the double-sweep BFS
  * bound — the standard "how wide is this graph" probe (exact on
  * trees, a tight lower bound in practice): BFS from a deterministic
  * seed to its farthest node u (eccentricity 1), then BFS from u; the
  * second sweep's reach is the reported diameter bound, and u's
  * partner v the witness pair.
  *
  * Scale: each BFS is the textbook frontier loop — state is one
  * (node, dist) row per REACHED node, each round joins the frontier
  * against the edge table (node-keyed, min-combined map-side) and
  * anti-joins the visited set; the loop is gated by the 1-row frontier
  * count (the ccFixpoint discipline) and runs eccentricity-many
  * rounds, never a hard-coded unroll. No SQL oracle (data-driven round
  * count; SURVEY §2.C rule 4) — Analytics78Spec pins exact sweep
  * results on path (double sweep exact on trees) and clique fixtures
  * plus the reach invariant on real data. */
object Analytics78 {

  /** BFS distances from `seed` over the symmetric edge list: returns
    * the (u, d) table of reached nodes and the round count. */
  private[queries] def bfs(s: SparkSession, sym0: DataFrame,
      seed: Long, maxRounds: Int = 256): (DataFrame, Int) = {
    import s.implicits._
    val sym = sym0.localCheckpoint(true)
    var dist = Seq((seed, 0L)).toDF("u", "d").localCheckpoint(true)
    var frontier = dist
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      // frontier-emptiness gate fused into the checkpoint job via
      // observe() (r16, the eigenFixpoint pattern): count==0 is the
      // same decision the old limit(1).count() job made, one fewer
      // job per BFS level.
      val nextPre = sym
        .join(frontier.select(col("u"), col("d")), Seq("u"))
        .select(col("v").as("u"), (col("d") + 1).as("d"))
        .groupBy(col("u")).agg(min(col("d")).as("d"))
        .join(dist.select(col("u")), Seq("u"), "left_anti")
        .observe("bfs_n", count(lit(1)).as("n"))
      val next = nextPre.localCheckpoint(true)
      rounds += 1
      if (nextPre.queryExecution.observedMetrics("bfs_n")
          .getAs[Long]("n") == 0L) done = true
      else {
        dist = dist.union(next).localCheckpoint(true)
        frontier = next
      }
    }
    (dist, rounds)
  }

  /** Farthest (d DESC, u ASC) row of a distance table — 1 row. */
  private def farthest(dist: DataFrame): (Long, Long) = {
    val r = dist.orderBy(desc("d"), col("u")).limit(1).head
    (r.getLong(0), r.getLong(1))
  }

  /** Certified diameter interval. Double sweep gives the lower bound
    * (exact on trees); the upper bound is 2·ecc(w) for w the midpoint
    * of a sweep-2 shortest path (d2(w)+d3(w) = lb with d2,d3 the BFS
    * distance tables from the two sweep endpoints, |d2−d3| minimal) —
    * diam ≤ 2·ecc(x) holds for ANY x in the component, and the path
    * midpoint makes it tight (exact on trees: ecc(center) = ⌈diam/2⌉).
    * lb is also lifted to ecc(w). Degenerate input (no support-≥2
    * co-pair edges) returns an empty frame instead of throwing. */
  private def qGraphDiameter(s: SparkSession,
      d: String): DataFrame = withLoopParallelism(s, d) {
    // loop-sized shuffle width (r16, Tables.loopPartitions)
    import s.implicits._
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val seedRow = sym.agg(min(col("u"))).head
    if (seedRow.isNullAt(0)) {
      return Seq.empty[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .toDF("seed", "ecc_seed", "sweep2_root", "witness",
          "diameter_lb", "diameter_ub", "midpoint", "n_reached")
    }
    val seed = seedRow.getLong(0)
    val (d1, _) = bfs(s, sym, seed)
    val (u, eccSeed) = farthest(d1)
    val (d2, _) = bfs(s, sym, u)
    val (v, diamLb0) = farthest(d2)
    val reached = d2.count()
    // sweep 3 from the witness; midpoint = min-id node on a u—v
    // shortest path (du+dv = lb) with the most balanced split.
    val (d3, _) = bfs(s, sym, v)
    val midRow = d2.select(col("u"), col("d").as("du"))
      .join(d3.select(col("u"), col("d").as("dv")), Seq("u"))
      .filter(col("du") + col("dv") === lit(diamLb0))
      .orderBy(abs(col("du") - col("dv")), col("u")).limit(1).head
    val w = midRow.getLong(0)
    val (d4, _) = bfs(s, sym, w)
    val eccMid = farthest(d4)._2
    val diamLb = math.max(diamLb0, eccMid)
    val diamUb = 2L * eccMid
    Seq((seed, eccSeed, u, v, diamLb, diamUb, w, reached))
      .toDF("seed", "ecc_seed", "sweep2_root", "witness",
        "diameter_lb", "diameter_ub", "midpoint", "n_reached")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_diameter" -> (qGraphDiameter _),
  )

  val sql: Map[String, String] = Map()
}
