package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 seventh wave: community convergence + embedding drift.
  *
  *  - q_graph_labelprop_fixpoint: weighted label propagation iterated
  *    to termination — the convergent companion to the oracled 2-round
  *    unroll q_graph_labelprop, completing the unroll/fixpoint
  *    symmetry the centralities got in r13/r14 (Analytics83/94).
  *    Synchronous LPA provably oscillates (a single edge flips labels
  *    u⇄v forever — the spec demonstrates it), so termination is
  *    "labels unchanged OR period-2 limit cycle detected": each round
  *    compares the new labels against BOTH the previous state and the
  *    state two rounds back with 1-row count gates on checkpointed
  *    label tables — the standard sync-LPA stopping rule, made exact
  *    by integer labels (no tolerance convention at all).
  *  - q_embed_drift: representation drift between two halves of the
  *    embedding corpus (vec_id parity — a deterministic stand-in for
  *    "yesterday's batch vs today's"): per-label centroid cosine,
  *    L2 centroid shift, and norm ratio. The per-label tripwire that
  *    answers "did MY class move" where q_embed_cka answers "did the
  *    geometry move" — reads the (label, half, dim) aggregate grid,
  *    never pairs of vectors.
  *
  * Determinism: labels are exact BIGINTs (ties → smallest label);
  * centroid sums ride a 9dp DECIMAL lattice per dimension and the
  * 64-term cosine/shift folds ride a 12dp lattice. Scale: labelprop
  * rounds are one edge⋈label shuffle + a degree-bounded argmax window
  * each, with per-round state one (node, label) row; drift collapses
  * the corpus to a labels×2×64 grid in one explode scan. */
object Analytics100 {

  /** Labels at sync-LPA termination over a symmetric weighted edge
    * list: (labels, rounds, cycled). Gate: zero changes vs prev
    * (converged) or vs prev-prev (period-2 cycle — terminate, report
    * cycled=true). */
  private[graft] def labelpropFixpoint(sym0: DataFrame,
      maxRounds: Int = 64): (DataFrame, Int, Boolean) = {
    val sym = sym0.repartition(col("v")).persist()
    var lab = sym.select(col("u")).distinct()
      .withColumn("lbl", col("u")).localCheckpoint(true)
    var prev: DataFrame = null
    var rounds = 0
    var cycled = false
    var done = sym.isEmpty
    while (!done && rounds < maxRounds) {
      val nbr = sym.join(
        lab.select(col("u").as("v"), col("lbl")), Seq("v"))
        .groupBy(col("u"), col("lbl")).agg(sum(col("cn")).as("w"))
      val win = Window.partitionBy(col("u"))
        .orderBy(desc("w"), col("lbl"))
      val next = nbr.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1).select(col("u"), col("lbl"))
        .localCheckpoint(true)
      rounds += 1
      // ONE merged gate job per round (r15): the separate chg/cyc counts
      // each paid a node-sized join+count job, and both run on every
      // non-terminal round past round 1. A single join of next against
      // prev-labels (and prev-prev when it exists) computes both change
      // counts in one aggregate — same stopping decisions, same rounds,
      // same labels, ~one fewer job per round.
      // Node-set invariant the merged gate relies on (ADVICE r15): sym
      // is symmetric, so every node has ≥1 neighbor and every round's
      // label table covers the IDENTICAL node set — the next⋈lab join
      // is total. The prev-prev side is a LEFT join with null counted
      // as "changed" so cycle detection stays independent of prev
      // coverage, and the sums are coalesced so an empty state table
      // reads 0 (both are no-ops under the invariant: values and
      // stopping decisions identical).
      val gj = next.join(lab.select(col("u"), col("lbl").as("pl")),
        Seq("u"))
      val gRow = (if (prev != null)
          gj.join(prev.select(col("u"), col("lbl").as("pp")), Seq("u"),
            "left")
        else gj.withColumn("pp", col("pl")))
        .agg(coalesce(sum(when(col("lbl") =!= col("pl"), 1L)
            .otherwise(0L)), lit(0L)).as("chg"),
          coalesce(sum(when(col("pp").isNull
              || col("lbl") =!= col("pp"), 1L)
            .otherwise(0L)), lit(0L)).as("cyc")).head
      if (gRow.getLong(0) == 0L) done = true
      else if (prev != null && gRow.getLong(1) == 0L) {
        done = true; cycled = true
      }
      prev = lab
      lab = next
    }
    sym.unpersist()
    (lab, rounds, cycled)
  }

  /** Top-20 converged communities with the termination facts. */
  private def qGraphLabelpropFixpoint(s: SparkSession,
      d: String): DataFrame = {
    // loop-sized shuffle width (r16, Tables.loopPartitions): sf0.1/32c
    // 4.0 → 2.3 s min-of-3
    val (lab, rounds, cycled) = withLoopParallelism(s, d) {
      labelpropFixpoint(Analytics10.lpSymEdges(s, d))
    }
    lab.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
      .orderBy(desc("sz"), col("lbl")).limit(20)
      .select(col("lbl"), col("sz"), lit(rounds).as("rounds"),
        lit(cycled).as("cycle_terminated"))
  }

  /** Per-label centroid drift between the vec_id-parity halves. */
  private def qEmbedDrift(s: SparkSession, d: String): DataFrame = {
    val g = t(s, d, "embeddings")
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("label"), col("half"), col("i"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(CAST(v AS DOUBLE), 9) AS DECIMAL(28,9))"))
          .as("sv"))
      .select(col("label"), col("half"), col("i"),
        col("n"), (dbl(col("sv")) / dbl(col("n"))).as("c"))
    val a = g.filter(col("half") === 0)
      .select(col("label"), col("i"), col("c").as("c0"),
        col("n").as("n0"))
    val b = g.filter(col("half") === 1)
      .select(col("label"), col("i"), col("c").as("c1"),
        col("n").as("n1"))
    a.join(b, Seq("label", "i"))
      .groupBy(col("label"))
      .agg(max(col("n0")).as("n_half0"), max(col("n1")).as("n_half1"),
        // 12dp-lattice folds over the 64-dim grid
        sum(expr("CAST(ROUND(c0 * c1, 12) AS DECIMAL(38,12))")).as("dot"),
        sum(expr("CAST(ROUND(c0 * c0, 12) AS DECIMAL(38,12))")).as("s0"),
        sum(expr("CAST(ROUND(c1 * c1, 12) AS DECIMAL(38,12))")).as("s1"),
        sum(expr("CAST(ROUND((c0 - c1) * (c0 - c1), 12)" +
          " AS DECIMAL(38,12))")).as("d2"))
      .select(col("label"), col("n_half0"), col("n_half1"),
        when(dbl(col("s0")) > 0 && dbl(col("s1")) > 0,
          round(dbl(col("dot"))
            / (sqrt(dbl(col("s0"))) * sqrt(dbl(col("s1")))), 6))
          .as("centroid_cosine"),
        round(sqrt(greatest(lit(0.0), dbl(col("d2")))), 6)
          .as("centroid_shift"),
        when(dbl(col("s1")) > 0,
          round(sqrt(dbl(col("s0"))) / sqrt(dbl(col("s1"))), 6))
          .as("norm_ratio"))
      .orderBy(col("label"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_labelprop_fixpoint" -> (qGraphLabelpropFixpoint _),
    "q_embed_drift_label" -> (qEmbedDrift _),
  )

  val sql: Map[String, String] = Map(
    "q_embed_drift_label" ->
      """WITH x AS (
        |  SELECT label, vec_id % 2 AS half, i,
        |    CAST(ROUND(CAST(v AS DOUBLE), 9) AS DECIMAL(28,9)) AS v
        |  FROM (SELECT label, vec_id, unnest(embedding) AS v,
        |          generate_subscripts(embedding, 1) AS i
        |        FROM embeddings)),
        |g AS (
        |  SELECT label, half, i, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS c
        |  FROM x GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT a.label, a.i, a.c AS c0, b.c AS c1,
        |    a.n AS n0, b.n AS n1
        |  FROM g a JOIN g b ON a.label = b.label AND a.i = b.i
        |  WHERE a.half = 0 AND b.half = 1),
        |f AS (
        |  SELECT label, max(n0) AS n_half0, max(n1) AS n_half1,
        |    sum(CAST(ROUND(c0 * c1, 12) AS DECIMAL(38,12))) AS dot,
        |    sum(CAST(ROUND(c0 * c0, 12) AS DECIMAL(38,12))) AS s0,
        |    sum(CAST(ROUND(c1 * c1, 12) AS DECIMAL(38,12))) AS s1,
        |    sum(CAST(ROUND((c0 - c1) * (c0 - c1), 12)
        |      AS DECIMAL(38,12))) AS d2
        |  FROM j GROUP BY label)
        |SELECT label, n_half0, n_half1,
        |  CASE WHEN CAST(s0 AS DOUBLE) > 0 AND CAST(s1 AS DOUBLE) > 0
        |    THEN ROUND(CAST(dot AS DOUBLE)
        |      / (sqrt(CAST(s0 AS DOUBLE)) * sqrt(CAST(s1 AS DOUBLE))),
        |      6) END AS centroid_cosine,
        |  ROUND(sqrt(greatest(0.0, CAST(d2 AS DOUBLE))), 6)
        |    AS centroid_shift,
        |  CASE WHEN CAST(s1 AS DOUBLE) > 0
        |    THEN ROUND(sqrt(CAST(s0 AS DOUBLE))
        |      / sqrt(CAST(s1 AS DOUBLE)), 6) END AS norm_ratio
        |FROM f ORDER BY label""".stripMargin,
  )
}
