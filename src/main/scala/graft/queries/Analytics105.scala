package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-15 third wave: the weighted blocked rank test beside
  * Friedman, the rank-linear trend test beside Jonckheere, and the
  * intrinsic-dimension estimator beside the embedding diagnostics —
  * three oracled operators:
  *
  *  - q_agg_quade: Quade test on Friedman's (week × event-type) count
  *    grid — blocks WEIGHTED by the tie-averaged rank of their range,
  *    so high-signal weeks count more (the power upgrade over
  *    Friedman when effects scale with block level). Statistic
  *    T3 = (n−1)·B/(A−B) with S_bj = Q_b·(r_bj − (k+1)/2); all S live
  *    in exact 4× integer space (2×ranks × 2×range-ranks), so A and B
  *    are exact BIGINTs and T3 is one integer ratio.
  *  - q_agg_cuzick: Cuzick's rank trend test across the five ORDERED
  *    order priorities (the continuous-outcome sibling of the binary
  *    Cochran–Armitage q_agg_trendtest, and the linear-statistic
  *    sibling of q_agg_jonckheere's pairwise form): T = Σ gᵢ·rᵢ over
  *    combined tie-averaged ranks; z from the exact permutation
  *    moments E[T] = N·ḡ·r̄, Var = S_gg·S_rr/(N−1).
  *  - q_embed_twonn: TwoNN intrinsic-dimension estimator (Facco et
  *    al., Sci. Rep. 2017): d = n / Σ ln(r₂/r₁) over each point's two
  *    nearest neighbors — the "how many dimensions does the manifold
  *    actually use" diagnostic that explains ANN recall cliffs and
  *    quantization error before they happen; exact duplicates
  *    (r₁ = 0) are excluded and counted implicitly via n_used.
  *
  * Determinism: Quade is exact integer arithmetic to the final
  * division; Cuzick moments are DECIMAL(19,0)² cell products with the
  * z as one identical double tree; TwoNN distances are 6dp-rounded
  * squared Euclidean from fixed-order float_dot folds, ln-ratio terms
  * 9dp-rounded before the DECIMAL sum. Scale: Quade/Cuzick collapse
  * the fact stream to bounded grids (weeks×types, 5×50) before any
  * rank algebra; TwoNN rides the 512-cap md5 sample (the knngraph
  * contract — the full-corpus path is the IVF family). */
object Analytics105 {

  /** Friedman's 0-filled (week, event-type, count) grid + within-block
    * 2×tie-averaged ranks — shared shape with q_agg_friedman. */
  private def weekGrid(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(col("event_type").as("g"),
        expr("us div 604800000000").as("wk"))
    val counts = ev.groupBy(col("wk"), col("g")).agg(count(lit(1)).as("c"))
    counts.select(col("wk")).distinct()
      .crossJoin(counts.select(col("g")).distinct())
      .join(counts, Seq("wk", "g"), "left")
      .select(col("wk"), col("g"), coalesce(col("c"), lit(0L)).as("c"))
  }

  private def qAggQuade(s: SparkSession, d: String): DataFrame = {
    val grid = weekGrid(s, d).localCheckpoint(true) // weeks×types cells
    // within-block 2×tie-averaged ranks of counts
    val vals = grid.groupBy(col("wk"), col("c")).agg(count(lit(1)).as("t"))
    val wv = Window.partitionBy(col("wk")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = vals
      .withColumn("cum", coalesce(sum(col("t")).over(wv), lit(0L)))
      .select(col("wk"), col("c"),
        (lit(2L) * col("cum") + col("t") + 1).as("r2"))
    // block ranges and their 2×tie-averaged rank ACROSS blocks
    val rng = grid.groupBy(col("wk"))
      .agg((max(col("c")) - min(col("c"))).as("rg"))
    val rvals = rng.groupBy(col("rg")).agg(count(lit(1)).as("t"))
    val wr = Window.orderBy(col("rg")) // block-count-bounded window
      .rowsBetween(Window.unboundedPreceding, -1)
    val q2 = rvals
      .withColumn("cum", coalesce(sum(col("t")).over(wr), lit(0L)))
      .select(col("rg"), (lit(2L) * col("cum") + col("t") + 1).as("q2"))
    val kn = grid.agg(countDistinct(col("g")).as("k"),
      countDistinct(col("wk")).as("n"))
    // S4 = q2·(r2 − (k+1)) = 4·Q_b·(r_bj − (k+1)/2), exact integers
    val s4 = grid
      .join(r2, Seq("wk", "c"))
      .join(rng.join(q2, Seq("rg")).select(col("wk"), col("q2")),
        Seq("wk"))
      .crossJoin(broadcast(kn))
      .select(col("g"), col("k"), col("n"),
        (col("q2") * (col("r2") - (col("k") + 1))).as("s4"))
    val perTreat = s4.groupBy(col("g"), col("k"), col("n"))
      .agg(sum(col("s4")).as("sj"), sum(col("s4") * col("s4")).as("a4g"))
    perTreat.groupBy(col("k"), col("n"))
      .agg(sum(col("a4g")).as("a4"), sum(col("sj") * col("sj")).as("b4"))
      .select(col("k"), col("n").as("n_blocks"),
        // T3 = (n−1)·(B4/n)/(A4 − B4/n) = (n−1)·B4/(n·A4 − B4)
        when(col("n") * col("a4") - col("b4") > 0,
          round((dbl(col("n")) - 1.0) * dbl(col("b4"))
            / (dbl(col("n")) * dbl(col("a4")) - dbl(col("b4"))), 6))
          .as("t3"),
        (col("k") - 1).as("df1"),
        ((col("n") - 1) * (col("k") - 1)).as("df2"))
  }

  private def qAggCuzick(s: SparkSession, d: String): DataFrame = {
    val grid = Analytics103.jtGrid(s, d).localCheckpoint(true)
    // combined 2×tie-averaged midranks over the quantity lattice
    val byQ = grid.groupBy(col("q")).agg(sum(col("cnt")).as("tq"))
    val wq = Window.orderBy(col("q")) // ≤50-cell window
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = byQ
      .withColumn("cum", coalesce(sum(col("tq")).over(wq), lit(0L)))
      .select(col("q"), (lit(2L) * col("cum") + col("tq") + 1).as("r2"))
    // cell moments (DECIMAL(19,0)² products — the kruskal bound class)
    val m = grid.join(r2, Seq("q"))
      .agg(sum(col("cnt")).as("n"),
        sum(expr("CAST(g AS DECIMAL(19,0)) * cnt")).as("sg"),
        sum(expr("CAST(g AS DECIMAL(19,0)) * g * cnt")).as("sg2"),
        sum(expr("CAST(r2 AS DECIMAL(19,0)) * cnt")).as("sr"),
        sum(expr("CAST(r2 AS DECIMAL(19,0)) * r2 * cnt")).as("sr2"),
        sum(expr("CAST(g AS DECIMAL(19,0)) * r2 * cnt")).as("sgr"))
    m.select(col("n"),
        expr("CAST(sgr AS DOUBLE) / 2.0").as("t_stat"),
        expr("""CAST(sg AS DOUBLE) * CAST(sr AS DOUBLE)
               | / CAST(n AS DOUBLE) / 2.0""".stripMargin).as("e_t"),
        expr("""(CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE)
               |   * CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
               | * (CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE)
               |   * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
               | / (CAST(n AS DOUBLE) - 1.0) / 4.0""".stripMargin)
          .as("var_t"))
      .select(col("n"), round(col("t_stat"), 1).as("t_stat"),
        round(col("e_t"), 4).as("e_t"),
        when(col("var_t") > 0,
          round((col("t_stat") - col("e_t")) / sqrt(col("var_t")), 6))
          .as("z"))
  }

  private def qEmbedTwonn(s: SparkSession, d: String): DataFrame = {
    val base = LlmSim6.capped(s, d, 512)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val a = base.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = base.select(col("vec_id").as("b"), col("embedding").as("eb"))
    val d2 = a.join(broadcast(b), col("a") =!= col("b"))
      .withColumn("d2", expr(
        "ROUND(greatest(float_dot(ea, ea) - 2.0 * float_dot(ea, eb)" +
          " + float_dot(eb, eb), 0.0), 6)"))
      .filter(col("d2") > 0) // exact duplicates carry no ratio signal
      .select(col("a"), col("b"), col("d2"))
    val w = Window.partitionBy(col("a")).orderBy(col("d2"), col("b"))
    val nn2 = d2.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("a"))
      .agg(max(when(col("rn") === 1, col("d2"))).as("d1"),
        max(when(col("rn") === 2, col("d2"))).as("d2nd"))
      .filter(col("d1").isNotNull && col("d2nd").isNotNull)
      // ln μ = ½(ln d₂² − ln d₁²), 9dp term lattice (cross-libm ln)
      .select(expr("CAST(ROUND(0.5 * (ln(d2nd) - ln(d1)), 9)" +
        " AS DECIMAL(28,9))").as("lmu"))
    nn2.agg(count(lit(1)).as("n_used"), sum(col("lmu")).as("slmu"))
      .select(col("n_used"),
        round(dbl(col("slmu")), 6).as("sum_log_mu"),
        when(dbl(col("slmu")) > 0,
          round(dbl(col("n_used")) / dbl(col("slmu")), 6))
          .as("id_twonn"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_quade" -> (qAggQuade _),
    "q_agg_cuzick" -> (qAggCuzick _),
    "q_embed_twonn" -> (qEmbedTwonn _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_quade" ->
      """WITH ev AS (
        |  SELECT event_type AS g,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
        |  FROM events),
        |counts AS (
        |  SELECT wk, g, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |grid AS MATERIALIZED (
        |  SELECT w.wk, t.g, coalesce(c.c, 0) AS c
        |  FROM (SELECT DISTINCT wk FROM counts) w
        |  CROSS JOIN (SELECT DISTINCT g FROM counts) t
        |  LEFT JOIN counts c ON c.wk = w.wk AND c.g = t.g),
        |vals AS (
        |  SELECT wk, c, CAST(count(*) AS BIGINT) AS t
        |  FROM grid GROUP BY 1, 2),
        |r2 AS (
        |  SELECT wk, c, 2 * coalesce(sum(t) OVER (PARTITION BY wk
        |      ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) + t + 1 AS r2
        |  FROM vals),
        |rng AS (
        |  SELECT wk, max(c) - min(c) AS rg FROM grid GROUP BY wk),
        |rvals AS (
        |  SELECT rg, CAST(count(*) AS BIGINT) AS t
        |  FROM rng GROUP BY rg),
        |q2 AS (
        |  SELECT rg, 2 * coalesce(sum(t) OVER (ORDER BY rg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS q2
        |  FROM rvals),
        |kn AS (
        |  SELECT CAST(count(DISTINCT g) AS BIGINT) AS k,
        |    CAST(count(DISTINCT wk) AS BIGINT) AS n
        |  FROM grid),
        |s4 AS (
        |  SELECT grid.g, kn.k, kn.n,
        |    q2.q2 * (r2.r2 - (kn.k + 1)) AS s4
        |  FROM grid
        |  JOIN r2 ON r2.wk = grid.wk AND r2.c = grid.c
        |  JOIN rng ON rng.wk = grid.wk
        |  JOIN q2 ON q2.rg = rng.rg
        |  CROSS JOIN kn),
        |pt AS (
        |  SELECT g, k, n, sum(s4) AS sj, sum(s4 * s4) AS a4g
        |  FROM s4 GROUP BY 1, 2, 3)
        |SELECT k, n AS n_blocks,
        |  CASE WHEN n * sum(a4g) - sum(sj * sj) > 0 THEN
        |    ROUND((CAST(n AS DOUBLE) - 1.0) * CAST(sum(sj * sj) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(sum(a4g) AS DOUBLE)
        |        - CAST(sum(sj * sj) AS DOUBLE)), 6) END AS t3,
        |  k - 1 AS df1, (n - 1) * (k - 1) AS df2
        |FROM pt GROUP BY k, n""".stripMargin,
    "q_agg_cuzick" ->
      """WITH grid AS MATERIALIZED (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |byq AS (SELECT q, sum(cnt) AS tq FROM grid GROUP BY q),
        |r2 AS (
        |  SELECT q, 2 * coalesce(sum(tq) OVER (ORDER BY q
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + tq + 1 AS r2
        |  FROM byq),
        |m AS (
        |  SELECT sum(cnt) AS n,
        |    sum(CAST(g AS HUGEINT) * cnt) AS sg,
        |    sum(CAST(g AS HUGEINT) * g * cnt) AS sg2,
        |    sum(CAST(r2 AS HUGEINT) * cnt) AS sr,
        |    sum(CAST(r2 AS HUGEINT) * r2 * cnt) AS sr2,
        |    sum(CAST(g AS HUGEINT) * r2 * cnt) AS sgr
        |  FROM grid JOIN r2 USING (q)),
        |c AS (
        |  SELECT CAST(n AS BIGINT) AS n,
        |    CAST(sgr AS DOUBLE) / 2.0 AS t_stat,
        |    CAST(sg AS DOUBLE) * CAST(sr AS DOUBLE)
        |      / CAST(n AS DOUBLE) / 2.0 AS e_t,
        |    (CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE)
        |        * CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(sr2 AS DOUBLE) - CAST(sr AS DOUBLE)
        |        * CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) / 4.0 AS var_t
        |  FROM m)
        |SELECT n, ROUND(t_stat, 1) AS t_stat, ROUND(e_t, 4) AS e_t,
        |  CASE WHEN var_t > 0
        |    THEN ROUND((t_stat - e_t) / sqrt(var_t), 6) END AS z
        |FROM c""".stripMargin,
    // base/dot CTEs mirror q_embed_knngraph's oracle conventions
    "q_embed_twonn" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 512),
        |z AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |    CAST(unnest(a.embedding) AS DOUBLE) AS px,
        |    CAST(unnest(b.embedding) AS DOUBLE) AS ex
        |  FROM base a JOIN base b ON a.vec_id <> b.vec_id),
        |dots AS (
        |  SELECT a, b,
        |    ROUND(greatest(SUM(px * px) - 2.0 * SUM(px * ex)
        |      + SUM(ex * ex), 0.0), 6) AS d2
        |  FROM z GROUP BY 1, 2),
        |nn AS (
        |  SELECT a, d2,
        |    row_number() OVER (PARTITION BY a ORDER BY d2, b) AS rn
        |  FROM dots WHERE d2 > 0 QUALIFY rn <= 2),
        |mu AS (
        |  SELECT a,
        |    max(CASE WHEN rn = 1 THEN d2 END) AS d1,
        |    max(CASE WHEN rn = 2 THEN d2 END) AS d2nd
        |  FROM nn GROUP BY a),
        |terms AS (
        |  SELECT CAST(ROUND(0.5 * (ln(d2nd) - ln(d1)), 9)
        |    AS DECIMAL(28,9)) AS lmu
        |  FROM mu WHERE d1 IS NOT NULL AND d2nd IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_used,
        |  ROUND(CAST(sum(lmu) AS DOUBLE), 6) AS sum_log_mu,
        |  CASE WHEN CAST(sum(lmu) AS DOUBLE) > 0 THEN
        |    ROUND(CAST(count(*) AS DOUBLE)
        |      / CAST(sum(lmu) AS DOUBLE), 6) END AS id_twonn
        |FROM terms""".stripMargin,
  )
}
