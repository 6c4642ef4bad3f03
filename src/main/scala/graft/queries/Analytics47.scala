package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 fourth wave: iterative proportional fitting (raking) —
  * the survey/post-stratification reweighting that makes a skewed
  * sample match target marginal distributions (here: uniform nation
  * and segment margins), the standard bias-correction pass before a
  * curated dataset's statistics are published.
  *
  * Scale notes:
  *  - The fact table collapses ONCE to the QI-bounded contingency
  *    table (nation × segment cells); both IPF rounds are bounded-key
  *    aggregates + broadcast joins over that table — the corpus is
  *    never rescanned.
  *  - Determinism: every scaling ratio is a single IEEE division from
  *    either exact BIGINTs or 12-dp DECIMAL sums; weights round to
  *    12 dp and sum as DECIMAL (exact, order-free) before feeding the
  *    next round's margins — the round-then-decimal-sum discipline
  *    (no double accumulation ever crosses a shuffle). */
object Analytics47 {

  /** Two unrolled IPF rounds (row-scale to uniform nation margins,
    * column-scale to uniform segment margins, twice) over the
    * customer (nation, segment) contingency table. Output: per cell,
    * the original count, the final weight, and the raking factor w/n;
    * margins after two rounds already sit near the targets (the spec
    * pins exact-fit behavior on a separable fixture). */
  private def qAggIpf(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "customer")
      .groupBy(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tot = cells.agg(sum(col("n")).as("ntot"),
      countDistinct(col("nat")).as("n_nat"),
      countDistinct(col("seg")).as("n_seg"))
    val w0 = cells.crossJoin(broadcast(tot))
    // round 1: rows to N/n_nat
    val r1 = w0.groupBy(col("nat")).agg(sum(col("n")).as("rs0"))
    val w1 = w0.join(broadcast(r1), Seq("nat"))
      .withColumn("w1", expr(
        "CAST(round(CAST(n AS DOUBLE) * (CAST(ntot AS DOUBLE) " +
          "/ CAST(n_nat AS DOUBLE)) / CAST(rs0 AS DOUBLE), 12) " +
          "AS DECIMAL(28,12))"))
    // round 1: cols to N/n_seg
    val c1 = w1.groupBy(col("seg")).agg(sum(col("w1")).as("cs1"))
    val w2 = w1.join(broadcast(c1), Seq("seg"))
      .withColumn("w2", expr(
        "CAST(round(CAST(w1 AS DOUBLE) * (CAST(ntot AS DOUBLE) " +
          "/ CAST(n_seg AS DOUBLE)) / CAST(cs1 AS DOUBLE), 12) " +
          "AS DECIMAL(28,12))"))
    // round 2
    val r2 = w2.groupBy(col("nat")).agg(sum(col("w2")).as("rs2"))
    val w3 = w2.join(broadcast(r2), Seq("nat"))
      .withColumn("w3", expr(
        "CAST(round(CAST(w2 AS DOUBLE) * (CAST(ntot AS DOUBLE) " +
          "/ CAST(n_nat AS DOUBLE)) / CAST(rs2 AS DOUBLE), 12) " +
          "AS DECIMAL(28,12))"))
    val c2 = w3.groupBy(col("seg")).agg(sum(col("w3")).as("cs3"))
    w3.join(broadcast(c2), Seq("seg"))
      .withColumn("w4", expr(
        "CAST(round(CAST(w3 AS DOUBLE) * (CAST(ntot AS DOUBLE) " +
          "/ CAST(n_seg AS DOUBLE)) / CAST(cs3 AS DOUBLE), 12) " +
          "AS DECIMAL(28,12))"))
      .select(col("nat"), col("seg"), col("n"),
        round(dbl(col("w4")), 6).as("w"),
        round(dbl(col("w4")) / dbl(col("n")), 6).as("raking_factor"))
      .orderBy(col("nat"), col("seg"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_ipf" -> (qAggIpf _),
  )

  val sql: Map[String, String] = Map(
    // Same two unrolled rounds; each weight is one mult + two divs
    // from exact inputs, rounded to 12 dp, summed as DECIMAL.
    "q_agg_ipf" ->
      """WITH cells AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |    CAST(count(*) AS BIGINT) AS n FROM customer GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot,
        |    CAST(count(DISTINCT nat) AS BIGINT) AS n_nat,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS n_seg FROM cells),
        |r1 AS (SELECT nat, CAST(sum(n) AS BIGINT) AS rs0
        |       FROM cells GROUP BY 1),
        |w1t AS (SELECT cells.*, tot.*, rs0,
        |    CAST(round(CAST(n AS DOUBLE) * (CAST(ntot AS DOUBLE)
        |      / CAST(n_nat AS DOUBLE)) / CAST(rs0 AS DOUBLE), 12)
        |      AS DECIMAL(28,12)) AS w1
        |  FROM cells CROSS JOIN tot JOIN r1 USING (nat)),
        |c1 AS (SELECT seg, CAST(sum(w1) AS DECIMAL(38,12)) AS cs1
        |       FROM w1t GROUP BY 1),
        |w2t AS (SELECT w1t.*, cs1,
        |    CAST(round(CAST(w1 AS DOUBLE) * (CAST(ntot AS DOUBLE)
        |      / CAST(n_seg AS DOUBLE)) / CAST(cs1 AS DOUBLE), 12)
        |      AS DECIMAL(28,12)) AS w2
        |  FROM w1t JOIN c1 USING (seg)),
        |r2 AS (SELECT nat, CAST(sum(w2) AS DECIMAL(38,12)) AS rs2
        |       FROM w2t GROUP BY 1),
        |w3t AS (SELECT w2t.*, rs2,
        |    CAST(round(CAST(w2 AS DOUBLE) * (CAST(ntot AS DOUBLE)
        |      / CAST(n_nat AS DOUBLE)) / CAST(rs2 AS DOUBLE), 12)
        |      AS DECIMAL(28,12)) AS w3
        |  FROM w2t JOIN r2 USING (nat)),
        |c2 AS (SELECT seg, CAST(sum(w3) AS DECIMAL(38,12)) AS cs3
        |       FROM w3t GROUP BY 1),
        |w4t AS (SELECT w3t.*, cs3,
        |    CAST(round(CAST(w3 AS DOUBLE) * (CAST(ntot AS DOUBLE)
        |      / CAST(n_seg AS DOUBLE)) / CAST(cs3 AS DOUBLE), 12)
        |      AS DECIMAL(28,12)) AS w4
        |  FROM w3t JOIN c2 USING (seg))
        |SELECT nat, seg, n, round(CAST(w4 AS DOUBLE), 6) AS w,
        |  round(CAST(w4 AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS raking_factor
        |FROM w4t ORDER BY nat, seg""".stripMargin,
  )
}
