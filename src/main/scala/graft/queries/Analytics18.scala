package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 eighteenth wave: HITS hub/authority scoring on the directed
  * customer→part purchase bipartite graph (the eigenvector companion
  * to q_graph_pagerank, in exact integer arithmetic), the Theil
  * inequality index per region (the decomposable entropy sibling of
  * q_agg_gini), and week-over-week period comparison (the
  * report-layer delta table every dashboard starts from).
  *
  * Scale notes:
  *  - HITS runs TWO unrolled mutual-reinforcement rounds with
  *    UNNORMALIZED integer iterates: h₀=1 makes a₁ = in-degree and
  *    every later iterate an exact BIGINT sum — no per-iteration
  *    float normalization (whose cross-engine summation order would
  *    break exactness; scores are scale-free anyway, and top-k only
  *    needs ratios). Each round is one edge-keyed shuffle join
  *    against the node-score table — the pagerank message-passing
  *    shape, minus the damping vector.
  *  - Theil needs per-row ln(x/μ) terms: each is rounded to 9 dp and
  *    DECIMAL-summed (order-free), with μ broadcast from the exact
  *    per-region decimal totals — one revenue shuffle, one stat
  *    broadcast, one term aggregation.
  *  - Week-over-week: the stream collapses to (type, week) counts
  *    once; the lag/delta/pct columns are a single ordered window
  *    over the bounded weekly table. */
object Analytics18 {

  /** Two-round integer HITS on customer→part edges: top-20
    * authorities (parts) with their round-2 authority score and
    * top hub contribution. */
  private def qGraphHits(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("c"))
      .join(t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")),
        Seq("ok"))
      .select(col("c"), col("p")).distinct()
    // h0 = 1 ⇒ a1(p) = in-degree
    val a1 = e.groupBy(col("p")).agg(count(lit(1)).as("a1"))
    // h1(c) = Σ_{p: c→p} a1(p)
    val h1 = e.join(a1.hint("shuffle_hash"), Seq("p"))
      .groupBy(col("c")).agg(sum(col("a1")).as("h1"))
    // a2(p) = Σ_{c: c→p} h1(c)
    val a2 = e.join(h1.hint("shuffle_hash"), Seq("c"))
      .groupBy(col("p"))
      .agg(sum(col("h1")).as("a2"), max(col("h1")).as("max_hub"))
    a2.join(a1, Seq("p"))
      .select(col("p").as("part"), col("a1").as("in_deg"),
        col("a2").as("authority2"), col("max_hub"))
      .orderBy(col("authority2").desc, col("part"))
      .limit(20)
  }

  /** Theil T inequality index of per-customer order revenue within
    * each region: T = (1/n) Σ (x/μ) ln(x/μ). */
  private def qAggTheil(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("x"))
      // Theil's domain is positive shares: a zero-revenue customer
      // would put ln(0)/0-division on the path (ANSI throws)
      .filter(col("x") > 0)
    val reg = t(s, d, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
      .join(broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("c_nationkey"),
          col("n_regionkey"))), Seq("c_nationkey"))
      .join(broadcast(t(s, d, "region")
        .select(col("r_regionkey").as("n_regionkey"), col("r_name"))),
        Seq("n_regionkey"))
      .select(col("o_custkey"), col("r_name"))
    val byReg = rev.join(reg.hint("shuffle_hash"), Seq("o_custkey"))
    val stats = byReg.groupBy(col("r_name"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    byReg.join(broadcast(stats), Seq("r_name"))
      .withColumn("ratio",
        dbl(col("x")) / (dbl(col("sx")) / dbl(col("n"))))
      .withColumn("term", expr(
        "CAST(ROUND(ratio * ln(ratio), 9) AS DECIMAL(28,9))"))
      .groupBy(col("r_name"))
      .agg(max(col("n")).as("n_customers"),
        round(dbl(sum(col("term"))) / dbl(max(col("n"))), 6).as("theil_t"))
      .orderBy(col("r_name"))
  }

  /** Week-over-week event volume: per (type, week) count, previous
    * week, absolute delta, percent change. */
  private def qTimePop(s: SparkSession, d: String): DataFrame = {
    val wk = events(s, d)
      .select(col("event_type").as("et"), expr("us div 604800000000").as("wk"))
      .groupBy(col("et"), col("wk")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("et")).orderBy(col("wk"))
    wk.withColumn("prev", lag(col("c"), 1).over(w))
      .select(col("et").as("event_type"), col("wk").as("week"), col("c"),
        col("prev"), (col("c") - col("prev")).as("delta"),
        when(col("prev").isNotNull && col("prev") > 0,
          round((dbl(col("c")) - dbl(col("prev"))) / dbl(col("prev")), 6))
          .as("pct_change"))
      .orderBy(col("event_type"), col("week"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_graph_hits" -> (qGraphHits _),
    "q_agg_theil" -> (qAggTheil _),
    "q_time_pop" -> (qTimePop _),
  )

  val sql: Map[String, String] = Map(
    "q_graph_hits" ->
      """WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |           FROM orders o JOIN lineitem l
        |             ON o.o_orderkey = l.l_orderkey),
        |a1 AS (SELECT p, CAST(count(*) AS BIGINT) AS a1
        |       FROM e GROUP BY p),
        |h1 AS (SELECT c, CAST(sum(a1) AS BIGINT) AS h1
        |       FROM e JOIN a1 USING (p) GROUP BY c),
        |a2 AS (SELECT p, CAST(sum(h1) AS BIGINT) AS a2,
        |         CAST(max(h1) AS BIGINT) AS max_hub
        |       FROM e JOIN h1 USING (c) GROUP BY p)
        |SELECT p AS part, a1 AS in_deg, a2 AS authority2, max_hub
        |FROM a2 JOIN a1 USING (p)
        |ORDER BY authority2 DESC, part LIMIT 20""".stripMargin,
    "q_agg_theil" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS x
        |  FROM orders GROUP BY o_custkey),
        |reg AS (
        |  SELECT c.c_custkey AS o_custkey, r.r_name
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |       JOIN region r ON n.n_regionkey = r.r_regionkey),
        |byreg AS (SELECT reg.r_name, rev.x
        |          FROM rev JOIN reg USING (o_custkey)),
        |stats AS (SELECT r_name, CAST(count(*) AS BIGINT) AS n,
        |            CAST(sum(x) AS DECIMAL(38,4)) AS sx
        |          FROM byreg GROUP BY r_name),
        |terms AS (
        |  SELECT b.r_name, s.n,
        |    CAST(ROUND(
        |      (CAST(b.x AS DOUBLE) / (CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE)))
        |      * ln(CAST(b.x AS DOUBLE) / (CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE))),
        |      9) AS DECIMAL(28,9)) AS term
        |  FROM byreg b JOIN stats s ON b.r_name = s.r_name)
        |SELECT r_name, max(n) AS n_customers,
        |  round(CAST(CAST(sum(term) AS DECIMAL(38,9)) AS DOUBLE)
        |    / CAST(max(n) AS DOUBLE), 6) AS theil_t
        |FROM terms GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_time_pop" ->
      """WITH wk AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT et AS event_type, wk AS week, c,
        |  lag(c, 1) OVER w AS prev,
        |  c - lag(c, 1) OVER w AS delta,
        |  CASE WHEN lag(c, 1) OVER w > 0 THEN
        |    round((CAST(c AS DOUBLE) - CAST(lag(c, 1) OVER w AS DOUBLE))
        |      / CAST(lag(c, 1) OVER w AS DOUBLE), 6)
        |  END AS pct_change
        |FROM wk
        |WINDOW w AS (PARTITION BY et ORDER BY wk)
        |ORDER BY event_type, week""".stripMargin,
  )
}
