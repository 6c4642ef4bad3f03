package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-14 sixth wave: market-basket rules and the two-sample
  * distribution-distance family (the drift monitors between PSI's
  * binned ratio and KS's sup-gap) — four oracled operators:
  *
  *  - q_agg_assocrules: association rules over co-purchase pairs —
  *    for each frequent pair (support ≥ 5 orders) both directed rules
  *    a→b with confidence = sup(ab)/sup(a) and lift =
  *    N·sup(ab)/(sup(a)·sup(b)); top-20 by lift. Consumes the
  *    materialized coPairCounts table (the write-once pattern) plus
  *    one per-part order-count aggregate — the retail/recsys
  *    "customers who bought X" primitive, done as relational algebra
  *    instead of an Apriori scan loop.
  *  - q_agg_mmd: maximum mean discrepancy between the `view` and
  *    `purchase` value samples under the quadratic kernel
  *    k(x,y) = (1 + xy/c)², c = 10⁴ (value² scale). The kernel's
  *    explicit feature map (1, √2·x/√c, x²/c) collapses MMD² to a
  *    CLOSED FORM over first/second moments: 2/c·(m₁−m₂)² +
  *    1/c²·(q₁−q₂)² — a kernel two-sample test with zero pairwise
  *    work, exact from lattice moments at any scale.
  *  - q_agg_wasserstein: 1-D Wasserstein-1 (earth-mover) distance
  *    between the same two samples — W₁ = ∫|F₁−F₂| dv computed
  *    exactly on the cents-lattice support: one merge of the two
  *    (value, count) tables, cumulative shares, Σ|F₁−F₂|·Δv over
  *    consecutive support points. The metric drift monitors quote in
  *    the metric's own units (unlike PSI/KS, which are unitless).
  *  - q_agg_hellinger: Hellinger distance + Bhattacharyya coefficient
  *    between the two samples on a fixed 20-bin histogram —
  *    BC = Σ√(p̂·q̂), H = √(1−BC): the bounded-[0,1] companion the
  *    dashboard wants when W₁'s unit-ful answer is too raw.
  *
  * Determinism: all four are exact-integer count/moment algebra;
  * doubles appear only in final fixed trees, 6/9dp-rounded; the
  * Wasserstein cumsums are BIGINT on the cents lattice. Scale:
  * assocrules reuses the materialized pair table (one broadcast of
  * per-part counts); mmd/hellinger are one grouped scan each;
  * wasserstein collapses both samples to the value-lattice grid
  * (bounded by the value domain at 2dp, not the row count) before
  * its two window passes. */
object Analytics99 {

  /** (value-cents, type) pairs for the two compared event samples. */
  private def twoSamples(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_type").as("et"),
        expr("CAST(ROUND(value, 2) AS DECIMAL(12,2))").as("v"))

  private def qAggAssocrules(s: SparkSession, d: String): DataFrame = {
    // Checkpoint the distinct pair table once (r15): the old
    // crossJoin(broadcast(li.agg(countDistinct))) raced its broadcast
    // subquery against the main job, re-running the lineitem scan +
    // distinct ~3× (nOrders future, partCnt, and again for each). One
    // order×part-bounded checkpoint feeds both marginals, and the order
    // count folds into a literal — identical doubles, one scan.
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().localCheckpoint(true)
    val no = li.agg(countDistinct(col("ok"))).head.getLong(0)
    val partCnt = li.groupBy(col("pk")).agg(count(lit(1)).as("pc"))
    val pairs = coPairCounts(s, d).filter(col("cn") >= 5)
    // both rule directions from the u<v pair table
    val directed = pairs.select(col("u").as("a"), col("v").as("b"),
        col("cn"))
      .union(pairs.select(col("v").as("a"), col("u").as("b"), col("cn")))
    directed
      .join(partCnt.select(col("pk").as("a"), col("pc").as("ca")),
        Seq("a"))
      .join(partCnt.select(col("pk").as("b"), col("pc").as("cb")),
        Seq("b"))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("cn").as("support_orders"),
        round(dbl(col("cn")) / dbl(col("ca")), 6).as("confidence"),
        round(lit(no).cast("double") * dbl(col("cn"))
          / (dbl(col("ca")) * dbl(col("cb"))), 6).as("lift"))
      .orderBy(desc("lift"), desc("confidence"), col("antecedent"),
        col("consequent"))
      .limit(20)
  }

  /** Closed-form quadratic-kernel MMD² between view/purchase values. */
  private def qAggMmd(s: SparkSession, d: String): DataFrame = {
    val m = twoSamples(s, d)
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("sv2"))
      .select(col("et"), col("n"),
        (dbl(col("sv")) / dbl(col("n"))).as("m1"),
        (dbl(col("sv2")) / dbl(col("n"))).as("q1"))
    val w = m.agg(
      max(when(col("et") === "view", col("m1"))).as("mv"),
      max(when(col("et") === "view", col("q1"))).as("qv"),
      max(when(col("et") === "purchase", col("m1"))).as("mp"),
      max(when(col("et") === "purchase", col("q1"))).as("qp"),
      max(when(col("et") === "view", col("n"))).as("nv"),
      max(when(col("et") === "purchase", col("n"))).as("np"))
    // k(x,y) = (1 + xy/c)², c = 1e4 (the value² scale): feature map
    // (1, √2·x/√c, x²/c) ⇒ MMD² = 2/c·(Δm)² + 1/c²·(Δq)²
    w.filter(col("mv").isNotNull && col("mp").isNotNull)
      .select(col("nv").as("n_view"), col("np").as("n_purchase"),
        round((lit(2.0) / lit(1.0e4))
          * (col("mv") - col("mp")) * (col("mv") - col("mp"))
          + (lit(1.0) / lit(1.0e8))
            * (col("qv") - col("qp")) * (col("qv") - col("qp")), 9)
          .as("mmd2"),
        round(col("mv") - col("mp"), 6).as("mean_gap"),
        round(col("qv") - col("qp"), 6).as("second_moment_gap"))
  }

  /** Exact 1-D W₁ on the cents-lattice support of the two samples. */
  private def qAggWasserstein(s: SparkSession, d: String): DataFrame = {
    val g = twoSamples(s, d)
      .groupBy(col("v"))
      .agg(sum(when(col("et") === "view", 1L).otherwise(0L)).as("c1"),
        sum(when(col("et") === "purchase", 1L).otherwise(0L)).as("c2"))
    val tot = g.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val wv = Window.orderBy(col("v"))
    val cum = g
      .withColumn("f1", sum(col("c1")).over(wv))
      .withColumn("f2", sum(col("c2")).over(wv))
      .withColumn("nextv", lead(col("v"), 1).over(wv))
    cum.crossJoin(broadcast(tot))
      .filter(col("n1") > 0 && col("n2") > 0 && col("nextv").isNotNull)
      .select(col("n1"), col("n2"),
        // |F1−F2|·Δv per support gap, on a 12dp lattice (F gaps are
        // exact integer ratios; Δv exact decimal)
        expr("""CAST(ROUND(abs(CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               | - CAST(f2 AS DOUBLE) / CAST(n2 AS DOUBLE))
               | * CAST(nextv - v AS DOUBLE), 12)
               | AS DECIMAL(38,12))""".stripMargin).as("seg"))
      .agg(max(col("n1")).as("n_view"), max(col("n2")).as("n_purchase"),
        sum(col("seg")).as("w"))
      .select(col("n_view"), col("n_purchase"),
        round(dbl(col("w")), 6).as("wasserstein1"))
  }

  /** Hellinger + Bhattacharyya on a fixed 20-bin histogram. */
  private def qAggHellinger(s: SparkSession, d: String): DataFrame = {
    val b = twoSamples(s, d)
      // value ∈ [0,100): fixed-width bins keep the grid bounded and
      // identical across engines (no data-driven edges)
      .select(col("et"),
        least(expr("CAST(floor(CAST(v AS DOUBLE) / 5.0) AS BIGINT)"),
          lit(19L)).as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col("et") === "view", 1L).otherwise(0L)).as("c1"),
        sum(when(col("et") === "purchase", 1L).otherwise(0L)).as("c2"))
    val tot = b.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    b.crossJoin(broadcast(tot))
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("n1"), col("n2"),
        expr("""CAST(ROUND(sqrt((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               | * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 12)
               | AS DECIMAL(38,12))""".stripMargin).as("bcterm"))
      .agg(max(col("n1")).as("n_view"), max(col("n2")).as("n_purchase"),
        sum(col("bcterm")).as("bc"))
      .select(col("n_view"), col("n_purchase"),
        round(dbl(col("bc")), 6).as("bhattacharyya"),
        // explicit null gate: greatest() IGNORES nulls, so an empty
        // one-sided aggregate would otherwise report H = 0
        when(col("bc").isNotNull,
          round(sqrt(greatest(lit(0.0), lit(1.0) - dbl(col("bc")))), 6))
          .as("hellinger"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_assocrules" -> (qAggAssocrules _),
    "q_agg_mmd" -> (qAggMmd _),
    "q_agg_wasserstein" -> (qAggWasserstein _),
    "q_agg_hellinger" -> (qAggHellinger _),
  )

  private val two =
    """WITH two AS (
      |  SELECT event_type AS et, CAST(ROUND(value, 2) AS DECIMAL(12,2))
      |    AS v
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "q_agg_assocrules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS no FROM li),
        |pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS pc
        |       FROM li GROUP BY pk),
        |e AS (SELECT a.pk AS u, b.pk AS v,
        |        CAST(count(*) AS BIGINT) AS cn
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 5),
        |directed AS (
        |  SELECT u AS a, v AS b, cn FROM e
        |  UNION ALL SELECT v AS a, u AS b, cn FROM e)
        |SELECT d.a AS antecedent, d.b AS consequent,
        |  d.cn AS support_orders,
        |  ROUND(CAST(d.cn AS DOUBLE) / CAST(pa.pc AS DOUBLE), 6)
        |    AS confidence,
        |  ROUND(CAST(no.no AS DOUBLE) * CAST(d.cn AS DOUBLE)
        |    / (CAST(pa.pc AS DOUBLE) * CAST(pb.pc AS DOUBLE)), 6)
        |    AS lift
        |FROM directed d
        |JOIN pc pa ON pa.pk = d.a
        |JOIN pc pb ON pb.pk = d.b
        |CROSS JOIN no
        |ORDER BY lift DESC, confidence DESC, antecedent, consequent
        |LIMIT 20""".stripMargin,
    "q_agg_mmd" -> (two +
      """m AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m1,
        |    CAST(sum(v * v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS q1
        |  FROM two GROUP BY et),
        |w AS (
        |  SELECT
        |    max(CASE WHEN et = 'view' THEN m1 END) AS mv,
        |    max(CASE WHEN et = 'view' THEN q1 END) AS qv,
        |    max(CASE WHEN et = 'purchase' THEN m1 END) AS mp,
        |    max(CASE WHEN et = 'purchase' THEN q1 END) AS qp,
        |    max(CASE WHEN et = 'view' THEN n END) AS nv,
        |    max(CASE WHEN et = 'purchase' THEN n END) AS np
        |  FROM m)
        |SELECT nv AS n_view, np AS n_purchase,
        |  ROUND((2.0 / 1e4) * (mv - mp) * (mv - mp)
        |    + (1.0 / 1e8) * (qv - qp) * (qv - qp), 9) AS mmd2,
        |  ROUND(mv - mp, 6) AS mean_gap,
        |  ROUND(qv - qp, 6) AS second_moment_gap
        |FROM w WHERE mv IS NOT NULL AND mp IS NOT NULL"""
        .stripMargin),
    "q_agg_wasserstein" -> (two +
      """g AS (
        |  SELECT v,
        |    CAST(sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM two GROUP BY v),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |          CAST(sum(c2) AS BIGINT) AS n2 FROM g),
        |cum AS (
        |  SELECT v,
        |    sum(c1) OVER (ORDER BY v) AS f1,
        |    sum(c2) OVER (ORDER BY v) AS f2,
        |    lead(v, 1) OVER (ORDER BY v) AS nextv
        |  FROM g),
        |seg AS (
        |  SELECT n1, n2,
        |    CAST(ROUND(abs(CAST(f1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(f2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |      * CAST(nextv - v AS DOUBLE), 12) AS DECIMAL(38,12)) AS seg
        |  FROM cum CROSS JOIN tot
        |  WHERE n1 > 0 AND n2 > 0 AND nextv IS NOT NULL)
        |SELECT max(n1) AS n_view, max(n2) AS n_purchase,
        |  ROUND(CAST(sum(seg) AS DOUBLE), 6) AS wasserstein1
        |FROM seg""".stripMargin),
    "q_agg_hellinger" -> (two +
      """b AS (
        |  SELECT least(CAST(floor(CAST(v AS DOUBLE) / 5.0) AS BIGINT),
        |      19) AS bin,
        |    CAST(sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN et = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM two GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |          CAST(sum(c2) AS BIGINT) AS n2 FROM b),
        |terms AS (
        |  SELECT n1, n2,
        |    CAST(ROUND(sqrt((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |      * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 12)
        |      AS DECIMAL(38,12)) AS bcterm
        |  FROM b CROSS JOIN tot WHERE n1 > 0 AND n2 > 0)
        |SELECT max(n1) AS n_view, max(n2) AS n_purchase,
        |  ROUND(CAST(sum(bcterm) AS DOUBLE), 6) AS bhattacharyya,
        |  CASE WHEN sum(bcterm) IS NOT NULL THEN
        |    ROUND(sqrt(greatest(0.0, 1.0 - CAST(sum(bcterm) AS DOUBLE))),
        |      6) END AS hellinger
        |FROM terms""".stripMargin),
  )
}
