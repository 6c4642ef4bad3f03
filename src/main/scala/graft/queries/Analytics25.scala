package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-fifth wave: embedding drift between corpus halves
  * (the model-monitoring check that catches encoder or data shifts
  * before retrieval quality dies), minimum-detectable-effect sizing
  * (the answer to "is this A/B test even big enough" computed from
  * the data itself), and the inter-purchase-gap distribution (the
  * purchase-cycle report behind replenishment and churn models).
  *
  * Scale notes:
  *  - Drift: one posexplode shuffle to (half, dim) exact moments —
  *    bounded by 2×64 cells — then a dim-keyed self-merge and a
  *    TakeOrdered top-10. The corpus streams once.
  *  - MDE: per-type exact decimal moments in one shuffle, fixed
  *    double tree with frozen z constants (1.96, 0.8416).
  *  - Purchase gaps: one customer-keyed sort for the lag, then the
  *    percentile picks run over the BOUNDED gap-day count table
  *    (the q_agg_mannwhitney discipline) — never a global sort of
  *    raw gaps. */
object Analytics25 {

  /** Per-dimension mean drift between even and odd vec_id halves:
    * the 10 most-shifted dimensions. */
  private def qEmbedDrift(s: SparkSession, d: String): DataFrame = {
    val comp = t(s, d, "embeddings")
      .select((col("vec_id") % 2).as("h"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("h"), col("i"), col("v").cast("double").as("v"))
      .groupBy(col("h"), col("i"))
      .agg(sum(col("v")).as("sx"), count(lit(1)).as("n"))
      .select(col("h"), col("i"), round(col("sx") / col("n"), 6).as("m"))
    comp.filter(col("h") === 0)
      .select(col("i"), col("m").as("mean_even"))
      .join(comp.filter(col("h") === 1)
        .select(col("i"), col("m").as("mean_odd")), Seq("i"))
      .select(col("i").as("dim"), col("mean_even"), col("mean_odd"),
        round(col("mean_even") - col("mean_odd"), 6).as("diff"))
      .orderBy(abs(col("diff")).desc, col("dim"))
      .limit(10)
  }

  /** Minimum detectable effect (80% power, 5% two-sided) per event
    * type at the observed n and sd. */
  private def qAggMde(s: SparkSession, d: String): DataFrame = {
    val m = events(s, d)
      .select(col("event_type"), dec(col("value")).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("ssx"))
    val nD = dbl(col("n"))
    val mean = dbl(col("sx")) / nD
    val sd = sqrt((dbl(col("ssx")) - dbl(col("sx")) * dbl(col("sx")) / nD)
      / (nD - 1.0))
    val mde = lit(1.96 + 0.8416) * sd * sqrt(lit(2.0) / nD)
    // n=1 ⇒ sd undefined; mean=0 ⇒ relative MDE undefined → NULL,
    // not an ANSI divide-by-zero
    m.select(col("event_type"), col("n"), round(mean, 6).as("mean"),
      when(col("n") > 1, round(sd, 6)).as("sd"),
      when(col("n") > 1, round(mde, 6)).as("mde_abs"),
      when(col("n") > 1 && mean =!= 0.0, round(mde / mean, 6))
        .as("mde_rel"))
      .orderBy(col("event_type"))
  }

  /** Inter-purchase gap distribution: mean / discrete median / p90 of
    * days between a customer's consecutive orders. */
  private def qWinPurchasegap(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"))
    val w = Window.partitionBy(col("ck")).orderBy(col("day"), col("ok"))
    val gaps = o.withColumn("prev", lag(col("day"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("day") - col("prev")).as("g"))
    val b = gaps.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val wOrd = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    b.select(col("g"), col("cnt"),
      sum(col("cnt")).over(wOrd).as("cum"),
      sum(col("cnt")).over(wAll).as("nn"),
      sum(col("g") * col("cnt")).over(wAll).as("sg"))
      .agg(max(col("nn")).as("n_gaps"),
        round(dbl(max(col("sg"))) / dbl(max(col("nn"))), 6).as("mean_days"),
        min(when(expr("cum >= (nn + 1) div 2"), col("g"))).as("median_days"),
        min(when(expr("cum >= (9 * nn + 9) div 10"), col("g")))
          .as("p90_days"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_embed_drift" -> (qEmbedDrift _),
    "q_agg_mde" -> (qAggMde _),
    "q_win_purchasegap" -> (qWinPurchasegap _),
  )

  val sql: Map[String, String] = Map(
    "q_embed_drift" ->
      """WITH x AS (SELECT vec_id % 2 AS h, i - 1 AS i,
        |    CAST(v AS DOUBLE) AS v FROM (
        |    SELECT vec_id, unnest(embedding) AS v,
        |      generate_subscripts(embedding, 1) AS i FROM embeddings)),
        |m AS (SELECT h, i, round(SUM(v) / COUNT(*), 6) AS m
        |      FROM x GROUP BY 1, 2),
        |j AS (SELECT a.i AS dim, a.m AS mean_even, b.m AS mean_odd,
        |        round(a.m - b.m, 6) AS diff
        |      FROM m a JOIN m b ON a.i = b.i AND a.h = 0 AND b.h = 1)
        |SELECT CAST(dim AS INT) AS dim, mean_even, mean_odd, diff
        |FROM j ORDER BY abs(diff) DESC, dim LIMIT 10""".stripMargin,
    "q_agg_mde" ->
      """WITH m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))
        |      * CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,8)) AS ssx
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
        |  round(sqrt((CAST(ssx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1.0)), 6) AS sd,
        |  round((1.96 + 0.8416)
        |    * sqrt((CAST(ssx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |    * sqrt(2.0 / CAST(n AS DOUBLE)), 6) AS mde_abs,
        |  round(((1.96 + 0.8416)
        |    * sqrt((CAST(ssx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0))
        |    * sqrt(2.0 / CAST(n AS DOUBLE)))
        |    / (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS mde_rel
        |FROM m ORDER BY event_type""".stripMargin,
    "q_win_purchasegap" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck, o_orderkey AS ok,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day
        |  FROM orders),
        |gaps AS (
        |  SELECT day - lag(day, 1) OVER (PARTITION BY ck
        |    ORDER BY day, ok) AS g
        |  FROM o),
        |b AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt
        |      FROM gaps WHERE g IS NOT NULL GROUP BY g),
        |c AS (
        |  SELECT g, cnt,
        |    sum(cnt) OVER (ORDER BY g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS nn,
        |    sum(g * cnt) OVER () AS sg
        |  FROM b)
        |SELECT CAST(max(nn) AS BIGINT) AS n_gaps,
        |  round(CAST(max(sg) AS DOUBLE) / CAST(max(nn) AS DOUBLE), 6)
        |    AS mean_days,
        |  CAST(min(CASE WHEN cum >= (nn + 1) // 2 THEN g END) AS BIGINT)
        |    AS median_days,
        |  CAST(min(CASE WHEN cum >= (9 * nn + 9) // 10 THEN g END)
        |    AS BIGINT) AS p90_days
        |FROM c""".stripMargin,
  )
}
