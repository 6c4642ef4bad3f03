package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-second wave: association-rule mining over the
  * co-purchase pairs (support/confidence/lift — the market-basket
  * report), RFM customer segmentation (the lifecycle-marketing
  * workhorse), and the first-order event-type Markov transition
  * matrix (the sequence-model starter every clickstream analysis
  * begins with).
  *
  * Scale notes:
  *  - Lift reads the MATERIALIZED pair-count table (Tables.
  *    coPairCounts — six graph ops share it) and joins two part-
  *    marginal count tables node-keyed (shuffle_hash, not broadcast:
  *    marginals scale with the catalog); the final ranking is a
  *    TakeOrdered top-20, never a full sort.
  *  - RFM quintiles sort the CUSTOMER dimension, not the fact table
  *    (orders collapse to one row per customer first); the report is
  *    the bounded 5³ segment cube. ntile runs over total orders
  *    (tiebreak custkey) for engine-identical assignment.
  *  - Markov: one user-keyed sort; transitions via lag; the matrix
  *    is a bounded 5×5 count table and probabilities are exact-count
  *    ratios from a windowed row-total. */
object Analytics22 {

  /** Top-20 association rules u→v by lift among pairs with support
    * ≥ 3 distinct orders. */
  private def qAggLift(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val marg = li.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    // 1-row broadcast order count, not a driver-side .count(): the whole
    // query stays one job (the Analytics26 qTextBurstiness convention)
    val no = li.agg(countDistinct(col("ok")).as("n_orders"))
    coPairCounts(s, d).filter(col("cn") >= 3)
      .join(marg.select(col("pk").as("u"), col("cnt").as("cu"))
        .hint("shuffle_hash"), Seq("u"))
      .join(marg.select(col("pk").as("v"), col("cnt").as("cv"))
        .hint("shuffle_hash"), Seq("v"))
      .crossJoin(broadcast(no))
      .select(col("u"), col("v"), col("cn").as("support_n"),
        round(dbl(col("cn")) / dbl(col("cu")), 6).as("confidence"),
        round(dbl(col("cn")) * dbl(col("n_orders")) /
          (dbl(col("cu")) * dbl(col("cv"))), 6).as("lift"))
      .orderBy(col("lift").desc, col("u"), col("v"))
      .limit(20)
  }

  /** RFM segmentation: per-customer recency/frequency/monetary
    * quintile scores, reported as the bounded segment cube. */
  private def qWinRfm(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
      .select(col("o_custkey").as("ck"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"),
        dec(col("o_totalprice")).as("price"))
    val mx = o.agg(max(col("day")).as("mxd"))
    val cust = o.groupBy(col("ck"))
      .agg(max(col("day")).as("lastd"), count(lit(1)).as("f"),
        sum(col("price")).as("m"))
      .crossJoin(broadcast(mx))
      .select(col("ck"), (col("mxd") - col("lastd")).as("rdays"),
        col("f"), col("m"))
    val rW = Window.orderBy(col("rdays").desc, col("ck"))
    val fW = Window.orderBy(col("f"), col("ck"))
    val mW = Window.orderBy(col("m"), col("ck"))
    cust
      .select(col("ck"),
        ntile(5).over(rW).as("r_score"),
        ntile(5).over(fW).as("f_score"),
        ntile(5).over(mW).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** First-order Markov transition matrix of event types per user
    * stream: counts + exact-ratio probabilities. */
  private def qAggMarkov(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val trans = events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowW = Window.partitionBy(col("from_type"))
    trans
      .withColumn("rt", sum(col("n")).over(rowW))
      .select(col("from_type"), col("to_type"), col("n"),
        round(dbl(col("n")) / dbl(col("rt")), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_lift" -> (qAggLift _),
    "q_win_rfm" -> (qWinRfm _),
    "q_agg_markov" -> (qAggMarkov _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_lift" ->
      """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |pairs AS MATERIALIZED (SELECT a.pk AS u, b.pk AS v,
        |            CAST(count(*) AS BIGINT) AS cn
        |          FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |          GROUP BY 1, 2 HAVING count(*) >= 3),
        |marg AS MATERIALIZED (SELECT pk, CAST(count(*) AS BIGINT) AS cnt
        |         FROM li GROUP BY pk),
        |n AS MATERIALIZED (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS total FROM li)
        |SELECT u, v, cn AS support_n,
        |  round(CAST(cn AS DOUBLE) / CAST(mu.cnt AS DOUBLE), 6)
        |    AS confidence,
        |  round(CAST(cn AS DOUBLE) * CAST(total AS DOUBLE)
        |    / (CAST(mu.cnt AS DOUBLE) * CAST(mv.cnt AS DOUBLE)), 6) AS lift
        |FROM pairs JOIN marg mu ON pairs.u = mu.pk
        |     JOIN marg mv ON pairs.v = mv.pk, n
        |ORDER BY lift DESC, u, v LIMIT 20""".stripMargin,
    "q_win_rfm" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck,
        |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS price
        |  FROM orders),
        |mx AS (SELECT max(day) AS mxd FROM o),
        |cust AS (
        |  SELECT ck, CAST(mxd - max(day) AS BIGINT) AS rdays,
        |    CAST(count(*) AS BIGINT) AS f, sum(price) AS m
        |  FROM o, mx GROUP BY ck, mxd),
        |scored AS (
        |  SELECT ck,
        |    ntile(5) OVER (ORDER BY rdays DESC, ck) AS r_score,
        |    ntile(5) OVER (ORDER BY f, ck) AS f_score,
        |    ntile(5) OVER (ORDER BY m, ck) AS m_score
        |  FROM cust)
        |SELECT r_score, f_score, m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM scored GROUP BY 1, 2, 3
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    "q_agg_markov" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |trans AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM ev),
        |cnt AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM trans WHERE from_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM cnt ORDER BY from_type, to_type""".stripMargin,
  )
}
