package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 twenty-seventh wave: the sample-ratio-mismatch check (the
  * first thing an experimentation platform validates — a skewed
  * assignment invalidates every downstream metric), the vocabulary
  * coverage curve (what share of corpus tokens the top-k words cover —
  * the tokenizer-budget report, Zipf's-law's operational face), and
  * the referential-integrity audit (orphan facts and dangling
  * dimension keys — the FK report every warehouse runs nightly).
  *
  * Scale notes:
  *  - SRM: assignment is map-only md5 parity (no RNG state); the
  *    check collapses to two integers and a 1-df chi-square fixed
  *    double tree.
  *  - Coverage: the vocabulary count table is bounded; ranking and
  *    cumulative shares run over IT, never the token stream (one
  *    explode-count shuffle total).
  *  - Integrity: each relation audit is ONE left-anti count between
  *    key projections (no row payloads shuffle); the three audits
  *    union into a bounded report. */
object Analytics27 {

  /** Sample-ratio mismatch: md5-parity A/B assignment of users, 1-df
    * chi-square against the intended 50/50. */
  private def qAggSrm(s: SparkSession, d: String): DataFrame = {
    val assigned = events(s, d)
      .select(col("user_id")).distinct()
      .select(when(expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), " +
        "1, 6), 16, 10) AS BIGINT) % 2") === 0,
        "A").otherwise("B").as("arm"))
      .groupBy(col("arm")).agg(count(lit(1)).as("n"))
    val wide = assigned.agg(
      sum(when(col("arm") === "A", col("n"))).as("n_a"),
      sum(when(col("arm") === "B", col("n"))).as("n_b"))
    wide.select(col("n_a"), col("n_b"),
      round((dbl(col("n_a")) - dbl(col("n_b"))) *
        (dbl(col("n_a")) - dbl(col("n_b"))) /
        (dbl(col("n_a")) + dbl(col("n_b"))), 6).as("chi2_1df"),
      // 3.841 = χ²(1df, 95%): flag only a statistically real skew
      ((dbl(col("n_a")) - dbl(col("n_b"))) *
        (dbl(col("n_a")) - dbl(col("n_b"))) /
        (dbl(col("n_a")) + dbl(col("n_b"))) > 3.841).as("srm_flag"))
  }

  /** Vocabulary coverage: share of all corpus tokens covered by the
    * top-k most frequent words, k ∈ {1, 5, 10, 20}. */
  private def qTextCoverage(s: SparkSession, d: String): DataFrame = {
    val vocab = t(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("wd"))
      .filter(col("wd") =!= "")
      .groupBy(col("wd")).agg(count(lit(1)).as("c"))
    val wRank = Window.orderBy(col("c").desc, col("wd"))
    val wCum = Window.orderBy(col("c").desc, col("wd"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("c").desc, col("wd"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = vocab
      .select(col("wd"), col("c"),
        row_number().over(wRank).as("rk"),
        sum(col("c")).over(wCum).as("cum"),
        sum(col("c")).over(wAll).as("tot"))
    ranked.filter(col("rk").isin(1, 5, 10, 20))
      .select(col("rk").as("top_k"), col("wd").as("kth_word"),
        col("cum").as("tokens_covered"), col("tot").as("tokens_total"),
        round(dbl(col("cum")) / dbl(col("tot")), 6).as("coverage"))
      .orderBy(col("top_k"))
  }

  /** Referential-integrity audit: orphan lineitems (no order), orphan
    * orders (no customer), suppliers with no lineitems. ONE plan, one
    * action (r11): each relation's audit is a left-anti-join aggregate
    * cross-joined with its table total as a 1-row broadcast aggregate
    * (the Analytics22 discipline), the three UNION ALL'd — replacing
    * six sequential driver-side `.count()` jobs with a single job
    * whose branches schedule concurrently. At 100 TB each scan is
    * expensive; serializing six of them was the repo's last driver-
    * side holdout. */
  private def qQualityIntegrity(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val o = t(s, d, "orders")
    val c = t(s, d, "customer")
    val sup = t(s, d, "supplier")
    def audit(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame =
      left.select(col(lk))
        .join(right.select(col(rk).as(lk)), Seq(lk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(broadcast(left.agg(count(lit(1)).as("n_rows"))))
        .select(lit(name).as("relation"), col("n_orphans"), col("n_rows"))
    audit("lineitem_without_order", li, "l_orderkey", o, "o_orderkey")
      .unionAll(audit("order_without_customer", o, "o_custkey",
        c, "c_custkey"))
      .unionAll(audit("supplier_without_lineitem", sup, "s_suppkey",
        li, "l_suppkey"))
      .orderBy(col("relation"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_srm" -> (qAggSrm _),
    "q_text_coverage" -> (qTextCoverage _),
    "q_quality_integrity" -> (qQualityIntegrity _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arms AS (
        |  SELECT CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(
        |        substr(md5(CAST(user_id AS VARCHAR)), 1, 6), ''),
        |        ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 2 = 0
        |    THEN 'A' ELSE 'B' END AS arm
        |  FROM u),
        |cnt AS (SELECT arm, CAST(count(*) AS BIGINT) AS n
        |        FROM arms GROUP BY arm),
        |wide AS (
        |  SELECT CAST(sum(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b
        |  FROM cnt)
        |SELECT n_a, n_b,
        |  round((CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
        |    * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
        |    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)), 6) AS chi2_1df,
        |  ((CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
        |    * (CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
        |    / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) > 3.841)
        |    AS srm_flag
        |FROM wide""".stripMargin,
    "q_text_coverage" ->
      """WITH vocab AS (
        |  SELECT wd, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS wd
        |        FROM documents)
        |  WHERE wd <> '' GROUP BY wd),
        |ranked AS (
        |  SELECT wd, c,
        |    row_number() OVER (ORDER BY c DESC, wd) AS rk,
        |    sum(c) OVER (ORDER BY c DESC, wd
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER () AS tot
        |  FROM vocab)
        |SELECT CAST(rk AS INT) AS top_k, wd AS kth_word,
        |  CAST(cum AS BIGINT) AS tokens_covered,
        |  CAST(tot AS BIGINT) AS tokens_total,
        |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS coverage
        |FROM ranked WHERE rk IN (1, 5, 10, 20) ORDER BY top_k""".stripMargin,
    "q_quality_integrity" ->
      """SELECT 'lineitem_without_order' AS relation,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |    AS n_orphans,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows
        |UNION ALL
        |SELECT 'order_without_customer',
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders)
        |UNION ALL
        |SELECT 'supplier_without_lineitem',
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier
        |   WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)),
        |  (SELECT CAST(count(*) AS BIGINT) FROM supplier)
        |ORDER BY relation""".stripMargin,
  )
}
