package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 eleventh wave: nonparametric inference and vocabulary
  * scaling —
  *
  *  - q_agg_permtest: a seeded permutation test of the treatment-vs-
  *    control mean (B = 100 deterministic md5 reassignments) — the
  *    assumption-free significance gate used when the metric is too
  *    skewed for the z/t machinery (every reassignment, and hence the
  *    p-value, is reproducible and engine-portable).
  *  - q_text_heaps: Heaps'-law vocabulary growth V(N) ≈ k·N^β fit
  *    over 16 NESTED md5-bucket subsamples of the corpus — the
  *    vocabulary-scaling report a tokenizer/vocab-size decision reads
  *    (β near 1 ⇒ open vocabulary; β ≪ 1 ⇒ vocabulary saturating).
  *
  * Scale notes:
  *  - permtest: the corpus collapses ONCE to the per-user metric
  *    table; the B reassignments explode that bounded table ×100 into
  *    ONE map-side-combinable (b, arm) aggregate — B scans' worth of
  *    work in a single shuffle, nothing quadratic. The md5 chain is
  *    the repo's standard hex fold, so both engines draw identical
  *    pseudo-labels.
  *  - heaps: growth points come from NESTED subsamples (md5 nibble of
  *    doc_id ≤ f), NOT a prefix rank — assignment is map-only, each
  *    word contributes its MIN bucket once (one vocab-bounded
  *    aggregate), V(f) is a 16-row cumulative, and no whole-corpus
  *    single-partition rank window ever exists. The OLS fit runs on
  *    16 (log N, log V) points with ROUND(·,9)→DECIMAL sums. */
object Analytics54 {

  /** Seeded permutation test (B = 100) of the click-value mean
    * difference between user-parity arms. */
  private def qAggPermtest(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("m"))
    val obs = users
      .withColumn("arm", when(col("user_id") % 2 === 0, "t").otherwise("c"))
      .groupBy(lit(1).as("one"))
      .agg(expr("count_if(arm = 't')").as("nt"),
        expr("count_if(arm = 'c')").as("nc"),
        sum(when(col("arm") === "t", col("m"))).as("st"),
        sum(when(col("arm") === "c", col("m"))).as("sc"))
      .selectExpr("nt", "nc",
        "CASE WHEN nt > 0 AND nc > 0 THEN " +
          "CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc END AS obs")
    val perms = users
      .select(col("user_id"), col("m"),
        explode(expr("sequence(1, 100)")).as("b"))
      .withColumn("parm", expr(
        "CAST(conv(substring(md5(concat(CAST(user_id AS STRING), ':', " +
          "CAST(b AS STRING))), 1, 6), 16, 10) AS BIGINT) % 2"))
      .groupBy(col("b"))
      .agg(expr("count_if(parm = 0)").as("pnt"),
        expr("count_if(parm = 1)").as("pnc"),
        sum(when(col("parm") === 0, col("m"))).as("pst"),
        sum(when(col("parm") === 1, col("m"))).as("psc"))
      .selectExpr("b",
        "CASE WHEN pnt > 0 AND pnc > 0 THEN " +
          "CAST(pst AS DOUBLE) / pnt - CAST(psc AS DOUBLE) / pnc END " +
          "AS pdiff")
    perms.crossJoin(broadcast(obs))
      .agg(max(col("nt")).as("n_t"), max(col("nc")).as("n_c"),
        max(round(col("obs"), 6)).as("obs_diff"),
        count(lit(1)).as("n_perm"),
        sum(when(expr(
          "ROUND(abs(pdiff), 9) >= ROUND(abs(obs), 9)"), 1L)
          .otherwise(0L)).as("n_extreme"))
      .withColumn("p_value", round(expr(
        "CAST(n_extreme + 1 AS DOUBLE) / CAST(n_perm + 1 AS DOUBLE)"), 6))
  }

  /** Heaps'-law fit over 16 nested md5-bucket subsamples: per bucket
    * (cumulative docs, cumulative 3-gram vocabulary) + the fitted
    * (β, ln k). The vocabulary unit is the 3-word shingle — the unit
    * the dedup index keys on, and one that actually GROWS on this
    * corpus (its word vocabulary is closed at a few dozen types, which
    * would make a word-level fit a degenerate flat line). */
  private def qTextHeaps(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("bkt", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 1), 16, 10) " +
          "AS BIGINT)"))
    val nByB = docs.groupBy(col("bkt")).agg(count(lit(1)).as("nd"))
    // each shingle contributes its MIN bucket: V(f) = types with mb <= f
    val vByB = docs
      .select(col("bkt"), split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("bkt"), explode(expr(
        """array_distinct(transform(sequence(1, size(ws) - 2),
          |  i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])))"""
          .stripMargin)).as("w"))
      .groupBy(col("w")).agg(min(col("bkt")).as("mb"))
      .groupBy(col("mb")).agg(count(lit(1)).as("nv"))
    val grid = nByB.join(vByB, col("bkt") === col("mb"), "full_outer")
      .select(coalesce(col("bkt"), col("mb")).as("f"),
        coalesce(col("nd"), lit(0L)).as("nd"),
        coalesce(col("nv"), lit(0L)).as("nv"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("f"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val pts = grid
      .select(col("f"), sum(col("nd")).over(wCum).as("n_docs"),
        sum(col("nv")).over(wCum).as("vocab"))
      .filter(col("n_docs") > 0 && col("vocab") > 0)
      .withColumn("lx", expr("ROUND(ln(CAST(n_docs AS DOUBLE)), 9)"))
      .withColumn("ly", expr("ROUND(ln(CAST(vocab AS DOUBLE)), 9)"))
    val fit = pts.agg(count(lit(1)).as("k"),
        sum(expr("CAST(lx AS DECIMAL(28,9))")).as("sx"),
        sum(expr("CAST(ly AS DECIMAL(28,9))")).as("sy"),
        sum(expr("CAST(ROUND(lx * lx, 9) AS DECIMAL(38,9))")).as("sxx"),
        sum(expr("CAST(ROUND(lx * ly, 9) AS DECIMAL(38,9))")).as("sxy"))
      .selectExpr("k",
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) " +
          "/ CAST(k AS DOUBLE) AS vxx",
        "CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) " +
          "/ CAST(k AS DOUBLE) AS vxy",
        "CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS mx",
        "CAST(sy AS DOUBLE) / CAST(k AS DOUBLE) AS my")
      .selectExpr(
        "CASE WHEN vxx > 0 THEN vxy / vxx END AS beta",
        "CASE WHEN vxx > 0 THEN my - (vxy / vxx) * mx END AS logk")
    pts.crossJoin(broadcast(fit))
      .select(col("f").as("bucket"), col("n_docs"), col("vocab"),
        // + 0.0 normalizes IEEE −0.0 (a flat fit rounds to −0.0 in one
        // engine and +0.0 in the other)
        (round(col("beta"), 6) + 0.0).as("beta"),
        (round(col("logk"), 6) + 0.0).as("log_k"))
      .orderBy(col("bucket"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_agg_permtest" -> (qAggPermtest _),
    "q_text_heaps" -> (qTextHeaps _),
  )

  val sql: Map[String, String] = Map(
    "q_agg_permtest" ->
      """WITH users AS (
        |  SELECT user_id, sum(CAST(value AS DECIMAL(18,6))) AS m
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |obs AS (
        |  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nc,
        |    CASE WHEN sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) > 0
        |      AND sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) > 0
        |      THEN CAST(sum(CASE WHEN user_id % 2 = 0 THEN m END)
        |             AS DOUBLE)
        |        / sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |        - CAST(sum(CASE WHEN user_id % 2 <> 0 THEN m END)
        |             AS DOUBLE)
        |        / sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      END AS obs
        |  FROM users),
        |perms AS (
        |  SELECT b,
        |    CASE WHEN sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END) > 0
        |      AND sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END) > 0
        |      THEN CAST(sum(CASE WHEN parm = 0 THEN m END) AS DOUBLE)
        |        / sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END)
        |        - CAST(sum(CASE WHEN parm = 1 THEN m END) AS DOUBLE)
        |        / sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END)
        |      END AS pdiff
        |  FROM (
        |    SELECT user_id, m, b,
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(substr(md5(
        |          CAST(user_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)),
        |          1, 6), ''),
        |          ch -> CAST(strpos('0123456789abcdef', ch) - 1
        |            AS BIGINT))),
        |        (h, x) -> h * 16 + x) % 2 AS parm
        |    FROM users, unnest(generate_series(1, 100)) AS s(b)) z
        |  GROUP BY b)
        |SELECT max(nt) AS n_t, max(nc) AS n_c,
        |  max(ROUND(obs, 6)) AS obs_diff,
        |  CAST(count(*) AS BIGINT) AS n_perm,
        |  CAST(sum(CASE WHEN ROUND(abs(pdiff), 9) >= ROUND(abs(obs), 9)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
        |  ROUND(CAST(sum(CASE WHEN ROUND(abs(pdiff), 9)
        |        >= ROUND(abs(obs), 9) THEN 1 ELSE 0 END) + 1 AS DOUBLE)
        |    / CAST(count(*) + 1 AS DOUBLE), 6) AS p_value
        |FROM perms CROSS JOIN obs""".stripMargin,
    "q_text_heaps" ->
      """WITH docs AS (
        |  SELECT doc_id, text,
        |    CAST(strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT)
        |      AS bkt
        |  FROM documents),
        |nb AS (SELECT bkt, CAST(count(*) AS BIGINT) AS nd
        |       FROM docs GROUP BY 1),
        |vb AS (
        |  SELECT mb, CAST(count(*) AS BIGINT) AS nv FROM (
        |    SELECT w, min(bkt) AS mb FROM (
        |      SELECT bkt, unnest(list_distinct(list_transform(
        |        generate_series(1, len(ws) - 2),
        |        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS w
        |      FROM (SELECT bkt, string_split(lower(text), ' ') AS ws
        |            FROM docs
        |            WHERE len(string_split(lower(text), ' ')) >= 3) y) z
        |    GROUP BY w) a
        |  GROUP BY 1),
        |grid AS (
        |  SELECT COALESCE(bkt, mb) AS f,
        |    COALESCE(nd, CAST(0 AS BIGINT)) AS nd,
        |    COALESCE(nv, CAST(0 AS BIGINT)) AS nv
        |  FROM nb FULL OUTER JOIN vb ON bkt = mb),
        |pts AS (
        |  SELECT f, n_docs, vocab,
        |    ROUND(ln(CAST(n_docs AS DOUBLE)), 9) AS lx,
        |    ROUND(ln(CAST(vocab AS DOUBLE)), 9) AS ly
        |  FROM (
        |    SELECT f,
        |      CAST(sum(nd) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED
        |        PRECEDING AND CURRENT ROW) AS BIGINT) AS n_docs,
        |      CAST(sum(nv) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED
        |        PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab
        |    FROM grid) c
        |  WHERE n_docs > 0 AND vocab > 0),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    sum(CAST(lx AS DECIMAL(28,9))) AS sx,
        |    sum(CAST(ly AS DECIMAL(28,9))) AS sy,
        |    sum(CAST(ROUND(lx * lx, 9) AS DECIMAL(38,9))) AS sxx,
        |    sum(CAST(ROUND(lx * ly, 9) AS DECIMAL(38,9))) AS sxy
        |  FROM pts),
        |fit AS (
        |  SELECT CASE WHEN vxx > 0 THEN vxy / vxx END AS beta,
        |    CASE WHEN vxx > 0 THEN my - (vxy / vxx) * mx END AS logk
        |  FROM (
        |    SELECT CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS vxx,
        |      CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * CAST(sy AS DOUBLE) / CAST(k AS DOUBLE) AS vxy,
        |      CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS mx,
        |      CAST(sy AS DOUBLE) / CAST(k AS DOUBLE) AS my
        |    FROM mom) a)
        |SELECT f AS bucket, n_docs, vocab,
        |  ROUND(beta, 6) + 0.0 AS beta, ROUND(logk, 6) + 0.0 AS log_k
        |FROM pts CROSS JOIN fit ORDER BY bucket""".stripMargin,
  )
}
