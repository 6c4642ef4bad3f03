package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 eleventh wave: Holt double-exponential smoothing (the
  * level+trend upgrade of q_time_ema), the Theil–Sen robust slope
  * estimator (rank-based trend detection immune to outlier bursts),
  * and a two-step full-batch logistic-regression trainer over hashed
  * text features (the linear-classifier sibling of q_text_naivebayes).
  *
  * Scale notes:
  *  - Holt's recursion is inherently sequential PER KEY, so it runs as
  *    a per-user sorted fold (collect_list → fixed-order aggregate):
  *    group state is bounded by per-user activity, the same contract as
  *    q_sim_mmr's mapGroups. α = β = 1/2 keeps every smoothing product
  *    dyadic; both engines walk the identical fold, so the final
  *    (level, trend) doubles are bit-equal.
  *  - Theil–Sen is quadratic in the HOURLY series length — bounded by
  *    the time range, not the row count (720 hours at this SF; a year
  *    is 8 760) — so the pair self-join is a bounded-table op by
  *    construction; the median slope is a deterministic ordered pick
  *    (slope, h1, h2), not an interpolation.
  *  - Logistic regression: every gradient/score accumulation across
  *    docs or buckets routes through ROUND(·, 9) → DECIMAL sums (the
  *    engine-order-free discipline); only per-element sigmoid/products
  *    stay in doubles, where both engines compute identical expression
  *    trees. Model state is 65 numbers — broadcast, never collected. */
object Analytics11 {

  /** Holt linear smoothing (α = β = 0.5) of each user's event-value
    * series: final level + trend per user — the per-entity short-term
    * forecast state. */
  private def qTimeHolt(s: SparkSession, d: String): DataFrame = {
    events(s, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("value")))).as("arr"))
      // State is a 2-element DOUBLE array [level, trend], NOT a struct:
      // DuckDB v1.0's list_reduce mis-evaluates struct accumulators
      // beyond two elements (reproduced: 3-element fold returns a wrong
      // second field), while list accumulators fold correctly — and the
      // array form keeps both expression trees identical anyway.
      .select(col("user_id"), size(col("arr")).as("n_events"), expr(
        """aggregate(
          |  transform(slice(arr, 2, size(arr) - 1),
          |    e -> array(CAST(e.value AS DOUBLE), CAST(0.0 AS DOUBLE))),
          |  array(CAST(element_at(arr, 1).value AS DOUBLE),
          |        CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> array(
          |    CAST(0.5 AS DOUBLE) * x[0]
          |      + CAST(0.5 AS DOUBLE) * (acc[0] + acc[1]),
          |    CAST(0.5 AS DOUBLE)
          |        * ((CAST(0.5 AS DOUBLE) * x[0]
          |            + CAST(0.5 AS DOUBLE) * (acc[0] + acc[1])) - acc[0])
          |      + CAST(0.5 AS DOUBLE) * acc[1]))""".stripMargin).as("st"))
      .select(col("user_id"), col("n_events").cast("long").as("n_events"),
        round(expr("st[0]"), 6).as("level"),
        round(expr("st[1]"), 6).as("trend"))
      .orderBy(col("user_id"))
  }

  /** Theil–Sen slope per event type over the hourly count series: the
    * discrete median (deterministic (slope, h1, h2) pick) of all
    * pairwise slopes — robust trend detection. */
  private def qTimeTheilsen(s: SparkSession, d: String): DataFrame = {
    val hourly = events(s, d)
      .select(col("event_type"), expr("us div 3600000000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val a = hourly.select(col("event_type"), col("hr").as("h1"),
      col("c").as("c1"))
    val b = hourly.select(col("event_type"), col("hr").as("h2"),
      col("c").as("c2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("h1") < col("h2"))
      .withColumn("slope", expr(
        "CAST(c2 - c1 AS DOUBLE) / CAST(h2 - h1 AS DOUBLE)"))
    val win = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("h1"), col("h2"))
    val cw = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn", row_number().over(win))
      .withColumn("np", count(lit(1)).over(cw))
      .filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        round(col("slope"), 6).as("slope"))
      .orderBy(col("event_type"))
  }

  /** Two full-batch gradient-descent steps (η = 0.1) of logistic
    * regression: label = (lang = 'en'), features = 64-bucket hashed
    * term frequencies plus bias (bkt = −1). From w₀ = 0 the first
    * residual is exactly 0.5 − y, so step 1 is exact rank-1 algebra;
    * step 2 scores through the sigmoid with decimal-routed sums. */
  private def qTextLogreg(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), when(col("lang") === "en", 1.0).otherwise(0.0)
        .as("y"))
    val tf = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("bkt", expr(
        "CAST(CAST(conv(substring(md5(w), 1, 6), 16, 10) AS BIGINT) % 64" +
          " AS BIGINT)"))
      .groupBy(col("doc_id"), col("bkt")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    // Step 1: residual is exactly (0.5 − y) — gradients are exact
    // 0.5-multiples, summed as DECIMAL(18,1).
    val g1w = tf.join(docs, Seq("doc_id"))
      .withColumn("g", expr(
        "CAST((0.5 - y) * CAST(tf AS DOUBLE) AS DECIMAL(18,1))"))
      .groupBy(col("bkt")).agg(sum(col("g")).as("g1"))
    val g1b = docs
      .agg(sum(expr("CAST(0.5 - y AS DECIMAL(18,1))")).as("g1"))
      .select(lit(-1L).as("bkt"), col("g1"))
    val w1 = g1w.union(g1b).crossJoin(broadcast(nDocs))
      .select(col("bkt"), expr(
        "-0.1 * (CAST(g1 AS DOUBLE) / CAST(n AS DOUBLE))").as("w1"))
    // Step 2: score each doc through w1 (decimal-routed bucket sum),
    // sigmoid residual, decimal-routed gradient.
    val w1f = w1.filter(col("bkt") >= 0)
    val w1b = w1.filter(col("bkt") === -1L)
      .select(col("w1").as("bias"))
    val score = tf.join(broadcast(w1f), Seq("bkt"))
      .withColumn("t", expr(
        "CAST(ROUND(CAST(tf AS DOUBLE) * w1, 9) AS DECIMAL(18,9))"))
      .groupBy(col("doc_id")).agg(sum(col("t")).as("sc"))
      .crossJoin(broadcast(w1b))
      .select(col("doc_id"),
        expr("CAST(sc AS DOUBLE) + bias").as("s"))
    val resid = docs.join(score, Seq("doc_id"), "left")
      .select(col("doc_id"), expr(
        "1.0 / (1.0 + exp(-(COALESCE(s, CAST(0.0 AS DOUBLE))))) - y")
        .as("r2"))
    val g2w = tf.join(resid, Seq("doc_id"))
      .withColumn("g", expr(
        "CAST(ROUND(r2 * CAST(tf AS DOUBLE), 9) AS DECIMAL(18,9))"))
      .groupBy(col("bkt")).agg(sum(col("g")).as("g2"))
    val g2b = resid
      .agg(sum(expr("CAST(ROUND(r2, 9) AS DECIMAL(18,9))")).as("g2"))
      .select(lit(-1L).as("bkt"), col("g2"))
    w1.join(g2w.union(g2b), Seq("bkt")).crossJoin(broadcast(nDocs))
      .select(col("bkt"),
        round(col("w1"), 6).as("w1"),
        round(expr(
          "w1 - 0.1 * (CAST(g2 AS DOUBLE) / CAST(n AS DOUBLE))"), 6)
          .as("w2"))
      .orderBy(col("bkt"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_time_holt" -> (qTimeHolt _),
    "q_time_theilsen" -> (qTimeTheilsen _),
    "q_text_logreg" -> (qTextLogreg _),
  )

  val sql: Map[String, String] = Map(
    "q_time_holt" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_id, value
        |  FROM events),
        |g AS (SELECT user_id, list_sort(list(
        |        {'us': us, 'event_id': event_id, 'value': value})) AS arr
        |      FROM ev GROUP BY user_id),
        |f AS (SELECT user_id, len(arr) AS n,
        |  list_reduce(list_prepend(
        |    [CAST(arr[1].value AS DOUBLE), CAST(0.0 AS DOUBLE)],
        |    list_transform(arr[2:],
        |      e -> [CAST(e.value AS DOUBLE), CAST(0.0 AS DOUBLE)])),
        |    (acc, x) -> [
        |      CAST(0.5 AS DOUBLE) * x[1]
        |        + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
        |      CAST(0.5 AS DOUBLE)
        |          * ((CAST(0.5 AS DOUBLE) * x[1]
        |              + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2])) - acc[1])
        |        + CAST(0.5 AS DOUBLE) * acc[2]]) AS st
        |  FROM g)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  round(st[1], 6) AS level, round(st[2], 6) AS trend
        |FROM f ORDER BY user_id""".stripMargin,
    "q_time_theilsen" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, a.hr AS h1, b.hr AS h2,
        |    CAST(b.c - a.c AS DOUBLE) / CAST(b.hr - a.hr AS DOUBLE)
        |      AS slope
        |  FROM hourly a JOIN hourly b
        |    ON a.event_type = b.event_type AND a.hr < b.hr),
        |ranked AS (
        |  SELECT event_type, slope,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY slope, h1, h2) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM pairs)
        |SELECT event_type, np AS n_pairs, round(slope, 6) AS slope
        |FROM ranked WHERE rn = (np + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "q_text_logreg" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
        |         ELSE CAST(0.0 AS DOUBLE) END AS y
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(md5(w), 1, 6), ''),
        |        ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT))),
        |      (h, x) -> h * 16 + x) % 64 AS bkt,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) z
        |  WHERE w <> '' GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
        |g1w AS (
        |  SELECT bkt, sum(CAST((0.5 - y) * CAST(tf AS DOUBLE)
        |    AS DECIMAL(18,1))) AS g1
        |  FROM tf JOIN docs USING (doc_id) GROUP BY bkt
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT) AS bkt,
        |    sum(CAST(0.5 - y AS DECIMAL(18,1))) AS g1 FROM docs),
        |w1 AS (
        |  SELECT bkt,
        |    -0.1 * (CAST(g1 AS DOUBLE) / CAST(n AS DOUBLE)) AS w1
        |  FROM g1w CROSS JOIN nd),
        |score AS (
        |  SELECT tf.doc_id,
        |    CAST(sum(CAST(ROUND(CAST(tf.tf AS DOUBLE) * w1.w1, 9)
        |      AS DECIMAL(18,9))) AS DOUBLE)
        |    + (SELECT w1 FROM w1 WHERE bkt = -1) AS s
        |  FROM tf JOIN w1 ON tf.bkt = w1.bkt
        |  GROUP BY tf.doc_id),
        |resid AS (
        |  SELECT docs.doc_id,
        |    1.0 / (1.0 + exp(-(COALESCE(s, CAST(0.0 AS DOUBLE))))) - y
        |      AS r2
        |  FROM docs LEFT JOIN score ON docs.doc_id = score.doc_id),
        |g2 AS (
        |  SELECT bkt, sum(CAST(ROUND(r2 * CAST(tf AS DOUBLE), 9)
        |    AS DECIMAL(18,9))) AS g2
        |  FROM tf JOIN resid USING (doc_id) GROUP BY bkt
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT),
        |    sum(CAST(ROUND(r2, 9) AS DECIMAL(18,9))) FROM resid)
        |SELECT w1.bkt, round(w1.w1, 6) AS w1,
        |  round(w1.w1 - 0.1 * (CAST(g2.g2 AS DOUBLE)
        |    / CAST(n AS DOUBLE)), 6) AS w2
        |FROM w1 JOIN g2 ON w1.bkt = g2.bkt CROSS JOIN nd
        |ORDER BY w1.bkt""".stripMargin,
  )
}
