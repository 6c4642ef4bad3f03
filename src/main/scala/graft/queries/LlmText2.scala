package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Second LLM-pipeline text wave: PII-style scrubbing, n-gram
  * generation, and duplicate-group clustering (connected components).
  *
  * Scale notes: the scrub and n-gram ops are embarrassingly parallel
  * (per-row regex / array transforms, whole-stage codegen'd). Clustering
  * is the one iterative op in the engine — min-label propagation over a
  * *blocked* candidate graph (equal (lang, source) block + |Δn_chars|≤2
  * band), converging in O(graph diameter) joins; each iteration is a
  * shuffle on doc_id, never an unblocked O(n²) pair scan. */
object LlmText2 {

  /** Scrub: lowercase, filler-token masking ('a'/'the' → '#', word
    * boundaries so substrings survive), digit-run masking, whitespace
    * squeeze — the regex-normalization pass an LLM data pipeline runs
    * before dedup. (Spark regexp_replace is global by default; DuckDB
    * needs 'g'.) */
  private def qTextScrub(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(lower(col("text")),
          "\\b(a|the)\\b", "#"), "[0-9]+", "#"),
          " +", " ").as("scrubbed"))
      .withColumn("n_masked",
        (length(col("scrubbed")) -
          length(regexp_replace(col("scrubbed"), "#", ""))).cast("int"))
      .orderBy("doc_id")

  /** Word bigram counts, global top-20 (token-statistics op). The words
    * array is split once and bigrams come from one zip_with over two
    * slices — O(tokens), not the O(tokens²) of per-index element_at over
    * a re-split array. One-word docs fall out naturally (empty slices). */
  private def qTextNgrams(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bg")).limit(20)

  /** Duplicate-group clustering: connected components over a blocked
    * near-dup candidate graph, labels = min doc_id of the component.
    *
    * Iterative min-label propagation with pointer doubling: each round
    * takes the min over (own label, neighbors' labels, label-of-label).
    * The label-of-label join halves label-chain depth every round, so
    * convergence is O(log diameter) — plain neighbor propagation needs
    * O(diameter) rounds, which on the band-graph chains here (hundreds
    * of docs long at sf0.1) is 10× the shuffles for the same answer.
    * Convergence test: labels only ever decrease, so the label sum is
    * strictly decreasing until the fixpoint — one cheap agg per round
    * instead of a change-count join. The DuckDB oracle computes the same
    * components with a recursive CTE. */
  private def qDedupCluster(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val a = docs.select(col("doc_id").as("x"), col("lang"), col("source"),
      col("n_chars").as("nc_x"))
    val b = docs.select(col("doc_id").as("y"), col("lang"), col("source"),
      col("n_chars").as("nc_y"))
    val pairs = a.join(b, Seq("lang", "source"))
      .filter(abs(col("nc_x") - col("nc_y")) <= 2 && col("x") < col("y"))
      .select(col("x"), col("y"))
    connectedComponents(docs.select(col("doc_id")), pairs)
  }

  /** Min-label propagation with pointer doubling over an undirected edge
    * set (`x`,`y` pairs; both directions are derived here). Returns
    * (doc_id, grp) with grp = the component's minimum doc_id. Extracted
    * from q_dedup_cluster so the convergence arithmetic is unit-testable
    * at extreme id ranges. */
  private[queries] def connectedComponents(vertices: DataFrame,
      pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("y").as("x"), col("x").as("y"))).persist()
    try {
      // localCheckpoint (eager) truncates lineage every round — without
      // it each round's logical plan nests the previous one and Catalyst
      // analysis time grows with the iteration count, dominating the
      // actual (tiny) per-round shuffle. A production run over an
      // unreliable cluster would checkpoint() to durable storage at the
      // same cadence instead.
      var labels = vertices.select(col("doc_id"), col("doc_id").as("grp"))
        .localCheckpoint(true)
      // convergence scalar: labels only decrease, so the label sum is
      // strictly decreasing until the fixpoint. Summed as DECIMAL(38,0) —
      // a Long sum overflows once doc_ids reach ~2^40 at real corpus
      // cardinality, which would stall or false-converge the loop.
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("grp").cast("decimal(38,0)"))).head.getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 50) {
        val prop = edges.join(labels, edges("x") === labels("doc_id"))
          .select(col("y").as("doc_id"), col("grp"))
        val jump = labels.toDF("d1", "g1")
          .join(labels.toDF("d2", "g2"), col("g1") === col("d2"))
          .select(col("d1").as("doc_id"), col("g2").as("grp"))
        val next = labels.union(prop).union(jump)
          .groupBy("doc_id").agg(min("grp").as("grp")).localCheckpoint(true)
        val s2 = labelSum(next)
        labels = next
        converged = s2.compareTo(prevSum) == 0
        prevSum = s2
        iter += 1
      }
      labels.orderBy("doc_id")
    } finally edges.unpersist()
  }

  /** Stopword removal: drop function words, keep order, count the
    * removals — the token-filtering pass before n-gram/embedding
    * stages. */
  private def qTextStopwords(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"),
        expr("array_join(filter(ws, w -> NOT w IN ('a', 'the', 'of', 'and')), ' ')")
          .as("kept"),
        expr("cast(size(ws) - size(filter(ws, w -> NOT w IN ('a', 'the', 'of', 'and'))) as int)")
          .as("n_removed"))
      .orderBy("doc_id")

  /** Sub-document exact dedup (the CCNet paragraph-dedup analogue over
    * flat text): documents split into fixed 10-word spans, a span kept
    * only at its FIRST corpus occurrence (lowest (doc_id, idx) —
    * deterministic), documents reconstructed from their surviving spans.
    * This is the family member the whole-document passes can't express:
    * boilerplate headers/footers repeated across millions of pages
    * disappear while the unique bodies survive.
    *
    * Scale shape: the span table is one explode (O(tokens) rows); first
    * ownership is a single min(struct) hash aggregate keyed by span
    * text (map-side partials absorb hot boilerplate spans before the
    * shuffle); the ownership table joins back on the same key the
    * aggregate hashed on (shuffle join — span-keyed, AQE-skew-safe, no
    * unbounded broadcast); reconstruction is a per-doc sorted
    * collect_list bounded by document length. No stage holds more than
    * one document's spans in a buffer. */
  private def qDedupSpan(s: SparkSession, d: String): DataFrame = {
    val spans = t(s, d, "documents")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_sp",
        greatest(ceil(size(col("ws")) / lit(10.0)), lit(1)).cast("int"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, n_sp - 1)," +
          " i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"))
        .as(Seq("idx", "span")))
    val firstOwner = spans.groupBy(col("span"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("fst"))
    spans.join(firstOwner, Seq("span"))
      .withColumn("keep", col("doc_id") === col("fst.doc_id") &&
        col("idx") === col("fst.idx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        expr("""array_join(transform(array_sort(
          collect_list(CASE WHEN keep THEN struct(idx, span) END)),
          p -> p.span), ' ')""").as("deduped"))
      .orderBy("doc_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stopwords" -> (qTextStopwords _),
    "q_text_scrub" -> (qTextScrub _),
    "q_text_ngrams" -> (qTextNgrams _),
    "q_dedup_cluster" -> (qDedupCluster _),
    "q_dedup_span" -> (qDedupSpan _),
  )

  val sql: Map[String, String] = Map(
    // 1-based inclusive list slicing in DuckDB (ws[a:b]) vs Spark's
    // slice(ws, start, length); first-occurrence via a window rank
    // ordered by (doc_id, idx) — same total order as Spark's
    // min(struct(doc_id, idx))
    "q_dedup_span" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |sp AS (SELECT doc_id, CAST(i AS INT) AS idx,
        |         array_to_string(
        |           ws[CAST(i AS INT)*10+1 : CAST(i AS INT)*10+10], ' ')
        |           AS span
        |       FROM (SELECT doc_id, ws, unnest(range(0,
        |           GREATEST(CAST(ceil(len(ws)/10.0) AS BIGINT), 1))) AS i
        |             FROM w)),
        |k AS (SELECT doc_id, idx, span,
        |        ROW_NUMBER() OVER (PARTITION BY span
        |          ORDER BY doc_id, idx) = 1 AS keep FROM sp)
        |SELECT doc_id, COUNT(*) AS n_spans,
        |  CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(span, ' ' ORDER BY idx)
        |    FILTER (WHERE keep), '') AS deduped
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_stopwords" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(string_split(text, ' '),
        |    w -> w NOT IN ('a', 'the', 'of', 'and')), ' ') AS kept,
        |  CAST(len(string_split(text, ' ')) -
        |       len(list_filter(string_split(text, ' '),
        |         w -> w NOT IN ('a', 'the', 'of', 'and'))) AS INT) AS n_removed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_scrub" ->
      """SELECT doc_id, scrubbed,
        |  CAST(len(scrubbed) - len(replace(scrubbed, '#', '')) AS INT) AS n_masked
        |FROM (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(lower(text),
        |    '\b(a|the)\b', '#', 'g'), '[0-9]+', '#', 'g'),
        |                 ' +', ' ', 'g') AS scrubbed
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_text_ngrams" ->
      """SELECT bg, COUNT(*) AS n FROM (
        |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1])) AS bg
        |  FROM documents)
        |GROUP BY bg ORDER BY n DESC, bg LIMIT 20""".stripMargin,
    "q_dedup_cluster" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.doc_id AS x, b.doc_id AS y
        |  FROM documents a JOIN documents b
        |    ON a.lang = b.lang AND a.source = b.source
        |   AND abs(a.n_chars - b.n_chars) <= 2 AND a.doc_id < b.doc_id),
        |edges AS (SELECT x, y FROM pairs UNION SELECT y AS x, x AS y FROM pairs),
        |lbl AS (
        |  SELECT doc_id, doc_id AS root FROM documents
        |  UNION
        |  SELECT e.y AS doc_id, l.root FROM lbl l
        |  JOIN edges e ON e.x = l.doc_id WHERE l.root < e.y)
        |SELECT doc_id, MIN(root) AS grp FROM lbl GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
  )
}
