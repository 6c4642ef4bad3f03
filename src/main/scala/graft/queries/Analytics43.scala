package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-9 seventh wave: data-governance reports — the k-anonymity
  * re-identification audit and the per-source dataset card. Both are
  * the "publish this before you ship the dataset" artifacts a
  * training-data pipeline emits alongside the data itself.
  *
  * Scale notes:
  *  - Both ops collapse the fact table to a bounded intermediate in
  *    ONE map-side-combined scan (equivalence classes bounded by
  *    quasi-identifier cardinality; datacard rows bounded by source ×
  *    lang), then answer every reported figure from that table. The
  *    k sweep is a 4-row broadcast cross join over the class table,
  *    not four audit runs.
  *  - Every ratio divides exact BIGINTs and rounds (6/9dp) before
  *    emission; group rows exist only when n ≥ 1, so no ANSI
  *    divide-by-zero surface. */
object Analytics43 {

  /** k-anonymity audit over the customer quasi-identifiers
    * (nation, market segment, account-balance band of 1000): for each
    * candidate k, how many equivalence classes fall below k members
    * and how many rows those classes expose. The class table is the
    * QI-cardinality-bounded aggregate every k answers from — the
    * production privacy gate before sharing joined analytics
    * extracts. */
  private def qQualityKanon(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cls = t(s, d, "customer")
      .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / lit(1000.0)).cast("bigint").as("balband"))
      .groupBy(col("nat"), col("seg"), col("balband"))
      .agg(count(lit(1)).as("sz"))
    val ks = Seq(2, 5, 10, 25).toDF("k")
    cls.crossJoin(broadcast(ks))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("sz") < col("k"), 1L).otherwise(0L))
          .as("classes_at_risk"),
        sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
          .as("rows_at_risk"),
        sum(col("sz")).as("n_rows"),
        min(col("sz")).as("min_class"),
        max(col("sz")).as("max_class"))
      .select(col("k"), col("n_classes"), col("classes_at_risk"),
        col("rows_at_risk"), col("n_rows"), col("min_class"),
        col("max_class"),
        when(col("n_rows") > 0,
          round(dbl(col("rows_at_risk")) / dbl(col("n_rows")), 9))
          .as("risk_share"))
      .orderBy(col("k"))
  }

  /** l-diversity audit — k-anonymity's required companion (a class can
    * be k-anonymous and still leak: if all k members share one value of
    * the sensitive attribute, membership alone discloses it). QI here
    * is (nation, balance band); the SENSITIVE attribute is the market
    * segment. Per class: size and distinct sensitive values; per
    * candidate l ∈ {2, 3}: classes below l and the rows they expose.
    * Same bounded shape as the k audit — ONE map-side-combined scan to
    * the QI-cardinality-bounded class table (countDistinct over the
    * 5-value segment domain adds a constant factor, not a new shuffle
    * key), then a 2-row broadcast cross join answers the sweep. */
  private def qQualityLdiv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cls = t(s, d, "customer")
      .select(col("c_nationkey").as("nat"),
        floor(col("c_acctbal") / lit(1000.0)).cast("bigint").as("balband"),
        col("c_mktsegment").as("seg"))
      .groupBy(col("nat"), col("balband"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("seg")).as("ldiv"))
    val ls = Seq(2, 3).toDF("l")
    cls.crossJoin(broadcast(ls))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("ldiv") < col("l"), 1L).otherwise(0L))
          .as("classes_below"),
        sum(when(col("ldiv") < col("l"), col("sz")).otherwise(0L))
          .as("rows_exposed"),
        sum(col("sz")).as("n_rows"),
        min(col("ldiv")).as("min_ldiv"))
      .select(col("l"), col("n_classes"), col("classes_below"),
        col("rows_exposed"), col("n_rows"), col("min_ldiv"),
        when(col("n_rows") > 0,
          round(dbl(col("rows_exposed")) / dbl(col("n_rows")), 9))
          .as("exposed_share"))
      .orderBy(col("l"))
  }

  /** Per-source dataset card — the datasheet row published with every
    * training-data drop: volume (docs, whitespace tokens), language
    * mix (distinct langs, dominant lang + share), short-document share
    * (< 20 tokens), and the exact-duplicate share (1 − distinct
    * md5(text) / docs). One scan builds the per-(source, lang) and
    * per-source aggregates; the dominant language is a
    * row_number-over-counts argmax (deterministic lang tie-break). */
  private def qQualityDatacard(s: SparkSession, d: String): DataFrame = {
    // eager localCheckpoint, NOT persist (feeds the per-source base
    // aggregate AND the per-(source, lang) argmax): RDD-level blocks the
    // ContextCleaner reclaims, no CacheManager entry to leak past the op
    // (VERDICT r9). The text column collapses to its md5 BEFORE the
    // materialization — the dup-share aggregate only ever consumes the
    // hash, so the checkpointed table carries 16 bytes per doc instead
    // of the corpus.
    val docs = t(s, d, "documents")
      .select(col("source"), col("lang"), md5(col("text")).as("th"),
        size(split(col("text"), " ")).cast("bigint").as("ntok"))
      .localCheckpoint(true)
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("ntok")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      sum(when(col("ntok") < 20, 1L).otherwise(0L)).as("n_short"),
      countDistinct(col("th")).as("n_uniq"))
    val wTop = Window.partitionBy(col("source"))
      .orderBy(desc("nl"), col("lang"))
    val top = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("nl"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("nl"))
    base.join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(dbl(col("n_tokens")) / dbl(col("n_docs")), 6)
          .as("avg_tokens"),
        col("n_langs"), col("top_lang"),
        round(dbl(col("nl")) / dbl(col("n_docs")), 9)
          .as("top_lang_share"),
        round(dbl(col("n_short")) / dbl(col("n_docs")), 9)
          .as("short_share"),
        round(lit(1.0) - dbl(col("n_uniq")) / dbl(col("n_docs")), 9)
          .as("exact_dup_share"))
      .orderBy(col("source"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_quality_kanon" -> (qQualityKanon _),
    "q_quality_ldiv" -> (qQualityLdiv _),
    "q_quality_datacard" -> (qQualityDatacard _),
  )

  val sql: Map[String, String] = Map(
    // floor(DOUBLE / 1000.0) is the same IEEE op in both engines; the
    // k list is a VALUES CTE (INTEGER in both).
    "q_quality_kanon" ->
      """WITH qi AS (SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balband
        |  FROM customer),
        |cls AS (SELECT nat, seg, balband, CAST(count(*) AS BIGINT) AS sz
        |        FROM qi GROUP BY 1, 2, 3),
        |ks AS (SELECT k FROM (VALUES (2), (5), (10), (25)) v(k))
        |SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_at_risk,
        |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(min(sz) AS BIGINT) AS min_class,
        |  CAST(max(sz) AS BIGINT) AS max_class,
        |  CASE WHEN sum(sz) > 0 THEN
        |    round(CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(sz) AS DOUBLE), 9)
        |  END AS risk_share
        |FROM cls CROSS JOIN ks GROUP BY k ORDER BY k""".stripMargin,
    "q_quality_ldiv" ->
      """WITH qi AS (SELECT c_nationkey AS nat,
        |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS balband,
        |  c_mktsegment AS seg
        |  FROM customer),
        |cls AS (SELECT nat, balband, CAST(count(*) AS BIGINT) AS sz,
        |          CAST(count(DISTINCT seg) AS BIGINT) AS ldiv
        |        FROM qi GROUP BY 1, 2),
        |ls AS (SELECT l FROM (VALUES (2), (3)) v(l))
        |SELECT l, CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN ldiv < l THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below,
        |  CAST(sum(CASE WHEN ldiv < l THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_exposed,
        |  CAST(sum(sz) AS BIGINT) AS n_rows,
        |  CAST(min(ldiv) AS BIGINT) AS min_ldiv,
        |  CASE WHEN sum(sz) > 0 THEN
        |    round(CAST(sum(CASE WHEN ldiv < l THEN sz ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(sz) AS DOUBLE), 9)
        |  END AS exposed_share
        |FROM cls CROSS JOIN ls GROUP BY l ORDER BY l""".stripMargin,
    // len(string_split) mirrors size(split); md5 hex strings match;
    // the dominant-language pick is the same (count DESC, lang)
    // row_number in both engines.
    "q_quality_datacard" ->
      """WITH dd AS (SELECT source, lang, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(CASE WHEN ntok < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_short,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_uniq
        |  FROM dd GROUP BY source),
        |lt AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nl,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY count(*) DESC, lang) AS rk
        |  FROM dd GROUP BY source, lang)
        |SELECT b.source, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS avg_tokens,
        |  n_langs, lt.lang AS top_lang,
        |  round(CAST(nl AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
        |    AS top_lang_share,
        |  round(CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
        |    AS short_share,
        |  round(1.0 - CAST(n_uniq AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
        |    AS exact_dup_share
        |FROM base b JOIN lt ON b.source = lt.source AND lt.rk = 1
        |ORDER BY b.source""".stripMargin,
  )
}
