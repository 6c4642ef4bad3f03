package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Round-7 fifteenth wave: duplicated-SPAN extraction (the maximal-run
  * upgrade of q_dedup_ngram's gram-level hits — the ExactSubstr shape
  * from the train-data-dedup literature, at word-shingle granularity),
  * Adamic–Adar link scoring over the co-purchase graph (the classic
  * common-neighbor predictor), and SAX symbolization of the hourly
  * event series (the time-series-to-string bridge that makes motif
  * search a text problem).
  *
  * Scale notes:
  *  - Substring spans: gram generation is map-only (one transform over
  *    the split array — no per-gram window), the cross-doc duplicate
  *    filter is one hash-shuffle on the gram md5, the survivors
  *    back-join LEFT SEMI (shuffle_hash, no broadcast assumption), and
  *    the maximal-run merge is the gaps-and-islands window per doc.
  *    Nothing touches raw text twice; candidate volume is bounded by
  *    the duplicate rate, not the corpus.
  *  - Adamic–Adar runs on the support-≥2 co-purchase graph (the
  *    q_graph_triangles discipline: one-off co-occurrences are noise
  *    and make wedge enumeration quadratic in hub degree). Wedges are
  *    closed against the edge set with a LEFT SEMI join; each
  *    common-neighbor term rounds to 9 dp and sums as DECIMAL — the
  *    order-free double discipline.
  *  - SAX: the stream collapses to a (type, hour) exact count table in
  *    one shuffle; z-scores come from exact decimal moments via one
  *    broadcast of k≈5 stat rows; the per-day word assembles from an
  *    array_sort (not collect order). Everything after the first
  *    aggregate is bounded by hours × types, not events. */
object Analytics15 {

  private val K = 8 // words per shingle

  /** Maximal cross-document duplicated spans: positions whose 8-gram
    * also appears in ANOTHER document, merged into maximal runs
    * (doc_id, span_start, span_end, n_words). */
  private def qDedupSubstring(s: SparkSession, d: String): DataFrame = {
    val grams = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= K)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $K), " +
          s"i -> struct(i AS pos, array_join(slice(ws, i + 1, $K), ' ') AS gram))"))
        .as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"),
        md5(col("e.gram")).as("h"))
    val dup = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("h"))
    val hits = grams.join(dup.hint("shuffle_hash"), Seq("h"), "leftsemi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits.withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        max(col("pos")).as("maxpos"), count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"),
        (col("maxpos") + K - 1).as("span_end"),
        (col("maxpos") + K - col("span_start")).as("n_words"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** Adamic–Adar link score for every support-≥2 co-purchase edge with
    * at least one common neighbor: AA(u,v) = Σ_w 1/ln(deg(w)). */
  private def qGraphAdamicAdar(s: SparkSession, d: String): DataFrame = {
    val e = coPairCounts(s, d).filter(col("cn") >= 2)
      .select(col("u"), col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    sym.select(col("u").as("w"), col("v").as("a"))
      .join(sym.select(col("u").as("w"), col("v").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
      .join(e.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"),
        "leftsemi")
      .join(deg.select(col("u").as("w"), col("deg")).hint("shuffle_hash"),
        Seq("w"))
      // deg(w) ≥ 2 by construction (w neighbors both a and b), so
      // ln(deg) ≥ ln 2 and the term is finite
      .withColumn("term", expr(
        "CAST(ROUND(1.0 / ln(CAST(deg AS DOUBLE)), 9) AS DECIMAL(18,9))"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"), sum(col("term")).as("t"))
      .select(col("a").as("u"), col("b").as("v"), col("n_common"),
        round(dbl(col("t")), 6).as("adamic_adar"))
      .orderBy(col("u"), col("v"))
  }

  /** SAX symbolization: hourly event counts per type z-normalized
    * against the type's own mean/std, mapped to a 4-letter alphabet at
    * the N(0,1) quartile breakpoints (−0.6745, 0, 0.6745), assembled
    * into one word per (type, day) in hour order. */
  private def qTimeSax(s: SparkSession, d: String): DataFrame = {
    val hr = events(s, d)
      .select(col("event_type").as("et"), expr("us div 3600000000").as("h"))
      .groupBy(col("et"), col("h")).agg(count(lit(1)).as("c"))
    val stats = hr.groupBy(col("et"))
      .agg(count(lit(1)).as("n"), sum(dec(col("c"))).as("sc"),
        sum(dec(col("c")) * dec(col("c"))).as("ssc"))
    val z = hr.join(broadcast(stats), Seq("et"))
      .withColumn("mu", dbl(col("sc")) / dbl(col("n")))
      .withColumn("sg", sqrt((dbl(col("ssc")) -
        dbl(col("sc")) * dbl(col("sc")) / dbl(col("n"))) / dbl(col("n"))))
      .withColumn("zz", when(col("sg") === 0.0, lit(0.0))
        .otherwise((dbl(col("c")) - col("mu")) / col("sg")))
      .withColumn("sym",
        when(col("zz") < -0.6745, "a").when(col("zz") < 0.0, "b")
          .when(col("zz") < 0.6745, "c").otherwise("d"))
    z.groupBy(col("et"), expr("h div 24").as("day"))
      .agg(count(lit(1)).as("n_hours"),
        array_sort(collect_list(struct(col("h"), col("sym")))).as("hs"))
      .select(col("et").as("event_type"), col("day"), col("n_hours"),
        expr("array_join(transform(hs, x -> x.sym), '')").as("sax_word"))
      .orderBy(col("event_type"), col("day"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_dedup_substring" -> (qDedupSubstring _),
    "q_graph_adamicadar" -> (qGraphAdamicAdar _),
    "q_time_sax" -> (qTimeSax _),
  )

  val sql: Map[String, String] = Map(
    "q_dedup_substring" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |        md5(array_to_string(
        |          ws[CAST(i AS INT)+1 : CAST(i AS INT)+8], ' ')) AS h
        |      FROM (SELECT doc_id, ws, unnest(range(0, len(ws) - 7)) AS i
        |            FROM w WHERE len(ws) >= 8)),
        |dup AS (SELECT h FROM g GROUP BY h
        |        HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (SELECT doc_id, pos FROM g SEMI JOIN dup USING (h)),
        |runs AS (SELECT doc_id, pos,
        |           pos - ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                    ORDER BY pos) AS grp
        |         FROM hits)
        |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
        |  CAST(max(pos) + 7 AS INT) AS span_end,
        |  CAST(max(pos) + 8 - min(pos) AS INT) AS n_words
        |FROM runs GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "q_graph_adamicadar" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |wed AS (SELECT s1.v AS a, s2.v AS b, s1.u AS w
        |        FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v),
        |closed AS (SELECT wed.a, wed.b, wed.w FROM wed
        |           SEMI JOIN e ON wed.a = e.u AND wed.b = e.v),
        |terms AS (SELECT c.a, c.b,
        |            CAST(ROUND(1.0 / ln(CAST(deg.deg AS DOUBLE)), 9)
        |              AS DECIMAL(18,9)) AS term
        |          FROM closed c JOIN deg ON c.w = deg.u)
        |SELECT a AS u, b AS v, CAST(count(*) AS BIGINT) AS n_common,
        |  round(CAST(CAST(sum(term) AS DECIMAL(38,9)) AS DOUBLE), 6)
        |    AS adamic_adar
        |FROM terms GROUP BY a, b ORDER BY u, v""".stripMargin,
    "q_time_sax" ->
      """WITH hr AS (
        |  SELECT event_type AS et,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT et, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(c AS DECIMAL(18,4))) AS sc,
        |    sum(CAST(c AS DECIMAL(18,4)) * CAST(c AS DECIMAL(18,4))) AS ssc
        |  FROM hr GROUP BY et),
        |z AS (
        |  SELECT hr.et, hr.h, hr.c,
        |    CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    sqrt((CAST(ssc AS DOUBLE)
        |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
        |      / CAST(n AS DOUBLE)) AS sg
        |  FROM hr JOIN stats ON hr.et = stats.et),
        |sym AS (
        |  SELECT et, h,
        |    CASE WHEN zz < -0.6745 THEN 'a' WHEN zz < 0.0 THEN 'b'
        |         WHEN zz < 0.6745 THEN 'c' ELSE 'd' END AS sym
        |  FROM (SELECT et, h,
        |          CASE WHEN sg = 0.0 THEN 0.0
        |               ELSE (CAST(c AS DOUBLE) - mu) / sg END AS zz
        |        FROM z))
        |SELECT et AS event_type, h // 24 AS day,
        |  CAST(count(*) AS BIGINT) AS n_hours,
        |  string_agg(sym, '' ORDER BY h) AS sax_word
        |FROM sym GROUP BY et, h // 24
        |ORDER BY event_type, day""".stripMargin,
  )
}
