package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 semi-structured wave: JSON payload profiling — the "what is
  * actually inside this props column" report every pipeline needs
  * before it can promote a JSON blob to typed columns (key inventory,
  * presence share, how much of each key parses numeric, numeric
  * range). The profiling complement of q_fn_json (extraction) and
  * q_fn_variant (parse-once reading).
  *
  * Scale notes: keys explode per row but the aggregate is keyed by the
  * JSON KEY — shuffle volume is bounded by the key vocabulary, with
  * map-side partial aggregation absorbing the per-row fan-out. The
  * rows total is a 1-row broadcast. try_cast (not cast) keeps ANSI
  * mode from throwing on non-numeric values — the profiling op must
  * never die on the data it exists to characterize; min/max are exact
  * comparisons (no summation, no rounding trap). */
object Analytics39 {

  private def qFnJsonProfile(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("props"))
    val tot = ev.agg(count(lit(1)).as("n_rows"))
    // from_json to map<string,string>, NOT get_json_object over a
    // string-concatenated '$.'+key path: a key containing JSONPath
    // metacharacters (dot, bracket, quote, '$') would make the path
    // lookup return NULL/wrong silently, and Spark's path dialect
    // differs from the oracle's (ADVICE r8). The map parse has no path
    // language at all — keys are opaque. Values are assumed scalar
    // (engine and oracle both render scalars as their JSON text;
    // nested values would render differently and are out of contract).
    val keyed = ev
      .select(explode(expr("from_json(props, 'map<string,string>')"))
        .as(Seq("k", "v")))
      .withColumn("num", expr("try_cast(v AS DOUBLE)"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_present"),
        sum(when(col("num").isNotNull, 1L).otherwise(0L)).as("n_numeric"),
        min(col("num")).as("min_num"), max(col("num")).as("max_num"))
    keyed.crossJoin(broadcast(tot))
      .select(col("k").as("key"), col("n_present"),
        round(dbl(col("n_present")) / dbl(col("n_rows")), 6).as("share"),
        col("n_numeric"), col("min_num"), col("max_num"))
      .orderBy(col("key"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_fn_json_profile" -> (qFnJsonProfile _),
  )

  val sql: Map[String, String] = Map(
    "q_fn_json_profile" ->
      """WITH ev AS (SELECT props FROM events),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM ev),
        |keyed AS (
        |  -- key-opaque like the engine side: the whole object becomes a
        |  -- MAP and its entries unnest — no '$.'||k path concat, so keys
        |  -- containing JSONPath metacharacters ('.', '"', '[', '$')
        |  -- extract their own values (ADVICE r9). json_valid mirrors
        |  -- Spark's behavior (from_json of an invalid blob is NULL → the
        |  -- explode drops the row); the transform would ERROR on it
        |  SELECT e.key AS k, e.value AS v
        |  FROM (SELECT unnest(map_entries(
        |          json_transform(props, '"MAP(VARCHAR, VARCHAR)"'))) AS e
        |        FROM ev WHERE json_valid(props)) z),
        |agg AS (
        |  SELECT k, CAST(count(*) AS BIGINT) AS n_present,
        |    CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
        |    min(TRY_CAST(v AS DOUBLE)) AS min_num,
        |    max(TRY_CAST(v AS DOUBLE)) AS max_num
        |  FROM keyed GROUP BY k)
        |SELECT k AS key, n_present,
        |  round(CAST(n_present AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS share,
        |  n_numeric, min_num, max_num
        |FROM agg, tot ORDER BY key""".stripMargin,
  )
}
