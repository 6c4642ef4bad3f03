package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Scalar-function surface (SURVEY.md §2.C q_fn_*): string, date, math,
  * conditional, array higher-order, map, JSON — all codegen'd built-ins,
  * no UDFs. Engine-portability notes live next to each oracle. */
object Functions {

  private def qFnString(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(col("p_partkey"),
      substring(col("p_name"), 1, 5).as("s_sub"),
      upper(col("p_brand")).as("s_up"),
      lower(col("p_type")).as("s_low"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("s_trim"),
      concat(col("p_brand"), lit("_"), col("p_type")).as("s_cat"),
      lpad(col("p_brand"), 12, "*").as("s_lpad"),
      regexp_replace(col("p_name"), "widget", "gadget").as("s_repl"),
      length(col("p_name")).cast("int").as("n_len"),
      regexp_extract(col("p_name"), "([a-z]+)$", 1).as("s_re"),
      col("p_name").like("%bolt%").as("is_bolt"),
      size(split(col("p_name"), " ")).cast("int").as("n_words"))
      .orderBy("p_partkey")

  private def qFnDate(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dom"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      datediff(col("o_orderdate").cast("date"),
        lit(java.sql.Date.valueOf("1995-01-01"))).as("days_since"),
      date_add(col("o_orderdate").cast("date"), 30).as("due"),
      weekday(col("o_orderdate")).as("dow"))
      .orderBy("o_orderkey")

  private def qFnMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(col("p_partkey"),
      round(col("p_retailprice"), 2).as("r2"),
      floor(col("p_retailprice")).cast("bigint").as("fl"),
      ceil(col("p_retailprice")).cast("bigint").as("ce"),
      abs(col("p_size") - 25).as("ab"),
      round(pow(col("p_size"), 1.5), 6).as("p15"),
      round(log(col("p_retailprice")), 6).as("lnp"),
      round(sqrt(col("p_size")), 6).as("sq"),
      (col("p_partkey") % 7).as("m7"))
      .orderBy("p_partkey")

  private def qFnCond(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)"))
        .as("seg"),
      least(col("c_acctbal"), lit(5000.0)).as("capped"),
      greatest(col("c_nationkey"), lit(10)).as("gkey"),
      when(col("c_acctbal") < 0, "neg").when(col("c_acctbal") < 5000, "low")
        .otherwise("high").as("band"))
      .orderBy("c_custkey")

  /** Higher-order array functions over embeddings.embedding
    * (array<float>, dim 64). Folds are sequential left-to-right on both
    * engines, accumulating in double, so sums are bit-identical. */
  private def qFnArray(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").select(col("vec_id"), col("label"),
      size(col("embedding")).as("dim"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double")), 6).as("sum_e"),
      round(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0),
        (acc, x) => acc + x), 6).as("norm2"),
      size(filter(col("embedding"), x => x > 0.0f)).as("n_pos"),
      element_at(col("embedding"), 1).cast("double").as("e1"))
      .orderBy("vec_id")

  private def qFnMap(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("m", map(lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string")))
      .select(col("event_id"),
        element_at(col("m"), "type").as("mtype"),
        element_at(col("m"), "uid").as("muid"),
        array_join(map_keys(col("m")), ",").as("ks"))
      .orderBy("event_id")

  private def qFnJson(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("int").as("k_int"))
      .orderBy("event_id")

  /** VARIANT (Spark 4 semi-structured type): build a nested JSON doc
    * per row, parse to variant once, then extract typed values by path —
    * object fields, a nested object, an array index, and a missing path
    * via try_variant_get. The 100 TB point: variant stores the parsed
    * binary form, so N path extractions cost one parse, unlike N
    * get_json_object re-parses of the raw string. The DuckDB oracle
    * recomputes every output from the source columns, so a variant
    * path/typing drift hash-mismatches. (schema_of_variant introspection
    * is covered in LlmText3Spec — its DECIMAL(p,s) inference varies
    * per row, which is exactly what makes it a bad hash target.) */
  private def qFnVariant(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .withColumn("v", parse_json(to_json(struct(
        col("event_type").as("etype"), col("value").as("val"),
        struct(col("k")).as("nested"),
        array(col("k"), col("k") * 2).as("arr")))))
      .select(col("event_id"),
        variant_get(col("v"), "$.etype", "string").as("etype"),
        variant_get(col("v"), "$.val", "double").as("val"),
        variant_get(col("v"), "$.nested.k", "int").as("k"),
        variant_get(col("v"), "$.arr[1]", "bigint").as("k2"),
        try_variant_get(col("v"), "$.missing", "int").as("missing"))
      .orderBy("event_id")

  /** Data masking (`mask` built-in, codegen'd): the PII-redaction pass
    * applied before data leaves a trust boundary — default masking
    * (upper→X, lower→x, digit→n) and a custom-character variant that
    * keeps digits visible. The DuckDB oracle reproduces the same
    * character classes with regexp chains. */
  private def qFnMask(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"),
        mask(col("c_name")).as("masked"),
        mask(col("c_name"), lit("U"), lit("l"), lit("#"), lit("*"))
          .as("masked_custom"))
      .orderBy("c_custkey")

  val defs: Map[String, Relational.Q] = Map(
    "q_fn_mask" -> (qFnMask _),
    "q_fn_variant" -> (qFnVariant _),
    "q_fn_string" -> (qFnString _),
    "q_fn_date" -> (qFnDate _),
    "q_fn_math" -> (qFnMath _),
    "q_fn_cond" -> (qFnCond _),
    "q_fn_array" -> (qFnArray _),
    "q_fn_map" -> (qFnMap _),
    "q_fn_json" -> (qFnJson _),
  )

  val sql: Map[String, String] = Map(
    // DuckDB length()/len() return BIGINT where Spark returns INT → CAST.
    "q_fn_string" ->
      """SELECT p_partkey,
        |  substring(p_name, 1, 5) AS s_sub,
        |  upper(p_brand) AS s_up, lower(p_type) AS s_low,
        |  trim('  ' || p_name || '  ') AS s_trim,
        |  p_brand || '_' || p_type AS s_cat,
        |  lpad(p_brand, 12, '*') AS s_lpad,
        |  replace(p_name, 'widget', 'gadget') AS s_repl,
        |  CAST(length(p_name) AS INT) AS n_len,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS s_re,
        |  p_name LIKE '%bolt%' AS is_bolt,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    // DuckDB year()→BIGINT vs Spark INT; isodow is Mon=1 vs Spark
    // weekday Mon=0.
    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS due,
        |  CAST(isodow(o_orderdate) - 1 AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // DuckDB ln() is natural log (log() is log10); floor/ceil return
    // DOUBLE → CAST BIGINT.
    "q_fn_math" ->
      """SELECT p_partkey,
        |  round(p_retailprice, 2) AS r2,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  abs(p_size - 25) AS ab,
        |  round(pow(p_size, 1.5), 6) AS p15,
        |  round(ln(p_retailprice), 6) AS lnp,
        |  round(sqrt(p_size), 6) AS sq,
        |  p_partkey % 7 AS m7
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_fn_cond" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
        |  least(c_acctbal, 5000.0) AS capped,
        |  greatest(c_nationkey, 10) AS gkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS band
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // list_reduce folds left-to-right; 0.0 + x0 == x0 in IEEE, so seeding
    // with the first element matches Spark's aggregate(0.0, +).
    "q_fn_array" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |        (a, x) -> a + x), 6) AS sum_e,
        |  round(list_reduce(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x), 6) AS norm2,
        |  CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT) AS n_pos,
        |  CAST(embedding[1] AS DOUBLE) AS e1
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_fn_map" ->
      """SELECT event_id, event_type AS mtype, CAST(user_id AS VARCHAR) AS muid,
        |  'type,uid' AS ks
        |FROM events ORDER BY event_id""".stripMargin,
    "q_fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    // Spark mask(): upper→X lower→x digit→n, other kept; the custom
    // variant maps upper→U lower→l digit→# other→*. The custom oracle
    // masks the "other" class FIRST so an original '#' becomes '*'
    // while digits masked TO '#' afterwards stay '#'.
    "q_fn_mask" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS masked,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[^A-Za-z0-9]', '*', 'g'), '[A-Z]', 'U', 'g'),
        |    '[a-z]', 'l', 'g'), '[0-9]', '#', 'g') AS masked_custom
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // recomputed from source columns: the variant build/extract round
    // trip on the Spark side must land back on exactly these values
    "q_fn_variant" ->
      """SELECT event_id, event_type AS etype, value AS val,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CAST(2 * CAST(json_extract_string(props, '$.k') AS INT) AS BIGINT)
        |    AS k2,
        |  CAST(NULL AS INT) AS missing
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
