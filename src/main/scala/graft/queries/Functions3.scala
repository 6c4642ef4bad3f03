package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-10 scalar-function wave: Unicode text hygiene via the native
  * `unicode_norm` expression (functions/UnicodeNorm.scala) — the
  * normalization pass a multilingual corpus runs before any
  * hash-keyed operation (exact dedup, shingling, fingerprinting), since
  * decomposed accents and compatibility codepoints make visually
  * identical documents hash apart.
  *
  * Scale notes: one narrow projection pass, no shuffle until the final
  * presentation sort; `unicode_norm` resolves its form at plan time and
  * generates a static call inside whole-stage codegen whose fast path
  * (already-normalized input, the overwhelmingly common case) returns
  * the input buffer without allocating. */
object Functions3 {

  /** Per-document normalization report over a deterministic "dirty"
    * prefix (decomposed e+combining-acute, U+212B ANGSTROM SIGN, a BEL
    * control and a zero-width space) prepended to the corpus text:
    * raw vs NFC vs control/format-stripped lengths, a changed flag,
    * and the hash of the cleaned text — the before/after ledger of a
    * corpus-hygiene pass. The NFC output is bit-compared against
    * DuckDB's utf8proc via md5. */
  private def qFnUnicode(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // "Cafe"+COMBINING ACUTE, ANGSTROM SIGN, BEL, ZERO WIDTH SPACE
    val prefix = "Cafe\u0301 \u212B \u0007\u200B"
    t(s, d, "documents")
      .select(col("doc_id"),
        concat(lit(prefix), substring(col("text"), 1, 48)).as("s0"))
      .select(col("doc_id"), length(col("s0")).as("l_raw"),
        expr("unicode_norm(s0, 'NFC')").as("n"))
      .select(col("doc_id"), col("l_raw"), length(col("n")).as("l_nfc"),
        regexp_replace(col("n"), "[\\p{Cc}\\p{Cf}]", "").as("cl"))
      .select(col("doc_id"), col("l_raw"), col("l_nfc"),
        length(col("cl")).as("l_clean"),
        when(col("l_raw") =!= col("l_nfc"), 1).otherwise(0).as("changed"),
        md5(col("cl")).as("h"))
      .orderBy(col("doc_id"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_fn_unicode" -> (qFnUnicode _),
  )

  val sql: Map[String, String] = Map(
    // chr() concatenation builds the identical dirty prefix without
    // non-ASCII source bytes; nfc_normalize is utf8proc's UAX #15 NFC,
    // bit-identical to java.text.Normalizer's; both regexp engines
    // (RE2, java.util.regex) strip the same \p{Cc}/\p{Cf} classes.
    "q_fn_unicode" ->
      """WITH b AS (SELECT doc_id,
        |  'Cafe' || chr(769) || ' ' || chr(8491) || ' ' || chr(7)
        |    || chr(8203) || substr(text, 1, 48) AS s0
        |  FROM documents),
        |n AS (SELECT doc_id, CAST(length(s0) AS INT) AS l_raw,
        |        nfc_normalize(s0) AS n FROM b),
        |c AS (SELECT doc_id, l_raw, CAST(length(n) AS INT) AS l_nfc,
        |        regexp_replace(n, '[\p{Cc}\p{Cf}]', '', 'g') AS cl
        |      FROM n)
        |SELECT doc_id, l_raw, l_nfc, CAST(length(cl) AS INT) AS l_clean,
        |  CASE WHEN l_raw <> l_nfc THEN 1 ELSE 0 END AS changed,
        |  md5(cl) AS h
        |FROM c ORDER BY doc_id""".stripMargin,
  )
}
