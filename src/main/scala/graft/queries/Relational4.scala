package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 join addition: FUZZY (Hamming-1) string self-join via
  * wildcard-neighborhood blocking — the entity-resolution/record-
  * linkage primitive ("these two names differ by one character") that
  * a naive formulation writes as an O(n²) levenshtein cross join.
  *
  * Blocking is exact-by-construction, the string sibling of the
  * simhash pigeonhole: every name generates one variant per position
  * with that character masked; two equal-length names at Hamming
  * distance EXACTLY 1 collide on the (position, masked) key of their
  * single differing position — and nowhere else once identical names
  * are deduped. Full recall with zero post-verification, candidate
  * volume = true match volume; only (position, masked-name) keys ever
  * shuffle. At 100 TB the same neighborhood trick covers edit
  * distance ≤ k with C(L,k) masks — the standard scalable fuzzy-join
  * construction. */
object Relational4 {

  /** All customer-name pairs at Hamming distance exactly 1, with the
    * differing position — deterministic, blocked, verification-free. */
  private def qJoinFuzzy(s: SparkSession, d: String): DataFrame = {
    val names = t(s, d, "customer").select(col("c_name").as("nm")).distinct()
    val masked = names.select(col("nm"), posexplode(expr(
      """transform(sequence(1, length(nm)), i ->
        |  concat(substring(nm, 1, i - 1), '_',
        |    substring(nm, i + 1, length(nm) - i)))""".stripMargin))
      .as(Seq("pos0", "mk")))
      .select(col("nm"), (col("pos0") + 1).as("pos"), col("mk"))
    masked.select(col("pos"), col("mk"), col("nm").as("name_a"))
      .join(masked.select(col("pos"), col("mk"), col("nm").as("name_b")),
        Seq("pos", "mk"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("pos").as("diff_pos"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_join_fuzzy" -> (qJoinFuzzy _),
  )

  val sql: Map[String, String] = Map(
    "q_join_fuzzy" ->
      """WITH names AS (SELECT DISTINCT c_name AS nm FROM customer),
        |masked AS (
        |  SELECT nm, i AS pos,
        |    substr(nm, 1, CAST(i AS INT) - 1) || '_'
        |      || substr(nm, CAST(i AS INT) + 1,
        |           length(nm) - CAST(i AS INT)) AS mk
        |  FROM (SELECT nm, unnest(generate_series(1, length(nm))) AS i
        |        FROM names) z)
        |SELECT a.nm AS name_a, b.nm AS name_b,
        |  CAST(a.pos AS INT) AS diff_pos
        |FROM masked a JOIN masked b
        |  ON a.pos = b.pos AND a.mk = b.mk AND a.nm < b.nm
        |ORDER BY name_a, name_b""".stripMargin,
  )
}
