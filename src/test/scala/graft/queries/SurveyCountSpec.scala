package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Mechanical guard against SURVEY.md header drift (VERDICT r11 item 2):
  * the `<!-- COUNTS: declared=N oracled=M -->` marker must equal the
  * as-built `SparkEntry.queries.size` / `SparkEntry.oracleSql.size`.
  * Three rounds of manual sync re-drifted three times; this test makes
  * the drift a red build instead of a judge finding. */
class SurveyCountSpec extends AnyFunSuite {

  private val CountsRe =
    """<!-- COUNTS: declared=(\d+) oracled=(\d+) -->""".r

  test("SURVEY.md COUNTS marker matches the declared query surface") {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8) // lossy decode; marker is ASCII
    val marker = text.linesIterator.collectFirst {
      case CountsRe(d, o) => (d.toInt, o.toInt)
    }
    assert(marker.isDefined,
      "SURVEY.md must contain a '<!-- COUNTS: declared=N oracled=M -->' line")
    val (declared, oracled) = marker.get
    assert(declared == SparkEntry.queries.size,
      s"SURVEY.md says declared=$declared but SparkEntry.queries has " +
        s"${SparkEntry.queries.size} ids — update the COUNTS marker in the " +
        "same commit as the wave that changed the surface")
    assert(oracled == SparkEntry.oracleSql.size,
      s"SURVEY.md says oracled=$oracled but SparkEntry.oracleSql has " +
        s"${SparkEntry.oracleSql.size} ids — update the COUNTS marker")
  }

  /** ADVICE r14: the q_embed_drift SURVEY row was accidentally renamed to
    * q_embed_drift_label, leaving a duplicate row and an undocumented live
    * id — and the counts-only check passed. This test makes the SURVEY §2
    * table's id SET (first table cell, grouped rows split on '/') equal
    * `SparkEntry.queries.keySet`: no duplicates, no orphans, no
    * undocumented ids. */
  test("SURVEY.md table ids match SparkEntry.queries exactly") {
    val rowId = """^\|\s*(q_[a-z0-9_/ ]+?)\s*\|""".r
    val lines = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    val tableIds = lines.flatMap { l =>
      rowId.findFirstMatchIn(l).toSeq.flatMap(
        _.group(1).split('/').map(_.trim).filter(_.nonEmpty))
    }
    val dupes = tableIds.groupBy(identity).collect {
      case (id, hits) if hits.size > 1 => s"$id×${hits.size}"
    }
    assert(dupes.isEmpty,
      s"SURVEY.md documents these ids more than once: ${dupes.mkString(", ")}")
    val documented = tableIds.toSet
    val undocumented = SparkEntry.queries.keySet -- documented
    val orphaned = documented -- SparkEntry.queries.keySet
    assert(undocumented.isEmpty,
      s"live query ids with no SURVEY §2 row: ${undocumented.toSeq.sorted}")
    assert(orphaned.isEmpty,
      s"SURVEY §2 rows naming ids that no longer exist: ${orphaned.toSeq.sorted}")
  }

  test("every oracle id is a declared query id") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql ids with no queries entry: $orphans")
  }

  /** The r12 drift moved from the (guarded) marker into the unguarded
    * prose. Counts may now appear ONLY in the marker: any count-shaped
    * literal ("N declared ...", "M DuckDB-oracled", "M with DuckDB",
    * "declared=N"/"oracled=M" outside the marker line) in SURVEY.md or
    * README.md prose is a red build — point prose at the marker
    * instead of repeating numbers. */
  test("no count-shaped literals in SURVEY.md / README.md prose") {
    val proseCount =
      """(?i)\b\d+\s+(declared|DuckDB[- ]oracled|with\s+DuckDB)\b""".r
    val kvCount = """\b(declared|oracled)=\d+""".r
    for (f <- Seq("SURVEY.md", "README.md")) {
      val lines = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
      val bad = lines.zipWithIndex.filter { case (l, _) =>
        !CountsRe.pattern.matcher(l.trim).matches() &&
          (proseCount.findFirstIn(l).isDefined ||
            kvCount.findFirstIn(l).isDefined)
      }
      assert(bad.isEmpty, s"$f repeats counts in prose (only the COUNTS " +
        s"marker may carry them): " +
        bad.map { case (l, i) => s"line ${i + 1}: $l" }.mkString("; "))
    }
  }
}
