package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Structural gates for the round-8 multimodal ops (no SQL oracle —
  * pixel/PCM decode is not DuckDB-expressible): exact resize block
  * means against an independent in-test decode, and the audio
  * fingerprint's near-dup vs unrelated separation. */
class LlmText11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("payload table sources from a real binaryFile ingest: artifacts " +
      "exist on disk and table bytes equal the artifact file bytes") {
    import org.apache.spark.sql.functions.col
    val df = MmPayloads.payloads(spark, sf)
    assert(df.count() == 500)
    val base =
      s"/root/repo/target/qtmp/mm_ingest_${math.abs(sf.hashCode)}/fixtures"
    val img3 = java.nio.file.Paths.get(s"$base/img/3.bmp")
    val wav3 = java.nio.file.Paths.get(s"$base/wav/3.wav")
    assert(java.nio.file.Files.exists(img3) &&
      java.nio.file.Files.exists(wav3),
      "ingest artifacts missing from the fixture store")
    // ingest fidelity: the binary column is byte-identical to the
    // on-disk artifact the binaryFile scan read
    val row = df.filter(col("doc_id") === 3L).head
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("img"),
      java.nio.file.Files.readAllBytes(img3)), "img bytes != artifact")
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("wav"),
      java.nio.file.Files.readAllBytes(wav3)), "wav bytes != artifact")
    // and the artifact really is a BMP/WAV container, not raw pixels
    val hdr = java.nio.file.Files.readAllBytes(img3).take(2)
    assert(hdr.sameElements(Array[Byte]('B', 'M')), "not a BMP container")
    val riff = java.nio.file.Files.readAllBytes(wav3).take(4)
    assert(riff.sameElements("RIFF".getBytes), "not a RIFF container")
  }

  test("resize: 8x8 block means match an independent decode+mean, " +
      "and the run is deterministic") {
    import graft.functions.ImageHeader
    val rows = SparkEntry.queries("q_mm_resize")(spark, sf).collect()
    assert(rows.length >= 100)
    assert(rows.forall(r => r.getInt(1) == 32 && r.getInt(2) == 32 &&
      r.getInt(3) == 8 && r.getInt(4) == 8))
    // independent recomputation for a handful of ids
    rows.take(5).foreach { r =>
      val id = r.getLong(0)
      val group = id / 5
      val variant = (id % 5).toInt
      val img = ImageHeader.bmpPixels(32, 32, (x, y) => {
        val fx = (group % 97 + 1) * 0.11
        val fy = (group % 89 + 1) * 0.07
        (math.sin(fx * (x + 1)) * 55 + math.cos(fy * (y + 1)) * 55
          + 128).toInt +
          (if (variant != 0 && x == 3 + variant && y == 2 * variant) 40
           else 0)
      })
      val g = ImageHeader.bmpGray(img).get
      val expected = (for (by <- 0 until 8; bx <- 0 until 8) yield {
        val sum = (for (dy <- 0 until 4; dx <- 0 until 4)
          yield g(by * 4 + dy)(bx * 4 + dx).toLong).sum
        f"${(sum / 16L).toInt & 0xff}%02x"
      }).mkString
      assert(r.getString(6) == expected, s"doc $id resize mismatch")
    }
    val again = SparkEntry.queries("q_mm_resize")(spark, sf).collect()
    assert(rows.toSeq == again.toSeq, "resize not deterministic")
  }

  test("audio fingerprint: meta fields parse from real bytes, clone " +
      "variants sit within 4 bits, unrelated groups scatter") {
    val rows = SparkEntry.queries("q_mm_audio_fingerprint")(spark, sf)
      .collect()
    assert(rows.length >= 100)
    assert(rows.forall(r => r.getInt(1) == 8000 && r.getLong(2) == 1024L
      && r.getLong(3) == 128L), "WAV meta fields wrong")
    val sigs = rows.map(r => (r.getLong(0), r.getLong(4))).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // within-group: ids 5g..5g+4 share a base waveform
    val withinOk = (0L until 20L).forall { g =>
      val base = sigs(g * 5)
      (1 to 4).forall(v => ham(base, sigs(g * 5 + v)) <= 4)
    }
    assert(withinOk, "clone variants drifted past 4 bits")
    // cross-group: different tone mixes must separate on average
    val cross = (0L until 19L).map(g => ham(sigs(g * 5), sigs((g + 1) * 5)))
    assert(cross.sum.toDouble / cross.size > 8.0,
      s"unrelated groups too close: $cross")
  }
}
