package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Ingest-once multimodal payload table (round 9, closing the r8
  * "synthesis inside the operator" caveat): one parquet table per data
  * dir with REAL container bytes in opaque `binary` columns —
  *
  *   (doc_id, img: binary [32×32 BMP], wav: binary [PCM WAV])
  *
  * written ONCE (the coPairCounts materialization pattern) and SCANNED
  * by the multimodal operators, which therefore exercise the exact
  * production shape: read binary column → byte-level decode →
  * (id, small features) out. The payload CONTENT is still the
  * clearly-marked deterministic stand-in for a real corpus (the
  * image/audio libs aren't in this container — synthesis is the ingest
  * step's data source, not part of any operator), group-keyed so ids
  * in the same id/5 group are near-duplicates and variants differ by
  * one-pixel / tiny-amplitude edits. */
object MmPayloads {

  /** Deterministic 32×32 BMP for a doc id (q_mm_phash synthesis
    * pattern: per-group frequency mix; variants get one-pixel edits). */
  private[queries] def bmpFor(id: Long): Array[Byte] = {
    import graft.functions.ImageHeader
    val group = id / 5
    val variant = (id % 5).toInt
    ImageHeader.bmpPixels(32, 32, (x, y) => {
      val fx = (group % 97 + 1) * 0.11
      val fy = (group % 89 + 1) * 0.07
      (math.sin(fx * (x + 1)) * 55 + math.cos(fy * (y + 1)) * 55
        + 128).toInt +
        (if (variant != 0 && x == 3 + variant && y == 2 * variant) 40
         else 0)
    })
  }

  /** Deterministic mono 16-bit 8kHz WAV for a doc id (group-keyed
    * two-tone mix; variants get a small amplitude edit). */
  private[queries] def wavFor(id: Long): Array[Byte] = {
    import graft.functions.AudioHeader
    val group = id / 5
    val variant = (id % 5).toInt
    val frames = 1024
    val bytes = AudioHeader.wav(1, 8000, 16, frames)
    val dataOff = bytes.length - frames * 2
    val f1 = (group % 13 + 1) * 0.015
    val f2 = (group % 7 + 1) * 0.041
    var i = 0
    while (i < frames) {
      var v = (math.sin(f1 * i) * 9000 + math.sin(f2 * i) * 5000).toInt
      if (variant != 0 && i % 256 == variant) v += 800
      bytes(dataOff + 2 * i) = (v & 0xff).toByte
      bytes(dataOff + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    bytes
  }

  /** The materialized payload table for a data dir: written once
    * (distributed — payload bytes are produced inside executors and go
    * straight to parquet, never through the driver), then scanned by
    * every multimodal consumer. */
  def payloads(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = s"/root/repo/target/qtmp/mm_payloads_${math.abs(dir.hashCode)}"
    if (!pathExists(s"$p/_SUCCESS")) {
      t(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .as[Long]
        .mapPartitions(_.map(id => (id, bmpFor(id), wavFor(id))))
        .toDF("doc_id", "img", "wav")
        .write.mode("overwrite").parquet(p)
    }
    s.read.parquet(p)
  }
}
