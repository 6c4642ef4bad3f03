package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Round-8 multimodal wave: raster RESIZE (the named driver
  * requirement the mm family still lacked — decode / feature-extract /
  * resize / frame-sample) and an audio energy fingerprint (the
  * feature-extract step over real PCM bytes, the audio sibling of
  * q_mm_phash's dHash).
  *
  * Both SCAN the ingest-once [[MmPayloads]] binary-column table —
  * since r11 sourced from REAL on-disk `.bmp`/`.wav` artifacts through
  * `format("binaryFile")`, so the whole path is the genuine production
  * shape: file store → binary ingest → `binary` column → byte-level
  * decode via the lib-free codecs → bounded per-row state → only
  * (id, features) ever shuffling. Parallelism is repartition-spread,
  * never parquet-file-layout-bound (the r8 discipline). No SQL oracle
  * (pixel/PCM decode is not DuckDB-expressible) → structural
  * ScalaTests pin the math. */
object LlmText11 {

  /** Block-mean resize of each document's 32×32 BMP raster to 8×8:
    * decode real BMP bytes (bfOffBits, bottom-up rows, stride), mean
    * each 4×4 block in exact integer math (sum div 16), and report the
    * resized raster as a 64-hex-byte fingerprint plus its exact mean.
    * The resize every vision pipeline runs before feature extraction;
    * at 100 TB only (id, 64 bytes) leave the decode stage. */
  private def qMmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.ImageHeader
    MmPayloads.payloads(s, d).select(col("doc_id"), col("img"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[(Long, Array[Byte])].mapPartitions(_.map { case (id, img) =>
        val g = ImageHeader.bmpGray(img).getOrElse(Array(Array(0)))
        val h = g.length
        val w = if (h > 0) g(0).length else 0
        val out = new Array[Int](64)
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            var sum = 0L
            var dy = 0
            while (dy < 4) {
              var dx = 0
              while (dx < 4) {
                sum += g((by * 4 + dy) min (h - 1))((bx * 4 + dx) min (w - 1))
                dx += 1
              }
              dy += 1
            }
            out(by * 8 + bx) = (sum / 16L).toInt // exact integer block mean
            bx += 1
          }
          by += 1
        }
        val sig = out.map(v => f"${v & 0xff}%02x").mkString
        val mean = out.map(_.toLong).sum / 64L
        (id, w, h, 8, 8, mean, sig)
      }).toDF("doc_id", "w_in", "h_in", "w_out", "h_out",
        "mean_gray", "resized_hex")
      .orderBy("doc_id")
  }

  /** 64-bit audio energy fingerprint over real PCM WAV bytes scanned
    * from the payload table: parse the RIFF chunk stream for the
    * format fields, window the samples (64 windows × 16 frames), and
    * take the circular energy-gradient sign bits — the dHash idea on
    * the energy envelope. Near-identical audio lands within a few
    * bits; unrelated mixes scatter. Only (id, meta, 8-byte sig)
    * shuffle. */
  private def qMmAudioFingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.AudioHeader
    MmPayloads.payloads(s, d).select(col("doc_id"), col("wav"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[(Long, Array[Byte])].mapPartitions(_.map { case (id, bytes) =>
        val meta = AudioHeader.parse(bytes).get
        // this table's WAVs carry the data chunk last (MmPayloads
        // layout): sample bytes are the declared-frame-count tail
        val dataOff = bytes.length - meta.nFrames.toInt * 2
        // 64-window mean-absolute energy envelope from the REAL bytes
        val energy = new Array[Long](64)
        var w = 0
        while (w < 64) {
          var sum = 0L
          var j = 0
          while (j < 16) {
            val o = dataOff + 2 * (w * 16 + j)
            val sample = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
            sum += math.abs(sample.toLong)
            j += 1
          }
          energy(w) = sum
          w += 1
        }
        var sig = 0L
        var k = 0
        while (k < 64) {
          if (energy(k) > energy((k + 1) % 64)) sig |= (1L << k)
          k += 1
        }
        (id, meta.sampleRate, meta.nFrames, meta.durationMs, sig,
          energy.sum)
      }).toDF("doc_id", "sample_rate", "n_frames", "duration_ms",
        "sig", "total_energy")
      .orderBy("doc_id")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_mm_resize" -> (qMmResize _),
    "q_mm_audio_fingerprint" -> (qMmAudioFingerprint _),
  )

  // pixel/PCM decode is not DuckDB-expressible → no SQL oracles;
  // LlmText11Spec pins the resize block means and the fingerprint's
  // near-dup/separation structure.
  val sql: Map[String, String] = Map.empty
}
