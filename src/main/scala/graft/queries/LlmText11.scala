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
  * Both follow the established multimodal contract: payload synthesis
  * is the clearly-marked deterministic stand-in for a corpus binary
  * column (the image/audio libs aren't in this container), while the
  * Spark-side plumbing — batched mapPartitions over binary, byte-level
  * decode via the lib-free codecs, bounded per-row state, only
  * (id, features) ever shuffling — is real and tested. Parallelism is
  * repartition-spread, never parquet-file-layout-bound (the r8
  * discipline). No SQL oracle (pixel/PCM decode is not
  * DuckDB-expressible) → structural ScalaTests pin the math. */
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
    t(s, d, "documents").select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long].mapPartitions(_.map { id =>
        val group = id / 5
        val variant = (id % 5).toInt
        // the q_mm_phash synthesis pattern: per-group frequency mix,
        // variants get one-pixel edits
        val img = ImageHeader.bmpPixels(32, 32, (x, y) => {
          val fx = (group % 97 + 1) * 0.11
          val fy = (group % 89 + 1) * 0.07
          (math.sin(fx * (x + 1)) * 55 + math.cos(fy * (y + 1)) * 55
            + 128).toInt +
            (if (variant != 0 && x == 3 + variant && y == 2 * variant) 40
             else 0)
        })
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

  /** 64-bit audio energy fingerprint over real PCM WAV bytes: emit a
    * per-document mono 16-bit WAV (group-keyed two-tone mix, variants
    * get a small amplitude edit), parse the RIFF chunk stream for the
    * format fields, window the samples (64 windows × 16 frames), and
    * take the circular energy-gradient sign bits — the dHash idea on
    * the energy envelope. Near-identical audio lands within a few
    * bits; unrelated mixes scatter. Only (id, meta, 8-byte sig)
    * shuffle. */
  private def qMmAudioFingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.AudioHeader
    t(s, d, "documents").select(col("doc_id"))
      .repartition(s.sessionState.conf.numShufflePartitions)
      .as[Long].mapPartitions(_.map { id =>
        val group = id / 5
        val variant = (id % 5).toInt
        val frames = 1024
        val bytes = AudioHeader.wav(1, 8000, 16, frames)
        // fill the (tail) data chunk with a deterministic two-tone mix
        val dataOff = bytes.length - frames * 2
        val f1 = (group % 13 + 1) * 0.015
        val f2 = (group % 7 + 1) * 0.041
        var i = 0
        while (i < frames) {
          var v = (math.sin(f1 * i) * 9000 + math.sin(f2 * i) * 5000).toInt
          if (variant != 0 && i % 256 == variant) v += 800 // tiny edit
          bytes(dataOff + 2 * i) = (v & 0xff).toByte
          bytes(dataOff + 2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val meta = AudioHeader.parse(bytes).get
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
