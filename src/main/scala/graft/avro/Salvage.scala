package graft.avro

import java.io.EOFException

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Per-file validation + block salvage over Avro container files — the
  * engine-native reimplementation of what the reference delegates to
  * `avro-tools cat` / `avro-tools repair` subprocesses
  * (`/root/reference/src/services/repair-avro.ts:131,149`; semantics
  * B1-B12 in SURVEY.md §2.B).
  *
  * Salvage core (B9): on a decode failure, scan forward for the file's
  * 16-byte sync marker (`DataFileReader.sync`) and resume at the next
  * block; records decoded cleanly before and after the corrupt region are
  * kept (avro-tools' default recovery mode `all`, B10). A sync-marker
  * byte sequence that happens to occur *inside* a record payload
  * (FIXTURES.md `sync_collision`) just triggers another decode failure and
  * another resync — candidate blocks are only accepted if they decode
  * cleanly (SURVEY §7.3 risk 1).
  */
object Salvage {

  /** Validation result for one file (reference A10: sampled decode). */
  final case class ValidateResult(valid: Boolean, recordsScanned: Long,
      error: String)

  /** Salvage accounting (B12 — the counts avro-tools prints and the
    * reference discards; we keep them as data). */
  final case class SalvageResult(status: String,
      recordsRecovered: Long, resyncs: Long, error: String)

  /** Sampled decode scan. Defaults mirror the reference's
    * `application.yml:6-7` (limit 1,000,000, samplerate 1%). Sampling is
    * at *block* granularity: unsampled blocks are skipped raw (their
    * count/size varints and sync markers are still structurally checked,
    * but datum-internal corruption inside them can be missed — the same
    * trade-off as the reference's 1% `cat` scan, SURVEY §3.2, with the
    * work actually reduced instead of decoding everything). */
  def validate(fs: FileSystem, path: Path, limit: Long = 1000000L,
      samplerate: Double = 0.01, seed: Long = 42L): ValidateResult = {
    var scanned = 0L
    try {
      val in = new HadoopSeekableInput(fs, path)
      try {
        val reader = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        try {
          val headerEnd = reader.previousSync() // position after header sync
          val rng = new java.util.Random(
            seed ^ scala.util.hashing.MurmurHash3.stringHash(path.toString).toLong)
          var more = reader.hasNext
          while (more && scanned < limit) {
            if (samplerate >= 1.0 || rng.nextDouble() < samplerate) {
              // decode every record of the sampled block
              var inBlock = reader.getBlockCount
              while (inBlock > 0 && scanned < limit) {
                reader.next()
                scanned += 1
                inBlock -= 1
              }
            } else {
              // skip the block without decoding; structure (varints +
              // sync) is still verified by the block iteration itself
              scanned += reader.getBlockCount
              reader.nextBlock()
            }
            more = reader.hasNext
          }
          // DataFileStream.hasNext swallows a mid-block EOF: a truncated
          // tail reads as a clean end (and re-calling hasNext after that
          // EOF even flips back to true). A well-formed container always
          // ends with its sync marker, so check it (unless we hit limit).
          if (!more && !trailingMarkerIntact(fs, path, headerEnd))
            ValidateResult(valid = false, scanned, "truncated tail (missing trailing sync marker)")
          else ValidateResult(valid = true, scanned, null)
        } finally reader.close()
      } finally in.close()
    } catch {
      case e: Exception =>
        ValidateResult(valid = false, scanned, s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** True iff the file's last 16 bytes equal its sync marker (read from
    * the 16 bytes preceding `headerEnd`, the first post-header position). */
  private def trailingMarkerIntact(fs: FileSystem, path: Path,
      headerEnd: Long): Boolean = {
    val len = fs.getFileStatus(path).getLen
    if (len < headerEnd || headerEnd < 16) return false
    if (len == headerEnd) return true // empty container: ends at header sync
    val in = fs.open(path)
    try {
      val marker = new Array[Byte](16)
      in.readFully(headerEnd - 16, marker)
      val tail = new Array[Byte](16)
      in.readFully(len - 16, tail)
      java.util.Arrays.equals(marker, tail)
    } finally in.close()
  }

  /** Block salvage. Streams recovered records straight into the output
    * writer (no in-memory accumulation — a multi-GB container must not
    * materialize on one executor's heap); `out=None` only counts
    * (report mode).
    *
    * `mode` mirrors avro-tools repair's `-o` recovery options (reference
    * B10, `repair-avro.ts:149`): `all` keeps every cleanly-decoded
    * record, `prior` keeps only records decoded before the first
    * corruption, `after` only records decoded after it. The scan always
    * runs the whole file so resync accounting is identical across
    * modes; only the writes are gated. */
  def salvage(fs: FileSystem, path: Path, out: Option[Path],
      codecOverride: Option[String] = None,
      mode: String = "all"): SalvageResult = {
    require(Set("all", "prior", "after")(mode),
      s"recovery mode must be all|prior|after, got $mode")
    val header = try {
      val in = new HadoopSeekableInput(fs, path)
      try {
        val r = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        val h = (r.getSchema, Option(r.getMetaString("avro.codec")).getOrElse("null"))
        r.close(); Some(h)
      } finally in.close()
    } catch {
      case e: Exception =>
        return SalvageResult("unrepairable", 0L, 0L,
          s"header: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    val (schema, codec) = header.get

    val in = new HadoopSeekableInput(fs, path)
    try {
      val reader = new DataFileReader[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      val writer = out.map { o =>
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(AvroWrite.codecFactory(codecOverride.getOrElse(codec)))
        w.create(schema, fs.create(o, true))
        w
      }
      val fileLen = fs.getFileStatus(path).getLen
      var recovered = 0L
      var resyncs = 0L
      var exhausted = false
      var corrupted = false // true once the first decode failure is seen
      def keep: Boolean = mode match {
        case "prior" => !corrupted
        case "after" => corrupted
        case _ => true
      }
      val headerEnd = reader.previousSync()
      // NB: reader.tell() reflects the buffered input's read-ahead (up to
      // ~8 KiB past the current block) — resuming from tell() would skip
      // good blocks. previousSync() is the corrupt block's start; the scan
      // from start+1 lands on that block's own trailing marker, so only
      // the bad block is dropped.
      var lastSync = headerEnd
      try {
        while (!exhausted) {
          try {
            if (reader.hasNext) {
              val rec = reader.next()
              if (keep) {
                writer.foreach(_.append(rec))
                recovered += 1
              }
            } else exhausted = true
          } catch {
            case _: EOFException => exhausted = true
            case _: Exception =>
              resyncs += 1
              corrupted = true
              val from = math.max(reader.previousSync(), lastSync) + 1
              if (from >= fileLen) exhausted = true
              else try {
                reader.sync(from)
                val advanced = reader.previousSync()
                if (advanced < from) exhausted = true // no marker ahead
                else lastSync = advanced
              } catch { case _: Exception => exhausted = true }
          }
        }
      } finally {
        try reader.close() finally writer.foreach(_.close())
      }

      // A truncated tail is also corruption even though the block loop
      // ends silently (same EOF-swallowing as in validate).
      if (!trailingMarkerIntact(fs, path, headerEnd)) resyncs += 1
      val status = if (resyncs == 0) "valid" else "repaired"
      SalvageResult(status, recovered, resyncs, null)
    } catch {
      case e: Exception =>
        SalvageResult("unrepairable", 0L, 0L,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally in.close()
  }
}

/** Hadoop FSDataInputStream as an avro SeekableInput — keeps every path
  * behind the FileSystem API (file:// in tests, s3a:// in production;
  * SURVEY §7.3 risk 3). */
class HadoopSeekableInput(fs: FileSystem, path: Path) extends SeekableInput {
  private val status = fs.getFileStatus(path)
  private val in = fs.open(path)
  override def seek(p: Long): Unit = in.seek(p)
  override def tell(): Long = in.getPos
  override def length(): Long = status.getLen
  override def read(b: Array[Byte], off: Int, len: Int): Int = in.read(b, off, len)
  def close(): Unit = in.close()
}
