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
  /** Header-corruption salvage (opt-in via the pipeline's `borrowSchema`):
    * when THIS file's header is unreadable (the taxonomy's `bad_header` /
    * `bad_schema` classes — terminal for avro-tools and the reference
    * alike, `repair-avro.ts:63-64`), reconstruct a header from a sibling
    * container's schema+codec and re-run the normal block-salvage loop.
    *
    * Two structural facts make this sound without guesswork:
    *  - a container's random 16-byte sync marker is repeated after EVERY
    *    block and is the last 16 bytes of any cleanly-closed file — so a
    *    corrupt-header/intact-tail file still reveals its own marker;
    *  - blocks begin immediately after a marker occurrence, so decode can
    *    resume at the FIRST marker found in the file (the header's own
    *    sync when it survived, else the first block boundary). A chance
    *    payload collision just fails decode and resyncs forward, exactly
    *    as in [[salvage]].
    *
    * The donor schema is an assumption, not knowledge: a wrong donor
    * (different generation/codec) makes block decode fail everywhere and
    * the result degrades to 0-recovered `unrepairable` — never silently
    * wrong output UNLESS the donor schema is decode-compatible but
    * semantically different, which same-directory donor selection (the
    * pipeline picks siblings of the same partition) makes unlikely; the
    * report row carries the donor path for audit. */
  def salvageBorrowed(fs: FileSystem, path: Path, donorSchema: Schema,
      donorCodec: String, out: Option[Path],
      mode: String = "all"): SalvageResult = {
    val len = try fs.getFileStatus(path).getLen catch {
      case e: Exception => return SalvageResult("unrepairable", 0L, 0L,
        s"stat: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    // magic(4) + shortest metadata + sync(16) already exceeds this; a
    // shorter file cannot carry the header sync AND a block boundary
    if (len < 48) return SalvageResult("unrepairable", 0L, 0L,
      "borrow: too short to carry a recoverable block")
    val marker = new Array[Byte](16)
    val tailIn = fs.open(path)
    try tailIn.readFully(len - 16, marker) finally tailIn.close()
    val firstSync = findFirstMarker(fs, path, len, marker)
    if (firstSync < 0L || firstSync + 16 >= len)
      return SalvageResult("unrepairable", 0L, 0L,
        "borrow: no block boundary before the trailing marker " +
          "(tail truncated too, or single corrupt region spans the file)")
    val synth = new Path(path.getParent,
      s".borrow-${path.getName}-${java.util.UUID.randomUUID()}")
    try {
      // donor header with THIS file's sync marker, then the original's
      // block region verbatim — the result is a container the standard
      // decode-or-resync loop already knows how to chew through
      val hdr = new java.io.ByteArrayOutputStream()
      val hw = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](donorSchema))
      hw.setCodec(AvroWrite.codecFactory(donorCodec))
      hw.create(donorSchema, hdr, marker)
      hw.close()
      val os = fs.create(synth, true)
      try {
        os.write(hdr.toByteArray)
        val in = fs.open(path)
        try {
          in.seek(firstSync + 16)
          val buf = new Array[Byte](1 << 20)
          var read = in.read(buf)
          while (read > 0) { os.write(buf, 0, read); read = in.read(buf) }
        } finally in.close()
      } finally os.close()
      val inner = salvage(fs, synth, out, Some(donorCodec), mode)
      if (inner.status == "unrepairable" || inner.recordsRecovered == 0L)
        SalvageResult("unrepairable", 0L, inner.resyncs,
          s"borrow: no block decoded under donor schema" +
            Option(inner.error).map(e => s" ($e)").getOrElse(""))
      // the header itself was the (first) corruption — always 'repaired'
      else SalvageResult("repaired_borrowed", inner.recordsRecovered,
        inner.resyncs, null)
    } catch {
      case e: Exception => SalvageResult("unrepairable", 0L, 0L,
        s"borrow: ${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally fs.delete(synth, false)
  }

  /** First byte offset of `marker` in the file (streamed 1 MiB windows
    * with a 15-byte carry so boundary-straddling matches are seen);
    * always ≤ len−16 since the trailing marker matches itself. */
  private def findFirstMarker(fs: FileSystem, path: Path, len: Long,
      marker: Array[Byte]): Long = {
    val chunk = 1 << 20
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](chunk + 15)
      var base = 0L
      while (base <= len - 16) {
        val toRead = math.min((chunk + 15).toLong, len - base).toInt
        in.readFully(base, buf, 0, toRead)
        var i = 0
        while (i <= toRead - 16) {
          var j = 0
          while (j < 16 && buf(i + j) == marker(j)) j += 1
          if (j == 16) return base + i
          i += 1
        }
        base += chunk
      }
      -1L
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
