package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileWriter, CodecFactory}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

/** Deterministic Avro corruption fixtures (FIXTURES.md §B) — seeded data,
  * byte surgery positioned from the file's *actual* sync-marker index
  * (the last 16 bytes of a well-formed container are its sync marker;
  * every block ends with it).
  *
  * Mirrors the corruption classes the reference's repair loop faces
  * (`/root/reference/src/services/repair-avro.ts:52-71`). */
object AvroFixtures {

  val metricEventSchema: Schema = new Schema.Parser().parse(
    """{"type": "record", "name": "metric_event", "namespace": "graft.fixtures",
      | "fields": [
      |   {"name": "id",    "type": "long"},
      |   {"name": "ts",    "type": {"type": "long", "logicalType": "timestamp-millis"}},
      |   {"name": "name",  "type": "string"},
      |   {"name": "value", "type": "double"},
      |   {"name": "tags",  "type": {"type": "map", "values": "string"}},
      |   {"name": "note",  "type": ["null", "string"], "default": null}
      | ]}""".stripMargin)

  def record(i: Long, rng: java.util.Random): GenericRecord = {
    val r = new GenericData.Record(metricEventSchema)
    r.put("id", i)
    r.put("ts", 1704067200000L + i * 1000L)
    r.put("name", s"metric_${rng.nextInt(50)}")
    r.put("value", rng.nextInt(100000) / 100.0)
    r.put("tags", Map("host" -> s"h${rng.nextInt(8)}",
      "dc" -> s"dc${rng.nextInt(3)}").asJava)
    r.put("note", if (rng.nextInt(4) == 0) s"note_$i" else null)
    r
  }

  /** Serialize n seeded records with the given codec and a small sync
    * interval (≥10 blocks per file), optionally with a fixed sync marker. */
  def containerBytes(n: Int, codec: String, seed: Long = 42L,
      sync: Option[Array[Byte]] = None,
      recordFn: Option[(Long, java.util.Random) => GenericRecord] = None,
      schema: Schema = metricEventSchema): Array[Byte] = {
    val rng = new java.util.Random(seed)
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(AvroWrite.codecFactory(codec))
    w.setSyncInterval(2048)
    sync match {
      case Some(m) => w.create(schema, out, m)
      case None => w.create(schema, out)
    }
    val mk = recordFn.getOrElse((i: Long, r: java.util.Random) => record(i, r))
    (0L until n.toLong).foreach(i => w.append(mk(i, rng)))
    w.close()
    out.toByteArray
  }

  /** Positions of every sync-marker occurrence (header end + block ends). */
  def syncPositions(bytes: Array[Byte]): Seq[Int] = {
    val marker = bytes.takeRight(16)
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i <= bytes.length - 16) {
      var j = 0
      while (j < 16 && bytes(i + j) == marker(j)) j += 1
      if (j == 16) { out += i; i += 16 } else i += 1
    }
    out.result()
  }

  /** The corruption taxonomy (FIXTURES.md §B.3): fixture name →
    * (bytes, expectValid, expectRepairable). */
  def taxonomy(codec: String = "deflate", n: Int = 1000)
      : Seq[(String, Array[Byte], Boolean, Boolean)] = {
    val base = containerBytes(n, codec)
    val syncs = syncPositions(base)
    require(syncs.length >= 5, s"need ≥5 sync markers, got ${syncs.length}")

    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(base.clone())

    val trunc = base.take((base.length * 3) / 4)
    val flip = mut { b =>
      val mid = (syncs(1) + 16 + syncs(2)) / 2 // inside block 2's payload
      if (codec == "null") {
        // uncompressed: one flipped bit can mutate a value silently (an
        // Avro property the reference shares — avro-tools can't see it
        // either); smear enough bytes to break varint/UTF-8 structure
        (0 until 64).foreach(k => b(mid + k) = 0xff.toByte)
      } else {
        b(mid) = (b(mid) ^ 0x5f).toByte // breaks decompression
      }
      b
    }
    val badSync = mut { b =>
      (0 until 16).foreach(k => b(syncs(2) + k) = 0x00); b
    }
    val badCount = mut { b =>
      // record-count varlong sits right after a sync marker
      b(syncs(1) + 16) = 0xff.toByte; b(syncs(1) + 17) = 0xff.toByte; b
    }
    val badHeader = mut { b => b(1) = 'X'.toByte; b }
    val badSchema = mut { b =>
      val idx = indexOf(b, "\"type\"".getBytes("UTF-8"))
      require(idx > 0, "schema json not found in header")
      b(idx + 1) = '}'.toByte; b
    }
    Seq(
      (s"ok_$codec", base, true, true),
      (s"trunc_tail_$codec", trunc, false, true),
      (s"flip_payload_$codec", flip, false, true),
      (s"bad_sync_$codec", badSync, false, true),
      (s"bad_count_$codec", badCount, false, true),
      (s"bad_header_$codec", badHeader, false, false),
      (s"bad_schema_$codec", badSchema, false, false),
      (s"empty_file_$codec", Array.emptyByteArray, false, false),
    )
  }

  /** `sync_collision`: a record payload that *contains* the file's sync
    * marker, followed by a corrupted block — salvage must not resync
    * inside the payload (SURVEY §7.3 risk 1). Null codec so the marker
    * bytes survive into the container verbatim. */
  def syncCollision(): (Array[Byte], Int) = {
    val marker = Array.tabulate[Byte](16)(i => (0x40 + i).toByte)
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"blob","fields":[
        | {"name":"id","type":"long"},{"name":"payload","type":"bytes"}]}"""
        .stripMargin)
    val n = 400
    val bytes = containerBytes(n, "null", sync = Some(marker),
      recordFn = Some { (i, rng) =>
        val r = new GenericData.Record(schema)
        r.put("id", i)
        val payload = if (i % 7 == 3) marker
          else { val b = new Array[Byte](16); rng.nextBytes(b); b }
        r.put("payload", java.nio.ByteBuffer.wrap(payload))
        r
      }, schema = schema)
    val syncs = syncPositions(bytes)
    val corrupted = bytes.clone()
    // corrupt the record-count varlong of the block after the 3rd real
    // sync (collision occurrences inside payloads are also in `syncs`,
    // which is exactly the trap)
    val pos = syncs(2) + 16
    corrupted(pos) = 0xfe.toByte; corrupted(pos + 1) = 0xff.toByte
    (corrupted, n)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Materialize the taxonomy (all codecs) + collision fixture into a
    * directory; idempotent. Returns the manifest. */
  def writeAll(dir: String): Seq[(String, Boolean, Boolean)] = {
    val d: JPath = Paths.get(dir)
    Files.createDirectories(d)
    val all = Seq("null", "deflate", "snappy").flatMap(c => taxonomy(c))
    val manifest = all.map { case (name, bytes, valid, repairable) =>
      Files.write(d.resolve(s"$name.avro"), bytes)
      (name, valid, repairable)
    }
    val (coll, _) = syncCollision()
    Files.write(d.resolve("sync_collision.avro"), coll)
    manifest :+ (("sync_collision", false, true))
  }
}
