package graft.avro

import java.util.UUID

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** DSv2 write path for `graft-avro`:
  * `df.write.format("graft-avro").mode("append"|"overwrite").save(dir)`.
  *
  * Each task writes one container file under a hidden temp name and
  * renames it into place on task commit (the same temp→rename discipline
  * as the reference's repaired-file swap, `repair-avro.ts:152-157`).
  * Overwrite is implemented as truncate-at-commit: the files present
  * when the write was planned are deleted in the driver-side commit,
  * after every task has successfully committed — so a failed job leaves
  * the old data intact. */
case class AvroWriteBuilder(schema: StructType, options: Map[String, String])
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = options.getOrElse("path",
        throw new IllegalArgumentException("path option required"))
      val preExisting: Seq[String] =
        if (doTruncate) AvroContainerSource.listFiles(path).map(_._1) else Nil
      AvroBatchWrite(schema, path, options.getOrElse("codec", "null"),
        preExisting, AvroContainerSource.serializableConfEntries())
    }

    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      val path = options.getOrElse("path",
        throw new IllegalArgumentException("path option required"))
      if (doTruncate) throw new UnsupportedOperationException(
        "graft-avro streaming sink supports append mode only")
      AvroStreamingWrite(schema, path, options.getOrElse("codec", "null"),
        AvroContainerSource.serializableConfEntries())
    }
  }
}

/** Streaming sink: `df.writeStream.format("graft-avro").start(dir)`.
  *
  * Tasks write each micro-batch partition to a hidden temp container;
  * the DRIVER-side epoch commit renames every temp to its canonical
  * `part-e<epoch>-p<partition>.avro` name. The canonical name is
  * deterministic per (epoch, partition), and the rename overwrites, so
  * a replayed epoch after failure recovery lands on the same files, and
  * the epoch commit first sweeps canonical files of the SAME epoch that
  * the replay did not re-produce (a replay may plan fewer partitions) —
  * idempotent output without a metadata log (the FileStreamSink
  * discipline, minus the read-side log: readers see files, and a crash
  * BETWEEN renames of one epoch can expose a partial epoch until the
  * replay completes — at-least-once, converging to exactly the epoch's
  * data). */
case class AvroStreamingWrite(schema: StructType, path: String,
    codec: String, confEntries: Map[String, String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  // One recovery listing per query (re)start: sweeps orphan temps left
  // by a driver crash, without paying O(files ever written) per commit.
  @transient private var firstCommit = true

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    AvroStreamingWriterFactory(schema,
      SchemaConverter.toAvroRecord(schema, "graft_record").toString,
      path, codec, confEntries)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroContainerSource.confFrom(confEntries)
    // Renames happen in ASCENDING partition order (the canonical name
    // embeds a zero-padded partition id, so name order = partition
    // order). Invariant relied on below: a commit attempt that crashes
    // mid-rename leaves a canonical-file set that is a PREFIX of its
    // planned partitions — never an arbitrary subset.
    val ms = messages.collect { case m: AvroEpochMessage => m }
      .sortBy(m => new Path(m.finalPath).getName)
    val keep = ms.map(m => new Path(m.finalPath).getName).toSet
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(conf)
    // A replayed epoch may plan FEWER partitions than the dead attempt
    // (shuffle.partitions changed across restart, listing split
    // differently) — canonical files of this epoch that the replay does
    // not re-produce must go, or their rows double forever. Listing the
    // whole sink per commit would be O(files ever written) — so probe
    // the canonical names of THIS attempt's partitions instead (same
    // RPC class as the per-file renames below). Why any prior partial
    // commit must hit one of these probes: the prefix invariant above
    // means a crashed fresh attempt left partitions 0..k, and partition
    // 0 is in every attempt's plan; a crashed REPLAY can additionally
    // have deleted-but-not-re-renamed one canonical file, leaving a gap
    // at the front — but its sweep completed before any rename started
    // (sweep precedes renames, and sweep never deletes in-plan files),
    // so some in-plan canonical file still exists and a probe hits.
    val isReplay = ms.exists(m => fs.exists(new Path(m.finalPath)))
    if ((isReplay || firstCommit) && fs.exists(dirPath)) {
      val it = fs.listStatus(dirPath).iterator
      val prefix = s"part-e$epochId-"
      val currentTmps = ms.map(m => new Path(m.tmpPath).getName).toSet
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        val staleCanonical =
          isReplay && n.startsWith(prefix) && !keep.contains(n)
        // Epoch-tagged temps (.tmp-e<epoch>-p<part>-<uuid>.avro) from
        // an epoch at or before this one that are not in this commit's
        // message set are orphans of a dead attempt: their epoch has
        // committed, or is being committed right now with fresh temps.
        // Dot-prefixed so readers never saw them, but they accumulate
        // unboundedly across crash-restarts unless swept here.
        val orphanTmp = !currentTmps.contains(n) &&
          AvroStreamingWrite.tmpEpoch(n).exists(_ <= epochId)
        if ((staleCanonical || orphanTmp) &&
            !fs.delete(st.getPath, false) && fs.exists(st.getPath))
          throw new java.io.IOException(
            s"epoch $epochId replay sweep failed: cannot delete ${st.getPath}")
      }
    }
    firstCommit = false
    ms.foreach { m =>
      val tmp = new Path(m.tmpPath)
      val fin = new Path(m.finalPath)
      if (fs.exists(fin)) fs.delete(fin, false) // epoch replay: overwrite
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(
          s"epoch $epochId commit failed: cannot rename $tmp to $fin")
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroContainerSource.confFrom(confEntries)
    messages.collect { case m: AvroEpochMessage => m.tmpPath }.foreach { p =>
      val hp = new Path(p)
      hp.getFileSystem(conf).delete(hp, false)
    }
  }
}

object AvroStreamingWrite {
  // Streaming temp layout: .tmp-e<epoch>-p<5-digit partition>-<uuid>.avro
  // The -p\d{5}- tail keeps batch temps (.tmp-<uuid>.avro, whose UUID hex
  // can start with 'e' + digits) from ever parsing as an epoch.
  private val TmpEpoch = """^\.tmp-e(\d+)-p\d{5}-.*""".r
  private[avro] def tmpEpoch(name: String): Option[Long] = name match {
    case TmpEpoch(e) => scala.util.Try(e.toLong).toOption
    case _ => None
  }
}

case class AvroEpochMessage(tmpPath: String, finalPath: String)
    extends WriterCommitMessage

case class AvroStreamingWriterFactory(schema: StructType, avroJson: String,
    path: String, codec: String, confEntries: Map[String, String])
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new AvroStreamDataWriter(schema, avroJson, path, codec, partitionId,
      epochId, confEntries)
}

/** Per-task epoch writer: temp container now, canonical rename deferred
  * to the driver's epoch commit (see AvroStreamingWrite). */
class AvroStreamDataWriter(schema: StructType, avroJson: String, dir: String,
    codec: String, partitionId: Int, epochId: Long,
    confEntries: Map[String, String]) extends DataWriter[InternalRow] {

  private val conf = AvroContainerSource.confFrom(confEntries)
  private val avroSchema = new Schema.Parser().parse(avroJson)
  private val toRecord = AvroDatum.recordWriter(schema, avroSchema)
  private val finalPath =
    new Path(dir, f"part-e$epochId-p$partitionId%05d.avro")
  // epoch+partition tag → the driver's recovery sweep can prove a temp
  // orphaned (its epoch committed/replayed) without a metadata log
  private val tmpPath = new Path(dir,
    f".tmp-e$epochId-p$partitionId%05d-${UUID.randomUUID()}.avro")
  private val fs = finalPath.getFileSystem(conf)
  fs.mkdirs(finalPath.getParent)
  private val out = fs.create(tmpPath, true)
  private val writer = new DataFileWriter[GenericRecord](
    new GenericDatumWriter[GenericRecord](avroSchema))
  writer.setCodec(AvroWrite.codecFactory(codec))
  writer.create(avroSchema, out)

  override def write(row: InternalRow): Unit = writer.append(toRecord(row))

  override def commit(): WriterCommitMessage = {
    writer.close()
    AvroEpochMessage(tmpPath.toString, finalPath.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}

case class AvroBatchWrite(schema: StructType, path: String, codec: String,
    preExisting: Seq[String], confEntries: Map[String, String])
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    AvroDataWriterFactory(schema,
      SchemaConverter.toAvroRecord(schema, "graft_record").toString,
      path, codec, confEntries)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // all tasks committed → safe to drop the truncated generation
    val conf = AvroContainerSource.confFrom(confEntries)
    preExisting.foreach { p =>
      val hp = new Path(p)
      hp.getFileSystem(conf).delete(hp, false)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroContainerSource.confFrom(confEntries)
    messages.collect { case m: AvroCommitMessage => m.path }.foreach { p =>
      val hp = new Path(p)
      hp.getFileSystem(conf).delete(hp, false)
    }
  }
}

case class AvroCommitMessage(path: String) extends WriterCommitMessage

case class AvroDataWriterFactory(schema: StructType, avroJson: String,
    path: String, codec: String, confEntries: Map[String, String])
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new AvroDataWriter(schema, avroJson, path, codec, partitionId, taskId,
      confEntries)
}

class AvroDataWriter(schema: StructType, avroJson: String, dir: String,
    codec: String, partitionId: Int, taskId: Long,
    confEntries: Map[String, String]) extends DataWriter[InternalRow] {

  private val conf = AvroContainerSource.confFrom(confEntries)
  private val avroSchema = new Schema.Parser().parse(avroJson)
  private val toRecord = AvroDatum.recordWriter(schema, avroSchema)
  private val finalPath =
    new Path(dir, f"part-$partitionId%05d-$taskId-${UUID.randomUUID()}.avro")
  private val tmpPath = new Path(dir, s".tmp-${UUID.randomUUID()}.avro")
  private val fs = finalPath.getFileSystem(conf)
  fs.mkdirs(finalPath.getParent)
  private val out = fs.create(tmpPath, true)
  private val writer = new DataFileWriter[GenericRecord](
    new GenericDatumWriter[GenericRecord](avroSchema))
  writer.setCodec(AvroWrite.codecFactory(codec))
  writer.create(avroSchema, out)

  override def write(row: InternalRow): Unit = writer.append(toRecord(row))

  override def commit(): WriterCommitMessage = {
    writer.close()
    // An unchecked false return would report task success with a commit
    // message pointing at a file that doesn't exist — the job would
    // "succeed" with silently missing data.
    if (!fs.rename(tmpPath, finalPath))
      throw new java.io.IOException(
        s"task commit failed: cannot rename $tmpPath to $finalPath")
    AvroCommitMessage(finalPath.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    fs.delete(tmpPath, false)
  }

  override def close(): Unit = ()
}
