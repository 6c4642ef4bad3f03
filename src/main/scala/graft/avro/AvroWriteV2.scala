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

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    AvroStreamingWriterFactory(schema,
      SchemaConverter.toAvroRecord(schema, "graft_record").toString,
      path, codec, confEntries)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val conf = AvroContainerSource.confFrom(confEntries)
    val ms = messages.collect { case m: AvroEpochMessage => m }
    // A replayed epoch may plan FEWER partitions than the dead attempt
    // (shuffle.partitions changed across restart, listing split
    // differently) — canonical files of this epoch that the replay does
    // not re-produce must go, or their rows double forever. Listing the
    // whole sink per commit would be O(files ever written) — so probe
    // one canonical name first: partition 0 exists in every attempt, so
    // any hit means this epoch was committed before (replay) and only
    // then is the directory listed for the sweep.
    val keep = ms.map(m => new Path(m.finalPath).getName).toSet
    val dirPath = new Path(path)
    val fs = dirPath.getFileSystem(conf)
    val isReplay = ms.nonEmpty && fs.exists(new Path(ms.head.finalPath))
    if (isReplay && fs.exists(dirPath)) {
      val it = fs.listStatus(dirPath).iterator
      val prefix = s"part-e$epochId-"
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (n.startsWith(prefix) && !keep.contains(n) &&
            !fs.delete(st.getPath, false) && fs.exists(st.getPath))
          throw new java.io.IOException(
            s"epoch $epochId replay sweep failed: cannot delete ${st.getPath}")
      }
    }
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
