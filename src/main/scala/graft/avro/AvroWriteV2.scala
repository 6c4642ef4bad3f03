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
  }
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
