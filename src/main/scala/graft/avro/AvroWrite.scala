package graft.avro

import java.util.UUID

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Avro container write path (no spark-avro jar → built on avro-core).
  *
  * One output file per partition; each task writes to a hidden temp name
  * and commits via FileSystem.rename — the same temp→validate→rename
  * discipline the reference applies to repaired files
  * (`/root/reference/src/services/repair-avro.ts:152-157`, A15). */
object AvroWrite {

  /** Write `df` as `part-NNNNN.avro` files under `dir`.
    * codec ∈ {null, deflate, snappy, bzip2, xz, zstandard}. */
  def write(df: DataFrame, dir: String, codec: String = "null",
      syncIntervalBytes: Int = 64 * 1024): Unit = {
    val schema = df.schema
    val avroJson = SchemaConverter.toAvroRecord(schema, "graft_record").toString
    val confEntries = AvroContainerSource.serializableConfEntries()
    val rdd = df.queryExecution.toRdd // InternalRow, no Row round-trip
    rdd.foreachPartition { rows =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val toRecord = AvroDatum.recordWriter(schema, avroSchema)
      val conf = AvroContainerSource.confFrom(confEntries)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val finalPath = new Path(dir, f"part-$pid%05d.avro")
      val tmpPath = new Path(dir, s".tmp-${UUID.randomUUID()}.avro")
      val fs = finalPath.getFileSystem(conf)
      fs.mkdirs(finalPath.getParent)
      val out = fs.create(tmpPath, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      writer.setCodec(codecFactory(codec))
      writer.setSyncInterval(syncIntervalBytes)
      writer.create(avroSchema, out)
      var ok = false
      try {
        rows.foreach(r => writer.append(toRecord(r)))
        writer.close()
        ok = true
      } finally {
        if (!ok) { try writer.close() catch { case _: Exception => () } }
        if (ok) {
          // First-attempt-wins commit: the final name is deterministic
          // per partition, and a complete file only ever appears there
          // (partials stay under the temp name). So a failed rename with
          // the destination present means a retried/speculative attempt
          // already committed this partition — drop ours. A failed
          // rename with no destination is a real commit failure and must
          // fail the task, not silently lose the partition.
          if (!fs.rename(tmpPath, finalPath)) {
            fs.delete(tmpPath, false)
            if (!fs.exists(finalPath))
              throw new java.io.IOException(
                s"commit failed: cannot rename $tmpPath to $finalPath")
          }
        } else fs.delete(tmpPath, false)
      }
    }
  }

  def codecFactory(name: String): CodecFactory = name.toLowerCase match {
    case "null" | "none" => CodecFactory.nullCodec()
    case "deflate" => CodecFactory.deflateCodec(CodecFactory.DEFAULT_DEFLATE_LEVEL)
    case "snappy" => CodecFactory.snappyCodec()
    case "bzip2" => CodecFactory.bzip2Codec()
    case "xz" => CodecFactory.xzCodec(CodecFactory.DEFAULT_XZ_LEVEL)
    case "zstandard" | "zstd" => CodecFactory.zstandardCodec(3)
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }
}
