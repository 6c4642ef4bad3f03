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

  /** Write `df` as `part-NNNNN-<runId>.avro` files under `dir` —
    * **append semantics**: every call materializes its own part files
    * next to whatever the directory already holds (clear the directory
    * or use the DSv2 overwrite mode for truncation). The run id in the
    * name is what makes re-runs safe: with a bare deterministic name, a
    * second run's rename would fail against the first run's file and
    * first-attempt-wins would silently keep the STALE data on
    * HDFS-semantics filesystems (POSIX rename overwrites, so local
    * tests never see the divergence). Within one run the name is
    * deterministic per partition, so retried/speculative attempts still
    * resolve first-wins. codec ∈ {null, deflate, snappy, bzip2, xz,
    * zstandard}. */
  def write(df: DataFrame, dir: String, codec: String = "null",
      syncIntervalBytes: Int = 64 * 1024): Unit = {
    val schema = df.schema
    val avroJson = SchemaConverter.toAvroRecord(schema, "graft_record").toString
    val confEntries = AvroContainerSource.serializableConfEntries()
    val runId = UUID.randomUUID().toString.take(8) // driver-side: one per call
    val rdd = df.queryExecution.toRdd // InternalRow, no Row round-trip
    rdd.foreachPartition { rows =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val toRecord = AvroDatum.recordWriter(schema, avroSchema)
      val conf = AvroContainerSource.confFrom(confEntries)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val finalPath = new Path(dir, f"part-$pid%05d-$runId.avro")
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

  /** Hive-layout partitioned write: rows land under
    * `dir/col1=v1/col2=v2/part-NNNNN.avro`, with the partition columns
    * dropped from the record schema (hive convention — values live in
    * the path). This is the reference's production layout
    * (`data=YYYY-MM-DD`, `/root/reference/src/services/repair-avro.ts:92`),
    * writable at scale: rows are clustered by partition value
    * (`repartition(partCols)`) so each partition directory is written by
    * exactly one task, and sorted within tasks so exactly one writer is
    * open at a time. Same first-attempt-wins deterministic-name commit
    * as the flat write. Values are URL-encoded in path segments; NULL
    * becomes the hive default-partition token. */
  def writePartitioned(df: DataFrame, dir: String, partCols: Seq[String],
      codec: String = "null", syncIntervalBytes: Int = 64 * 1024): Unit = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    val dataFields = df.schema.fields.filterNot(f => partCols.contains(f.name))
    require(dataFields.length + partCols.length == df.schema.length,
      s"partCols ${partCols.mkString(",")} must all exist in ${df.columns.mkString(",")}")
    val dataSchema = StructType(dataFields.toSeq)
    val avroJson = SchemaConverter.toAvroRecord(dataSchema, "graft_record").toString
    val confEntries = AvroContainerSource.serializableConfEntries()
    val np = partCols.length
    val arranged = df.select(partCols.map(c => col(c).cast("string")) ++
      dataFields.map(f => col(f.name)): _*)
    val sorted = arranged.repartition(partCols.map(col): _*)
      .sortWithinPartitions(partCols.map(col): _*)
    val dataTypes = dataFields.map(f => (f.dataType, f.nullable))
    // run id in the final names: append semantics across calls, first-
    // attempt-wins within a call (same reasoning as the flat write)
    val runId = UUID.randomUUID().toString.take(8)
    sorted.queryExecution.toRdd.foreachPartition { rows =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val conf = AvroContainerSource.confFrom(confEntries)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val dataProj = UnsafeProjection.create(dataTypes.zipWithIndex.map {
        case ((dt, nullable), i) => BoundReference(np + i, dt, nullable)
      }.toSeq)
      val toRecord = AvroDatum.recordWriter(dataSchema, avroSchema)
      def enc(s: String): String =
        java.net.URLEncoder.encode(s, "UTF-8")
      var currentKey: Seq[String] = null
      var writer: DataFileWriter[GenericRecord] = null
      var fs: org.apache.hadoop.fs.FileSystem = null
      var tmp: Path = null
      var finalPath: Path = null
      // Task-level commit discipline: every partition's file stays under
      // its temp name until ALL rows of this task are written, then the
      // whole batch renames at once — a task that dies mid-way leaves
      // only dot-temp files (invisible to the listing), never a
      // committed-looking prefix of its output.
      val pending = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
      def closeCurrent(): Unit = if (writer != null) {
        writer.close(); writer = null
        pending += ((tmp, finalPath))
      }
      def open(key: Seq[String]): Unit = {
        val sub = partCols.zip(key)
          .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("/")
        val d = new Path(dir, sub)
        finalPath = new Path(d, f"part-$pid%05d-$runId.avro")
        tmp = new Path(d, s".tmp-${UUID.randomUUID()}.avro")
        fs = finalPath.getFileSystem(conf)
        fs.mkdirs(d)
        val out = fs.create(tmp, true)
        writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        writer.setCodec(codecFactory(codec))
        writer.setSyncInterval(syncIntervalBytes)
        writer.create(avroSchema, out)
      }
      var ok = false
      try {
        rows.foreach { r =>
          val key = (0 until np).map(i =>
            if (r.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
            else r.getUTF8String(i).toString)
          if (key != currentKey) { closeCurrent(); open(key); currentKey = key }
          writer.append(toRecord(dataProj(r)))
        }
        closeCurrent()
        ok = true
      } finally {
        if (!ok) {
          if (writer != null) {
            try writer.close() catch { case _: Exception => () }
            if (tmp != null) fs.delete(tmp, false)
          }
          pending.foreach { case (t, _) => fs.delete(t, false) }
        }
      }
      pending.foreach { case (t, f) =>
        if (!fs.rename(t, f)) {
          fs.delete(t, false)
          if (!fs.exists(f))
            throw new java.io.IOException(
              s"commit failed: cannot rename $t to $f")
        }
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
