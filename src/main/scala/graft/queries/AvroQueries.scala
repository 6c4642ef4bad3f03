package graft.queries

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.avro.{AvroFixtures, AvroWrite}
import graft.repair.RepairPipeline
import Tables._

/** Source/sink surface (SURVEY §2.C cat. scans/sources/sinks): the custom
  * Avro container source round-trip, the reference-faithful
  * validate/repair pipeline as queryable DataFrames, the binaryFile
  * metadata listing (A4), and a parquet sink round-trip. */
object AvroQueries {

  private val workRoot = "/root/repo/target/qtmp"

  // scratch dirs come from the one shared helper — a second copy here
  // would silently diverge if the scratch root ever moves
  private def freshDir(tag: String): String = Tables.freshDir(tag)

  /** events → hive-layout partitioned avro write (the reference's
    * production `data=…` shape, A-layout) → partition-column-surfacing
    * read → per-partition aggregate. Oracled against the same aggregate
    * over the parquet table; the partition column round-trips through
    * the directory name, not the records. */
  private def qAvroPartitioned(s: SparkSession, d: String): DataFrame = {
    val dir = freshDir(s"avro_part_${math.abs(d.hashCode)}")
    AvroWrite.writePartitioned(
      events(s, d).select(col("event_id"), col("us"), col("value"),
        col("event_type")),
      dir, Seq("event_type"))
    s.read.format("graft-avro").option("hivepartitions", "true").load(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(sum(dec(col("value")))).as("sum_v"),
        countDistinct(col("event_id")).as("nd_ids"))
      .orderBy("event_type")
  }

  /** events → graft-avro DSv2 write → graft-avro read → project. Oracled
    * as an identity query over `events` (the round trip must be
    * lossless). */
  private def qAvroRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = freshDir(s"avro_rt_${math.abs(d.hashCode)}")
    events(s, d).select(col("event_id"), col("event_type"),
      col("value"), col("props"), col("us"))
      .write.format("graft-avro").option("codec", "deflate")
      .mode("append").save(dir)
    s.read.format("graft-avro").load(dir)
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
      .orderBy("event_id")
  }

  /** Sampled validation over the corruption-taxonomy fixtures → report
    * rows (reference A10; statuses are data, not log lines). */
  private def qAvroValidate(s: SparkSession, d: String): DataFrame = {
    val dir = fixturesDir()
    val report = RepairPipeline.run(s, dir, replace = false,
      quarantineDir = Some(freshDir("avro_quarantine_v")), samplerate = 1.0)
    report.toDF()
      .withColumn("name", regexp_extract(col("path"), "([^/]+)\\.avro$", 1))
      .select(col("name"), col("status"), col("recordsScanned"),
        col("recordsRecovered"), col("resyncs"))
      .orderBy("name")
  }

  /** Repair with in-place replacement on a scratch copy of the fixtures →
    * after-state report (every repaired file revalidates clean). */
  private def qAvroRepair(s: SparkSession, d: String): DataFrame = {
    val dir = freshDir("avro_repair_run")
    AvroFixtures.writeAll(dir)
    val report = RepairPipeline.run(s, dir, replace = true, samplerate = 1.0)
    report.toDF()
      .withColumn("name", regexp_extract(col("path"), "([^/]+)\\.avro$", 1))
      .select(col("name"), col("status"), col("recordsRecovered"),
        col("resyncs"))
      .orderBy("name")
  }

  /** Micro-batch streaming ingest of a container directory through the
    * graft-avro source, drained to a memory sink — lossless, so it's
    * oracled as an identity query over events. */
  private def qAvroStream(s: SparkSession, d: String): DataFrame = {
    val dir = freshDir(s"avro_st_${math.abs(d.hashCode)}")
    events(s, d).select(col("event_id"), col("event_type"))
      .write.format("graft-avro").mode("append").save(dir)
    val name = s"avsink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = s.readStream.format("graft-avro").load(dir)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name).orderBy("event_id")
  }

  /** Small-file compaction — the maintenance operator the reference's
    * production layout (thousands of small `data=…` avro objects) needs
    * most: a metadata-only listing sizes the output (⌈Σbytes/target⌉
    * containers), then the records flow source→sink through a
    * shuffle-FREE coalesce — no row is ever hashed or sorted, tasks just
    * drain multiple input files into one output container. The one
    * driver-side value is a 1-row aggregate over the listing (one row
    * per FILE, not per record — the same planner-side decision Spark's
    * own file-index makes). Content is oracled as identity over events;
    * AvroSubsystemSpec asserts the file count actually drops to the
    * computed bin count. */
  private def qAvroCompact(s: SparkSession, d: String): DataFrame = {
    val src = freshDir(s"avro_cm_src_${math.abs(d.hashCode)}")
    val dst = freshDir(s"avro_cm_out_${math.abs(d.hashCode)}")
    events(s, d).select(col("event_id"), col("event_type"), col("us"))
      .repartition(40) // manufacture the small-file problem
      .write.format("graft-avro").mode("append").save(src)
    val nBins = compactionBins(s, src, target = 256L << 10) // 256 KiB
    s.read.format("graft-avro").load(src)
      .coalesce(nBins)
      .write.format("graft-avro").mode("append").save(dst)
    s.read.format("graft-avro").load(dst)
      .select(col("event_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** nBins the compactor would choose for `dir` — exposed for the spec. */
  private[graft] def compactionBins(s: SparkSession, dir: String,
      target: Long): Int = {
    val total = s.read.format("binaryFile").load(s"$dir/*.avro")
      .agg(sum(col("length"))).collect()(0).getLong(0)
    math.max(1L, (total + target - 1) / target).toInt
  }

  /** Streaming SINK through the graft-avro DSv2 write path: events
    * parquet consumed as a stream, drained into avro containers via the
    * epoch-committed streaming writer (temp→canonical rename per epoch,
    * idempotent on replay — see AvroStreamingWrite), then read back
    * batch-side. Lossless → identity oracle over events. */
  private def qAvroStreamSink(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = freshDir(s"avro_ss_${math.abs(d.hashCode)}")
    val ckpt = freshDir(s"avro_ss_ck_${math.abs(d.hashCode)}")
    val schema = t(s, d, "events").schema
    val q = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .select(col("event_id"), col("event_type"), tsMicros(schema).as("us"))
      .writeStream.format("graft-avro")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(dir)
    try q.processAllAvailable() finally q.stop()
    s.read.format("graft-avro").load(dir)
      .select(col("event_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** End-to-end streaming avro pipeline: container directory consumed
    * through the graft-avro SOURCE (durable batch manifest), a real
    * transform (filter + derived column), drained back out through the
    * graft-avro streaming SINK (epoch-committed) — the full
    * ingest→clean→publish loop the reference's production layout runs,
    * as one structured-streaming query. Lossless and deterministic →
    * arithmetic oracle over events. */
  private def qAvroStreamE2e(s: SparkSession, d: String): DataFrame = {
    val src = freshDir(s"avro_e2e_src_${math.abs(d.hashCode)}")
    val dst = freshDir(s"avro_e2e_dst_${math.abs(d.hashCode)}")
    val ckpt = freshDir(s"avro_e2e_ck_${math.abs(d.hashCode)}")
    events(s, d).select(col("event_id"), col("event_type"), col("value"))
      .write.format("graft-avro").mode("append").save(src)
    val q = s.readStream.format("graft-avro").load(src)
      .filter(col("event_type") =!= "click")
      .withColumn("v2", col("value") * 2) // exact binary fp op
      .writeStream.format("graft-avro")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(dst)
    try q.processAllAvailable() finally q.stop()
    s.read.format("graft-avro").load(dst)
      .select(col("event_id"), col("event_type"), col("v2"))
      .orderBy("event_id")
  }

  /** Schema-drift report over a container directory — the lake-hygiene
    * operator for the reference's production shape, where files written
    * across deploys carry different embedded schemas. A metadata-only
    * pass: one task per file batch opens just the container HEADER
    * (schema + codec, no record decode — at 100 TB the IO is a few KB
    * per file regardless of file size), fingerprints the writer schema
    * (Avro parsing-canonical-form fingerprint, so doc/alias-only changes
    * collapse), and the report groups files per distinct schema with
    * the field list — the operator a migration runbook starts from.
    * File-level rows depend on generated names → the grouped report is
    * the output; ScalaTest pins the two-generation fixture. */
  private def qAvroSchemaDrift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = freshDir(s"avro_drift_${math.abs(d.hashCode)}")
    // manufacture drift: generation 1 (2 columns, 3 files), then a
    // deploy that added a column (3 columns, 2 files)
    events(s, d).select(col("event_id"), col("event_type"))
      .repartition(3)
      .write.format("graft-avro").mode("append").save(dir)
    events(s, d).select(col("event_id"), col("event_type"), col("value"))
      .repartition(2)
      .write.format("graft-avro").mode("append").save(dir)
    val files = graft.avro.AvroContainerSource.listFiles(dir).map(_._1)
    val confEntries = graft.avro.AvroContainerSource.serializableConfEntries()
    val perFile = s.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 8)))
      .map { p =>
        val conf = graft.avro.AvroContainerSource.confFrom(confEntries)
        val hp = new org.apache.hadoop.fs.Path(p)
        // per-file capture: a junk/truncated header becomes ONE report
        // row, never an aborted run (the reference's A18 defect — same
        // discipline as RepairPipeline)
        val in = hp.getFileSystem(conf).open(hp)
        try {
          val st = new org.apache.avro.file.DataFileStream[AnyRef](in,
            new org.apache.avro.generic.GenericDatumReader[AnyRef]())
          try {
            val schema = st.getSchema
            val fp = org.apache.avro.SchemaNormalization
              .parsingFingerprint64(schema)
            val fields = schema.getFields.asScala.map(_.name)
              .sorted.mkString(",")
            (fp, fields, schema.getFields.size)
          } finally st.close()
        } catch {
          case _: Exception => (0L, "<unreadable>", -1)
        } finally {
          try in.close() catch { case _: Exception => () }
        }
      }
    perFile.toDF("schema_fp", "fields", "n_fields")
      .groupBy(col("schema_fp"), col("fields"), col("n_fields"))
      .agg(count(lit(1)).as("n_files"))
      .orderBy(col("n_files").desc, col("n_fields").asc)
  }

  /** File-metadata scan (reference A4's S3 listing as a DataFrame).
    * Relative names + sizes are deterministic; paths aren't → no oracle. */
  private def qSourceBinary(s: SparkSession, d: String): DataFrame =
    s.read.format("binaryFile").load(s"$d/*.parquet")
      .select(regexp_extract(col("path"), "([^/]+)\\.parquet$", 1).as("name"),
        col("length"))
      .orderBy("name")

  /** Parquet sink round-trip, oracled as identity over orders. */
  private def qSinkParquet(s: SparkSession, d: String): DataFrame = {
    val dir = freshDir(s"sink_pq_${math.abs(d.hashCode)}")
    t(s, d, "orders").write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  private def fixturesDir(): String = {
    val p = s"$workRoot/avro_fixtures"
    if (!Files.exists(Paths.get(p, "sync_collision.avro"))) {
      AvroFixtures.writeAll(p)
    }
    p
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_avro_compact" -> (qAvroCompact _),
    "q_avro_stream_sink" -> (qAvroStreamSink _),
    "q_avro_schema_drift" -> (qAvroSchemaDrift _),
    "q_avro_stream_e2e" -> (qAvroStreamE2e _),
    "q_avro_roundtrip" -> (qAvroRoundtrip _),
    "q_avro_partitioned" -> (qAvroPartitioned _),
    "q_avro_stream" -> (qAvroStream _),
    "q_avro_validate" -> (qAvroValidate _),
    "q_avro_repair" -> (qAvroRepair _),
    "q_source_binary" -> (qSourceBinary _),
    "q_sink_parquet" -> (qSinkParquet _),
  )

  val sql: Map[String, String] = Map(
    // compaction must be content-lossless: identity oracle over events
    "q_avro_compact" ->
      """SELECT event_id, event_type FROM events ORDER BY event_id""",
    // the streamed epoch-committed write must also be lossless
    "q_avro_stream_sink" ->
      """SELECT event_id, event_type FROM events ORDER BY event_id""",
    // source→transform→sink round trip: filter + exact-double derivation
    "q_avro_stream_e2e" ->
      """SELECT event_id, event_type, value * 2 AS v2
        |FROM events WHERE event_type <> 'click' ORDER BY event_id""".stripMargin,
    "q_avro_partitioned" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
        |  COUNT(DISTINCT event_id) AS nd_ids
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_avro_roundtrip" ->
      """SELECT event_id, event_type, value, props
        |FROM events ORDER BY event_id""".stripMargin,
    "q_avro_stream" ->
      """SELECT event_id, event_type FROM events ORDER BY event_id""".stripMargin,
    "q_sink_parquet" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
