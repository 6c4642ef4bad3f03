package graft.avro

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.repair.RepairPipeline

/** Avro subsystem: schema converter, DSv2 round-trip with pruning/limit,
  * salvage over the FIXTURES.md corruption taxonomy, repair-pipeline
  * invariants (SURVEY §5.B). */
class AvroSubsystemSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(tag: String): String = {
    val p = Files.createTempDirectory(s"graft-$tag").toString
    p
  }

  test("schema converter round-trips the all_types surface") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("dec", DecimalType(18, 4)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("rec", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val avro = SchemaConverter.toAvroRecord(st, "t")
    val back = SchemaConverter.toSparkStruct(avro)
    assert(back.fieldNames.toSeq == st.fieldNames.toSeq)
    assert(back("dec").dataType == DecimalType(18, 4))
    assert(back("ts").dataType == TimestampType)
    assert(back("arr").dataType.asInstanceOf[ArrayType].elementType == LongType)
    assert(back("rec").dataType.isInstanceOf[StructType])
  }

  test("multi-branch unions decode as struct-of-branches and round-trip") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    val dir = tmpDir("union")
    val sch = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"u","type":["int","string"]},
        |{"name":"v","type":["null","string","long"]}]}""".stripMargin)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new java.io.File(dir, "u.avro"))
    for (i <- 0 until 6) {
      val r = new GenericData.Record(sch)
      r.put("id", i.toLong)
      r.put("u", if (i % 2 == 0) Int.box(i)
                 else new org.apache.avro.util.Utf8(s"s$i"))
      r.put("v", if (i % 3 == 0) null
                 else if (i % 3 == 1) new org.apache.avro.util.Utf8(s"v$i")
                 else Long.box(i * 10L))
      w.append(r)
    }
    w.close()
    // the reference reads any union transparently (GenericDatumReader
    // pass-through); the relational shape here is struct-of-branches
    val df = spark.read.format("graft-avro").load(dir)
    val uT = df.schema("u").dataType.asInstanceOf[StructType]
    assert(uT.fieldNames.toSeq == Seq("tag", "member_int", "member_string"))
    assert(!df.schema("u").nullable && df.schema("v").nullable)
    val rows = df.selectExpr("id", "u.tag", "u.member_int",
      "u.member_string", "v.tag", "v.member_string", "v.member_long")
      .orderBy("id").collect()
    assert(rows.length == 6)
    for (r <- rows) {
      val i = r.getLong(0).toInt
      if (i % 2 == 0) {
        assert(r.getInt(1) == 0 && r.getInt(2) == i && r.isNullAt(3))
      } else {
        assert(r.getInt(1) == 1 && r.isNullAt(2) && r.getString(3) == s"s$i")
      }
      if (i % 3 == 0) assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
      else if (i % 3 == 1)
        assert(r.getInt(4) == 0 && r.getString(5) == s"v$i" && r.isNullAt(6))
      else assert(r.getInt(4) == 1 && r.isNullAt(5) && r.getLong(6) == i * 10L)
    }
    // round-trips through the DSv2 writer (the struct encodes as a
    // record — tagged values, not a union — and survives re-read)
    val dir2 = tmpDir("union-rt")
    df.write.format("graft-avro").mode("append").save(dir2)
    val back = spark.read.format("graft-avro").load(dir2)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // the drift report's header fingerprint covers union schemas
    assert(org.apache.avro.SchemaNormalization.parsingFingerprint64(sch) != 0L)
  }

  test("time-millis/micros decode as TimeType and round-trip (µs)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    // TIME is flag-gated in Spark 4.1; the source honors the session
    // regime (without the flag these columns stay raw int/long millis/
    // micros-of-day, the pre-TIME behavior)
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try timeRoundTrip()
    finally spark.conf.set("spark.sql.timeType.enabled", "false")
  }

  private def timeRoundTrip(): Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.spark.sql.types._
    val dir = tmpDir("time")
    val sch = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"t3","type":{"type":"int","logicalType":"time-millis"}},
        |{"name":"t6","type":["null",
        |  {"type":"long","logicalType":"time-micros"}]}]}""".stripMargin)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    w.create(sch, new java.io.File(dir, "t.avro"))
    // 12:34:56.789 and 12:34:56.789123
    for (i <- 0 until 4) {
      val r = new GenericData.Record(sch)
      r.put("id", i.toLong)
      r.put("t3", Int.box(45296789 + i))
      r.put("t6", if (i == 3) null else Long.box(45296789123L + i))
      w.append(r)
    }
    w.close()
    val df = spark.read.format("graft-avro").load(dir)
    assert(df.schema("t3").dataType == TimeType(3))
    assert(df.schema("t6").dataType == TimeType(6) && df.schema("t6").nullable)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[java.time.LocalTime]("t3") ==
      java.time.LocalTime.of(12, 34, 56, 789000000))
    assert(rows(0).getAs[java.time.LocalTime]("t6") ==
      java.time.LocalTime.of(12, 34, 56, 789123000))
    assert(rows(3).isNullAt(rows(3).fieldIndex("t6")))
    // round-trips through the DSv2 writer (both widen to time-micros)
    val dir2 = tmpDir("time-rt")
    df.write.format("graft-avro").mode("append").save(dir2)
    val back = spark.read.format("graft-avro").load(dir2)
    assert(back.schema("t3").dataType == TimeType(6)) // written as µs
    assert(back.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getAs[java.time.LocalTime]("t3"),
          r.getAs[java.time.LocalTime]("t6"))).toSeq ==
      rows.map(r => (r.getLong(0), r.getAs[java.time.LocalTime]("t3"),
        r.getAs[java.time.LocalTime]("t6"))).toSeq)
  }

  test("avro fixtures decode via DataFileReader and match seeded ids") {
    val dir = tmpDir("fix")
    val bytes = AvroFixtures.containerBytes(500, "deflate")
    Files.write(Paths.get(dir, "ok.avro"), bytes)
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    val v = Salvage.validate(fs, new Path(dir, "ok.avro"), samplerate = 1.0)
    assert(v.valid && v.recordsScanned == 500)
  }

  test("DSv2 read round-trips what AvroWrite wrote") {
    import spark.implicits._
    val dir = tmpDir("rt")
    val df = (1L to 300L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "v")
    AvroWrite.write(df, dir, codec = "snappy")
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "v"))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 300)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "name_1")
    assert(rows(299).getDouble(2) == 450.0)
  }

  test("DSv2 write: append, overwrite truncates only on commit") {
    import spark.implicits._
    val dir = tmpDir("wv2")
    val df1 = (1L to 100L).map(i => (i, s"a$i")).toDF("id", "s")
    df1.write.format("graft-avro").mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 100)
    // append accumulates
    df1.write.format("graft-avro").mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 200)
    // overwrite replaces the whole generation
    val df2 = (1L to 7L).map(i => (i, s"b$i")).toDF("id", "s")
    df2.write.format("graft-avro").mode("overwrite").save(dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() == 7)
    assert(back.orderBy("id").collect().map(_.getString(1)).head == "b1")
  }

  test("split reads: byte ranges cover every record exactly once") {
    import spark.implicits._
    val dir = tmpDir("split")
    Files.write(Paths.get(dir, "big.avro"),
      AvroFixtures.containerBytes(5000, "deflate"))
    val df = spark.read.format("graft-avro")
      .option("maxSplitBytes", "8192").load(dir)
    assert(df.rdd.getNumPartitions > 3,
      s"expected multiple splits, got ${df.rdd.getNumPartitions}")
    val ids = df.select("id").collect().map(_.getLong(0))
    assert(ids.length == 5000, s"records lost/duplicated: ${ids.length}")
    assert(ids.toSet == (0L until 5000L).toSet)
  }

  test("DSv2 column pruning and limit pushdown reach the scan") {
    import spark.implicits._
    val dir = tmpDir("prune")
    AvroWrite.write((1L to 1000L).map(i => (i, s"s$i", i.toDouble))
      .toDF("id", "name", "v"), dir)
    val plan = spark.read.format("graft-avro").load(dir)
      .select("id").limit(7).queryExecution.executedPlan.toString()
    assert(plan.contains("cols=[id]"), s"pruning missing from: $plan")
    assert(plan.contains("limit=7"), s"limit missing from: $plan")
    assert(spark.read.format("graft-avro").load(dir).select("id").limit(7)
      .count() == 7)
  }

  test("nested types round-trip (map + nullable + timestamp-millis)") {
    val dir = tmpDir("nested")
    Files.write(Paths.get(dir, "m.avro"),
      AvroFixtures.containerBytes(50, "null"))
    val df = spark.read.format("graft-avro").load(dir)
    val r = df.orderBy("id").collect()
    assert(r.length == 50)
    val tags = r(0).getMap[String, String](r(0).fieldIndex("tags"))
    assert(tags.keys.toSet == Set("host", "dc"))
    // timestamp-millis logical type became a TimestampType with µs value
    assert(df.schema("ts").dataType.typeName == "timestamp")
  }

  test("corruption taxonomy: validate verdicts match the manifest") {
    val dir = tmpDir("tax")
    val manifest = AvroFixtures.writeAll(dir)
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    manifest.foreach { case (name, expectValid, _) =>
      val v = Salvage.validate(fs, new Path(dir, s"$name.avro"),
        samplerate = 1.0)
      assert(v.valid == expectValid,
        s"$name: expected valid=$expectValid got ${v.valid} (${v.error})")
    }
  }

  test("salvage invariants: recovered ⊆ original, repaired output is valid, " +
      "valid files are fixed points") {
    val dir = tmpDir("salv")
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    val originalIds = (0L until 1000L).toSet
    AvroFixtures.taxonomy("deflate").foreach {
      case (name, bytes, _, repairable) =>
        val p = Paths.get(dir, s"$name.avro"); Files.write(p, bytes)
        val outP = new Path(dir, s"$name.repaired.avro")
        val res = Salvage.salvage(fs, new Path(p.toString), Some(outP))
        if (!repairable) {
          assert(res.status == "unrepairable", s"$name: ${res.status}")
        } else {
          assert(res.status == "valid" || res.status == "repaired", s"$name")
          // repaired output passes full validation
          val rv = Salvage.validate(fs, outP, samplerate = 1.0)
          assert(rv.valid, s"$name repaired output invalid: ${rv.error}")
          // recovered ids ⊆ original ids (decodes through our DSv2 source)
          val ids = spark.read.format("graft-avro").load(outP.toString)
            .select("id").collect().map(_.getLong(0)).toSet
          assert(ids.subsetOf(originalIds), s"$name leaked ids")
          if (name.startsWith("ok_")) assert(ids == originalIds,
            "valid file must be a fixed point of repair")
          if (name.startsWith("flip_payload"))
            assert(ids.size < 1000 && ids.size > 800,
              s"$name: lost exactly one block's records, got ${ids.size}")
        }
    }
  }

  test("recovery modes: prior keeps the pre-corruption prefix, after the " +
      "suffix, all = their union (reference B10 -o prior|after)") {
    val dir = tmpDir("recmode")
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    val (name, bytes, _, _) = AvroFixtures.taxonomy("deflate")
      .find(_._1.startsWith("flip_payload")).get
    val p = Paths.get(dir, s"$name.avro"); Files.write(p, bytes)
    def ids(mode: String): Seq[Long] = {
      val outP = new Path(dir, s"$name.$mode.avro")
      val res = Salvage.salvage(fs, new Path(p.toString), Some(outP),
        mode = mode)
      assert(res.status == "repaired", s"$mode: ${res.status}")
      spark.read.format("graft-avro").load(outP.toString)
        .select("id").collect().map(_.getLong(0)).toSeq.sorted
    }
    val all = ids("all"); val prior = ids("prior"); val after = ids("after")
    assert(prior.nonEmpty && after.nonEmpty, "mid-file corruption must split")
    assert(prior.toSet.intersect(after.toSet).isEmpty, "modes overlap")
    assert((prior ++ after).sorted == all, "prior ∪ after ≠ all")
    assert(prior == (0L until prior.length.toLong),
      s"prior is not the id prefix: ${prior.take(5)}...${prior.takeRight(2)}")
    assert(after.max == 999L && prior.max < after.min,
      "after must be the post-corruption suffix")
    intercept[IllegalArgumentException] {
      Salvage.salvage(fs, new Path(p.toString), None, mode = "bogus")
    }
  }

  test("progress accumulators tick per status and match the final report") {
    val dir = tmpDir("progress")
    AvroFixtures.writeAll(dir)
    val progress = new RepairPipeline.Progress(spark)
    val report = RepairPipeline.run(spark, dir, replace = false,
      progress = Some(progress))
    val byStatus = report.collect().groupBy(_.status)
      .view.mapValues(_.length.toLong).toMap
    val live = progress.counts.filter(_._2 > 0)
    assert(live == byStatus,
      s"live accumulator counts $live != report $byStatus")
  }

  test("sync_collision: no false resync inside a record payload") {
    val dir = tmpDir("coll")
    val (bytes, n) = AvroFixtures.syncCollision()
    val p = Paths.get(dir, "sync_collision.avro"); Files.write(p, bytes)
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    assert(!Salvage.validate(fs, new Path(p.toString), samplerate = 1.0).valid)
    val outP = new Path(dir, "coll.repaired.avro")
    val res = Salvage.salvage(fs, new Path(p.toString), Some(outP))
    assert(res.status == "repaired")
    val rv = Salvage.validate(fs, outP, samplerate = 1.0)
    assert(rv.valid, s"collision repaired output invalid: ${rv.error}")
    assert(res.recordsRecovered > 0 && res.recordsRecovered < n)
  }

  test("DSv2 options: seeded samplerate is deterministic, offset skips") {
    import spark.implicits._
    val dir = tmpDir("opts")
    // one container file: offset/limit are per-partition bounds
    AvroWrite.write((1L to 2000L).map(i => (i, i * 2.0)).toDF("id", "v")
      .coalesce(1), dir)
    def sampled() = spark.read.format("graft-avro")
      .option("samplerate", "0.1").option("seed", "7").load(dir)
      .select("id").collect().map(_.getLong(0)).toSeq
    val s1 = sampled(); val s2 = sampled()
    assert(s1 == s2, "seeded sample must be reproducible")
    assert(s1.size > 100 && s1.size < 320, s"~10% expected, got ${s1.size}")
    val off = spark.read.format("graft-avro").option("offset", "1990")
      .load(dir).collect()
    assert(off.length == 10 && off.map(_.getLong(0)).min == 1991L)
  }

  test("all six codecs round-trip through write + DSv2 read") {
    import spark.implicits._
    for (codec <- Seq("null", "deflate", "snappy", "bzip2", "xz", "zstandard")) {
      val dir = tmpDir(s"codec-$codec")
      AvroWrite.write((1L to 200L).map(i => (i, s"v$i")).toDF("id", "s"),
        dir, codec = codec)
      val back = spark.read.format("graft-avro").load(dir)
      assert(back.count() == 200, s"codec $codec lost rows")
      assert(back.orderBy("id").collect()(199).getString(1) == "v200",
        s"codec $codec corrupted data")
    }
  }

  test("streaming read: new container files arrive as micro-batches") {
    import spark.implicits._
    val dir = tmpDir("stream")
    AvroWrite.write((1L to 50L).map(i => (i, s"a$i")).toDF("id", "s"), dir)
    val q = spark.readStream.format("graft-avro").load(dir)
      .writeStream.format("memory").queryName("avro_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("avro_stream").count() == 50)
      // a new file appears (later part id → lexicographically after)
      val more = (51L to 80L).map(i => (i, s"b$i")).toDF("id", "s")
        .coalesce(1).rdd // ensure a single new part file
      (51L to 80L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1)
        .write.format("graft-avro").mode("append").save(dir)
      q.processAllAvailable()
      val ids = spark.table("avro_stream").select("id").collect()
        .map(_.getLong(0)).toSet
      assert(ids == (1L to 80L).toSet, s"got ${ids.size} ids")
    } finally q.stop()
  }

  test("hive-partitioned write: layout, partition column, subtree pruning") {
    import spark.implicits._
    val dir = tmpDir("hive")
    val df = Seq((1L, "2022-10-11", 1.5), (2L, "2022-10-11", 2.5),
      (3L, "2022-10-12", 3.5), (4L, "2022-10-13", 4.5),
      (5L, null.asInstanceOf[String], 5.5))
      .toDF("id", "data", "v")
    AvroWrite.writePartitioned(df, dir, Seq("data"))
    // hive layout on disk, record schema without the partition column
    val d11 = new java.io.File(s"$dir/data=2022-10-11")
    assert(d11.isDirectory, "partition directory missing")
    assert(d11.listFiles().exists(_.getName.endsWith(".avro")))
    val flat = spark.read.format("graft-avro").load(dir)
    assert(flat.columns.toSeq == Seq("id", "v"),
      s"partition col leaked into records: ${flat.columns.toSeq}")
    // partition column surfaces with hivepartitions=true
    val full = spark.read.format("graft-avro")
      .option("hivepartitions", "true").load(dir)
    assert(full.columns.toSeq == Seq("id", "v", "data"))
    val got = full.select("id", "data").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "2022-10-11", 2L -> "2022-10-11",
      3L -> "2022-10-12", 4L -> "2022-10-13", 5L -> null),
      s"null partition value must round-trip to NULL: $got")
    // partition-scoped load path = static pruning by listing
    val oneDay = spark.read.format("graft-avro")
      .load(s"$dir/data=2022-10-12")
    assert(oneDay.count() == 1)
    // partition-column-only projection decodes an empty record schema
    val counts = full.groupBy("data").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("2022-10-11" -> 2L, "2022-10-12" -> 1L,
      "2022-10-13" -> 1L, (null: String) -> 1L))
    // IsNotNull pushdown agrees with the surfaced nullness
    assert(full.filter($"data".isNotNull).count() == 4)
    // equality filter on the partition column prunes at the listing:
    // pushed into the scan (visible in the plan), correct rows survive
    val filtered = full.filter($"data" === "2022-10-11")
    assert(filtered.queryExecution.executedPlan.toString
      .contains("EqualTo(data,2022-10-11)"),
      s"partition filter not pushed:\n${filtered.queryExecution.executedPlan}")
    assert(filtered.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
  }

  test("record field shadowing a hive path key: one column, record wins") {
    import spark.implicits._
    val dir = tmpDir("shadow")
    // external-writer layout: the partition key also lives IN the records
    Files.createDirectories(Paths.get(dir, "data=path-value"))
    Seq((1L, "record-value"), (2L, "record-value"))
      .toDF("id", "data").coalesce(1)
      .write.format("graft-avro").mode("append")
      .save(s"$dir/data=path-value")
    val df = spark.read.format("graft-avro")
      .option("hivepartitions", "true").load(dir)
    assert(df.columns.count(_ == "data") == 1,
      s"duplicate column: ${df.columns.toSeq}")
    val vals = df.select("data").collect().map(_.getString(0)).distinct.toSeq
    assert(vals == Seq("record-value"),
      s"record field must win over the path constant: $vals")
  }

  test("Trigger.AvailableNow drains the directory snapshot then terminates") {
    import spark.implicits._
    val dir = tmpDir("avnow")
    AvroWrite.write((1L to 30L).map(i => (i, s"a$i")).toDF("id", "s"), dir)
    val name = "avnow_sink"
    val q = spark.readStream.format("graft-avro").load(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-stop")
    assert(spark.table(name).count() == 30)
    // a file landing after the snapshot is NOT picked up by this run
    (31L to 40L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    assert(spark.table(name).count() == 30)
  }

  test("streaming checkpoint recovery: files added while stopped still arrive") {
    import spark.implicits._
    val dir = tmpDir("stream-ckpt")
    val ckpt = tmpDir("stream-ckpt-cp")
    val outDir = tmpDir("stream-ckpt-out")
    AvroWrite.write((1L to 40L).map(i => (i, s"a$i")).toDF("id", "s"), dir)
    def start() = spark.readStream.format("graft-avro").load(dir)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // files land while the query is down; on restart the recovered
    // manifest must assign them batch numbers above the committed
    // offset (an in-memory-only manifest restarted at 0 and the new
    // files were silently dropped)
    (41L to 60L).map(i => (i, s"b$i")).toDF("id", "s").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(outDir).select("id").collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(ids == (1L to 60L), s"expected 1..60, got ${ids.size} rows")
  }

  test("add-column schema evolution: old files null-fill new columns") {
    import spark.implicits._
    val dir = tmpDir("evolve")
    // v1 files lack the column added later
    (1L to 10L).map(i => (i, s"a$i")).toDF("id", "s").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    (11L to 20L).map(i => (i, s"b$i", i * 1.5)).toDF("id", "s", "score")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType)))
    val back = spark.read.format("graft-avro").schema(schema).load(dir)
      .orderBy("id").collect()
    assert(back.length == 20)
    assert(back.take(10).forall(_.isNullAt(2)),
      "old-schema rows must null-fill the added column")
    assert(back(10).getDouble(2) == 11 * 1.5)
    // projection that only touches the evolved column still works
    val scores = spark.read.format("graft-avro").schema(schema).load(dir)
      .selectExpr("sum(score)").head.getDouble(0)
    assert(scores == (11 to 20).map(_ * 1.5).sum)
    // schema-LESS inference must also see the evolved column even though
    // the oldest (first-listed) generation lacks it: header-sample merge
    val inferred = spark.read.format("graft-avro").load(dir)
    assert(inferred.schema.fieldNames.toSeq == Seq("id", "s", "score"),
      s"merged inference lost a column: ${inferred.schema.fieldNames.toSeq}")
    assert(inferred.schema("score").nullable,
      "evolved column must infer nullable (old generations null-fill)")
    val r = inferred.orderBy("id").collect()
    assert(r.length == 20 && r.take(10).forall(_.isNullAt(2)) &&
      r(19).getDouble(2) == 20 * 1.5)
    // mergeschema=first restores the old single-header behavior
    val firstOnly = spark.read.format("graft-avro")
      .option("mergeschema", "first").load(dir)
    assert(firstOnly.schema.fieldNames.length == 2)
  }

  test("rename schema evolution: avro aliases map old-name values to the " +
      "renamed column across generations") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.types.MetadataBuilder
    val dir = tmpDir("alias-evolve")
    // gen-1: (id, qty)
    (1L to 10L).map(i => (i, i * 2L)).toDF("id", "qty").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    // gen-2: qty RENAMED to quantity (Avro-spec alias declares the former
    // name), plus an added column — the writer embeds the alias in the
    // container's writer schema via the field's avro.aliases metadata
    val md = new MetadataBuilder()
      .putStringArray(SchemaConverter.AliasesKey, Array("qty")).build()
    (11L to 20L).map(i => (i, i * 2L, s"u$i")).toDF("id", "quantity", "unit")
      .select(col("id"), col("quantity").as("quantity", md), col("unit"))
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
    // merged inference: ONE column under the new name, never a half-null
    // (qty, quantity) pair
    assert(df.schema.fieldNames.toSeq == Seq("id", "quantity", "unit"),
      s"rename must merge, got ${df.schema.fieldNames.toSeq}")
    assert(SchemaConverter.aliasesOf(df.schema("quantity")) == Seq("qty"),
      "merged field must carry the alias for the per-file decoder")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 20)
    // gen-1 values surface under the NEW name (not null-filled)
    assert((0 until 20).forall(i => rows(i).getLong(1) == (i + 1) * 2L),
      "old-generation qty values must decode into quantity")
    assert(rows.take(10).forall(_.isNullAt(2)), "added column still null-fills")
    // projection touching only the renamed column prunes through the alias
    assert(df.agg(sum(col("quantity"))).head.getLong(0) ==
      (1L to 20L).map(_ * 2L).sum)
    // rewrite (compaction path) re-embeds the alias in the new writer schema
    val dir2 = tmpDir("alias-rewrite")
    df.coalesce(1).write.format("graft-avro").mode("append").save(dir2)
    val fs = new Path(dir2).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val avroFile = fs.listStatus(new Path(dir2)).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).head
    val in = fs.open(avroFile)
    val stream = new org.apache.avro.file.DataFileStream(in,
      new org.apache.avro.generic.GenericDatumReader[Any]())
    try assert(stream.getSchema.getField("quantity").aliases()
      .contains("qty"), "rewrite must preserve rename resolvability")
    finally { stream.close(); in.close() }
  }

  test("chained rename evolution resolves transitively; ambiguous aliases " +
      "fail loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.MetadataBuilder
    val dir = tmpDir("alias-chain")
    (1L to 5L).map(i => (i, i * 2L)).toDF("id", "qty").coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val md1 = new MetadataBuilder()
      .putStringArray(SchemaConverter.AliasesKey, Array("qty")).build()
    (6L to 10L).map(i => (i, i * 2L)).toDF("id", "quantity")
      .select(col("id"), col("quantity").as("quantity", md1)).coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    // gen-3 renames AGAIN, aliasing only its immediate predecessor — the
    // merge must chase qty → quantity → amount transitively
    val md2 = new MetadataBuilder()
      .putStringArray(SchemaConverter.AliasesKey, Array("quantity")).build()
    (11L to 15L).map(i => (i, i * 2L)).toDF("id", "amount")
      .select(col("id"), col("amount").as("amount", md2)).coalesce(1)
      .write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").option("mergeschema", "all")
      .load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(SchemaConverter.aliasesOf(df.schema("amount")).toSet ==
      Set("qty", "quantity"), "chain intermediates must survive as aliases")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 15 &&
      (0 until 15).forall(i => rows(i).getLong(1) == (i + 1) * 2L),
      "every generation must decode into the final name")
    // ambiguity: two live fields both claiming alias 'x' is an error
    val bad = tmpDir("alias-ambig")
    val mdx = new MetadataBuilder()
      .putStringArray(SchemaConverter.AliasesKey, Array("x")).build()
    Seq((1L, 1L)).toDF("id", "a")
      .select(col("id"), col("a").as("a", mdx)).coalesce(1)
      .write.format("graft-avro").mode("append").save(bad)
    Seq((2L, 2L)).toDF("id", "b")
      .select(col("id"), col("b").as("b", mdx)).coalesce(1)
      .write.format("graft-avro").mode("append").save(bad)
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").option("mergeschema", "all")
        .load(bad).schema
    }
    assert(ex.getMessage.contains("ambiguous avro alias"))
    // collision: a generation carrying BOTH the old and new name live
    val bad2 = tmpDir("alias-live-collision")
    Seq((1L, 1L, 2L)).toDF("id", "qty", "quantity")
      .select(col("id"), col("qty"), col("quantity").as("quantity", md1))
      .coalesce(1).write.format("graft-avro").mode("append").save(bad2)
    val ex2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").load(bad2).schema
    }
    assert(ex2.getMessage.contains("live field"))
  }

  test("numeric type-promotion evolution: gen-1 int/float columns scan " +
      "as gen-2's long/double, old rows widened at read") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val dir = tmpDir("promote")
    // gen-1 writes (int n, float x, int m); gen-2 widened to
    // (long n, double x, double m) — the avro-spec promotions
    (1 to 10).map(i => (i, i * 0.5f, i)).toDF("n", "x", "m")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    (11L to 20L).map(i => (i, i * 0.5d, i * 2.0d)).toDF("n", "x", "m")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
    assert(df.schema("n").dataType == LongType &&
      df.schema("x").dataType == DoubleType &&
      df.schema("m").dataType == DoubleType,
      s"promotion lattice not applied: ${df.schema.simpleString}")
    val rows = df.orderBy("n").collect()
    assert(rows.length == 20)
    // gen-1 rows surface widened: int → long, float/int → double
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(2) == 1.0)
    assert(math.abs(rows(0).getDouble(1) - 0.5) < 1e-9)
    assert(rows(19).getLong(0) == 20L && rows(19).getDouble(2) == 40.0)
    // aggregates and filters work across the promoted column
    assert(df.filter(col("n") > 15).count() == 5)
    assert(df.agg(sum(col("n"))).head.getLong(0) == (1L to 20L).sum)
    // a genuinely incompatible change (string vs numeric) still fails
    val bad = tmpDir("promote-bad")
    Seq((1, "a")).toDF("n", "s").coalesce(1)
      .write.format("graft-avro").mode("append").save(bad)
    Seq((2.0, 1)).toDF("n", "s").coalesce(1)
      .write.format("graft-avro").mode("append").save(bad)
    val ex = intercept[IllegalArgumentException] {
      spark.read.format("graft-avro").load(bad).schema
    }
    assert(ex.getMessage.contains("incompatible schema evolution"))
  }

  test("string/bytes type-promotion evolution: mixed generations scan " +
      "as one binary column, string rows surface as exact UTF-8 bytes") {
    import spark.implicits._
    import org.apache.spark.sql.types.{BinaryType, LongType}
    val dir = tmpDir("promote-strbytes")
    // gen-1 writes (long id, string tag); gen-2 switched tag to bytes —
    // the avro-spec string↔bytes resolution (both directions legal;
    // merge lands on BINARY, the lossless one)
    (1L to 10L).map(i => (i, s"tag$i")).toDF("id", "tag")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    (11L to 20L).map(i => (i, s"raw$i".getBytes("UTF-8"))).toDF("id", "tag")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
    assert(df.schema("id").dataType == LongType &&
      df.schema("tag").dataType == BinaryType,
      s"string↔bytes promotion not applied: ${df.schema.simpleString}")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 20)
    // gen-1 string rows surface as their exact UTF-8 wire bytes
    assert(new String(rows(0).getAs[Array[Byte]](1), "UTF-8") == "tag1")
    assert(new String(rows(9).getAs[Array[Byte]](1), "UTF-8") == "tag10")
    assert(new String(rows(10).getAs[Array[Byte]](1), "UTF-8") == "raw11")
    // the promoted column is queryable: cast-to-string filter works
    assert(df.filter(org.apache.spark.sql.functions.col("tag")
      .cast("string").startsWith("tag")).count() == 10)
    // explicit string reader schema over a bytes writer also resolves
    // (the reverse promotion): bytes decode as UTF-8 text
    val asString = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", LongType),
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType)))
    val back = spark.read.format("graft-avro").schema(asString).load(dir)
      .orderBy("id").collect()
    assert(back(10).getString(1) == "raw11" && back(0).getString(1) == "tag1")
  }

  test("sampled inference forces nullability; exhaustive inference keeps it") {
    import spark.implicits._
    val dir = tmpDir("sampled-nullable")
    // 40 single-file generations → the default ≤32-header sample skips
    // some files, so ANY nullable=false claim would be a lie (an
    // unsampled generation could lack the field and null-fill). The
    // writer emits `id` as a non-null avro long, so non-sampled
    // inference genuinely reports nullable=false — the flip below is
    // the sampling guard, not writer behavior.
    for (i <- 1 to 40)
      Seq((i.toLong, s"a$i")).toDF("id", "s").coalesce(1)
        .write.format("graft-avro").mode("append").save(dir)
    val sampledSchema = spark.read.format("graft-avro").load(dir).schema
    assert(sampledSchema.fields.forall(_.nullable),
      s"sampled inference must force nullable=true: $sampledSchema")
    // mergeschema=all reads every header → declared nullability survives
    val allSchema = spark.read.format("graft-avro")
      .option("mergeschema", "all").load(dir).schema
    assert(!allSchema("id").nullable,
      s"exhaustive inference lost the writer's non-null claim: $allSchema")
  }

  test("sample disagreement escalates to all-header inference: columns " +
      "in unsampled files survive") {
    import spark.implicits._
    val dir = tmpDir("sample-escalate")
    def writeAs(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val stage = tmpDir(s"stage-$name")
      df.coalesce(1).write.format("graft-avro").mode("overwrite").save(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".avro")).get
      Files.move(part.toPath, Paths.get(dir, s"$name.avro"))
    }
    // 40 name-ordered files; the evenly-spread 32-sample over 40 skips
    // indices {4,9,14,19,24,29,34,38}. Alternate two schemas so the
    // SAMPLED headers already disagree (evolution demonstrably active),
    // and hide a third column in skipped index 4 — without escalation
    // the merge would silently drop it.
    for (i <- 0 until 40) {
      if (i == 4)
        writeAs(f"f$i%03d", Seq((i.toLong, i.toLong))
          .toDF("id", "only_in_unsampled"))
      else if (i % 2 == 0)
        writeAs(f"f$i%03d", Seq(Tuple1(i.toLong)).toDF("id"))
      else
        writeAs(f"f$i%03d", Seq((i.toLong, s"s$i")).toDF("id", "s"))
    }
    val schema = spark.read.format("graft-avro").load(dir).schema
    assert(schema.fieldNames.contains("only_in_unsampled"),
      s"escalated inference dropped the unsampled-only column: $schema")
    // exhaustive merge: the partial columns are nullable (absent from
    // some generation), and nothing is left force-nullable-by-sampling
    assert(schema("only_in_unsampled").nullable && schema("s").nullable,
      s"partial columns must infer nullable: $schema")
    val all = spark.read.format("graft-avro").load(dir)
    assert(all.count() == 40)
    assert(all.filter("only_in_unsampled IS NOT NULL").count() == 1)
  }

  test("nested nullability-only drift merges; nested add-field unions") {
    import org.apache.spark.sql.types._
    val a = StructType(Seq(StructField("inner", StructType(Seq(
      StructField("x", LongType, nullable = false))))))
    val b = StructType(Seq(StructField("inner", StructType(Seq(
      StructField("x", LongType, nullable = true))))))
    // same shape, one writer wrapped x in a null union → widen, not throw
    val merged = AvroContainerSource.mergeTypes(a, b)
    assert(merged.contains(StructType(Seq(StructField("inner",
      StructType(Seq(StructField("x", LongType, nullable = true))))))),
      s"nullability-only nested drift must merge: $merged")
    // a field ADDED inside the struct merges by name-union; the side
    // missing it surfaces it nullable (decoder null-fills per file)
    val c = StructType(Seq(StructField("inner", StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", StringType))))))
    val addMerged = AvroContainerSource.mergeTypes(a, c)
    assert(addMerged.contains(StructType(Seq(StructField("inner",
      StructType(Seq(StructField("x", LongType, nullable = false),
        StructField("y", StringType, nullable = true))))))),
      s"nested add-field must union-merge: $addMerged")
    // a changed TYPE is genuinely incompatible → still refused
    val d = StructType(Seq(StructField("inner", StructType(Seq(
      StructField("x", StringType))))))
    assert(AvroContainerSource.mergeTypes(a, d).isEmpty,
      "changed nested primitive type must refuse to merge")
    // array element / map value nullability widens the same way
    assert(AvroContainerSource.mergeTypes(
      ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = true))
      .contains(ArrayType(LongType, containsNull = true)))
    assert(AvroContainerSource.mergeTypes(
      MapType(StringType, LongType, valueContainsNull = false),
      MapType(StringType, LongType, valueContainsNull = true))
      .contains(MapType(StringType, LongType, valueContainsNull = true)))
  }

  test("nested add-field evolution end-to-end: old files null-fill the " +
      "added nested field") {
    import spark.implicits._
    val dir = tmpDir("evolve-nested")
    // gen1: meta = {x}; gen2: meta = {x, y}
    (1L to 5L).map(i => (i, Tuple1(i * 10L))).toDF("id", "meta")
      .selectExpr("id", "named_struct('x', meta._1) AS meta")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    (6L to 10L).map(i => (i, (i * 10L, s"v$i"))).toDF("id", "meta")
      .selectExpr("id",
        "named_struct('x', meta._1, 'y', meta._2) AS meta")
      .coalesce(1).write.format("graft-avro").mode("append").save(dir)
    val df = spark.read.format("graft-avro").load(dir)
    val metaT = df.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(metaT.fieldNames.toSeq == Seq("x", "y"),
      s"merged nested shape lost a field: $metaT")
    assert(metaT("y").nullable,
      "nested field absent from a generation must infer nullable")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 10)
    for (r <- rows) {
      val m = r.getStruct(1)
      assert(m.getLong(0) == r.getLong(0) * 10L)
    }
    assert(rows.take(5).forall(_.getStruct(1).isNullAt(1)),
      "old-generation rows must null-fill the added nested field")
    assert(rows.drop(5).zipWithIndex.forall { case (r, i) =>
      r.getStruct(1).getString(1) == s"v${i + 6}" })
    // nested-field projection through the evolved shape still works
    assert(df.selectExpr("sum(meta.x)").head.getLong(0) ==
      (1L to 10L).map(_ * 10).sum)
  }

  test("maxfilespertrigger bounds micro-batch admission") {
    import spark.implicits._
    val dir = tmpDir("mft")
    (1L to 100L).map(i => (i, s"a$i")).toDF("id", "s")
      .repartition(10).write.format("graft-avro").mode("append").save(dir)
    val name = "mft_sink"
    val q = spark.readStream.format("graft-avro")
      .option("maxfilespertrigger", "3").load(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 100, "all rows must arrive")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4,
        s"10 files / cap 3 needs >= 4 data batches, got $dataBatches")
    } finally q.stop()
  }

  test("quarantine mirrors subdirectories: same basename never collides") {
    val dir = tmpDir("qmirror")
    val qdir = tmpDir("qmirror-quarantine")
    val tax = AvroFixtures.taxonomy("deflate")
    val flip = tax.find(_._1 == "flip_payload_deflate").get._2
    val trunc = tax.find(_._1 == "trunc_tail_deflate").get._2
    Files.createDirectories(Paths.get(dir, "day=1"))
    Files.createDirectories(Paths.get(dir, "day=2"))
    Files.write(Paths.get(dir, "day=1", "bad.avro"), flip)
    Files.write(Paths.get(dir, "day=2", "bad.avro"), trunc)
    val report = RepairPipeline.run(spark, dir, replace = false,
      quarantineDir = Some(qdir), samplerate = 1.0).collect()
    assert(report.length == 2 && report.forall(_.status == "repaired"),
      s"both must repair: ${report.toSeq}")
    // the recursive listing found equal basenames in different subdirs;
    // the quarantine must hold BOTH, at mirrored relative paths
    val q1 = new java.io.File(s"$qdir/day=1/bad.avro")
    val q2 = new java.io.File(s"$qdir/day=2/bad.avro")
    assert(q1.isFile && q2.isFile, s"quarantine lost a copy: $q1 / $q2")
    val c1 = spark.read.format("graft-avro").load(q1.getPath).count()
    val c2 = spark.read.format("graft-avro").load(q2.getPath).count()
    assert(c1 != c2,
      s"distinct corruptions must yield distinct salvages ($c1 == $c2)")
  }

  test("repair pipeline end-to-end: statuses, replacement, per-file errors") {
    val dir = tmpDir("pipe")
    AvroFixtures.writeAll(dir)
    // also drop in a non-avro junk file: must become an error/unrepairable
    // row, not abort the run (reference A18 is a defect)
    Files.write(Paths.get(dir, "junk.avro"), "not avro at all".getBytes)
    val report = RepairPipeline.run(spark, dir, replace = true,
      samplerate = 1.0).collect()
    val byName = report.map(r =>
      r.path.split('/').last.stripSuffix(".avro") -> r).toMap
    assert(byName("ok_deflate").status == "valid")
    assert(byName("flip_payload_deflate").status == "repaired_replaced")
    assert(byName("bad_header_null").status == "unrepairable")
    assert(byName("junk").status == "unrepairable")
    // replaced files now validate clean in place
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    assert(Salvage.validate(fs,
      new Path(dir, "flip_payload_deflate.avro"), samplerate = 1.0).valid)
    // summary is queryable (B13)
    val sm = RepairPipeline.summary(spark.createDataset(
      report.toSeq)(org.apache.spark.sql.Encoders.product)).collect().toMap
    assert(sm.values.sum == report.length)
  }

  test("borrowSchema salvage: corrupt-header files recover via a sibling " +
      "donor; header-only corruption loses zero records") {
    val dir = tmpDir("borrow")
    val tax = AvroFixtures.taxonomy("deflate", 1000)
      .map { case (name, bytes, v, r) => name -> ((bytes, v, r)) }.toMap
    for (n <- Seq("ok_deflate", "bad_header_deflate", "bad_schema_deflate"))
      Files.write(Paths.get(dir, s"$n.avro"), tax(n)._1)
    // default (no flag): header corruption stays terminal
    val plain = RepairPipeline.run(spark, dir, samplerate = 1.0).collect()
      .map(r => r.path.split('/').last.stripSuffix(".avro") -> r.status).toMap
    assert(plain("bad_header_deflate") == "unrepairable" &&
      plain("bad_schema_deflate") == "unrepairable")
    // opt-in borrow: schema+codec from the healthy sibling, resync on the
    // file's own trailing marker — header-only damage recovers EVERY record
    val qdir = tmpDir("borrow-q")
    val rep = RepairPipeline.run(spark, dir, quarantineDir = Some(qdir),
      samplerate = 1.0, borrowSchema = true).collect()
      .map(r => r.path.split('/').last.stripSuffix(".avro") -> r).toMap
    assert(rep("ok_deflate").status == "valid")
    for (n <- Seq("bad_header_deflate", "bad_schema_deflate")) {
      assert(rep(n).status == "repaired_borrowed", s"$n: ${rep(n)}")
      assert(rep(n).recordsRecovered == 1000L,
        s"$n recovered ${rep(n).recordsRecovered}, header-only damage " +
          "must keep all blocks")
      assert(rep(n).error.contains("donor="), "report must name the donor")
      // the quarantined copy is a fully valid container with the donor
      // schema and all the original values
      val copy = s"$qdir/$n.avro"
      assert(spark.read.format("graft-avro").load(copy).count() == 1000L)
      val ids = spark.read.format("graft-avro").load(copy)
        .selectExpr("sum(id)").head.getLong(0)
      assert(ids == (0L until 1000L).sum, s"$n salvaged values drifted")
    }
    // no donor in the directory → still unrepairable, explicit reason
    val lone = tmpDir("borrow-lone")
    Files.write(Paths.get(lone, "bad.avro"), tax("bad_header_deflate")._1)
    val loneRep = RepairPipeline.run(spark, lone, samplerate = 1.0,
      borrowSchema = true).collect()
    assert(loneRep.head.status == "unrepairable" &&
      loneRep.head.error.contains("no readable sibling header"))
  }

  test("scheme-agnosticism: write, repair (replace+quarantine), and DSv2 " +
      "read all run over mock:// URIs") {
    // Register mock:// (a RawLocalFileSystem under a foreign scheme) on
    // the session conf; serializableConfEntries ships fs.* keys to
    // executors, so every remote FileSystem.get sees it too.
    spark.sparkContext.hadoopConfiguration.set("fs.mock.impl",
      classOf[MockSchemeFileSystem].getName)
    import spark.implicits._
    val localDir = tmpDir("mock-scheme")
    val mockDir = s"mock://$localDir"
    // s3a readiness gate must treat an exotic scheme as fine
    graft.repair.S3ACheck.validate(AvroContainerSource.hadoopConf(), mockDir)
    // write path over mock://
    AvroWrite.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "s"),
      s"$mockDir/clean")
    // corrupt fixtures land via local IO at the same physical location
    AvroFixtures.writeAll(s"$localDir/fix")
    val qdir = s"mock://${tmpDir("mock-quarantine")}"
    val report = RepairPipeline.run(spark, s"$mockDir/fix", replace = true,
      quarantineDir = Some(qdir), samplerate = 1.0).collect()
    val statuses = report.map(_.status).toSet
    assert(statuses.contains("valid") &&
      statuses.contains("repaired_replaced"),
      s"unexpected statuses over mock://: ${report.toSeq}")
    // nothing silently resolved back to file: — every reported path and
    // every listed file kept the scheme (Path.toString renders the
    // empty authority as mock:/..., so compare the parsed scheme)
    report.foreach(r =>
      assert(new Path(r.path).toUri.getScheme == "mock", r.path))
    AvroContainerSource.listFiles(s"$mockDir/fix").foreach { case (p, _) =>
      assert(new Path(p).toUri.getScheme == "mock", p)
    }
    // DSv2 read over mock://: the clean write round-trips, and a
    // replaced (repaired-in-place) file validates + reads
    val back = spark.read.format("graft-avro").load(s"$mockDir/clean")
    assert(back.count() == 50)
    val repaired = report.find(_.status == "repaired_replaced").get.path
    assert(spark.read.format("graft-avro").load(repaired).count() > 0)
    val fs = new Path(mockDir).getFileSystem(AvroContainerSource.hadoopConf())
    assert(fs.isInstanceOf[MockSchemeFileSystem],
      s"mock:// resolved to ${fs.getClass} — scheme registration broken")
    assert(Salvage.validate(fs, new Path(repaired), samplerate = 1.0).valid)
  }

  test("streaming sink epoch commit is idempotent under replay") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("sink-epoch")
    val sw = AvroStreamingWrite(new StructType().add("x", LongType),
      dir, "null", AvroContainerSource.serializableConfEntries())
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    def attempt(content: String): graft.avro.AvroEpochMessage = {
      val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}.avro")
      val os = fs.create(tmp, true)
      os.write(content.getBytes); os.close()
      graft.avro.AvroEpochMessage(tmp.toString,
        new Path(dir, "part-e7-p00000.avro").toString)
    }
    sw.commit(7L, Array(attempt("first")))
    sw.commit(7L, Array(attempt("replay"))) // epoch replayed after failure
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-e7"))
    assert(parts.length == 1, s"replay duplicated the epoch: ${parts.toSeq}")
    val bytes = java.nio.file.Files.readAllBytes(parts(0).toPath)
    assert(new String(bytes) == "replay", "replay did not overwrite")
    // leftover temps would leak into readers' directory listings
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".tmp")))
    // a replay planning FEWER partitions must sweep the dead attempt's
    // extra canonical files, or their rows double forever
    def attemptP(p: Int): graft.avro.AvroEpochMessage = {
      val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}.avro")
      val os = fs.create(tmp, true); os.write("x".getBytes); os.close()
      graft.avro.AvroEpochMessage(tmp.toString,
        new Path(dir, f"part-e9-p$p%05d.avro").toString)
    }
    sw.commit(9L, Array(attemptP(0), attemptP(1), attemptP(2)))
    sw.commit(9L, Array(attemptP(0))) // narrower replay
    val e9 = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-e9")).map(_.getName).sorted
    assert(e9.toSeq == Seq("part-e9-p00000.avro"),
      s"stale partitions from the dead attempt survive: ${e9.toSeq}")
  }

  test("CDC upserts through the avro sink: an epoch replay with " +
      "OVERLAPPING keys neither drops nor doubles them; latest-per-key " +
      "readback resolves the overlap (VERDICT r14 #8)") {
    import org.apache.spark.sql.types._
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val dir = tmpDir("sink-cdc")
    val schema = new StructType().add("k", LongType).add("v", StringType)
      .add("epoch", LongType)
    val avroSchema = SchemaConverter.toAvroRecord(schema, "graft_record")
    val sw = AvroStreamingWrite(schema, dir, "null",
      AvroContainerSource.serializableConfEntries())
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    def attempt(epoch: Long, rows: Seq[(Long, String)])
        : graft.avro.AvroEpochMessage = {
      val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}.avro")
      val os = fs.create(tmp, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, os)
      rows.foreach { case (k, v) =>
        val r = new GenericData.Record(avroSchema)
        r.put("k", k); r.put("v", v); r.put("epoch", epoch)
        w.append(r)
      }
      w.close()
      graft.avro.AvroEpochMessage(tmp.toString,
        new Path(dir, f"part-e$epoch%d-p00000.avro").toString)
    }
    // epoch 10: k=1,2; epoch 11 UPSERTS k=2 and inserts k=3 — and the
    // epoch-11 commit is REPLAYED (the crash-recovery path)
    sw.commit(10L, Array(attempt(10L, Seq(1L -> "a1", 2L -> "b1"))))
    sw.commit(11L, Array(attempt(11L, Seq(2L -> "b2", 3L -> "c1"))))
    sw.commit(11L, Array(attempt(11L, Seq(2L -> "b2", 3L -> "c1"))))
    val log = spark.read.format("graft-avro").load(dir)
    // the append log holds each epoch exactly once: 4 rows, k=2 twice
    assert(log.count() == 4L, s"replay duplicated rows: ${log.count()}")
    assert(log.filter("k = 2").count() == 2L)
    // CDC readback: latest epoch wins per key
    val latest = log.groupBy("k")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct("epoch", "v")).as("s"))
      .selectExpr("k", "s.v AS v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest == Map(1L -> "a1", 2L -> "b2", 3L -> "c1"),
      s"latest-per-key wrong: $latest")
  }

  test("replay sweep fires when the lowest replayed partition is missing") {
    // A crashed REPLAY commit can delete-but-not-re-rename partition 0
    // (rename = delete old + rename temp), so the next replay must not
    // key its sweep decision off any single canonical name: here p00000
    // is gone, p00001 survives from the dead attempt, and stale p00002
    // (the dead attempt planned 3 partitions, this replay plans 2) must
    // still be swept. The old head-probe missed exactly this state.
    import org.apache.spark.sql.types._
    val dir = tmpDir("sink-epoch-gap")
    val sw = AvroStreamingWrite(new StructType().add("x", LongType),
      dir, "null", AvroContainerSource.serializableConfEntries())
    val fs = new Path(dir).getFileSystem(AvroContainerSource.hadoopConf())
    def put(name: String, content: String): Unit = {
      val os = fs.create(new Path(dir, name), true)
      os.write(content.getBytes); os.close()
    }
    put("part-e13-p00001.avro", "dead-attempt") // renamed before the crash
    put("part-e13-p00002.avro", "stale")        // not in the replay's plan
    // orphan temp from an earlier epoch's dead attempt (driver crashed
    // before its rename) — provably dead, must be swept with the listing
    val orphan = ".tmp-e12-p00000-deadbeef.avro"
    put(orphan, "orphan")
    def attemptP(p: Int): graft.avro.AvroEpochMessage = {
      val tmp = new Path(dir,
        f".tmp-e13-p$p%05d-${java.util.UUID.randomUUID()}.avro")
      val os = fs.create(tmp, true); os.write(s"new-$p".getBytes); os.close()
      graft.avro.AvroEpochMessage(tmp.toString,
        new Path(dir, f"part-e13-p$p%05d.avro").toString)
    }
    sw.commit(13L, Array(attemptP(1), attemptP(0))) // arbitrary msg order
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!names.contains("part-e13-p00002.avro"),
      s"stale partition from the dead attempt survives: $names")
    assert(!names.contains(orphan), s"orphan temp survives: $names")
    assert(names.filter(_.startsWith("part-e13")) ==
      Set("part-e13-p00000.avro", "part-e13-p00001.avro"), names.toString)
    val p1 = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "part-e13-p00001.avro").toPath)
    assert(new String(p1) == "new-1", "replay did not overwrite p00001")
  }

  test("schema-drift report groups files by embedded writer schema") {
    val rows = graft.SparkEntry.queries("q_avro_schema_drift")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 2, s"expected 2 schema generations: ${rows.toSeq}")
    // majority generation first (3 files, 2 fields), drifted second
    assert(rows(0).getLong(3) == 3L && rows(0).getInt(2) == 2)
    assert(rows(1).getLong(3) == 2L && rows(1).getInt(2) == 3)
    assert(rows(1).getString(1).split(",").contains("value"),
      "drifted generation should carry the added column")
    assert(rows(0).getLong(0) != rows(1).getLong(0), "fingerprints collide")
  }

  test("compaction collapses small files to the computed bin count") {
    val sf = "/root/testdata/sf0.001"
    // run the full operator (writes 40 small containers, compacts them)
    val out = graft.SparkEntry.queries("q_avro_compact")(spark, sf)
    val rows = out.count()
    assert(rows == spark.read.parquet(s"$sf/events.parquet").count())
    val tag = math.abs(sf.hashCode)
    val srcDir = s"/root/repo/target/qtmp/avro_cm_src_$tag"
    val dstDir = s"/root/repo/target/qtmp/avro_cm_out_$tag"
    def avroFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".avro"))
    val nSrc = avroFiles(srcDir).length
    val nDst = avroFiles(dstDir).length
    assert(nSrc == 40, s"expected the manufactured small-file layout, got $nSrc")
    val expect = graft.queries.AvroQueries.compactionBins(
      spark, srcDir, 256L << 10)
    assert(nDst == expect, s"wrote $nDst containers, planned $expect")
    assert(nDst < nSrc, s"compaction did not reduce file count: $nDst >= $nSrc")
  }
}
