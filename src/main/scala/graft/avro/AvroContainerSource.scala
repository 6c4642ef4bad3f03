package graft.avro

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for Avro Object Container Files, built directly on
  * avro-core (`/opt/spark/jars` ships no spark-avro connector — SURVEY.md
  * §7.0). Registered as `graft-avro`:
  *
  * {{{ spark.read.format("graft-avro").option("samplerate", 0.01).load(dir) }}}
  *
  * Design (SURVEY §4.B): one `InputPartition` per container file — repair
  * and validation are file-granular, embarrassingly parallel, no shuffle.
  * Column pruning is pushed into the Avro decoder as a reader-schema
  * projection; limit pushdown stops each partition early. The reference's
  * validation knobs (`--offset/--limit/--samplerate`,
  * `/root/reference/src/services/repair-avro.ts:131` and
  * `resources/application.yml:6-7`) are exposed as options with a fixed
  * seed so sampling is reproducible (B7).
  *
  * Options: `mode` = failfast (default) | permissive (drop the rest of a
  * corrupt file), `samplerate` ∈ (0,1], `offset`, `limit`, `seed`.
  */
class AvroContainerSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = AvroContainerSource.listFiles(options)
    // A write to a fresh directory arrives here with no files when the
    // caller didn't pass a schema; the write path always supplies the
    // query schema via external metadata, so an empty struct is fine.
    if (paths.isEmpty) return new StructType()
    val conf = AvroContainerSource.hadoopConf()
    val fs = new Path(paths.head._1).getFileSystem(conf)
    // Schema-evolution-aware inference: a directory accumulates files
    // written under successive schemas, and the first-listed file is
    // usually the OLDEST — inferring from it alone silently drops every
    // later-added column. Default merges the headers of an evenly
    // spread ≤32-file sample (covers sorted listings where old files
    // cluster first; header reads are O(KB) each, so cost is bounded at
    // any corpus size). `mergeschema=all` reads every header,
    // `mergeschema=first` restores single-file inference. The per-file
    // read path null-fills fields a writer schema lacks, so the merged
    // shape is readable against every generation.
    val ps = paths.map(_._1)
    val mergeMode = Option(options.get("mergeschema")).getOrElse("sample")
    val headerPaths = mergeMode match {
      case "first" => Seq(ps.head)
      case "all" => ps
      case _ =>
        if (ps.length <= 32) ps
        else (0 until 32)
          .map(i => ps(((ps.length - 1).toLong * i / 31).toInt)).distinct
    }
    // True when some headers were NOT read: any unsampled file may lack
    // a field the sampled ones all carry, and the read path null-fills
    // it there — so no nullable=false claim derived from the sample
    // alone can be trusted (a nullability lie lets null-intolerant
    // optimizations return wrong results silently). `first` is an
    // explicit user opt-out of evolution awareness and keeps its
    // declared nullability.
    def header(p: String): StructType = {
      val in = fs.open(new Path(p))
      try {
        val s = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        try SchemaConverter.toSparkStruct(s.getSchema) finally s.close()
      } finally in.close()
    }
    val sampledStructs = headerPaths.map(header)
    // Under-covered-sample escalation: if the SAMPLED headers already
    // disagree, schema evolution is demonstrably active in this
    // directory, and an unsampled generation may well carry a column no
    // sampled header has (which this merge would silently drop). Pay
    // the bounded O(files) header-read cost and merge everything —
    // evolution-free directories (the common case) never pay it.
    val escalate = mergeMode != "first" && mergeMode != "all" &&
      headerPaths.length < ps.length && sampledStructs.distinct.length > 1
    val structs =
      if (escalate) ps.map(header)
      else sampledStructs
    // True when some headers were NOT read: any unsampled file may lack
    // a field the sampled ones all carry, and the read path null-fills
    // it there — so no nullable=false claim derived from the sample
    // alone can be trusted (a nullability lie lets null-intolerant
    // optimizations return wrong results silently). `first` is an
    // explicit user opt-out of evolution awareness and keeps its
    // declared nullability.
    val sampled = mergeMode != "first" && structs.length < ps.length
    // Rename evolution (Avro-spec `aliases`): a later generation that
    // declares `{"name": "new", "aliases": ["old"]}` means earlier
    // files' `old` IS this column — merge them under the new name
    // instead of surfacing two half-null columns. Alias declarations
    // ride StructField metadata (SchemaConverter.AliasesKey). Chained
    // renames (a→b in gen-2, b→c in gen-3) resolve transitively.
    val aliasTo = scala.collection.mutable.Map.empty[String, String]
    structs.foreach(_.fields.foreach { f =>
      SchemaConverter.aliasesOf(f).foreach { a =>
        aliasTo.get(a) match {
          case Some(c) if c != f.name => throw new IllegalArgumentException(
            s"ambiguous avro alias '$a': declared by both '$c' and " +
              s"'${f.name}' — rename evolution cannot pick a target")
          case _ => aliasTo(a) = f.name
        }
      }
    })
    def canon(n: String): String = {
      var cur = n; var hops = 0
      while (aliasTo.contains(cur) && aliasTo(cur) != cur && hops < 32) {
        cur = aliasTo(cur); hops += 1
      }
      if (hops >= 32) throw new IllegalArgumentException(
        s"avro alias chain from '$n' does not terminate (cycle?)")
      cur
    }
    val canonStructs =
      if (aliasTo.isEmpty) structs
      else structs.map { st =>
        val live = st.fieldNames.toSet
        StructType(st.fields.map { f =>
          val c = canon(f.name)
          if (c == f.name) f
          else if (live.contains(c)) throw new IllegalArgumentException(
            s"avro alias resolution is ambiguous: generation carries BOTH " +
              s"'${f.name}' and its rename target '$c' as live fields")
          else f.copy(name = c)
        })
      }
    // every name that resolves INTO a canonical field (including chain
    // intermediates) must survive on the merged field's metadata — the
    // per-file decoder resolves writer fields through exactly this list
    val aliasesByCanon: Map[String, Seq[String]] =
      aliasTo.keys.toSeq.groupBy(canon).map { case (c, as) =>
        c -> (as ++ aliasTo.values.filter(v => v != c && canon(v) == c))
          .distinct.sorted
      }
    val record = {
      val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
      val seenIn = scala.collection.mutable.Map.empty[String, Int]
      canonStructs.foreach(_.fields.foreach { f =>
        seenIn(f.name) = seenIn.getOrElse(f.name, 0) + 1
        order.get(f.name) match {
          case None => order(f.name) = f
          case Some(ex) =>
            AvroContainerSource.mergeTypes(ex.dataType, f.dataType) match {
              case Some(dt) => order(f.name) =
                ex.copy(dataType = dt, nullable = ex.nullable || f.nullable)
              // Only genuinely incompatible shapes land here (changed
              // primitive, array-vs-struct, …): add-field evolution —
              // top-level AND nested — merges above, with the decoder
              // null-filling fields a writer schema lacks.
              case None => throw new IllegalArgumentException(
                s"incompatible schema evolution for column '${f.name}': " +
                  s"${ex.dataType.simpleString} vs " +
                  s"${f.dataType.simpleString} (add-field evolution and " +
                  "avro numeric promotions int→long/float→double are " +
                  "supported; other TYPE changes must match across " +
                  "generations up to nullability)")
            }
        }
      })
      // Two reasons a field must surface as nullable regardless of what
      // the headers declare: it was absent from some SAMPLED generation
      // (null-fills there), or sampling skipped headers entirely and an
      // UNSAMPLED generation may lack it (the same null-fill, invisible
      // to this merge).
      StructType(order.values.toSeq.map { f0 =>
        // the decoder resolves every generation through the merged
        // field's alias list — re-attach the full (transitive) set even
        // when the first-seen copy was an alias-renamed field with no
        // metadata of its own
        val f = aliasesByCanon.get(f0.name) match {
          case Some(as) => f0.copy(metadata =
            SchemaConverter.aliasMetadata(as))
          case None => f0
        }
        if (sampled) AvroContainerSource.deepNullable(f)
        else if (seenIn(f.name) < canonStructs.length) f.copy(nullable = true)
        else f
      })
    }
    // hivepartitions=true: surface k=v path segments as string columns
    // (the reference's production layout is date-partitioned avro,
    // `repair-avro.ts:92`); a partition-scoped load path prunes by
    // listing only that subtree.
    if (!options.getBoolean("hivepartitions", false)) record
    else {
      val root = options.get("path")
      val partCols = scala.collection.mutable.LinkedHashSet.empty[String]
      paths.foreach { case (p, _) =>
        AvroContainerSource.hivePartitionValues(root, p)
          .foreach { case (k, _) => partCols += k }
      }
      // a partition key that also exists inside the records (external
      // writers sometimes keep it) must not produce a duplicate column —
      // the record field wins, the path copy is redundant
      partCols.filterNot(record.fieldNames.contains)
        .foldLeft(record)((st, c) =>
          st.add(c, org.apache.spark.sql.types.StringType, nullable = true))
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    AvroTable(schema, properties.asScala.toMap)
}

object AvroContainerSource {
  import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType}

  /** Avro-spec reader-schema numeric promotions (Avro 1.x spec, "Schema
    * Resolution": writer int is readable as long/float/double, long as
    * float/double, float as double). Two generations that disagree only
    * by such a widening resolve to the widened type — int+long → long,
    * float+double → double — and pairs where neither side can represent
    * the other exactly (int/long vs float) resolve to double, which the
    * Avro spec allows BOTH writers to be read as. The decoder
    * (AvroDatum) widens old generations' values at read time, mirroring
    * GenericDatumReader's reader-schema resolution. */
  private[avro] def promoteNumeric(a: DataType,
      b: DataType): Option[DataType] = (a, b) match {
    case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) =>
      Some(DoubleType)
    case (LongType, DoubleType) | (DoubleType, LongType) => Some(DoubleType)
    case (IntegerType, FloatType) | (FloatType, IntegerType) =>
      Some(DoubleType)
    case (LongType, FloatType) | (FloatType, LongType) => Some(DoubleType)
    case _ => None
  }

  /** Reconcile two header types for the same column across file
    * generations. Identical types merge trivially; structs merge
    * recursively by field-name union (nested add-field evolution: a
    * field one generation lacks surfaces nullable and null-fills in the
    * decoder), nullability flags widen at every level, and arrays/maps
    * merge element/value-wise; numeric primitives widen along the
    * Avro-spec promotion lattice (promoteNumeric). Genuinely different
    * shapes (string-vs-int, array-vs-struct) return None: the decoder
    * cannot reinterpret such a value's type, so that evolution must
    * fail inference loudly rather than mis-read silently. */
  private[avro] def mergeTypes(a: DataType, b: DataType): Option[DataType] =
    (a, b) match {
      case (x, y) if x == y => Some(x)
      // Avro-spec numeric widening across generations (int→long,
      // int/long/float→double) — r11: previously surfaced as
      // "incompatible schema evolution" even though avro's own reader-
      // schema resolution defines the promotion.
      case (x, y) if promoteNumeric(x, y).isDefined => promoteNumeric(x, y)
      // Avro-spec string↔bytes promotion (r12, the last spec-legal
      // resolution): the spec allows a writer string to be read as
      // bytes AND a writer bytes as string. Merge to BINARY — the
      // string→bytes direction is exact (avro strings are UTF-8 on the
      // wire), whereas forcing arbitrary bytes through a UTF-8 decode
      // could corrupt; callers who know the bytes are text can cast.
      case (org.apache.spark.sql.types.StringType, BinaryType) |
           (BinaryType, org.apache.spark.sql.types.StringType) =>
        Some(BinaryType)
      case (x: StructType, y: StructType) =>
        // Union-by-name recursive merge (nested ADD-FIELD evolution):
        // x's fields keep their order, y's new fields append after. A
        // field absent from one side surfaces nullable=true — the
        // decoder (AvroDatum RECORD case, pos -1) null-fills it for
        // files whose writer schema lacks it, so the merged shape is
        // readable against every generation.
        val yByName = y.fields.map(f => f.name -> f).toMap
        val xNames = x.fieldNames.toSet
        val mergedX = x.fields.map { fa =>
          yByName.get(fa.name) match {
            case None => Some(fa.copy(nullable = true))
            case Some(fb) => mergeTypes(fa.dataType, fb.dataType)
              .map(dt => fa.copy(dataType = dt,
                nullable = fa.nullable || fb.nullable))
          }
        }
        val extraY = y.fields.filterNot(f => xNames(f.name))
          .map(f => Some(f.copy(nullable = true)))
        val all = mergedX ++ extraY
        if (all.forall(_.isDefined)) Some(StructType(all.map(_.get)))
        else None
      case (ArrayType(ea, na), ArrayType(eb, nb)) =>
        mergeTypes(ea, eb).map(ArrayType(_, na || nb))
      case (MapType(ka, va, na), MapType(kb, vb, nb)) =>
        for (k <- mergeTypes(ka, kb); v <- mergeTypes(va, vb))
          yield MapType(k, v, na || nb)
      case _ => None
    }

  /** Field with every nullability flag (its own and all nested ones)
    * forced true — the only honest claim when schema inference sampled
    * headers and unsampled generations may null-fill anything. */
  private[avro] def deepNullable(f: StructField): StructField = {
    def loosen(dt: DataType): DataType = dt match {
      case st: StructType =>
        StructType(st.fields.map(n =>
          n.copy(dataType = loosen(n.dataType), nullable = true)))
      case ArrayType(e, _) => ArrayType(loosen(e), containsNull = true)
      case MapType(k, v, _) => MapType(k, loosen(v), valueContainsNull = true)
      case other => other
    }
    f.copy(dataType = loosen(f.dataType), nullable = true)
  }

  /** (path, length) of every .avro file under the path option (recursive,
    * fully paginated via RemoteIterator — unlike the reference's single
    * listObjects page capped at 1000 keys, `repair-avro.ts:37-40`). */
  def listFiles(options: CaseInsensitiveStringMap): Seq[(String, Long)] = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("path option required"))
    listFiles(root)
  }

  /** Scheme-less path of `path` relative to `root` (falls back to the
    * full path when outside the root — keeps the mapping total). Shared
    * by hive-partition parsing here and quarantine mirroring in
    * RepairPipeline. */
  def relativePath(root: String, path: Path): String = {
    val rootPath = new Path(root).toUri.getPath.stripSuffix("/")
    val p = path.toUri.getPath
    if (rootPath.nonEmpty && p.startsWith(rootPath + "/"))
      p.substring(rootPath.length + 1)
    else p.stripPrefix("/")
  }

  /** Hive-style `k=v` path segments of `path` relative to `root`, in
    * segment order, URL-decoded (the writer encodes). */
  def hivePartitionValues(root: String, path: String): Seq[(String, String)] = {
    val rel = relativePath(root, new Path(path))
    def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")
    rel.split('/').toSeq.dropRight(1).flatMap { seg =>
      val i = seg.indexOf('=')
      if (i > 0) Some(dec(seg.take(i)) -> dec(seg.drop(i + 1))) else None
    }
  }

  def listFiles(root: String): Seq[(String, Long)] = {
    val conf = hadoopConf()
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    def attempt(): Seq[(String, Long)] = {
      val it = fs.listFiles(p, true)
      val out = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && !f.getPath.getName.startsWith(".") &&
            !f.getPath.getName.startsWith("_"))
          out += ((f.getPath.toString, f.getLen))
      }
      out.result().sortBy(_._1)
    }
    // A concurrent writer's temp file can vanish between the directory
    // read and the per-entry stat (local FS even shells out for
    // permissions), aborting the iterator mid-listing — retry.
    var tries = 3
    while (tries > 1) {
      try return attempt()
      catch { case _: Exception => tries -= 1; Thread.sleep(50) }
    }
    attempt()
  }

  /** Driver-side Hadoop conf; executors rebuild from serialized entries. */
  def hadoopConf(): Configuration = SparkSession.getActiveSession
    .map(_.sessionState.newHadoopConf())
    .getOrElse(new Configuration())

  /** The conf entries worth shipping to executors (fs bindings + creds). */
  def serializableConfEntries(): Map[String, String] = {
    val conf = hadoopConf()
    conf.iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter { case (k, _) =>
        k.startsWith("fs.") || k.startsWith("io.") || k.startsWith("hadoop.")
      }.toMap
  }

  def confFrom(entries: Map[String, String]): Configuration = {
    val c = new Configuration()
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

case class AvroTable(tableSchema: StructType, props: Map[String, String])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-avro:${props.getOrElse("path", "?")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    AvroScanBuilder(tableSchema, options)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    import scala.jdk.CollectionConverters._
    val opts = info.options().entrySet().asScala
      .map(e => e.getKey -> e.getValue).toMap // lowercased keys
    AvroWriteBuilder(info.schema(),
      props.map { case (k, v) => k.toLowerCase -> v } ++ opts)
  }
}

case class AvroScanBuilder(fullSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var limit: Int = -1
  private var partFilters: Array[org.apache.spark.sql.sources.Filter] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep original field order; an empty projection (count(*)) keeps zero
    // fields and the reader emits empty rows
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep(f.name)))
  }

  override def pushLimit(n: Int): Boolean = { limit = n; true }
  override def isPartiallyPushed: Boolean = true

  /** Partition pruning for hive-layout reads: equality/IN predicates on
    * path-derived partition columns are fully answered by the listing —
    * matching files are the only ones opened. Everything else stays a
    * post-scan filter. (One extra listing at planning time; the scan
    * re-lists anyway, and a production source would cache it.) */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull}
    if (!options.getBoolean("hivepartitions", false)) return filters
    val root = options.get("path")
    val partCols: Set[String] = AvroContainerSource.listFiles(options)
      .flatMap { case (p, _) =>
        AvroContainerSource.hivePartitionValues(root, p).map(_._1)
      }.toSet
    def pushable(f: org.apache.spark.sql.sources.Filter): Boolean = f match {
      case EqualTo(c, _) => partCols(c)
      case In(c, _) => partCols(c)
      case IsNotNull(c) => partCols(c)
      case _ => false
    }
    val (push, rest) = filters.partition(pushable)
    partFilters = push
    rest
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    partFilters

  override def build(): Scan = {
    // entrySet iterates the delegate's lowercased keys — keeps the DSv2
    // case-insensitive options contract (asCaseSensitiveMap would leak
    // the caller's original casing and break lookups like "samplerate")
    val opts = options.entrySet().asScala
      .map(e => e.getKey -> e.getValue).toMap
    AvroScan(fullSchema, required, opts, limit,
      AvroContainerSource.serializableConfEntries(), partFilters.toSeq)
  }
}

/** One byte range of one container file. Blocks whose start offset lies
  * in [start, end) belong to this partition — the classic sync-boundary
  * split contract, so ranges can cut anywhere without duplicating or
  * losing records. */
case class AvroFilePartition(path: String, start: Long, end: Long,
    partitionValues: Seq[(String, String)] = Nil)
    extends InputPartition

case class AvroScan(fullSchema: StructType, required: StructType,
    options: Map[String, String], limit: Int, confEntries: Map[String, String],
    partFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val cols = required.fieldNames.mkString(",")
    s"graft-avro cols=[$cols] limit=$limit" +
      s" partFilters=[${partFilters.mkString(",")}]"
  }

  /** true iff the path-derived partition values satisfy every pushed
    * partition filter. The default-partition token is NULL: equality/IN
    * never match it (NULL = literal is never true), IsNotNull excludes
    * it — consistent with the NULL the reader surfaces. */
  private def keepFile(pv: Map[String, String]): Boolean = {
    import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull}
    def nonNull(c: String): Option[String] =
      pv.get(c).filter(_ != "__HIVE_DEFAULT_PARTITION__")
    partFilters.forall {
      case EqualTo(c, v) => nonNull(c).contains(String.valueOf(v))
      case In(c, vs) =>
        nonNull(c).exists(x => vs.exists(v => String.valueOf(v) == x))
      case IsNotNull(c) => nonNull(c).isDefined
      case _ => true
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val files = AvroContainerSource.listFiles(
      new CaseInsensitiveStringMap(options.asJava))
    // Large containers split into byte ranges (resolved to sync
    // boundaries at read time) so a single multi-GB file scans with the
    // cluster, not one task. maxSplitBytes mirrors
    // spark.sql.files.maxPartitionBytes' role.
    val splitBytes = options.getOrElse("maxsplitbytes",
      (128L * 1024 * 1024).toString).toLong
    require(splitBytes > 0, s"maxSplitBytes must be positive, got $splitBytes")
    val hive = options.getOrElse("hivepartitions", "false").toBoolean
    val root = options.getOrElse("path", "")
    files.map { case (p, len) =>
      // parse once per file; reused by the filter and the partitions
      val pv =
        if (hive) AvroContainerSource.hivePartitionValues(root, p) else Nil
      (p, len, pv)
    }.filter { case (_, _, pv) => partFilters.isEmpty || keepFile(pv.toMap) }
      .flatMap { case (p, len, pv) =>
      // end must be the real length: avro's pastSync(pos) computes
      // pos + SYNC_SIZE, which overflows for Long.MaxValue
      if (len <= splitBytes) Seq(AvroFilePartition(p, 0L, len, pv))
      else (0L until len by splitBytes).map { start =>
        AvroFilePartition(p, start, math.min(start + splitBytes, len), pv)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(required, options, limit, confEntries)

  /** Micro-batch streaming over a grow-only container directory,
    * FileStreamSource-style: each latestOffset() call diffs the current
    * listing against the files already assigned to a batch; new files
    * (any name) form the next batch. The batch→files manifest is
    * persisted under the checkpoint (one file per batch, written
    * tmp+rename, FileStreamSourceLog-style), so a restarted query
    * resumes from the committed offset without dropping or replaying
    * files: already-assigned batches reload with their original numbers
    * and `seen` set, and new files get fresh batch numbers above the
    * recovered high-water mark. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new AvroMicroBatchStream(required, options, confEntries,
      checkpointLocation)
}

case class AvroBatchOffset(batch: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = batch.toString
}

class AvroMicroBatchStream(required: StructType,
    options: Map[String, String], confEntries: Map[String, String],
    checkpointLocation: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val seen = scala.collection.mutable.HashSet.empty[String]
  private val batches =
    scala.collection.mutable.Map.empty[Int, Seq[(String, Long)]]
  private var lastBatch = 0

  // Durable manifest: <checkpoint>/graft-avro-manifest/<batch> holds one
  // "len<TAB>path" line per file of that batch. Recovery replays it so a
  // restart neither re-assigns committed batch numbers to new files
  // (which silently dropped them) nor reprocesses committed files.
  private val conf = AvroContainerSource.confFrom(confEntries)
  private val manifestDir =
    new org.apache.hadoop.fs.Path(checkpointLocation, "graft-avro-manifest")
  private val mfs = manifestDir.getFileSystem(conf)
  if (mfs.exists(manifestDir)) {
    mfs.listStatus(manifestDir).map(_.getPath)
      .filter(_.getName.forall(_.isDigit)).foreach { p =>
        val b = p.getName.toInt
        val in = mfs.open(p)
        val text = try {
          val bos = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
          new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        val files = text.split("\n").iterator.filter(_.nonEmpty).map { line =>
          val Array(len, path) = line.split("\t", 2)
          (path, len.toLong)
        }.toSeq
        batches(b) = files
        seen ++= files.map(_._1)
        if (b > lastBatch) lastBatch = b
      }
  }

  private def persistBatch(b: Int, files: Seq[(String, Long)]): Unit = {
    mfs.mkdirs(manifestDir)
    val tmp = new org.apache.hadoop.fs.Path(manifestDir, s".$b.tmp")
    val out = mfs.create(tmp, true)
    try out.write(files.map { case (p, len) => s"$len\t$p\n" }.mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new org.apache.hadoop.fs.Path(manifestDir, b.toString)
    if (!mfs.rename(tmp, dest)) {
      mfs.delete(tmp, false)
      throw new java.io.IOException(s"cannot persist batch manifest $dest")
    }
  }

  private def listNow(): Seq[(String, Long)] =
    AvroContainerSource.listFiles(
      new CaseInsensitiveStringMap(options.asJava))

  override def initialOffset(): Offset = AvroBatchOffset(0)

  // Trigger.AvailableNow: snapshot the listing once; latestOffset is
  // then pinned to that batch so the query drains exactly the files
  // present at start and terminates — files landing mid-run wait for
  // the next invocation (incremental-batch semantics).
  private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    assignFreshBatch()
    availableNowCap = Some(lastBatch)
  }

  private def assignFreshBatch(cap: Int = Int.MaxValue): Unit = {
    val fresh = listNow().filterNot(f => seen.contains(f._1)).take(cap)
    if (fresh.nonEmpty) {
      lastBatch += 1
      persistBatch(lastBatch, fresh)
      batches(lastBatch) = fresh
      seen ++= fresh.map(_._1)
    }
  }

  override def latestOffset(): Offset = synchronized {
    availableNowCap match {
      case Some(cap) => AvroBatchOffset(cap)
      case None =>
        assignFreshBatch()
        AvroBatchOffset(lastBatch)
    }
  }

  // Admission control: `maxfilespertrigger` bounds how many new files a
  // micro-batch admits — the backpressure knob for a directory that
  // fills faster than one batch can drain. (AvailableNow snapshots
  // everything into its single final batch instead.)
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit = {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    options.get("maxfilespertrigger")
      .map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())
  }

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = synchronized {
    import org.apache.spark.sql.connector.read.streaming.ReadMaxFiles
    availableNowCap match {
      case Some(cap) => AvroBatchOffset(cap)
      case None =>
        val cap = limit match {
          case mf: ReadMaxFiles => mf.maxFiles()
          case _ => Int.MaxValue
        }
        assignFreshBatch(cap)
        AvroBatchOffset(lastBatch)
    }
  }

  override def deserializeOffset(json: String): Offset =
    AvroBatchOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[AvroBatchOffset].batch
    val e = end.asInstanceOf[AvroBatchOffset].batch
    // hive partition columns surface in streaming reads too — without
    // the parsed values every path-derived column would stream as NULL
    val hive = options.getOrElse("hivepartitions", "false").toBoolean
    val root = options.getOrElse("path", "")
    ((s + 1) to e).flatMap(b => batches.getOrElse(b, Nil))
      .map { case (p, len) =>
        val pv =
          if (hive) AvroContainerSource.hivePartitionValues(root, p) else Nil
        AvroFilePartition(p, 0L, len, pv)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(required, options, -1, confEntries)
}

case class AvroReaderFactory(required: StructType,
    options: Map[String, String], limit: Int, confEntries: Map[String, String])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[AvroFilePartition]
    new AvroPartitionReader(part, required, options, limit, confEntries)
  }
}

/** Reads one byte range of one container file: header parse (B1), block
  * iteration + decompression + datum decode (B2-B4) via avro's
  * DataFileReader; applies offset (B5), limit (B6), and seeded Bernoulli
  * sampling (B7). Range semantics: `sync(start)` skips to the first block
  * at or after `start`, `pastSync(end)` stops after the last block
  * starting before `end` — so arbitrary byte splits never duplicate or
  * drop a block. For split files, offset/limit are per-range bounds. */
class AvroPartitionReader(part: AvroFilePartition, required: StructType,
    options: Map[String, String], pushedLimit: Int,
    confEntries: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val conf = AvroContainerSource.confFrom(confEntries)
  private val offset = options.getOrElse("offset", "0").toLong
  private val optLimit = options.get("limit").map(_.toLong).getOrElse(Long.MaxValue)
  private val maxRows =
    if (pushedLimit >= 0) math.min(pushedLimit.toLong, optLimit) else optLimit
  private val samplerate = options.getOrElse("samplerate", "1.0").toDouble
  private val failfast =
    options.getOrElse("mode", "failfast").toLowerCase != "permissive"
  private val rng = new java.util.Random(
    options.getOrElse("seed", "42").toLong ^
      scala.util.hashing.MurmurHash3.stringHash(part.path).toLong ^ part.start)

  private val hp = new Path(part.path)
  private val in = new HadoopSeekableInput(hp.getFileSystem(conf), hp)
  private val datumReader = new GenericDatumReader[GenericRecord]()
  private val reader =
    new org.apache.avro.file.DataFileReader[GenericRecord](in, datumReader)
  // Three sources feed a required column: the decoded record, a hive
  // partition value from the path, or NULL when the column was added
  // after this file was written (add-column schema evolution — old
  // files null-fill instead of failing the resolver).
  private val partVals: Map[String, String] = part.partitionValues.toMap
  // precedence per required field: decoded record field if the writer
  // schema has it (a record field shadowing a path key wins — matches
  // inferSchema's dedup), else hive path constant, else evolution null
  // Field lookup is name-then-alias (SchemaConverter.resolveField):
  // rename evolution means a required field can live in this file's
  // writer schema under a FORMER name carried by the field's
  // `avro.aliases` metadata.
  private def writerField(f: StructField): Schema.Field =
    SchemaConverter.resolveField(reader.getSchema, f)
  private val availableStruct = StructType(required.fields
    .filter(f => writerField(f) != null))
  // Reader-schema projection = column pruning inside the decoder —
  // pruned by the WRITER-side names (an alias-resolved field keeps its
  // old name inside this file).
  private val projected: Schema =
    if (availableStruct.fieldNames.length == reader.getSchema.getFields.size())
      reader.getSchema
    else SchemaConverter.prune(reader.getSchema,
      availableStruct.fields.map(f => writerField(f).name).toSeq)
  datumReader.setExpected(projected)
  private val convert = AvroDatum.rowReader(projected, availableStruct)
  // required index → availableStruct index (-1 = constant: partition
  // value or evolution null)
  private val recIdx: Array[Int] = {
    var j = 0
    required.fields.map { f =>
      if (writerField(f) == null) -1
      else { val i = j; j += 1; i }
    }
  }
  private val consts: Array[AnyRef] = required.fields.map { f =>
    partVals.get(f.name)
      // the hive default-partition token round-trips back to NULL, so
      // the surfaced column and IsNotNull pushdown agree on nullness
      .filter(_ != "__HIVE_DEFAULT_PARTITION__")
      .map(v => org.apache.spark.unsafe.types.UTF8String.fromString(v)
        .asInstanceOf[AnyRef]).orNull
  }
  /** Splice decoded fields and constants into the required order. */
  private def assemble(rec: InternalRow): InternalRow = {
    if (availableStruct.length == required.length) return rec
    val out = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      if (recIdx(i) < 0) out.update(i, consts(i))
      else out.update(i, rec.get(recIdx(i), required.fields(i).dataType))
      i += 1
    }
    out
  }
  if (part.start > 0L) reader.sync(part.start)

  private var current: InternalRow = _
  private var emitted = 0L
  private var skipped = 0L
  private var dead = false

  override def next(): Boolean = {
    if (dead || emitted >= maxRows) return false
    try {
      while (reader.hasNext && !reader.pastSync(part.end)) {
        val rec = reader.next()
        if (skipped < offset) { skipped += 1 }
        else if (samplerate >= 1.0 || rng.nextDouble() < samplerate) {
          current = assemble(convert(rec))
          emitted += 1
          return true
        }
      }
      false
    } catch {
      // Avro decode corruption surfaces as AvroRuntimeException as often
      // as IOException — wrap every failure with the file path so a
      // 10,000-file scan names its corrupt member.
      case e: Exception if !failfast => dead = true; false
      case e: Exception => throw new java.io.IOException(
        s"corrupt avro container ${part.path}: ${e.getMessage}", e)
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = { try reader.close() finally in.close() }
}
