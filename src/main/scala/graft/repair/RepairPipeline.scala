package graft.repair

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.avro.{AvroContainerSource, Salvage}

/** Per-file repair outcome — the reference only ever *logs* this
  * (`repair-avro.ts:58,61,64`); the engine materializes it as a queryable
  * Dataset (SURVEY §2.B B12-B13). */
final case class FileRepairReport(
    path: String,
    status: String, // valid | repaired | repaired_replaced | unrepairable | error
    length: Long,
    recordsScanned: Long,
    recordsRecovered: Long,
    resyncs: Long,
    error: String)

/** The reference's whole pipeline, Spark-native (SURVEY §3.4):
  *
  *   list prefix → per file: sampled validate → if corrupt: salvage →
  *   re-validate → swap-in (optional) → report row
  *
  * vs the reference (`/root/reference/src/services/repair-avro.ts:36-76`):
  *  - listing is fully paginated (A4 fixed: no 1000-object cap);
  *  - files are processed as distributed tasks, not a sequential loop
  *    (A8: one file = one task, no shuffle — embarrassingly parallel, so
  *    this scales linearly with executors at 100 TB);
  *  - executors stream bytes via the FileSystem API — no whole-object
  *    driver buffering (A9) and no avro-tools JVM forks (3 per corrupt
  *    file in the reference);
  *  - an error on one file becomes a report row, not an abort of the
  *    whole run (A18 is a defect at scale);
  *  - repaired output is committed temp→validate→rename (A13-A15), and
  *    `replace=false` leaves originals untouched with repaired copies in
  *    `quarantineDir` (A16/A17 intended semantics — the reference's
  *    replace path is broken as written, see SURVEY A16).
  */
object RepairPipeline {

  /** Live per-status counters (reference A7's progress bar, Spark-native:
    * `LongAccumulator`s tick on the driver UI/REST API *while* the
    * distributed repair runs, where the report Dataset only exists at the
    * end). Retried tasks can over-count accumulators in general; `run`
    * executes the pipeline exactly once behind a persist, so on a healthy
    * run the counts equal the report's group-by (asserted in tests). */
  final class Progress(spark: SparkSession) extends Serializable {
    val statuses: Seq[String] = Seq("valid", "repaired", "repaired_replaced",
      "repaired_borrowed", "repaired_borrowed_replaced",
      "unrepairable", "error")
    private val acc = statuses.map(st =>
      st -> spark.sparkContext.longAccumulator(s"graft.repair.$st")).toMap
    private[repair] def record(status: String): Unit =
      acc.get(status).foreach(_.add(1L))
    def counts: Map[String, Long] =
      acc.map { case (st, a) => st -> a.value }
  }

  def run(spark: SparkSession, dir: String,
      replace: Boolean = false,
      quarantineDir: Option[String] = None,
      limit: Long = 1000000L,
      samplerate: Double = 0.01,
      seed: Long = 42L,
      recoverMode: String = "all",
      borrowSchema: Boolean = false,
      progress: Option[Progress] = None): Dataset[FileRepairReport] = {
    import spark.implicits._

    val files = AvroContainerSource.listFiles(dir)
    val confEntries = AvroContainerSource.serializableConfEntries()
    val parallelism = math.max(1,
      math.min(files.size, spark.sparkContext.defaultParallelism * 4))

    val report = spark.createDataset(files)
      .repartition(parallelism) // one file ≈ one task; no skew from dir order
      .mapPartitions { it =>
        val conf = AvroContainerSource.confFrom(confEntries)
        it.map { case (pathStr, len) =>
          val r = processOne(conf, pathStr, len, replace, quarantineDir,
            limit, samplerate, seed, rootDir = dir,
            recoverMode = recoverMode, borrowSchema = borrowSchema)
          progress.foreach(_.record(r.status))
          r
        }
      }
    // Repair mutates files (replace=true): the pipeline must execute
    // exactly once. Without this, any downstream orderBy's range-sampling
    // pass runs the repair, and the "real" pass then re-processes the
    // already-repaired files (observed: every status degraded to 'valid').
    report.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    report.count()
    report
  }

  private[repair] def processOne(conf: org.apache.hadoop.conf.Configuration,
      pathStr: String, len: Long, replace: Boolean,
      quarantineDir: Option[String], limit: Long, samplerate: Double,
      seed: Long, rootDir: String = "",
      recoverMode: String = "all",
      borrowSchema: Boolean = false): FileRepairReport = {
    val path = new Path(pathStr)
    try {
      val fs = path.getFileSystem(conf)
      val v = Salvage.validate(fs, path, limit, samplerate, seed)
      if (v.valid)
        return FileRepairReport(pathStr, "valid", len, v.recordsScanned, 0L, 0L, null)

      // Corrupt: salvage to a temp sibling (key by full path — the
      // reference keys by basename and collides across prefixes, A9).
      val tmp = new Path(path.getParent,
        s".repaired-${path.getName}-${java.util.UUID.randomUUID()}")
      val s = Salvage.salvage(fs, path, Some(tmp), mode = recoverMode)
      if (s.status == "unrepairable") {
        fs.delete(tmp, false)
        // Opt-in last resort for the one class block salvage can't touch:
        // an unreadable HEADER. Borrow schema+codec from a same-directory
        // sibling (same partition ⇒ same writer generation with high
        // probability) and resync on the file's own trailing marker.
        if (borrowSchema && s.error != null && s.error.startsWith("header")) {
          donorHeader(fs, path) match {
            case Some((donorPath, donorSchema, donorCodec)) =>
              val s2 = Salvage.salvageBorrowed(fs, path, donorSchema,
                donorCodec, Some(tmp), recoverMode)
              if (s2.status != "unrepairable")
                return commit(fs, path, pathStr, len, tmp, replace,
                  quarantineDir, rootDir, v.recordsScanned, s2,
                  limit, samplerate, seed, borrowed = true,
                  note = s"donor=$donorPath")
              fs.delete(tmp, false)
              return FileRepairReport(pathStr, "unrepairable", len,
                v.recordsScanned, 0L, s2.resyncs,
                s"${s.error}; ${s2.error}")
            case None =>
              return FileRepairReport(pathStr, "unrepairable", len,
                v.recordsScanned, 0L, s.resyncs,
                s"${s.error}; borrow: no readable sibling header")
          }
        }
        return FileRepairReport(pathStr, "unrepairable", len,
          v.recordsScanned, 0L, s.resyncs, s.error)
      }
      commit(fs, path, pathStr, len, tmp, replace, quarantineDir, rootDir,
        v.recordsScanned, s, limit, samplerate, seed, borrowed = false,
        note = null)
    } catch {
      case e: Exception =>
        FileRepairReport(pathStr, "error", len, 0L, 0L, 0L,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Re-validate (A14) and commit a salvaged temp: in-place swap (A15,
    * crash-safe via .bak parking) or quarantine mirror — shared by the
    * block-salvage and borrowed-header paths so the two can't drift. */
  private def commit(fs: org.apache.hadoop.fs.FileSystem, path: Path,
      pathStr: String, len: Long, tmp: Path, replace: Boolean,
      quarantineDir: Option[String], rootDir: String, recordsScanned: Long,
      s: Salvage.SalvageResult, limit: Long, samplerate: Double, seed: Long,
      borrowed: Boolean, note: String): FileRepairReport = {
    val rv = Salvage.validate(fs, tmp, limit, samplerate, seed)
    if (!rv.valid) {
      fs.delete(tmp, false)
      return FileRepairReport(pathStr, "unrepairable", len,
        recordsScanned, s.recordsRecovered, s.resyncs,
        s"revalidate failed: ${rv.error}")
    }
    val base = if (borrowed) "repaired_borrowed" else "repaired"
    val prefix = Option(note).map(n => s"$n ").getOrElse("")
    if (replace) {
      // A15 swap, crash-safe: park the original under a .bak name
      // first so no moment exists where the only copy of the data is
      // a hidden temp (delete-then-rename would lose the file if the
      // executor died between the two calls).
      val bak = new Path(path.getParent, s".bak-${path.getName}")
      fs.delete(bak, false)
      fs.rename(path, bak)
      if (fs.rename(tmp, path)) fs.delete(bak, false)
      else { fs.rename(bak, path); throw new java.io.IOException(
        s"swap failed for $pathStr; original restored") }
      FileRepairReport(pathStr, s"${base}_replaced", len,
        recordsScanned, s.recordsRecovered, s.resyncs,
        Option(note).orNull)
    } else {
      val dest = quarantineDir match {
        case Some(q) =>
          // Mirror the path relative to the scanned root under the
          // quarantine dir: listing is recursive, so keying by basename
          // alone would collide (and silently overwrite) when two
          // corrupt files share a name in different subdirectories —
          // the same defect the reference has across prefixes (A9).
          val d = new Path(q, relativeTo(rootDir, path))
          fs.mkdirs(d.getParent); fs.delete(d, false); fs.rename(tmp, d); d
        case None => tmp
      }
      FileRepairReport(pathStr, base, len, recordsScanned,
        s.recordsRecovered, s.resyncs, s"${prefix}repaired_copy=$dest")
    }
  }

  /** First readable sibling header (same directory = same partition):
    * (path, schema, codec). Bounded probe — dot-temps and the file
    * itself excluded, deterministic name order, ≤8 attempts. */
  private def donorHeader(fs: org.apache.hadoop.fs.FileSystem, path: Path)
      : Option[(Path, org.apache.avro.Schema, String)] = {
    val sibs =
      try fs.listStatus(path.getParent).filter(_.isFile).map(_.getPath)
        .filter(p => p != path && !p.getName.startsWith("."))
        .sortBy(_.getName).take(8)
      catch { case _: Exception => Array.empty[Path] }
    sibs.iterator.flatMap { p =>
      try {
        val in = new graft.avro.HadoopSeekableInput(fs, p)
        try {
          val r = new org.apache.avro.file.DataFileReader[AnyRef](in,
            new org.apache.avro.generic.GenericDatumReader[AnyRef]())
          val h = (p, r.getSchema,
            Option(r.getMetaString("avro.codec")).getOrElse("null"))
          r.close()
          Some(h)
        } finally in.close()
      } catch { case _: Exception => None }
    }.take(1).toList.headOption
  }

  /** Path of `path` relative to the scanned root, for mirroring the
    * source tree under the quarantine dir — delegates to the shared
    * relativization in AvroContainerSource so the two call sites can't
    * drift. */
  private[repair] def relativeTo(rootDir: String, path: Path): String =
    graft.avro.AvroContainerSource.relativePath(rootDir, path)

  /** B13: the run summary the reference reduces to log lines. */
  def summary(report: Dataset[FileRepairReport]): Dataset[(String, Long)] = {
    import report.sparkSession.implicits._
    report.groupByKey(_.status).count()
  }
}
