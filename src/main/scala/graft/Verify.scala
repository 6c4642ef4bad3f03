package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // If events.ts is parquet TIMESTAMP(NANOS), read as long epoch-nanos
      // (no-op for micros/ntz generations; see Tables.tsMicros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec's "No Partition Defined" warning fires hundreds of
    // times across the dump and buries real warnings (VERDICT r13).
    // Every unpartitioned window on a data path is individually
    // whitelisted by WindowAuditSpec as a bounded-aggregate window, so
    // the blanket warning carries no signal HERE — suppress just that
    // logger, leaving all other WARNs visible.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // dev filter (comma-separated ids, env or optional 3rd arg — the
    // arg form survives the sbt thin client, whose daemon does not see
    // the client's environment) — the driver never sets either
    val only = args.lift(2).orElse(sys.env.get("SPARK_GRAFT_VERIFY_ONLY"))
      .map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-op cache isolation: no query-body persist outlives its op
        // (VERDICT r9 — CacheManager entries otherwise accumulate across
        // the 346-op dump and leak into later queries' plans)
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Emit an explicit error-marker result instead of omitting the id:
        // a broken query then surfaces as a red (schema/hash-mismatch) row
        // in the driver's compare, not a silently missing key — a repo-wide
        // schema break reads as N red rows, not a shorter report.
        try {
          import spark.implicits._
          Seq((e.getClass.getName, String.valueOf(e.getMessage).take(500)))
            .toDF("graft_verify_err_class", "graft_verify_err_message")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name error-marker write failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
