package graft.repair

import org.apache.spark.sql.SparkSession

/** CLI entry mirroring the reference's pipeline
  * (`/root/reference/src/app.ts` → `RepairAvro.process()`), Spark-native:
  *
  * {{{
  *   spark-submit --class graft.repair.RepairMain app.jar <dir> [--replace] \
  *     [--quarantine <dir>]
  * }}}
  *
  * The reference's interactive prompt (A3) becomes CLI args; its YAML
  * knobs (`spec.avro.limit` / `spec.avro.samplerate`,
  * `resources/application.yml:6-7`) become Spark conf:
  * `spark.graft.limit`, `spark.graft.samplerate`, `spark.graft.seed`.
  * Output is the per-file report plus the B13 status summary — real
  * data, not log lines. */
object RepairMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: RepairMain <dir> [--replace] [--quarantine <dir>] " +
        "[--recover all|prior|after]")
    val dir = args(0)
    val replace = args.contains("--replace")
    val quarantine = args.sliding(2).collectFirst {
      case Array("--quarantine", q) => q
    }
    val recover = args.sliding(2).collectFirst {
      case Array("--recover", m) => m
    }.getOrElse("all")

    val spark = SparkSession.builder()
      .appName("graft-avro-repair")
      // spark-submit injects spark.master as a system property; direct
      // JVM launches fall back to all local cores
      .config("spark.master", sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val limit = spark.conf.get("spark.graft.limit", "1000000").toLong
    val samplerate = spark.conf.get("spark.graft.samplerate", "0.01").toDouble
    val seed = spark.conf.get("spark.graft.seed", "42").toLong

    // Reference A1: refuse to start when the S3 target can't work —
    // missing connector jar or credentials fail here, not mid-listing.
    S3ACheck.validate(
      spark.sessionState.newHadoopConf(), dir)

    // A7's progress bar, Spark-native: named accumulators tick live in
    // the UI/REST API while the distributed repair runs.
    val progress = new RepairPipeline.Progress(spark)
    val report = RepairPipeline.run(spark, dir, replace = replace,
      quarantineDir = quarantine, limit = limit, samplerate = samplerate,
      seed = seed, recoverMode = recover, progress = Some(progress))
    report.orderBy("path").collect().foreach { r =>
      println(s"""{"path":"${r.path}","status":"${r.status}","scanned":${r.recordsScanned},"recovered":${r.recordsRecovered},"resyncs":${r.resyncs}}""")
    }
    RepairPipeline.summary(report).collect().sortBy(_._1).foreach {
      case (status, n) => println(s"""{"summary":"$status","files":$n}""")
    }
    progress.counts.toSeq.sortBy(_._1).filter(_._2 > 0).foreach {
      case (status, n) => println(s"""{"progress":"$status","files":$n}""")
    }
    spark.stop()
  }
}
