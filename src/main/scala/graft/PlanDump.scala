package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `explain("formatted")` (AQE-final, post-execution)
  * for a comma-separated id list into per-query files — the r15
  * optimization round's before/after plan evidence.
  *
  * `sbt "runMain graft.PlanDump q_graph_pagerank,q_graph_cc before \
  *      /root/testdata/sf0.1 plans/r15"`
  * writes plans/r15/q_graph_pagerank_before.txt etc.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val ids = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = args.lift(1).getOrElse("before")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(3).getOrElse("plans/r15")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    ids.foreach { id =>
      val df = SparkEntry.queries(id)(spark, sfDir)
      df.collect() // finalize AQE so join strategy / codegen spans are real
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${id}_$suffix.txt"),
        s"== $id ($suffix) over $sfDir ==\n\n" + plan)
      spark.catalog.clearCache()
      println(s"[plandump] $id -> $outDir/${id}_$suffix.txt")
    }
    spark.stop()
  }
}
