package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-stage profiler — the headless stand-in for the Spark UI
  * stage page (optimization guide §7.1): runs ONE registered query under
  * the bench's exact session config with a listener recording every
  * stage's wall/CPU/shuffle/input metrics, then prints the stages sorted
  * by executor run time plus the job count. This is how a per-query
  * number from BENCH_FULL.json gets decomposed into "which stage, and is
  * it compute, shuffle or scheduling".
  *
  * `sbt "runMain graft.StageProbe q_graph_pagerank /root/testdata/sf0.1 2"`
  * (the optional trailing arg = number of timed repetitions; rep 1 warms
  * codegen/caches so rep 2 isolates steady-state cost).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val id = args.headOption.getOrElse("q_agg_group")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).getOrElse("1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARFIRST", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    final case class St(name: String, tasks: Int, runMs: Long, cpuMs: Long,
        shRead: Long, shWrite: Long, input: Long, gcMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(St(si.name.takeWhile(_ != '\n').take(70), si.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          m.jvmGCTime))
        ()
      }
    }

    val verbose = sys.env.get("SPARK_GRAFT_PROBE_QUIET").isEmpty
    id.split(",").map(_.trim).filter(_.nonEmpty).foreach { qid =>
      val fn = SparkEntry.queries(qid)
      var best = Double.MaxValue
      for (rep <- 1 to reps) {
        stages.clear(); jobs.set(0)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        best = math.min(best, wall)
        spark.catalog.clearCache()
        // Drain the async listener bus before reading the queue (ADVICE
        // r15: a fixed sleep races under load). listenerBus.waitUntilEmpty
        // is private[spark], so poll until the stage count is stable for
        // two consecutive 100 ms samples (2 s cap).
        locally {
          var last = -1; var stable = 0; var waited = 0
          while (stable < 2 && waited < 2000) {
            Thread.sleep(100); waited += 100
            val n = stages.size()
            if (n == last) stable += 1 else { stable = 0; last = n }
          }
        }
        spark.sparkContext.removeSparkListener(listener)
        import scala.jdk.CollectionConverters._
        val ss = stages.asScala.toSeq.sortBy(-_.runMs)
        println(f"== $qid rep $rep: wall $wall%.3f s, rows $n, " +
          s"jobs ${jobs.get()}, stages ${ss.size}")
        if (verbose) {
          println(f"${"runMs"}%7s ${"cpuMs"}%7s ${"gcMs"}%5s ${"tasks"}%5s " +
            f"${"shRead"}%9s ${"shWrite"}%9s ${"input"}%9s  name")
          ss.take(25).foreach { s =>
            println(f"${s.runMs}%7d ${s.cpuMs}%7d ${s.gcMs}%5d " +
              f"${s.tasks}%5d ${s.shRead}%9d ${s.shWrite}%9d " +
              f"${s.input}%9d  ${s.name}")
          }
          val totRun = ss.map(_.runMs).sum; val totCpu = ss.map(_.cpuMs).sum
          println(f"   totals: runMs $totRun cpuMs $totCpu " +
            f"(wall x cores = ${wall * cpus.toInt * 1000}%.0f ms)")
        }
      }
      println(f"## $qid best $best%.3f s over $reps reps")
    }
    spark.stop()
  }
}
