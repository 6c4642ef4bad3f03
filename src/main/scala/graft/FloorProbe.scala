package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only first-run-floor decomposition (r16, VERDICT item 4): the
  * bench's 541 sub-2 s queries carry a ~0.3-0.6 s per-query "floor"
  * that is 73% of total bench time. This probe splits ONE cold query
  * execution — same session config as the bench — into its driver-side
  * and executor-side components so the floor stops being a guess:
  *
  *  - `phases`: QueryPlanningTracker ms (parsing/analysis/optimization/
  *    planning) summed over every QueryExecution the query triggers
  *    (iterative drivers plan many).
  *  - `codegen`: delta of CodegenMetrics (janino wall ms, generated
  *    bytecode bytes, compile count) — codegen cache misses are a pure
  *    first-run cost, warm reps hit the cache.
  *  - `exec`: sum of per-task executor run time / parallelism-adjusted
  *    (task time ÷ session cores = lower bound on unavoidable wall).
  *  - `sched`: tasks launched and total scheduler delay (launch→start).
  *  - residue: wall − phases − codegen − exec/cores ≈ job submission,
  *    AQE re-planning, action round trips.
  *
  * Run: `tools/jrun.sh graft.FloorProbe id1,id2 /root/testdata/sf0.1 2`
  * — rep 1 is the bench-like cold number; rep 2 shows which components
  * are first-run-only (codegen, parquet footer reads).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val ids = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).getOrElse("2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
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

    // same warmup as Bench: session-level one-time costs are not the
    // per-query floor under study
    spark.range(1 << 20).selectExpr("count(*)", "sum(id)").collect()
    for (tbl <- graft.queries.Tables.names)
      spark.read.parquet(s"$sfDir/$tbl.parquet").limit(1).collect()

    // planning-phase ms, summed over every QueryExecution this query
    // triggers (QueryPlanningTracker is per-execution; iterative
    // drivers and AQE create many executions per query)
    val phaseMs = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    val nExecs = new java.util.concurrent.atomic.AtomicInteger(0)
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def record(
          qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        nExecs.incrementAndGet()
        qe.tracker.phases.foreach { case (ph, summ) =>
          phaseMs.computeIfAbsent(ph,
            _ => new java.util.concurrent.atomic.AtomicLong(0))
            .addAndGet(summ.endTimeMs - summ.startTimeMs)
          ()
        }
      }
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = record(qe)
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = record(qe)
    }

    val taskRunMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskDeserMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskGcMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskResSerMs = new java.util.concurrent.atomic.AtomicLong(0)
    val nTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val nStages = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          nTasks.incrementAndGet()
          taskRunMs.addAndGet(m.executorRunTime)
          taskDeserMs.addAndGet(m.executorDeserializeTime)
          taskGcMs.addAndGet(m.jvmGCTime)
          taskResSerMs.addAndGet(m.resultSerializationTime)
        }
        ()
      }
    }

    import org.apache.spark.metrics.source.CodegenMetrics
    def cgTime = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
    def cgCount = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    // histograms expose count+mean, not sum — mean*count approximates
    // the total (exact when read at quiescence, as here)
    def cgBytes = {
      val h = CodegenMetrics.METRIC_GENERATED_CLASS_BYTECODE_SIZE
      (h.getSnapshot.getMean * h.getCount).toLong
    }

    println("id,rep,wall_ms,parsing,analysis,optimization,planning," +
      "n_execs,cg_n,cg_ms_est,cg_bytecode,exec_task_ms,deser_ms,gc_ms," +
      "tasks,jobs,stages")
    ids.foreach { qid =>
      val fn = SparkEntry.queries(qid)
      for (rep <- 1 to reps) {
        phaseMs.clear(); nExecs.set(0)
        taskRunMs.set(0); taskDeserMs.set(0); taskGcMs.set(0)
        taskResSerMs.set(0); nTasks.set(0); nJobs.set(0); nStages.set(0)
        val cgT0 = (cgCount, cgTime.getMean * cgCount, cgBytes,
          cgSourceBytes)
        spark.listenerManager.register(qeListener)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wallMs = (System.nanoTime() - t0) / 1e6
        spark.catalog.clearCache()
        // drain the async buses (poll-until-stable; see StageProbe)
        locally {
          var last = -1L; var stable = 0; var waited = 0
          while (stable < 2 && waited < 2000) {
            Thread.sleep(100); waited += 100
            val n = taskRunMs.get()
            if (n == last) stable += 1 else { stable = 0; last = n }
          }
        }
        spark.sparkContext.removeSparkListener(listener)
        spark.listenerManager.unregister(qeListener)
        def ph(n: String) =
          Option(phaseMs.get(n)).map(_.get()).getOrElse(0L)
        val cgN = cgCount - cgT0._1
        val cgMs = cgTime.getMean * cgCount - cgT0._2
        println(f"$qid,$rep,$wallMs%.0f,${ph("parsing")},${ph("analysis")}," +
          f"${ph("optimization")},${ph("planning")},${nExecs.get()}," +
          f"$cgN,$cgMs%.0f,${cgBytes - cgT0._3}," +
          f"${taskRunMs.get()},${taskDeserMs.get()},${taskGcMs.get()}," +
          f"${nTasks.get()},${nJobs.get()},${nStages.get()}")
      }
    }
    spark.stop()
  }
}
