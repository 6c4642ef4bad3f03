package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev-only: capture the ROUND-BODY physical plans of an iterative
  * query — the per-round `localCheckpoint` executions — as they
  * actually ran (VERDICT r15 item 7: the final `explain` of a fixpoint
  * query is checkpoint-truncated, so join strategy / exchange counts
  * per round were invisible in the r15 plan dumps).
  *
  * Registers a QueryExecutionListener, runs the query once, and writes
  * every distinct checkpoint/collect execution's formatted plan (AQE
  * final) into ONE file, deduplicated by plan shape — an iterative
  * driver re-executes the same round body N times, so the file shows
  * each DISTINCT shape once with its occurrence count.
  *
  * `tools/jrun.sh graft.RoundPlanDump q_graph_pagerank_fixpoint after \
  *    /root/testdata/sf0.1 plans/r16` →
  * plans/r16/q_graph_pagerank_fixpoint_roundbody_after.txt
  */
object RoundPlanDump {
  def main(args: Array[String]): Unit = {
    val ids = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = args.lift(1).getOrElse("after")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(3).getOrElse("plans/r16")
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

    final case class Cap(funcName: String, plan: String)
    val caps = new java.util.concurrent.ConcurrentLinkedQueue[Cap]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        caps.add(Cap(funcName, qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))))
        ()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }

    ids.foreach { id =>
      caps.clear()
      spark.listenerManager.register(listener)
      val df = SparkEntry.queries(id)(spark, sfDir)
      df.collect()
      spark.catalog.clearCache()
      // the listener bus is async — poll until the capture count is
      // stable (same discipline as StageProbe)
      locally {
        var last = -1; var stable = 0; var waited = 0
        while (stable < 2 && waited < 4000) {
          Thread.sleep(100); waited += 100
          val n = caps.size()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
      }
      spark.listenerManager.unregister(listener)
      import scala.jdk.CollectionConverters._
      val all = caps.asScala.toSeq
      // Dedup by a normalized shape: strip expression ids / RDD ids /
      // stage ids / size stats so the N executions of one round body
      // collapse to one exemplar with a count.
      def norm(p: String): String = p
        .replaceAll("#\\d+[L]?", "#_")
        .replaceAll("\\[id=#\\d+\\]", "[id=#_]")
        .replaceAll("\\[plan_id=\\d+\\]", "[plan_id=_]")
        .replaceAll("MapPartitionsRDD\\[\\d+\\]", "MapPartitionsRDD[_]")
        .replaceAll("ExistingRDD\\[[^\\]]*\\]", "ExistingRDD[_]")
        .replaceAll("Scan ExistingRDD\\w*", "Scan ExistingRDD")
        .replaceAll("\\(\\d+\\)", "(_)")
        .replaceAll("rdd_\\d+", "rdd__")
        .replaceAll("Statistics\\([^)]*\\)", "Statistics(_)")
        .replaceAll("Observation\\w*", "Observation_")
        .replaceAll("graft_obs_[0-9a-f-]+", "graft_obs__")
        .replaceAll("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-" +
          "[0-9a-f]{12}", "_uuid_")
      val groups = all.groupBy(c => (c.funcName, norm(c.plan)))
        .toSeq.sortBy(-_._2.size)
      val sb = new StringBuilder
      sb ++= s"== $id round-body plans ($suffix) over $sfDir ==\n"
      sb ++= s"== ${all.size} action executions captured; " +
        s"${groups.size} distinct shapes ==\n\n"
      groups.foreach { case ((fn, _), cs) =>
        sb ++= s"---- shape x${cs.size} (action: $fn) ----\n"
        sb ++= cs.head.plan
        sb ++= "\n\n"
      }
      Files.writeString(
        Paths.get(s"$outDir/${id}_roundbody_$suffix.txt"), sb.toString)
      println(s"[roundplandump] $id -> " +
        s"$outDir/${id}_roundbody_$suffix.txt (${all.size} execs, " +
        s"${groups.size} shapes)")
    }
    spark.stop()
  }
}
