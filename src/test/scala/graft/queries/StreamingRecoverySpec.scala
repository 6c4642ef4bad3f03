package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery contract for stateful streaming: a query stopped
  * mid-stream and RESTARTED as a fresh query over the same checkpoint
  * must (a) restore its aggregation state from the state store — totals
  * continue from where they left off, not from zero — and (b) not
  * re-read already-committed input files. This is the production
  * restart path (deploys, crashes, rebalances) that none of the
  * in-flight MemoryStream specs exercise, because MemoryStream offsets
  * die with the instance; a file source's offsets are durable. */
class StreamingRecoverySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stateful counts survive a stop + fresh-query restart from the " +
      "same checkpoint; committed files are not reprocessed") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-recov-in").toString
    val out = Files.createTempDirectory("graft-recov-out").toString
    val ckpt = Files.createTempDirectory("graft-recov-ckpt").toString
    val schema = Seq(("a", 1L)).toDF("k", "v").schema

    // memory sinks refuse checkpoint recovery, so the durable-restart
    // path goes through foreachBatch → parquet (batch id recorded);
    // foreachBatch recovers both offsets and state-store contents
    def startQuery() =
      spark.readStream.schema(schema).parquet(in)
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            batch.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

    // batch 1: a=2 rows, b=1 row
    Seq(("a", 1L), ("a", 2L), ("b", 10L)).toDF("k", "v")
      .write.mode("append").parquet(in)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    def emissions() = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("k"),
        r.getAs[Long]("n"), r.getAs[Long]("sv"))).toSet
    val after1 = emissions()
    assert(after1 == Set((0L, "a", 2L, 3L), (0L, "b", 1L, 10L)),
      s"pre-restart emissions wrong: $after1")

    // batch 2 lands while no query is running; then a FRESH query
    // resumes from the same checkpoint
    Seq(("a", 100L), ("c", 7L)).toDF("k", "v")
      .write.mode("append").parquet(in)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val after2 = emissions() -- after1

    // 'a' continues from the RESTORED state (2+1 rows, 3+100 sum);
    // 'c' is new; 'b' was untouched by batch 2, so update mode emits
    // nothing for it — which also proves batch-1 files weren't re-read
    assert(after2 == Set((1L, "a", 3L, 103L), (1L, "c", 1L, 7L)),
      s"post-restart emissions wrong: $after2")
  }
}
