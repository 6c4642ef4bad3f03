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

  test("left-outer stream-stream join survives a restart: committed " +
      "matches and null-pads are not re-emitted; a pending impression " +
      "null-pads exactly once after the restart") {
    import spark.implicits._
    val impDir = Files.createTempDirectory("graft-jo-imp").toString
    val clkDir = Files.createTempDirectory("graft-jo-clk").toString
    val out = Files.createTempDirectory("graft-jo-out").toString
    val ckpt = Files.createTempDirectory("graft-jo-ckpt").toString
    val t0 = StreamingQ.t0
    def rows(evs: (Long, Long)*) = evs.map { case (id, off) =>
      (id, new java.sql.Timestamp((t0 + off) * 1000L)) }
      .toDF("event_id", "ts")
    val schema = rows((0L, 0L)).schema

    def startQuery() = {
      val impDf = spark.readStream.schema(schema).parquet(impDir)
        .select(col("event_id").as("ad_id"), col("ts").as("imp_ts"))
        .withWatermark("imp_ts", "10 minutes")
      val clkDf = spark.readStream.schema(schema).parquet(clkDir)
        .select(col("event_id").as("c_ad_id"), col("ts").as("clk_ts"))
        .withWatermark("clk_ts", "10 minutes")
      impDf.join(clkDf, expr("ad_id = c_ad_id AND clk_ts BETWEEN imp_ts " +
          "AND imp_ts + INTERVAL 10 MINUTES"), "left_outer")
        .select(col("ad_id"), unix_micros(col("imp_ts")).as("imp_us"),
          unix_micros(col("clk_ts")).as("clk_us"))
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            batch.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    def emissions() =
      try spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      catch { case _: Throwable => Seq.empty } // out empty before batch 0
    val usBase = t0 * 1000000L
    def us(off: Long) = usBase + off * 1000000L

    // run 1, phase A: impressions 1/2/3 + the in-window click for 1
    rows((1L, 0L), (2L, 60L), (3L, 120L))
      .write.mode("append").parquet(impDir)
    rows((1L, 300L)).write.mode("append").parquet(clkDir)
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      // phase B: a late pair drags the watermark to +3600s −> 2/3 have
      // passed their windows; impression 5 (+4100s) stays PENDING (its
      // window is still open under watermark 3600)
      rows((9L, 4000L), (5L, 4100L)).write.mode("append").parquet(impDir)
      rows((9L, 4200L)).write.mode("append").parquet(clkDir)
      q1.processAllAvailable()
    } finally q1.stop()
    val s1 = emissions()
    assert(s1.distinct.size == s1.size, s"run-1 duplicate emission: $s1")
    assert(s1.contains((1L, us(0), Some(us(300)))) &&
      s1.contains((9L, us(4000), Some(us(4200)))), s"run-1 matches: $s1")
    assert(!s1.exists(_._1 == 5L), s"pending ad 5 emitted early: $s1")

    // run 2 from the same checkpoint: a far-future pair advances the
    // watermark past ad 5's window
    rows((10L, 8000L)).write.mode("append").parquet(impDir)
    rows((10L, 8300L)).write.mode("append").parquet(clkDir)
    val q2 = startQuery()
    val s2 = try {
      q2.processAllAvailable()
      // flush batch: runs under the advanced (+7700s) watermark so ad
      // 5's eviction can't be left pending on a no-data-batch race; ad
      // 11's own window stays open, so it must not emit
      rows((11L, 8400L)).write.mode("append").parquet(impDir)
      q2.processAllAvailable()
      emissions()
    } finally q2.stop()

    // exactly-once across the restart: the full multiset is each
    // expected row ONCE — nothing from run 1 was replayed, ad 5
    // null-padded exactly once, ad 10 matched immediately (matches are
    // emitted on arrival; only null-pads wait for the watermark), and
    // the unmatched flush ad 11 stays pending (its window is open)
    val expect = Seq(
      (1L, us(0), Some(us(300))),
      (2L, us(60), None),
      (3L, us(120), None),
      (5L, us(4100), None),
      (9L, us(4000), Some(us(4200))),
      (10L, us(8000), Some(us(8300))))
    assert(s2.sortBy(_._1) == expect,
      s"post-restart emissions: ${s2.sortBy(_._1)}")
    assert(s1.forall(s2.contains), s"run-1 rows lost on restart: $s1 / $s2")
  }
}
