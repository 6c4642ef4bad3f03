package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway r15 diagnosis main (deleted before round close): A/B the
  * per-round join shape of the pagerank loops — baseline SMJ (sorts the
  * cached edge table every round), pre-sorted persist (SMJ skips the
  * big-side sort), shuffle_hash build on the node table (no sorts). */
object ScratchDebug {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.queries.Tables._
    val s = spark

    def edges(): DataFrame = {
      val e0 = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("u"),
          (col("l_partkey") * 2 + 1).as("v"))
        .distinct()
      e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    }

    def run(tag: String, presort: Boolean, hintSh: Boolean): Unit = {
      val t0 = System.nanoTime()
      val base = edges().repartition(col("u"))
      val e = (if (presort) base.sortWithinPartitions(col("u")) else base)
        .persist()
      val deg = e.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val nn = deg.count()
      var r = deg.select(col("u"), lit(1.0 / nn).as("r"), col("deg"))
      for (_ <- 1 to 5) {
        val rr = if (hintSh) r.hint("shuffle_hash") else r
        val contrib = e.join(rr, "u")
          .select(col("v").as("u"),
            expr("CAST(floor(r * 1000000000000000.0 / CAST(deg AS DOUBLE))" +
              " AS BIGINT)").as("c"))
        val sums = contrib.groupBy(col("u")).agg(sum(col("c")).as("s"))
        val rk = r.select(col("u"), col("deg"))
        r = sums.join(if (hintSh) rk.hint("shuffle_hash") else rk, "u")
          .select(col("u"), (lit(0.15 / nn)
            + lit(0.85) * (col("s").cast("double") / lit(1000000000000000.0)))
            .as("r"), col("deg"))
          .localCheckpoint(true)
      }
      val chk = r.agg(sum(col("r"))).head.getDouble(0)
      e.unpersist()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"== $tag: $sec%.3f s (5 rounds, checksum $chk%.9f)")
    }

    // interleave for fairness against warmup drift
    for (rep <- 1 to 2) {
      run(s"baseline-smj rep$rep", presort = false, hintSh = false)
      run(s"presort-smj rep$rep", presort = true, hintSh = false)
      run(s"shuffle-hash rep$rep", presort = false, hintSh = true)
      run(s"presort+sh rep$rep", presort = true, hintSh = true)
    }
    spark.stop()
  }
}
