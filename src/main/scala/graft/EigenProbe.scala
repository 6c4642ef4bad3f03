package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the eigen-fixpoint stopping rule (the r13 PageRank
  * discipline applied to eigenvector centrality): run the shifted
  * power iteration capped at increasing round budgets and report when
  * the top-50 RANKING stops changing vs the converged (gate-driven)
  * run — the measured basis for the tolerance choice. */
object EigenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = queries.Tables.coPairCounts(spark, sfDir)
      .filter(col("cn") >= 2).select(col("u"), col("v"))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    def top50(maxRounds: Int, tol: Double): (Seq[Long], Int, Double) = {
      val t0 = System.nanoTime()
      val (r, rounds) = queries.Analytics94.eigenFixpoint(
        sym, tol = tol, maxRounds = maxRounds)
      val ids = r.orderBy(desc("r"), col("u")).limit(50)
        .collect().map(_.getLong(0)).toSeq
      (ids, rounds, (System.nanoTime() - t0) / 1e9)
    }
    val (ref, refRounds, refSec) = top50(128, 1e-6)
    println(f"[eigenprobe] converged: rounds=$refRounds sec=$refSec%.1f")
    for (cap <- Seq(5, 10, 15, 20, 25, 30, 40)) {
      val (ids, rounds, sec) = top50(cap, 0.0)
      val sameSet = ids.toSet == ref.toSet
      val sameOrd = ids == ref
      println(f"[eigenprobe] cap=$cap%3d rounds=$rounds sec=$sec%.1f " +
        s"top50_set_match=$sameSet exact_order_match=$sameOrd")
    }
    for (tol <- Seq(1e-4, 1e-5)) {
      val (ids, rounds, sec) = top50(128, tol)
      println(f"[eigenprobe] tol=$tol rounds=$rounds sec=$sec%.1f " +
        s"top50_set_match=${ids.toSet == ref.toSet} " +
        s"exact_order_match=${ids == ref}")
    }
    // r15 gate-cadence experiment (VERDICT r14 ask #5): pay the 1-row
    // L1 gate only every k-th round — ~ (k−1)/k fewer driver jobs at
    // bounded staleness ≤ k−1 extra rounds. Two timed legs per k after
    // a warm-up leg, result recorded in SCALE.md.
    for (k <- Seq(1, 2, 4, 8)) {
      def leg(): (Int, Double) = {
        val t0 = System.nanoTime()
        val (r, rounds) = queries.Analytics94.eigenFixpoint(
          sym, tol = 1e-6, maxRounds = 128, gateEvery = k)
        r.count()
        (rounds, (System.nanoTime() - t0) / 1e9)
      }
      leg() // warm-up
      val (r1, s1) = leg()
      val (r2, s2) = leg()
      println(f"[eigenprobe] gate_every=$k rounds=$r1/$r2 " +
        f"sec=$s1%.1f/$s2%.1f")
    }
    spark.stop()
  }
}
