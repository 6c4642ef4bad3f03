package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Hand-computed greedy k-center trajectory (picks, selection
  * distances, covering radius) and an independent Scala replay of the
  * sign-bit Hamming-vs-cosine recall report. */
class Analytics51Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vec(xs: (Int, Double)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    xs.foreach { case (i, v) => a(i) = v.toFloat }
    a
  }

  test("coreset: greedy farthest-point picks v3(200), v1(100 tie→id), " +
      "v2(100); covering radius is the stranded point's distance") {
    import spark.implicits._
    val dir = Tables.freshDir("a51_core")
    val rows = Seq(
      (0L, vec(), 0),                       // origin (seed: min id)
      (1L, vec(0 -> 10.0), 0),
      (2L, vec(1 -> 10.0), 0),
      (3L, vec(0 -> 10.0, 1 -> 10.0), 0),   // farthest from origin
      (4L, vec(0 -> 1.0), 0))               // stranded near origin
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_sample_coreset")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, -1.0, 1.0), (2L, 3L, 200.0, 1.0),
      (3L, 1L, 100.0, 1.0), (4L, 2L, 100.0, 1.0)),
      s"coreset trajectory wrong: ${out.toSeq}")
  }

  test("coreset: greedy certificate on real data — covering radius " +
      "never exceeds the last selection distance") {
    val out = SparkEntry.queries("q_sample_coreset")(
        spark, "/root/testdata/sf0.001")
      .collect()
    val last = out.filter(_.getLong(0) == 4L).head
    assert(last.getDouble(3) <= last.getDouble(2) + 1e-9,
      s"radius ${last.getDouble(3)} > last pick ${last.getDouble(2)}")
  }

  test("binary: per-probe Hamming∩cosine top-5 overlap matches an " +
      "independent Scala replay") {
    import spark.implicits._
    val dir = Tables.freshDir("a51_bin")
    val rnd = new scala.util.Random(7)
    // 2 probes + 16 corpus vectors, signs clustered so the binary tier
    // is informative but imperfect
    val rows = (0L to 1L).map { i =>
      (i, Array.tabulate(64)(j =>
        (if (j % 2 == i % 2) 1.0f else -1.0f) *
          (0.5f + rnd.nextFloat())), 0)
    } ++ (8L to 23L).map { i =>
      (i, Array.tabulate(64)(j =>
        ((if ((i + j) % 3 == 0) -1.0f else 1.0f) *
          (0.1f + rnd.nextFloat()))), 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val all = rows.map { case (id, a, _) => id -> a.map(_.toDouble) }
    val want = all.filter(_._1 < 8).map { case (pid, p) =>
      val cands = all.filter(_._1 != pid)
      def ham(a: Array[Double], b: Array[Double]) =
        a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }
      def cos(a: Array[Double], b: Array[Double]) = {
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na > 0 && nb > 0)
          r9(a.zip(b).map { case (x, y) => x * y }.sum / na / nb)
        else 0.0
      }
      val topH = cands.sortBy(c => (ham(p, c._2), c._1)).take(5)
        .map(_._1).toSet
      val topC = cands.sortBy(c => (-cos(p, c._2), c._1)).take(5)
        .map(_._1).toSet
      pid -> (topH & topC).size.toLong
    }.toMap
    val out = SparkEntry.queries("q_embed_binary")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(x => x._1 -> x._2).toMap === want,
      s"overlap mismatch: ${out.toSeq} vs $want")
    assert(out.forall(r => r._3 == r._2 / 5.0))
  }
}
