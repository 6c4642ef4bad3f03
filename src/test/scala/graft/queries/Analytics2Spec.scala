package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Contract + plan gates for the round-7 analytics wave. The oracled ids
  * (degree, triangles, dsir, covariance) hash-verify against DuckDB; this
  * spec pins what the oracle can't: the MMR greedy contract (oracle-free
  * float argmax) and the scale-defining plan shapes. */
class Analytics2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("MMR: 10 picks per probe, rank-1 is the cosine argmax, " +
      "deterministic, and more diverse than plain top-10") {
    import spark.implicits._
    val out = SparkEntry.queries("q_sim_mmr")(spark, sf)
      .select("probe_id", "rank", "vec_id", "mmr_score")
      .as[(Long, Int, Long, Double)].collect()
    val byProbe = out.groupBy(_._1)
    assert(byProbe.keySet == Set(0L, 1L, 2L, 3L, 4L), s"probes: ${byProbe.keySet}")
    assert(byProbe.values.forall(_.length == 10))
    // reference data: all embeddings, collected once
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    for ((p, picks) <- byProbe) {
      val sorted = picks.sortBy(_._2)
      // rank 1 must be the plain cosine argmax (MMR's first pick has no
      // diversity penalty), ties to lowest vec_id
      val q = embs(p)
      val best = embs.iterator.filter(_._1 != p)
        .map { case (id, e) => (id, cos(e, q)) }
        .reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a }
      assert(sorted.head._3 == best._1,
        s"probe $p rank-1 ${sorted.head._3} != cosine argmax ${best._1}")
      // ranks are 1..10, picks distinct, probe never retrieves itself
      assert(sorted.map(_._2).toSeq == (1 to 10))
      assert(sorted.map(_._3).distinct.length == 10)
      assert(!sorted.map(_._3).contains(p))
      // diversification: the MMR set's mean pairwise cosine must not
      // exceed the plain top-10's (that's the entire point of the op)
      val top10 = embs.iterator.filter(_._1 != p)
        .map { case (id, e) => (id, cos(e, q)) }.toSeq
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
      def meanPair(ids: Seq[Long]): Double = {
        val ps = for {
          i <- ids.indices; j <- (i + 1) until ids.length
        } yield cos(embs(ids(i)), embs(ids(j)))
        ps.sum / ps.length
      }
      val mmrIds = sorted.map(_._3).toSeq
      assert(meanPair(mmrIds) <= meanPair(top10) + 1e-12,
        s"probe $p: MMR set is not more diverse than plain top-10")
      // scores are non-increasing in rank (greedy argmax property does
      // NOT guarantee this in general, but λ·sim − (1−λ)·penalty is
      // bounded by the previous max at each step for a fixed shortlist;
      // assert weak monotonicity of the recorded objective instead:
      // every score is within [-1, 1] and rank-1 score = λ·sim(best)
      assert(math.abs(sorted.head._4 - math.rint(0.7 * best._2 * 1e6) / 1e6)
        <= 1e-9, s"probe $p rank-1 score mismatch")
      assert(sorted.forall(r => r._4 >= -1.0 && r._4 <= 1.0))
    }
    // determinism: a second run produces the identical table
    val again = SparkEntry.queries("q_sim_mmr")(spark, sf)
      .select("probe_id", "rank", "vec_id", "mmr_score")
      .as[(Long, Int, Long, Double)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ==
      out.sortBy(r => (r._1, r._2)).toSeq, "MMR output is not deterministic")
  }

  test("DSIR plan: both hashed-LM count tables broadcast (no vocab shuffle " +
      "join on the token stream)") {
    val df = SparkEntry.queries("q_text_dsir")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 3, // ct (left), cs, and the 1-row totals
      s"DSIR must broadcast its bounded count tables (found $nBroadcast):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"DSIR token stream must not sort-merge join:\n$p")
  }

  test("triangle counting: wedge fan-out is bounded by orientation " +
      "(out-degree <= sqrt-m scale), and counts cross-check a brute force") {
    import spark.implicits._
    // brute-force reference on the sf0.001 SUPPORT-≥2 co-purchase graph
    // (the query prunes single-co-occurrence noise edges before the
    // quadratic wedge join — mirror that here)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val e = li.toDF("ok", "u").join(li.toDF("ok", "v"), "ok")
      .filter($"u" < $"v").select("u", "v")
      .groupBy("u", "v").count().filter($"count" >= 2)
      .select("u", "v").as[(Long, Long)].collect()
    val adj = e.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val triBrute = scala.collection.mutable.Map[Long, Long]()
    for ((u, v) <- e; w <- adj(u) if w > v && adj(v).contains(w)) {
      for (n <- Seq(u, v, w)) triBrute(n) = triBrute.getOrElse(n, 0L) + 1
    }
    val expected = triBrute.toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    val got = SparkEntry.queries("q_graph_triangles")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(got == expected, s"\ngot:      $got\nexpected: $expected")
  }
}
