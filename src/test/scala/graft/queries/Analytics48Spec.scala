package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Independent-reimplementation contracts for the BH-FDR correction
  * (the full z → A&S-polynomial p → step-up chain recomputed in Scala)
  * and the split conformal interval (md5 split, rank pick, and
  * coverage recomputed from the raw fixture). */
class Analytics48Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def upperTail(az: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * az)
    0.3989422804014327 * math.exp(-az * az / 2.0) *
      ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
        - 0.356563782) * t + 0.319381530) * t
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fdr: BH chain matches an independent reimplementation on a " +
      "fixture with one strong shift, one weak shift, and nulls") {
    import spark.implicits._
    val dir = Tables.freshDir("a48_fdr")
    // nation 1: mean 100 (far above); nation 2: mean 12 (mild);
    // nations 3..6: mean 10 (the bulk, centred)
    val rows =
      (1 to 40).map(i => (i.toLong, 1, 100.0 + (i % 5))) ++
      (1 to 40).map(i => (100L + i, 2, 12.0 + (i % 3))) ++
      (3 to 6).flatMap(nat => (1 to 40).map(i =>
        (nat * 1000L + i, nat, 10.0 + (i % 7))))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    // independent recomputation
    val bal = rows.map { case (_, nat, b) => (nat, b) }
    val nn = bal.size
    val mu = bal.map(_._2).sum / nn
    val vr = bal.map(b => b._2 * b._2).sum / nn - mu * mu
    val byNat = bal.groupBy(_._1).toSeq.sortBy(_._1)
    val scored = byNat.map { case (nat, xs) =>
      val n = xs.size
      val z = (xs.map(_._2).sum / n - mu) / math.sqrt(vr / n)
      (nat, n.toLong, z, r9(2.0 * upperTail(math.abs(z))))
    }
    val m = scored.size
    val ranked = scored.sortBy(s => (s._4, s._1)).zipWithIndex
      .map { case ((nat, n, z, p), i) => (nat, n, z, p, i + 1) }
    val padj = ranked.reverse
      .scanLeft(Double.MaxValue) { case (acc, (_, _, _, p, rk)) =>
        math.min(acc, m.toDouble * p / rk)
      }.drop(1)
    val want = ranked.reverse.zip(padj).map { case ((nat, n, z, p, _), a) =>
      val pa = math.min(1.0, a)
      (nat, n, r6(z), r6(p), r6(pa), r9(pa) <= 0.10)
    }.sortBy(_._1)

    val out = SparkEntry.queries("q_agg_fdr")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(out.toSeq === want, s"fdr mismatch: ${out.toSeq} vs $want")
    // the strong shift must be a discovery, and adjusted p must
    // dominate raw p everywhere
    assert(out.find(_._1 == 1).exists(_._6), "nation 1 not discovered")
    assert(out.forall(r => r._5 >= r._4 - 1e-9))
  }

  test("conformal: qhat, the rank index, and per-segment coverage " +
      "match a from-scratch recomputation of the md5 split") {
    import spark.implicits._
    val dir = Tables.freshDir("a48_conf")
    val rows = (1 to 400).map { i =>
      val seg = if (i % 2 == 0) "AUTO" else "STEEL"
      // deterministic spread with occasional outliers
      val bal = (if (seg == "AUTO") 50.0 else 200.0) +
        (i % 13) - 6 + (if (i % 37 == 0) 80.0 else 0.0)
      (i.toLong, seg, bal)
    }
    rows.toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    def nib(ck: Long): Char = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(ck.toString.getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.charAt(0)
    }
    val parts = rows.map { case (ck, seg, bal) =>
      val h = nib(ck)
      val p = if (h <= '7') "train" else if (h <= 'b') "cal" else "test"
      (ck, seg, bal, p)
    }
    val yhat = parts.filter(_._4 == "train").groupBy(_._2)
      .map { case (seg, xs) => seg -> xs.map(_._3).sum / xs.size }
    val cal = parts.filter(_._4 == "cal")
      .map(x => (x._1, r9(math.abs(x._3 - yhat(x._2)))))
      .sortBy(x => (x._2, x._1))
    val k = ((9 * (cal.size + 1) + 9) / 10) // integer ceil(0.9(n+1))
    val qhat = cal(k - 1)._2
    val test0 = parts.filter(_._4 == "test")
    val want = test0.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (seg, xs) =>
        val nCov = xs.count(x => r9(math.abs(x._3 - yhat(seg))) <= qhat)
        (seg, xs.size.toLong, nCov.toLong,
          r6(nCov.toDouble / xs.size), r6(qhat), r6(qhat * 2.0),
          cal.size.toLong)
    }
    val out = SparkEntry.queries("q_agg_conformal")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(out.toSeq === want, s"conformal mismatch: ${out.toSeq} vs $want")
  }
}
