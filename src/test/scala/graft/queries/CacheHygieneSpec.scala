package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Session cache hygiene (VERDICT r9): a query-body materialization must
  * not leave CacheManager entries past the op — Dataset.persist is held
  * until explicit unpersist (the ContextCleaner only reclaims RDD-level
  * blocks), so on a long-lived session leaked entries accumulate memory
  * forever AND get silently substituted into later queries' plans by
  * plan-equality matching. The former offenders now use eager
  * localCheckpoint (RDD-level, cleaner-reclaimed) or the write-once
  * parquet artifact pattern (cappedShingles, posGrid); this spec pins
  * that running each leaves the CacheManager exactly as it found it
  * (empty). Bench/Verify additionally clear the cache per-op as a
  * backstop. */
class CacheHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private val formerOffenders = Seq(
    "q_dedup_containment", "q_dedup_sweep", "q_dedup_eval",
    "q_dedup_incremental", "q_dedup_ngram", "q_text_tfidf",
    "q_time_lag_corr", "q_quality_datacard",
    "q_agg_pctl_cont", "q_agg_iqr", "q_agg_trimmed")

  test("the r9 cache-leak offenders leave the CacheManager empty") {
    spark.catalog.clearCache()
    formerOffenders.foreach { q =>
      SparkEntry.queries(q)(spark, sf).count()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$q leaked a CacheManager entry past the query build")
    }
  }
}
