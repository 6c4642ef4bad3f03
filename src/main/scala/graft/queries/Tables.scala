package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table loaders + hash-match helpers (SURVEY.md §2.C design rules).
  *
  * Determinism conventions baked in here and used by every oracled query:
  *  - monetary/double aggregates are routed through DECIMAL(18,4) *before*
  *    SUM (double summation order differs between engines);
  *  - aggregate outputs are cast back to a fixed decimal type so the Spark
  *    and DuckDB result schemas agree (Spark SUM(DECIMAL(18,4)) widens to
  *    DECIMAL(28,4), DuckDB to DECIMAL(38,4));
  *  - `events.ts` is parquet TIMESTAMP(NANOS); Spark reads it as a long of
  *    epoch nanos (legacy conf), DuckDB as TIMESTAMP_NS. Both sides compare
  *    on epoch micros (floor division, positive epochs).
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** DECIMAL(18,4) routing for double aggregates. */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Final-output representation for exact-decimal aggregates. The sum is
    * computed in DECIMAL (exact, order-independent); the last step casts to
    * DOUBLE because both engines round the same exact value to the same
    * IEEE-754 nearest double, while DECIMAL survives to the driver's pandas
    * compare with engine-specific physical types (pyarrow decimal128 object
    * vs DuckDB float64) and hash-mismatches despite equal values. */
  def dbl(c: Column): Column = c.cast("double")

  /** TIMESTAMP_NTZ literal (o_orderdate / l_shipdate are ntz). */
  def ntz(d: String): Column = expr(s"TIMESTAMP_NTZ '$d'")

  /** Deterministic scratch dir (delete-and-recreate): repeated query
    * invocations reuse one path instead of leaking a table-sized temp
    * directory per run. */
  def freshDir(tag: String): String = {
    val p = s"/root/repo/target/qtmp/$tag"
    val dir = new java.io.File(p)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    dir.mkdirs()
    p
  }

  /** events with `us` (epoch micros, long) and `ts_utc` (TimestampType). */
  def events(s: SparkSession, dir: String): DataFrame = {
    // ts is parquet TIMESTAMP(NANOS): unsupported as a Spark timestamp;
    // the legacy conf reads it as LongType epoch-nanos.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("us", expr("ts div 1000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
  }
}
