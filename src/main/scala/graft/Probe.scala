package graft

import org.apache.spark.sql.SparkSession

/** Dev-only schema probe over the driver testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$n.parquet")
      println(s"== $n rows=${df.count()}")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
