package graft
object DumpIds {
  def main(args: Array[String]): Unit = {
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
  }
}
