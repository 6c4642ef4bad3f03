package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerGroupNode

/** The declarative extension path: a session built with
  * `withExtensions(new GraftExtensions)` must expose the native
  * functions in SQL and plan TopKPerGroupNode via the injected strategy
  * — with no runtime `register`/strategy installation anywhere. */
class ExtensionsSpec extends AnyFunSuite {

  // fresh session (shared context is fine) so the extensions apply at
  // instantiation; deliberately not stopped — later suites getOrCreate
  // over the same context
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("injected functions resolve in SQL without runtime registration") {
    val dot = spark.sql(
      "SELECT float_dot(array(cast(1.5 as float), cast(2.0 as float)), " +
        "array(cast(2.0 as float), cast(3.0 as float)))").head.getDouble(0)
    assert(dot == 9.0, s"float_dot wrong: $dot")
    val sh = spark.sql("SELECT simhash64(array('a', 'b'))").head.getLong(0)
    assert(sh != 0L, "simhash64 not evaluated")
  }

  test("native top-k: null order keys rank NULLS LAST under DESC") {
    val df = spark.sql(
      "SELECT * FROM VALUES (1L, 5.0D), (1L, CAST(NULL AS DOUBLE)), " +
        "(1L, 7.0D) AS t(g, v)")
    val out = graft.plans.TopKPerGroup(df, Seq("g"), "v", Nil, 2)
      .orderBy("rnk").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(1) == 7.0 && out(1).getDouble(1) == 5.0,
      s"null must sort after real values: ${out.toSeq}")
  }

  test("partial pass flushes under group-cardinality blowup: bounded " +
      "memory, identical results") {
    // group ≈ unique key is the OOM shape: every row opens a heap, so
    // the partial pass would pin the whole partition. With the pin
    // bound set far below the row count the pass must flush (metric
    // ticks) and still produce exactly the window-formulation answer.
    spark.conf.set(graft.plans.TopKPerGroupStrategy.PartialMaxRowsKey, "500")
    try {
      val df = spark.range(0, 20000)
        .selectExpr("id % 6000 AS g", "cast((id * 37) % 1001 AS double) AS v",
          "id AS tie")
      val out = graft.plans.TopKPerGroup(df, Seq("g"), "v", Seq("tie"), 3)
      val got = out.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).sorted
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("tie").asc)
      val expect = df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3).collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).sorted
      assert(got.length == expect.length,
        s"row count: got ${got.length}, expect ${expect.length}")
      assert(got.sameElements(expect), "flushed partial pass changed results")
      // the flush really fired — otherwise this test proves nothing.
      // Descend through AQE stage leaves: collect() on the adaptive
      // plan alone sees only stage boundaries.
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          flatten(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          flatten(r.child)
        case _ => p.children.flatMap(flatten)
      })
      val flushes = flatten(out.queryExecution.executedPlan).collect {
        case e: graft.plans.TopKPerGroupExec if e.partial =>
          e.metrics("partialFlushes").value
      }.sum
      assert(flushes > 0, "expected at least one partial flush at bound 500")
    } finally spark.conf
      .unset(graft.plans.TopKPerGroupStrategy.PartialMaxRowsKey)
  }

  test("injected planner strategy plans TopKPerGroupNode") {
    val df = spark.range(0, 100)
      .selectExpr("id % 10 AS g", "cast(id AS double) AS v")
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).get
    val node = TopKPerGroupNode(2, Seq(attr("g")),
      Seq(SortOrder(attr("v"), Descending)),
      AttributeReference("rnk", IntegerType, nullable = false)(), lp)
    val out = org.apache.spark.sql.graftx.GraftDataset.ofRows(spark, node)
    assert(out.count() == 20, "2 rows per each of 10 groups expected")
    val top = out.filter("g = 3 AND rnk = 1").head.getDouble(1)
    assert(top == 93.0, s"rank-1 of group 3 should be 93, got $top")
  }
}
