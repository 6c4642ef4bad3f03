package graft.queries

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import Tables._

/** User-extension surface (SURVEY §4.B: one UDF, one typed Aggregator,
  * one generator) — intentionally minimal; everything else in the engine
  * is codegen'd built-ins. Each demo is still DuckDB-oracled. */
object FunctionsExt {

  /** Typed UDAF: exact top-3 values via a bounded insertion buffer (the
    * k-heap pattern — constant memory per group, merge-friendly, the
    * shape a production exact-top-k sketch takes). */
  object Top3Agg extends Aggregator[Double, List[Double], Seq[Double]] {
    override def zero: List[Double] = Nil
    override def reduce(b: List[Double], a: Double): List[Double] =
      (a :: b).sorted(Ordering[Double].reverse).take(3)
    override def merge(x: List[Double], y: List[Double]): List[Double] =
      (x ++ y).sorted(Ordering[Double].reverse).take(3)
    override def finish(r: List[Double]): Seq[Double] = r
    // Native row-format encoder, NOT Encoders.kryo: kryo buffers serialize
    // through java.nio internals (needs --add-opens on JDK 17) and opt the
    // merge path out of Tungsten's unsafe-row fast path. A List[Double] is
    // natively encodable as ARRAY<DOUBLE>.
    override def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Scalar UDF demo: lowercase + reverse (chosen because DuckDB can
    * express the identical function, keeping the oracle honest). */
  private def qUdfScalar(s: SparkSession, d: String): DataFrame = {
    val revLower = udf((x: String) => if (x == null) null else x.toLowerCase.reverse)
    s.udf.register("rev_lower", revLower)
    t(s, d, "part")
      .select(col("p_partkey"), revLower(col("p_name")).as("rev_name"))
      .orderBy("p_partkey")
  }

  /** UDAF demo: top-3 order totals per customer, exploded to rows. */
  private def qUdafTopk(s: SparkSession, d: String): DataFrame = {
    val top3 = udaf(Top3Agg)
    t(s, d, "orders").groupBy(col("o_custkey"))
      .agg(top3(col("o_totalprice")).as("top3"))
      .select(col("o_custkey"), posexplode(col("top3")).as(Seq("pos", "price")))
      .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rank"),
        col("price"))
      .orderBy("o_custkey", "rank")
  }

  /** Generator (UDTF-shaped) demo: a UDF building an array of structs,
    * exploded inline — one input row → N output rows. */
  private def qUdtfExplode(s: SparkSession, d: String): DataFrame = {
    val tokenize = udf((text: String) =>
      text.split(' ').filter(_.nonEmpty).map(w => (w, w.length)))
    t(s, d, "documents").filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(tokenize(col("text"))).as("tok"))
      .select(col("doc_id"), col("tok._1").as("w"),
        col("tok._2").cast("int").as("wlen"))
      .groupBy(col("doc_id"), col("w"), col("wlen"))
      .agg(count(lit(1)).as("n"))
      .orderBy("doc_id", "w", "wlen")
  }

  val defs: Map[String, Relational.Q] = Map(
    "q_udf_scalar" -> (qUdfScalar _),
    "q_udaf_topk" -> (qUdafTopk _),
    "q_udtf_explode" -> (qUdtfExplode _),
  )

  val sql: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT p_partkey, reverse(lower(p_name)) AS rev_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_udaf_topk" ->
      """SELECT o_custkey, CAST(rank AS INT) AS rank, price FROM (
        |  SELECT o_custkey, o_totalprice AS price,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC) AS rank
        |  FROM orders) z
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "q_udtf_explode" ->
      """SELECT doc_id, w, CAST(len(w) AS INT) AS wlen, COUNT(*) AS n FROM (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    x -> len(x) > 0)) AS w
        |  FROM documents WHERE doc_id < 100) z
        |GROUP BY doc_id, w, wlen ORDER BY doc_id, w, wlen""".stripMargin,
  )
}
