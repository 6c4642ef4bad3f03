package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator surface (SURVEY.md §2.C);
  * each id with an `oracleSql` entry is hash-checked against DuckDB running
  * that SQL over the same parquet tables.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggGroup(spark, "/root/testdata/sf0.001")

  /** Query-file modules in merge order, as (defs, sql) pairs. A flat
    * Seq folded at runtime — the old 100-term `++` chain nested one
    * typer level per module and finally overflowed the scalac stack. */
  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (Relational.defs, Relational.sql),
    (Relational2.defs, Relational2.sql),
    (Relational3.defs, Relational3.sql),
    (Relational4.defs, Relational4.sql),
    (Windows.defs, Windows.sql),
    (Functions.defs, Functions.sql),
    (AvroQueries.defs, AvroQueries.sql),
    (StreamingQ.defs, StreamingQ.sql),
    (LlmText.defs, LlmText.sql),
    (LlmText2.defs, LlmText2.sql),
    (LlmText3.defs, LlmText3.sql),
    (LlmText4.defs, LlmText4.sql),
    (LlmText5.defs, LlmText5.sql),
    (LlmText6.defs, LlmText6.sql),
    (LlmText7.defs, LlmText7.sql),
    (LlmText8.defs, LlmText8.sql),
    (LlmText9.defs, LlmText9.sql),
    (Analytics.defs, Analytics.sql),
    (Analytics2.defs, Analytics2.sql),
    (Analytics3.defs, Analytics3.sql),
    (Analytics4.defs, Analytics4.sql),
    (Analytics5.defs, Analytics5.sql),
    (Analytics6.defs, Analytics6.sql),
    (Analytics7.defs, Analytics7.sql),
    (Analytics8.defs, Analytics8.sql),
    (Analytics9.defs, Analytics9.sql),
    (Analytics10.defs, Analytics10.sql),
    (Analytics11.defs, Analytics11.sql),
    (Analytics12.defs, Analytics12.sql),
    (Analytics13.defs, Analytics13.sql),
    (Analytics14.defs, Analytics14.sql),
    (Analytics15.defs, Analytics15.sql),
    (Analytics16.defs, Analytics16.sql),
    (Analytics17.defs, Analytics17.sql),
    (Analytics18.defs, Analytics18.sql),
    (Analytics19.defs, Analytics19.sql),
    (Analytics20.defs, Analytics20.sql),
    (Analytics21.defs, Analytics21.sql),
    (Analytics22.defs, Analytics22.sql),
    (Analytics23.defs, Analytics23.sql),
    (Analytics24.defs, Analytics24.sql),
    (Analytics25.defs, Analytics25.sql),
    (Analytics26.defs, Analytics26.sql),
    (Analytics27.defs, Analytics27.sql),
    (Analytics28.defs, Analytics28.sql),
    (Analytics29.defs, Analytics29.sql),
    (Analytics30.defs, Analytics30.sql),
    (Analytics31.defs, Analytics31.sql),
    (Analytics32.defs, Analytics32.sql),
    (Analytics33.defs, Analytics33.sql),
    (Analytics34.defs, Analytics34.sql),
    (Analytics35.defs, Analytics35.sql),
    (Analytics36.defs, Analytics36.sql),
    (Analytics37.defs, Analytics37.sql),
    (Analytics38.defs, Analytics38.sql),
    (Analytics39.defs, Analytics39.sql),
    (Analytics40.defs, Analytics40.sql),
    (Analytics41.defs, Analytics41.sql),
    (Analytics42.defs, Analytics42.sql),
    (Analytics43.defs, Analytics43.sql),
    (Analytics44.defs, Analytics44.sql),
    (Analytics45.defs, Analytics45.sql),
    (Analytics46.defs, Analytics46.sql),
    (Analytics47.defs, Analytics47.sql),
    (LlmText13.defs, LlmText13.sql),
    (StreamingQ2.defs, StreamingQ2.sql),
    (StreamingQ3.defs, StreamingQ3.sql),
    (Analytics48.defs, Analytics48.sql),
    (Analytics49.defs, Analytics49.sql),
    (Analytics50.defs, Analytics50.sql),
    (Analytics51.defs, Analytics51.sql),
    (Analytics52.defs, Analytics52.sql),
    (Analytics53.defs, Analytics53.sql),
    (Analytics54.defs, Analytics54.sql),
    (Analytics55.defs, Analytics55.sql),
    (Analytics56.defs, Analytics56.sql),
    (Analytics57.defs, Analytics57.sql),
    (Analytics58.defs, Analytics58.sql),
    (Analytics59.defs, Analytics59.sql),
    (Analytics60.defs, Analytics60.sql),
    (Analytics61.defs, Analytics61.sql),
    (Analytics62.defs, Analytics62.sql),
    (Analytics63.defs, Analytics63.sql),
    (Analytics64.defs, Analytics64.sql),
    (Analytics65.defs, Analytics65.sql),
    (Analytics66.defs, Analytics66.sql),
    (Analytics67.defs, Analytics67.sql),
    (Analytics68.defs, Analytics68.sql),
    (Analytics69.defs, Analytics69.sql),
    (Analytics70.defs, Analytics70.sql),
    (Analytics71.defs, Analytics71.sql),
    (Analytics72.defs, Analytics72.sql),
    (Analytics73.defs, Analytics73.sql),
    (Analytics74.defs, Analytics74.sql),
    (Analytics75.defs, Analytics75.sql),
    (Analytics76.defs, Analytics76.sql),
    (Analytics77.defs, Analytics77.sql),
    (Analytics78.defs, Analytics78.sql),
    (Analytics79.defs, Analytics79.sql),
    (Analytics80.defs, Analytics80.sql),
    (Analytics81.defs, Analytics81.sql),
    (Analytics82.defs, Analytics82.sql),
    (Analytics83.defs, Analytics83.sql),
    (Analytics84.defs, Analytics84.sql),
    (Analytics85.defs, Analytics85.sql),
    (Analytics86.defs, Analytics86.sql),
    (Analytics87.defs, Analytics87.sql),
    (Analytics88.defs, Analytics88.sql),
    (Analytics89.defs, Analytics89.sql),
    (Analytics90.defs, Analytics90.sql),
    (Analytics91.defs, Analytics91.sql),
    (Analytics92.defs, Analytics92.sql),
    (Analytics93.defs, Analytics93.sql),
    (Analytics94.defs, Analytics94.sql),
    (Analytics95.defs, Analytics95.sql),
    (Analytics96.defs, Analytics96.sql),
    (Analytics97.defs, Analytics97.sql),
    (Analytics98.defs, Analytics98.sql),
    (Analytics99.defs, Analytics99.sql),
    (LlmText14.defs, LlmText14.sql),
    (LlmText15.defs, LlmText15.sql),
    (LlmText10.defs, LlmText10.sql),
    (LlmText16.defs, LlmText16.sql),
    (Mm2.defs, Mm2.sql),
    (LlmText11.defs, LlmText11.sql),
    (LlmText12.defs, LlmText12.sql),
    (LlmSim2.defs, LlmSim2.sql),
    (LlmSim3.defs, LlmSim3.sql),
    (LlmSim4.defs, LlmSim4.sql),
    (LlmSim5.defs, LlmSim5.sql),
    (LlmSim6.defs, LlmSim6.sql),
    (ScalePatterns2.defs, ScalePatterns2.sql),
    (ScalePatterns3.defs, ScalePatterns3.sql),
    (LlmSim.defs, LlmSim.sql),
    (FunctionsExt.defs, FunctionsExt.sql),
    (Functions3.defs, Functions3.sql),
    (ScalePatterns.defs, ScalePatterns.sql),
    (Formats.defs, Formats.sql),
    (Formats2.defs, Formats2.sql),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).foldLeft(
      Map.empty[String, (SparkSession, String) => DataFrame])(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).foldLeft(Map.empty[String, String])(_ ++ _)
}
