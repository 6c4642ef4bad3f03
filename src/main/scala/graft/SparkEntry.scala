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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      Relational4.defs ++
      Windows.defs ++ Functions.defs ++
      AvroQueries.defs ++ StreamingQ.defs ++ LlmText.defs ++ LlmText2.defs ++
      LlmText3.defs ++ LlmText4.defs ++ LlmText5.defs ++ LlmText6.defs ++
      LlmText7.defs ++ LlmText8.defs ++ LlmText9.defs ++
      Analytics.defs ++ Analytics2.defs ++ Analytics3.defs ++
      Analytics4.defs ++ Analytics5.defs ++ Analytics6.defs ++
      Analytics7.defs ++ Analytics8.defs ++ Analytics9.defs ++
      Analytics10.defs ++ Analytics11.defs ++ Analytics12.defs ++
      Analytics13.defs ++ Analytics14.defs ++ Analytics15.defs ++
      Analytics16.defs ++ Analytics17.defs ++ Analytics18.defs ++
      Analytics19.defs ++ Analytics20.defs ++ Analytics21.defs ++
      Analytics22.defs ++ Analytics23.defs ++ Analytics24.defs ++
      Analytics25.defs ++ Analytics26.defs ++ Analytics27.defs ++
      Analytics28.defs ++ Analytics29.defs ++ Analytics30.defs ++
      Analytics31.defs ++ Analytics32.defs ++ Analytics33.defs ++
      Analytics34.defs ++ Analytics35.defs ++ Analytics36.defs ++
      Analytics37.defs ++ Analytics38.defs ++ Analytics39.defs ++
      Analytics40.defs ++ Analytics41.defs ++ Analytics42.defs ++
      Analytics43.defs ++ Analytics44.defs ++ Analytics45.defs ++
      Analytics46.defs ++ Analytics47.defs ++ LlmText13.defs ++
      StreamingQ2.defs ++ Analytics48.defs ++ Analytics49.defs ++
      Analytics50.defs ++ Analytics51.defs ++ Analytics52.defs ++
      Analytics53.defs ++ Analytics54.defs ++ Analytics55.defs ++
      Analytics56.defs ++ Analytics57.defs ++ Analytics58.defs ++
      Analytics59.defs ++ Analytics60.defs ++ Analytics61.defs ++ Analytics62.defs ++
      Analytics63.defs ++ Analytics64.defs ++ Analytics65.defs ++ Analytics66.defs ++ Analytics67.defs ++
      Analytics68.defs ++ Analytics69.defs ++ Analytics70.defs ++
      Analytics71.defs ++
      LlmText14.defs ++ LlmText15.defs ++
      LlmText10.defs ++
      LlmText11.defs ++ LlmText12.defs ++ LlmSim2.defs ++ LlmSim3.defs ++
      LlmSim4.defs ++ LlmSim5.defs ++
      ScalePatterns2.defs ++ ScalePatterns3.defs ++
      LlmSim.defs ++ FunctionsExt.defs ++ Functions3.defs ++
      ScalePatterns.defs ++
      Formats.defs ++ Formats2.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.sql ++ Relational2.sql ++ Relational3.sql ++
      Relational4.sql ++
      Windows.sql ++ Functions.sql ++
      AvroQueries.sql ++ StreamingQ.sql ++ LlmText.sql ++ LlmText2.sql ++
      LlmText3.sql ++ LlmText4.sql ++ LlmText5.sql ++ LlmText6.sql ++
      LlmText7.sql ++ LlmText8.sql ++ LlmText9.sql ++
      Analytics.sql ++ Analytics2.sql ++ Analytics3.sql ++
      Analytics4.sql ++ Analytics5.sql ++ Analytics6.sql ++
      Analytics7.sql ++ Analytics8.sql ++ Analytics9.sql ++
      Analytics10.sql ++ Analytics11.sql ++ Analytics12.sql ++
      Analytics13.sql ++ Analytics14.sql ++ Analytics15.sql ++
      Analytics16.sql ++ Analytics17.sql ++ Analytics18.sql ++
      Analytics19.sql ++ Analytics20.sql ++ Analytics21.sql ++
      Analytics22.sql ++ Analytics23.sql ++ Analytics24.sql ++
      Analytics25.sql ++ Analytics26.sql ++ Analytics27.sql ++
      Analytics28.sql ++ Analytics29.sql ++ Analytics30.sql ++
      Analytics31.sql ++ Analytics32.sql ++ Analytics33.sql ++
      Analytics34.sql ++ Analytics35.sql ++ Analytics36.sql ++
      Analytics37.sql ++ Analytics38.sql ++ Analytics39.sql ++
      Analytics40.sql ++ Analytics41.sql ++ Analytics42.sql ++
      Analytics43.sql ++ Analytics44.sql ++ Analytics45.sql ++
      Analytics46.sql ++ Analytics47.sql ++ LlmText13.sql ++
      StreamingQ2.sql ++ Analytics48.sql ++ Analytics49.sql ++
      Analytics50.sql ++ Analytics51.sql ++ Analytics52.sql ++
      Analytics53.sql ++ Analytics54.sql ++ Analytics55.sql ++
      Analytics56.sql ++ Analytics57.sql ++ Analytics58.sql ++
      Analytics59.sql ++ Analytics60.sql ++ Analytics61.sql ++ Analytics62.sql ++
      Analytics63.sql ++ Analytics64.sql ++ Analytics65.sql ++ Analytics66.sql ++ Analytics67.sql ++
      Analytics68.sql ++ Analytics69.sql ++ Analytics70.sql ++
      Analytics71.sql ++
      LlmText14.sql ++ LlmText15.sql ++
      LlmText10.sql ++
      LlmText11.sql ++ LlmText12.sql ++ LlmSim2.sql ++ LlmSim3.sql ++
      LlmSim4.sql ++ LlmSim5.sql ++
      ScalePatterns2.sql ++ ScalePatterns3.sql ++
      LlmSim.sql ++ FunctionsExt.sql ++ Functions3.sql ++
      ScalePatterns.sql ++
      Formats.sql ++ Formats2.sql
}
