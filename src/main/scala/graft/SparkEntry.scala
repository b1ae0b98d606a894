package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory) and
  * §7 (build plan). One `queries` entry per implemented operator; a DuckDB
  * oracle SQL for every SQL-expressible one (column names aligned on both
  * sides, total order per §2.0 D1).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.aggGroupbyPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Joins.queries ++
      operators.Aggregations.queries ++
      operators.Windows.queries ++
      operators.SortsSetOps.queries ++
      functions.Udafs.queries ++
      functions.ScalarQueries.queries ++
      operators.LlmOps.queries ++
      streaming.StreamingOps.queries ++
      functions.ExtensionOps.queries ++
      operators.TrainingDataOps.queries ++
      operators.AnnOps.queries ++
      operators.BpeOps.queries ++
      operators.PcaOps.queries ++
      operators.Multimodal.queries ++
      sources.FileFormats.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.Joins.oracle ++
      operators.Aggregations.oracle ++
      operators.Windows.oracle ++
      operators.SortsSetOps.oracle ++
      functions.Udafs.oracle ++
      functions.ScalarQueries.oracle ++
      operators.LlmOps.oracle ++
      streaming.StreamingOps.oracle ++
      functions.ExtensionOps.oracle ++
      operators.TrainingDataOps.oracle ++
      operators.AnnOps.oracle ++
      operators.BpeOps.oracle ++
      operators.PcaOps.oracle ++
      operators.Multimodal.oracle ++
      sources.FileFormats.oracle
}
