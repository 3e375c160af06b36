package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine itself lives under `graft.engine`: each module contributes a
  * map of named operator queries (one per SURVEY.md §2 inventory row) plus
  * the matching DuckDB oracle SQL. This object is only the registry.
  */
object SparkEntry {

  /** Flagship query (PowerSurgeDetection analog, SURVEY.md §0): tumbling
    * 1-minute sum of `value` over the event stream. Driver smoke-checks
    * rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Windows.timeBatchSum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Windows.queries ++ Aggregates.queries ++
      Functions.queries ++ Cep.queries ++ Dedup.queries ++
      Similarity.queries ++ TextAnalysis.queries ++ Multimodal.queries ++
      Streaming.queries ++ Sketches.queries ++ Ops.queries ++
      Extras.queries ++ Ml.queries ++ Http.queries ++ SqlGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Windows.oracle ++ Aggregates.oracle ++
      Functions.oracle ++ Cep.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ TextAnalysis.oracle ++ Multimodal.oracle ++
      Streaming.oracle ++ Sketches.oracle ++ Ops.oracle ++
      Extras.oracle ++ Ml.oracle ++ Http.oracle ++ SqlGate.oracle
}
