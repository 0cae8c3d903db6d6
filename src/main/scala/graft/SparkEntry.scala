package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a map of named queries plus (where the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle producing the same
  * columns and values. Column names are aligned on both sides because the
  * driver's comparator sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the Q5-style snowflake join — revenue per nation.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceOps.queries ++ Relational.queries ++
      Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Multimodal.queries ++ StreamingQueries.queries ++ Breadth.queries ++
      TimeSeries.queries ++ CorpusBuild.queries ++
      HybridRetrieval.queries ++ BloomJoin.queries ++ GraphOps.queries ++
      Profiling.queries ++ BucketedJoin.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys are non-SQL-expressible ops that
    * get the driver's weaker rows-only check (and a scalatest oracle here).
    */
  def oracleSql: Map[String, String] =
    (ReferenceOps.oracles ++ Relational.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++
      Multimodal.oracles ++ StreamingQueries.oracles ++ Breadth.oracles ++
      TimeSeries.oracles ++ CorpusBuild.oracles ++
      HybridRetrieval.oracles ++ BloomJoin.oracles ++ GraphOps.oracles ++
      Profiling.oracles ++ BucketedJoin.oracles)
      .map { case (k, v) => k -> OracleSql.materializeCtes(v) }
}
