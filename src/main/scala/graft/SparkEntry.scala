package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY.md §2B plus the
  * LLM-data-pipeline extensions); every entry that is ANSI-SQL-expressible
  * has a matching DuckDB oracle in `oracleSql` with identical column names
  * and a total-order ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q11_agg_pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ScalarQueries.queries ++
      UdfQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ EventQueries.queries ++
      SketchQueries.queries ++ QuantizeQueries.queries ++
      CurationQueries.queries ++ SqlQueries.queries ++
      StatQueries.queries ++ AnnIndexQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ ScalarQueries.oracles ++
      UdfQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextQueries.oracles ++
      MultimodalQueries.oracles ++ EventQueries.oracles ++
      SketchQueries.oracles ++ QuantizeQueries.oracles ++
      CurationQueries.oracles ++ SqlQueries.oracles ++
      StatQueries.oracles ++ AnnIndexQueries.oracles
}
