package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain query modules; each entry has a
  * DuckDB oracle in `oracleSql` unless the operator is not SQL-expressible
  * (those get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ PipelineQueries.queries ++
      SketchQueries.queries ++ MultimodalQueries.queries ++ SamplingQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ EventQueries.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++ PipelineQueries.oracle ++
      MultimodalQueries.oracle ++ SamplingQueries.oracle ++ SketchQueries.oracle
}
