package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate/sketch aggregates (SURVEY §2.5 note: "free from Spark", in
  * scope for the generic surface). These intentionally carry NO DuckDB
  * oracle — different engines implement different sketches, so results are
  * approximate-by-contract and the driver applies its rows-only check. The
  * exact counterparts are oracle-checked in q13_distinct_agg.
  *
  * Scale note: this is the 100 TB path for distinct counting — HLL sketches
  * merge map-side, so cardinality estimation costs one scan and a tiny
  * shuffle, where exact countDistinct re-shuffles the full key set.
  */
object SketchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x01_approx_distinct" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // default 5% rsd: a tighter rsd quadruples the HLL register set
          // for little analytical value at this cardinality
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"),
          count(lit(1)).as("n_rows"))
    },

    "x02_approx_quantiles" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // one sketch pass for both percentiles (array form), not two;
          // split into scalar columns so the result is comparison-friendly
          element_at(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(1000)), 1).as("p50_price"),
          element_at(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(1000)), 2).as("p95_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    })

  /** No oracle by design (approximate results); driver records rows-only. */
  val oracle: Map[String, String] = Map.empty
}
