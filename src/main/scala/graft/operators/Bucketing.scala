package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout helpers (SURVEY "partitioning & shuffle": co-located
  * joins via bucketing).
  *
  * At 100 TB the dominant cost of a fact-fact join is the pairwise shuffle.
  * Writing both tables bucketed by the join key with the same bucket count
  * pins rows to deterministic buckets at WRITE time, so every later join or
  * aggregation on that key runs exchange-free — pay the shuffle once per
  * dataset lifetime instead of once per query. `BucketingSpec` asserts the
  * no-Exchange plan.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — plans without any
    * Exchange when bucket specs line up. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
