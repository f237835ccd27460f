package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.{coalesce, col, lit, pmod}

/** Materialization sinks (SURVEY §2.1 S11/S13/S14/S15).
  *
  * The reference mutates HDF5 files in place; this engine writes immutable
  * snapshots instead — re-running a stage is idempotent by construction
  * (SURVEY §7.4 item 3).
  */
object Sinks {

  /** S11/S14: partitioned snapshot — ymd/batch directories give partition
    * pruning on the two keys every reference query filters by. */
  def writeSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("ymd", "batch")
      .parquet(path)

  /** S13: the append-mode flux/thickness summary table
    * (`processstep_transmission_thickness_flux_table.py:81-89`). */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("header", "true")
      .csv(path)

  /** S15: quarantine split — rows failing `gate` go to the error path, the
    * rest are returned for further processing (`.stacking_error_list`
    * semantics of the stacker). A NULL gate counts as FAILING: without the
    * coalesce such rows would satisfy neither filter and silently vanish
    * from both outputs. Note the two filters evaluate `df` twice (the
    * error write now, the returned frame at the caller's action) — persist
    * upstream if the input plan is expensive. */
  def quarantine(df: DataFrame, gate: org.apache.spark.sql.Column, errorPath: String): DataFrame = {
    val pass = coalesce(gate, lit(false))
    df.filter(!pass).write.mode(SaveMode.Append).parquet(errorPath)
    df.filter(pass)
  }

  /** The writer behind w05's shard audit: deterministic hash-sharded
    * corpus export. Shard is a pure function of the id (the audit's seed-4
    * md5 family via the caller's `shard` column, or any deterministic
    * expression), so a re-export lands every document in the SAME shard
    * directory — and with dynamic partition overwrite, re-exporting a
    * subset (an incremental delta, a repaired shard) rewrites ONLY the
    * shard directories present in that subset, leaving the other
    * `shard=N/` dirs untouched. That is the idempotent re-export contract
    * the audit exists to pre-check.
    *
    * Layout: `repartition(nShards, shard)` then `partitionBy("shard")` —
    * each shard value hashes to exactly one task, so every shard dir
    * holds exactly ONE file per export (no small-file spray; at 100 TB
    * set `spark.sql.files.maxRecordsPerFile` to split giant shards into
    * sequentially-written chunks without changing the dir layout).
    */
  def exportShards(df: DataFrame, shard: Column, outDir: String,
                   nShards: Int): Unit = {
    require(nShards >= 1, s"exportShards needs nShards >= 1: got $nShards")
    // pmod: a caller-supplied hash may be negative; a negative `%` would
    // write shard=-3 dirs that a positive-keyed re-export never overwrites
    df.withColumn("shard", pmod(shard.cast("long"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(outDir)
  }
}
