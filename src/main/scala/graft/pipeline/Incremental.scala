package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental re-stacking (SURVEY §4 "mtime-based incremental recompute",
  * F5/A6): rebuild a stacked group only when its output is missing or older
  * than the newest input — the `processstep_stacker.py:21-39` staleness
  * check as snapshot bookkeeping.
  *
  * Inputs are metadata-only frames, so planning which groups to rebuild
  * costs one scan of file-listing metadata — at 100 TB this is the
  * difference between re-stacking everything nightly and touching only the
  * handful of batches that changed.
  */
object Incremental {

  /** Groups needing a rebuild: newest input mtime > snapshot stamp, or no
    * snapshot row at all.
    *
    * @param inputs   per-repetition listing with (keys..., modificationTime)
    * @param snapshot prior stacked snapshot with (keys..., stackedAt)
    * @param keys     grouping key columns (ymd, batch, configuration)
    */
  def staleGroups(inputs: DataFrame, snapshot: DataFrame, keys: Seq[String]): DataFrame = {
    val newest = inputs.groupBy(keys.map(col): _*)
      .agg(max(col("modificationTime")).as("newest_input"))
    newest.join(snapshot.select((keys.map(col) :+ col("stackedAt")): _*), keys, "left")
      .filter(col("stackedAt").isNull || col("newest_input") > col("stackedAt"))
      .select((keys.map(col) :+ col("newest_input")): _*)
  }

  /** Merge freshly stacked groups over the prior snapshot: carried-forward
    * rows for untouched groups, new rows for rebuilt ones (the immutable
    * replacement for the reference's in-place file rewrite). */
  def mergeSnapshot(prior: DataFrame, rebuilt: DataFrame, keys: Seq[String]): DataFrame =
    prior.join(rebuilt.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(rebuilt)
}
