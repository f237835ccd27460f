package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long-format image stacking (SURVEY §7.4 hard-part 1): the 100 TB-safe
  * fallback for A2/A3 when frames are too large for whole-image rows.
  *
  * `ArrayStats` keeps one image per row and merges Welford buffers — ideal
  * while a full image fits comfortably in an executor row. When frames reach
  * ~10^6+ pixels and groups reach thousands of repetitions, the long format
  * `(group, pixel_idx, v)` spreads a single group's pixels across the whole
  * cluster: the per-pixel aggregation shuffles by (group, pixel_idx), so no
  * task ever holds more than a partition of pixel-cells — there is no
  * per-group memory ceiling at all.
  *
  * Both paths implement the same statistics (mean / stddev ddof=1 / sem per
  * pixel); `StackLongSpec` asserts they agree bit-tightly.
  */
object StackLong {

  /** Explode image rows into long format. Input needs `imageCol` =
    * array<float> plus the group key columns. */
  def toLong(df: DataFrame, keys: Seq[String], imageCol: String): DataFrame =
    df.select(keys.map(col) :+ posexplode(col(imageCol)).as(Seq("pixel_idx", "v")): _*)

  /** Per-pixel stacking statistics over the long format: one shuffle keyed
    * by (group, pixel_idx) with full map-side partial aggregation. */
  def pixelStats(long: DataFrame, keys: Seq[String]): DataFrame = {
    val g = keys.map(col) :+ col("pixel_idx")
    long.groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        avg(col("v")).as("mean"),
        stddev_samp(col("v")).as("std"),
        (stddev_samp(col("v")) / sqrt(count(lit(1)))).as("sem"))
  }

  /** Reassemble per-pixel stats into per-group arrays (only when the result
    * must be image-shaped again; often the long form IS the product). */
  def toArrays(stats: DataFrame, keys: Seq[String]): DataFrame = {
    def series(c: String): Column =
      transform(
        array_sort(collect_list(struct(col("pixel_idx"), col(c).as("x")))),
        s => s.getField("x"))
    stats.groupBy(keys.map(col): _*)
      .agg(
        max(col("n")).as("n"),
        min(col("n")).as("__n_min"),
        series("mean").as("mean"),
        series("std").as("std"),
        series("sem").as("sem"))
      // ragged groups (mismatched image lengths) must fail loudly like the
      // ArrayStats path, not report max(n) over partially-covered pixels
      .withColumn("n",
        when(col("__n_min") =!= col("n"),
          raise_error(concat(lit("stacked arrays must share a shape: per-pixel counts range "),
            col("__n_min").cast("string"), lit(".."), col("n").cast("string"))))
          .otherwise(col("n")))
      .drop("__n_min")
  }
}
