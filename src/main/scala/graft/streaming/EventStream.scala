package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream/batch-shared window transforms over the events schema (SURVEY
  * §2.9): the same function runs under `readStream` (with watermark) and in
  * batch (where the watermark is a no-op) — single source of truth, which is
  * how the batch stage registry is reused incrementally via `foreachBatch`.
  */
object EventStream {

  /** Tumbling 10-minute counts per event type with late-data watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows (30-minute gap). */
  def sessionize(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}
