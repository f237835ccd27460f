package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming counterparts of the batch training-data operators (§2.9
  * extension): exact dedup on content hash during ingestion, watermark-
  * bounded dedup state, and the stream-stream interval join. Same column
  * transforms as the batch d01/q21 paths — only the source/sink change.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact dedup drops repeated content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = input.toDS().toDF("doc_id", "text")
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    input.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")))
    q.processAllAvailable()
    // later micro-batch re-sends known content plus one new doc: only the
    // new one survives (state remembers earlier batches)
    input.addData(Seq((4L, "beta"), (5L, "gamma")))
    q.processAllAvailable()
    val kept = spark.table("sdedup_out").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(kept == Set(1L, 2L, 5L))
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDS().toDF("ts", "text")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("text"))
    val q = deduped.writeStream.format("memory").queryName("sdedup_wm_out")
      .outputMode("append").start()
    // duplicate inside the watermark window -> dropped
    input.addData(Seq(
      (ts("2024-01-15 10:00:00"), "alpha"),
      (ts("2024-01-15 10:05:00"), "alpha")))
    q.processAllAvailable()
    // advance the watermark far past the first occurrences, then re-send:
    // state for "alpha" has expired, so the re-send is emitted again —
    // that's the contract that keeps dedup state bounded on an unbounded
    // stream (exact-forever dedup needs the batch d01/d06 path instead)
    input.addData(Seq((ts("2024-01-15 12:00:00"), "advance")))
    q.processAllAvailable()
    input.addData(Seq((ts("2024-01-15 12:01:00"), "alpha")))
    q.processAllAvailable()
    val emitted = spark.table("sdedup_wm_out").select("ts", "text")
      .as[(Timestamp, String)].collect().toSeq
    q.stop()
    assert(emitted.count(_._2 == "alpha") == 2,
      s"expected first occurrence + post-expiry re-emit, got $emitted")
    assert(!emitted.contains((ts("2024-01-15 10:05:00"), "alpha")))
  }

  test("stream-stream interval join pairs purchases with recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDS().toDF("click_ts", "c_user")
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDS().toDF("purchase_ts", "p_user")
      .withWatermark("purchase_ts", "1 hour")
    // inner interval join: click within 30 minutes before the purchase;
    // both watermarks bound the buffered state on each side
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData(Seq(
      (ts("2024-01-15 10:00:00"), 1L),   // in range for the 10:20 purchase
      (ts("2024-01-15 09:00:00"), 2L)))  // too old for the 10:00 purchase
    purchases.addData(Seq(
      (ts("2024-01-15 10:20:00"), 1L),
      (ts("2024-01-15 10:00:00"), 2L)))
    q.processAllAvailable()
    val rows = spark.table("ssj_out")
      .select("p_user", "purchase_ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    q.stop()
    assert(rows == Set((1L, ts("2024-01-15 10:20:00"), ts("2024-01-15 10:00:00"))))
  }
}
