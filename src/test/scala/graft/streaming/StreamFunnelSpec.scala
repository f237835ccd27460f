package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** StreamFunnel contracts: q46's strict-order semantics per stage,
  * within-batch arrival-order independence, replay idempotence, and
  * stream/batch parity against the q46 query itself on the same events.
  */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  /** latest emission per user (OutputMode.Update revisions). */
  private def latest(dir: String): Map[Long, Int] = {
    val df = spark.read.parquet(dir)
    df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("batch_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("stage"))
      .as[(Long, Int)].collect().toMap
  }

  private def startQuery(input: MemoryStream[(Long, String, Timestamp, Long)],
                         dir: String) = {
    val events = input.toDS().toDF("user_id", "event_type", "ts", "event_id")
    StreamFunnel.funnelStream(events)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamFunnel.UserFunnel],
                       id: Long) =>
        b.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(dir)
        ()
      }
      .start()
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sfunnel").toString + "/out"

  test("strict-order traps (the q46 edge fixture), within-batch order " +
      "independence, and replay idempotence") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmp()
    val input = MemoryStream[(Long, String, Timestamp, Long)]
    val q = startQuery(input, out)
    // the q46 edge fixture, delivered DELIBERATELY out of order within
    // the batch — the fold sorts by (ts, event_id)
    val batch = Seq(
      (1L, "purchase", ts(2), 103L), (1L, "view", ts(0), 101L),
      (1L, "click", ts(1), 102L),
      (2L, "view", ts(1), 202L), (2L, "click", ts(0), 201L),
      (3L, "click", ts(2), 303L), (3L, "view", ts(0), 301L),
      (3L, "purchase", ts(1), 302L),
      (4L, "view", ts(0), 401L), (4L, "click", ts(0), 402L),
      (5L, "purchase", ts(1), 502L), (5L, "click", ts(0), 501L))
    input.addData(batch)
    q.processAllAvailable()
    val stages = latest(out)
    assert(stages == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0),
      s"got $stages")
    // REPLAY the identical batch: every transition is a guarded monotone
    // min, so nothing may move
    input.addData(batch)
    q.processAllAvailable()
    assert(latest(out) == stages, "replay moved a stage")
    q.stop()
  }

  test("stream/batch parity: after an in-order prefix the per-stage " +
      "counts equal batch q46 over the same events") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmp()
    val input = MemoryStream[(Long, String, Timestamp, Long)]
    val q = startQuery(input, out)
    // per-user in-order delivery split across two micro-batches
    val types = Seq("view", "click", "purchase", "error")
    def ev(u: Long, i: Int) =
      (u, types(((u + i) % 4).toInt), ts(i), u * 100 + i)
    val all = for (u <- 1L to 20L; i <- 0 until 6) yield ev(u, i)
    val (b1, b2) = all.partition(_._4 % 100 < 3)
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    val stages = latest(out)
    val dir = java.nio.file.Files.createTempDirectory("sfunnel").toString
    all.toDF("user_id", "event_type", "ts", "event_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.SparkEntry.queries("q46")(spark, dir).collect().head
    assert(stages.values.count(_ >= 1) == r.getLong(0), "n_view parity")
    assert(stages.values.count(_ >= 2) == r.getLong(1), "n_view_click parity")
    assert(stages.values.count(_ == 3) == r.getLong(2), "n_funnel parity")
    q.stop()
  }
}
