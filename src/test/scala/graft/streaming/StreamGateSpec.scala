package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[StreamGate]] — the streaming corpus-gate router: c01's row-local
  * gates stateless, the duplicate gate stateful (first-owner-wins),
  * verdict precedence, the documented divergence corner, batch parity,
  * and the dual-sink overwrite idempotence.
  */
class StreamGateSpec extends SparkSpec {
  import spark.implicits._

  private val goodA = "the quick brown fox jumps over the lazy dog again"
  private val goodB = "a second perfectly ordinary document with many tokens here"
  private val junk = "A B C D E F G H I J K L M N O P" // 0 lowercase

  test("stream gate: row-local verdicts are stateless, the duplicate gate " +
      "is stateful across micro-batches, and precedence matches c01 " +
      "(row gates before the duplicate gate)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamGate.gate(input.toDS().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("sgate_out")
      .outputMode("append").start()
    input.addData(Seq(
      (1L, "en", goodA), (2L, "en", "a b c"), (3L, "es", goodA + " otra"),
      (4L, "en", junk), (8L, "en", null)))
    q.processAllAvailable()
    // batch 2: 5 repeats batch-1 content (cross-batch dup), 6 is new,
    // 7 repeats 6 within the same batch (in-batch dup, higher id loses)
    input.addData(Seq(
      (5L, "en", goodA), (6L, "en", goodB), (7L, "en", goodB)))
    q.processAllAvailable()
    val got = spark.table("sgate_out").as[StreamGate.Verdict]
      .collect().map(v => v.doc_id -> v.verdict).toMap
    q.stop()
    assert(got == Map(
      1L -> "kept", 2L -> "too_short", 3L -> "lang", 4L -> "low_quality",
      8L -> "empty", 5L -> "duplicate", 6L -> "kept", 7L -> "duplicate"),
      got.toString)
  }

  test("stream gate divergence corner (documented): a row-gated earlier " +
      "twin does NOT shadow a clean later copy — the clean copy becomes " +
      "the owner and is kept") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamGate.gate(input.toDS().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("sgate_corner_out")
      .outputMode("append").start()
    input.addData(Seq((10L, "es", goodA)))
    q.processAllAvailable()
    input.addData(Seq((11L, "en", goodA)))
    q.processAllAvailable()
    val got = spark.table("sgate_corner_out").as[StreamGate.Verdict]
      .collect().map(v => v.doc_id -> v.verdict).toMap
    q.stop()
    // batch c01 would say 11 -> duplicate (keeper = min id over ALL
    // copies); the stream gate keeps it because 10 never survived to own
    assert(got == Map(10L -> "lang", 11L -> "kept"), got.toString)
  }

  test("stream gate runs unchanged in BATCH mode and agrees with the " +
      "streamed verdicts on the same rows") {
    val rows = Seq(
      (1L, "en", goodA), (2L, "en", "a b c"), (3L, "es", goodA + " otra"),
      (4L, "en", junk), (8L, "en", null: String),
      (5L, "en", goodA), (6L, "en", goodB), (7L, "en", goodB))
    val got = StreamGate.gate(rows.toDF("doc_id", "lang", "text"))
      .collect().map(v => v.doc_id -> v.verdict).toMap
    assert(got == Map(
      1L -> "kept", 2L -> "too_short", 3L -> "lang", 4L -> "low_quality",
      8L -> "empty", 5L -> "duplicate", 6L -> "kept", 7L -> "duplicate"),
      got.toString)
  }

  test("routeToSinks: a re-executed micro-batch (same batchId, same rows) " +
      "OVERWRITES its batch_id subdirectory in both sinks — no appended " +
      "duplicates after a replay") {
    implicit val sqlCtx = spark.sqlContext
    val keepDir = java.nio.file.Files.createTempDirectory("sgate_keep").toString
    val quarDir = java.nio.file.Files.createTempDirectory("sgate_quar").toString
    val data = Seq((1L, "en", goodA), (2L, "en", "a b c"))
    // two independent query runs, each starting at batchId 0 with the
    // same rows — the second is byte-for-byte the replay of the first
    for (run <- 1 to 2) {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"sgate_ckpt$run").toString
      val input = MemoryStream[(Long, String, String)]
      input.addData(data)
      val q = StreamGate.routeToSinks(
        StreamGate.gate(input.toDS().toDF("doc_id", "lang", "text")),
        keepDir, quarDir, ckpt,
        Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      q.awaitTermination(20000)
      q.stop()
    }
    val kept = spark.read.parquet(s"$keepDir/batch_id=0")
      .select("doc_id").as[Long].collect().toSeq
    val quar = spark.read.parquet(s"$quarDir/batch_id=0")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(kept == Seq(1L), kept.toString)
    assert(quar == Seq(2L -> "too_short"), quar.toString)
  }
}
