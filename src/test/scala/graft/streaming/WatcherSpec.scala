package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import Watcher._

/** MemoryStream-driven tests of the completeness gate and the stream/batch
  * parity of the shared window transforms (SURVEY §5 test strategy #5). */
class WatcherSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fullSet = Seq(
    "eiger_1_master.h5", "im_craw.nxs",
    "beam_profile/eiger_2_master.h5", "beam_profile/im_craw.nxs",
    "beam_profile_through_sample/eiger_3_master.h5",
    "beam_profile_through_sample/im_craw.nxs")

  test("isComplete implements the 4-condition readiness predicate") {
    assert(isComplete(fullSet.toSet))
    assert(!isComplete(fullSet.tail.toSet)) // missing top-level eiger
    assert(!isComplete(fullSet.toSet - "beam_profile/im_craw.nxs"))
  }

  test("fileEvents discovers nested files and anchors the dir grammar") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("fe")
    val rep = root.resolve("2024/20240115/20240115_1_2")
    Files.createDirectories(rep.resolve("beam_profile"))
    Files.write(rep.resolve("im_craw.nxs"), Array[Byte](1))
    Files.write(rep.resolve("beam_profile/im_craw.nxs"), Array[Byte](1))
    // decoy: date-like prefix but NOT a repetition dir (needs the '/' anchor)
    val decoy = root.resolve("20240115_1_2_old")
    Files.createDirectories(decoy)
    Files.write(decoy.resolve("im_craw.nxs"), Array[Byte](1))
    Files.write(root.resolve("notes.txt"), Array[Byte](1)) // stray, no key

    val q = Watcher.fileEvents(spark, root.toString)
      .writeStream.format("memory").queryName("fe_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(30000); q.stop()
    val evs = spark.table("fe_out").as[FileEvent].collect()
    assert(evs.map(e => (e.repDir, e.relPath)).toSet == Set(
      ("20240115_1_2", "im_craw.nxs"),
      ("20240115_1_2", "beam_profile/im_craw.nxs")))
  }

  test("gate emits a repetition only once its file set is complete") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FileEvent]
    val gated = completenessGate(input.toDS(), stabilizationTimeoutMs = 600000L)
    // AvailableNow + a shared checkpoint: each run drains pending data and
    // stops (a pending processing-time timeout otherwise keeps the engine in
    // a no-data micro-batch loop and processAllAvailable never settles);
    // gate state survives across the restarts via the checkpoint.
    val ckpt = java.nio.file.Files.createTempDirectory("gate_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("gate_out").toString
    def drain(): Unit = {
      val q = gated.writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // the still-incomplete second dir holds a pending 600s timeout, which
      // keeps AvailableNow evaluating no-data batches — cap the drain well
      // below that; the data batches themselves process in ~2s
      q.awaitTermination(15000)
      q.stop()
    }
    def results() = spark.read.schema(
      org.apache.spark.sql.Encoders.product[RepetitionReady].schema)
      .parquet(outDir).as[RepetitionReady].collect()

    // first 3 files only -> nothing emitted
    input.addData(fullSet.take(3).map(f =>
      FileEvent("20240115_1_1", f, ts("2024-01-15 10:00:00"))))
    drain()
    assert(results().isEmpty)

    // complete the set -> exactly one ready record (state recovered from
    // the checkpoint); second dir stays incomplete
    input.addData(fullSet.drop(3).map(f =>
      FileEvent("20240115_1_1", f, ts("2024-01-15 10:00:05"))))
    input.addData(Seq(FileEvent("20240115_1_2", "im_craw.nxs", ts("2024-01-15 10:00:06"))))
    drain()
    val out = results()
    assert(out.length == 1)
    assert(out.head.repDir == "20240115_1_1")
    assert(out.head.complete && out.head.nFiles == 6)

    // trailing files ALWAYS arrive after completion (eiger data files) —
    // the tombstone must swallow them, never re-open the gate
    input.addData(Seq(FileEvent("20240115_1_1", "eiger_1_data_000001.h5",
      ts("2024-01-15 10:00:30"))))
    drain()
    assert(results().length == 1, "completed dir must not emit again")
  }

  test("gate times out and emits incomplete after the stabilization window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FileEvent]
    // 1-second stabilization timeout so the give-up path actually fires
    val gated = completenessGate(input.toDS(), stabilizationTimeoutMs = 1000L)
    val ckpt = java.nio.file.Files.createTempDirectory("gate_to_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("gate_to_out").toString
    def drain(): Unit = {
      val q = gated.writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", outDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // with pending timeouts AvailableNow keeps evaluating no-data
      // batches; 10s is plenty for the 1s stabilization window to fire
      q.awaitTermination(10000); q.stop()
    }
    input.addData(Seq(FileEvent("20240115_7_1", "im_craw.nxs", ts("2024-01-15 10:00:00"))))
    drain()
    Thread.sleep(1500) // let the processing-time timeout expire
    // any new batch triggers timeout processing for expired groups
    input.addData(Seq(FileEvent("20240115_8_1", "im_craw.nxs", ts("2024-01-15 10:00:02"))))
    drain()
    val out = spark.read.schema(
      org.apache.spark.sql.Encoders.product[RepetitionReady].schema)
      .parquet(outDir).as[RepetitionReady].collect()
    // the AvailableNow drain keeps evaluating pending timeouts, so the
    // second (also-incomplete) dir may give up too — assert on the first
    val first = out.find(_.repDir == "20240115_7_1")
    assert(first.isDefined, s"expected a timeout record, got ${out.toSeq}")
    assert(!first.get.complete && first.get.nFiles == 1)
    assert(out.forall(!_.complete))
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val counts = EventStream.tumblingCounts(
      input.toDS().toDF("ts", "event_type", "value", "user_id"),
      watermark = "30 minutes")
    val q = counts.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1 advances the watermark to 11:30
    input.addData(Seq(
      (ts("2024-01-15 10:05:00"), "click", 1.0, 1L),
      (ts("2024-01-15 12:00:00"), "click", 1.0, 2L)))
    q.processAllAvailable()
    // batch 2: one event far behind the watermark (dropped), one fresh
    input.addData(Seq(
      (ts("2024-01-15 09:00:00"), "click", 100.0, 3L), // late -> dropped
      (ts("2024-01-15 13:00:00"), "click", 1.0, 4L)))
    q.processAllAvailable()
    // advance watermark far enough to finalize every surviving window
    input.addData(Seq((ts("2024-01-15 15:00:00"), "view", 1.0, 5L)))
    q.processAllAvailable()
    val rows = spark.table("wm_out")
      .select("w_start", "sum_value").as[(Timestamp, Double)].collect().toMap
    q.stop()
    assert(!rows.contains(ts("2024-01-15 09:00:00")), "late window must not appear")
    assert(rows(ts("2024-01-15 10:00:00")) == 1.0)
  }

  test("tumbling window transform: stream result equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-15 10:01:00"), "click", 1.0, 1L),
      (ts("2024-01-15 10:04:00"), "click", 2.0, 2L),
      (ts("2024-01-15 10:11:00"), "view", 3.0, 3L),
      (ts("2024-01-15 10:19:59"), "click", 4.0, 4L))

    val batch = EventStream.tumblingCounts(
      rows.toDF("ts", "event_type", "value", "user_id"))
      .collect().map(_.toString).sorted

    val input = MemoryStream[(Timestamp, String, Double, Long)]
    val stream = EventStream.tumblingCounts(
      input.toDS().toDF("ts", "event_type", "value", "user_id"))
    val q = stream.writeStream.format("memory").queryName("tumb_out")
      .outputMode("complete").start()
    input.addData(rows)
    q.processAllAvailable()
    val streamed = spark.table("tumb_out").collect().map(_.toString).sorted
    q.stop()
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.length == 3) // two windows for click + one for view
  }

  test("sessionize merges events within the gap, splits across it") {
    val rows = Seq(
      (ts("2024-01-15 10:00:00"), "click", 1.0, 7L),
      (ts("2024-01-15 10:20:00"), "click", 1.0, 7L), // same session
      (ts("2024-01-15 11:30:00"), "click", 1.0, 7L), // > 30 min later -> new
      (ts("2024-01-15 10:00:00"), "view", 1.0, 8L))
    val out = EventStream.sessionize(rows.toDF("ts", "event_type", "value", "user_id"))
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getLong(3) == 2) // user 7 first session has 2 events
    assert(out(0).getTimestamp(1) == ts("2024-01-15 10:50:00")) // last + gap
  }
}
