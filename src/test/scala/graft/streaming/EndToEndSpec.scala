package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.{Fixtures, Sinks, Stages}
import Watcher._

/** The complete §3.3 translation in one test: watchdog-style file events →
  * stateful completeness gate → `foreachBatch` replay of the reference's
  * verbatim 15-step list → partitioned snapshot sink — and the streamed
  * snapshot must equal the plain batch run of the same pipeline. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fullSet = Seq(
    "eiger_1_master.h5", "im_craw.nxs",
    "beam_profile/eiger_2_master.h5", "beam_profile/im_craw.nxs",
    "beam_profile_through_sample/eiger_3_master.h5",
    "beam_profile_through_sample/im_craw.nxs")

  private val keyCols = Seq("ymd", "batch", "repetition", "configuration")

  private def comparable(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(
        col("ymd").cast("string"), col("batch").cast("int"),
        col("repetition"), col("configuration"),
        round(col("transmission"), 10), round(col("thickness"), 10),
        round(col("direct_flux"), 4))
      .collect().map(_.toString).sorted.toSeq

  test("watcher -> gate -> referenceSteps -> snapshot equals the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FileEvent]
    // short stabilization: every dir completes in the data batch, and the
    // post-emission tombstones then expire quickly so the AvailableNow
    // drain terminates instead of idling out the await cap
    val gated = Watcher.completenessGate(input.toDS(), stabilizationTimeoutMs = 5000L)

    val snapDir = Files.createTempDirectory("e2e_snap").toString
    val ckpt = Files.createTempDirectory("e2e_ckpt").toString
    val ctx = Fixtures.context(spark)
    val reps = Fixtures.repetitions(spark)

    // every repetition directory's full file set, in ONE micro-batch (the
    // snapshot sink overwrites per batch, exactly like a reprocessing run)
    input.addData(for {
      b <- Seq(1, 2); r <- Seq(1, 2, 3); f <- fullSet
    } yield FileEvent(s"20240115_${b}_$r", f, ts("2024-01-15 10:00:00")))

    val runBatch: (Dataset[RepetitionReady], Long) => Unit = { (batch, _) =>
      // the gate's verdicts pick WHICH repetition dirs to process — the
      // ready set is tiny (one row per directory), so driver-side collect
      // is the right move; the data-sized frame stays distributed.
      val ready = batch.filter(_.complete).collect().map(_.repDir).toSet
      if (ready.nonEmpty) {
        val selected = reps.filter(
          concat_ws("_", col("ymd"), col("batch"), col("repetition"))
            .isInCollection(ready))
        Sinks.writeSnapshot(
          Stages.run(selected, ctx, Stages.referenceSteps), snapDir)
        ctx.caches.release()
      }
    }
    val q = gated.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(runBatch)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    q.stop()

    val snapshot = spark.read.parquet(snapDir)
    assert(snapshot.count() == 12, "all 6 dirs x 2 configurations processed")
    // partition pruning on the snapshot layout still works end to end
    assert(snapshot.where(col("batch") === 1).count() == 6)

    val ctx2 = Fixtures.context(spark)
    val direct = Stages.run(reps, ctx2, Stages.referenceSteps)
    assert(comparable(snapshot) == comparable(direct),
      "streamed snapshot must match the batch pipeline bit for bit")
    ctx2.caches.release()
  }
}
