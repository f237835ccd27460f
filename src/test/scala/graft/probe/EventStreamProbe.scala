package graft.probe

import java.nio.file.attribute.FileTime

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStream

/** Throughput + watermark-state evidence for the event-window streaming
  * path — completing the trilogy (StreamGateProbe: the router,
  * StreamPackProbe: the accumulator; this: the WATERMARKED WINDOW
  * aggregations, whose scale question is state bounded by the watermark
  * horizon, not the stream).
  *
  * Method: stage the events table as `nFiles` TIME-RANGE-partitioned
  * parquet files with ascending modification times (the file source
  * replays by mod-time order, so event time advances roughly
  * monotonically — the realistic continuous-ingest shape; without the
  * range staging, a scrambled replay would advance the watermark to the
  * corpus max in batch 1 and drop nearly everything after as late).
  * Replay through the PRODUCT transforms (EventStream.tumblingCounts /
  * sessionize — the same functions the batch queries q22/q24 wrap),
  * read rows/s + state rows/bytes + late-drops from progress events,
  * and verify EXACT batch parity: every window the stream FINALIZED
  * (append mode emits a window only once its watermark passes) must
  * carry byte-identical aggregates to the batch run over the full
  * table — the stream/batch single-source-of-truth contract at probe
  * scale.
  *
  * Run: sbt "Test/runMain graft.probe.EventStreamProbe [sfDir] [nFiles] [filesPerTrigger]"
  */
object EventStreamProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfprobe100")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(30)
    val perTrigger = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // retain every micro-batch's progress: the default 100 silently
      // under-counts batches/stateRows/lateDrops when user-supplied
      // nFiles/filesPerTrigger exceed 100 micro-batches (ADVICE r20)
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("esprobe").toFile
    val root = tmp.getAbsolutePath
    // normalized micros timestamps (Tables.load owns the NANOS handling),
    // range-partitioned on ts so file k holds the k-th time slice
    val ev = Tables.load(spark, dir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    ev.repartitionByRange(nFiles, col("ts")).write.parquet(s"$root/in")
    val nIn = spark.read.parquet(s"$root/in").count()
    // ascending mod-times in path (= range) order: the file source's
    // replay order
    val parts = new java.io.File(s"$root/in").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.setLastModifiedTime(f.toPath,
        FileTime.fromMillis(1000000000000L + i * 1000L))
    }
    println(s"[probe] dir=$dir events=$nIn files=${parts.length} " +
      s"perTrigger=$perTrigger")

    def replay(name: String,
               xform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$root/in").schema)
        .option("maxFilesPerTrigger", perTrigger)
        .parquet(s"$root/in")
      val t0 = System.nanoTime()
      val q = xform(stream).writeStream
        .format("parquet")
        .option("path", s"$root/out_$name")
        .option("checkpointLocation", s"$root/ckpt_$name")
        .outputMode("append")
        .start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      q.stop()
      val lastOps = batches.lastOption.map(_.stateOperators.toSeq).getOrElse(Nil)
      val late = batches.flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      println(f"[probe] $name%-10s events=$nIn wall=$wall%.1f s " +
        f"rows/s=${nIn / wall}%.0f batches=${batches.length} " +
        f"stateRows=${lastOps.map(_.numRowsTotal).sum} " +
        f"stateMB=${lastOps.map(_.memoryUsedBytes).sum / 1e6}%.1f lateDrops=$late")
    }

    replay("tumbling", df => EventStream.tumblingCounts(df))
    replay("session", df => EventStream.sessionize(df))

    // batch parity on the FINALIZED windows: append mode emitted exactly
    // the windows whose end passed the final watermark; each must carry
    // the batch aggregate over the full table — COUNTS exactly, double
    // SUMS within the measured 1e-9 accumulation-order envelope (the
    // per-batch partial aggregation sums each window's values in a
    // different order than the one-shot batch plan; the ×10 oracle rung
    // measured the same ulp-scale divergence on the relational double
    // sums, bench/r20/oracle_x10.log — counts and every integer result
    // stay bit-exact)
    val streamed = spark.read.parquet(s"$root/out_tumbling")
    val batch = EventStream.tumblingCounts(ev)
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.w_start") === col("b.w_start") &&
        col("s.event_type") === col("b.event_type"), "left")
    val rows = streamed.count()
    val missing = joined.filter(col("b.n").isNull).count()
    val nMismatch = joined.filter(col("s.n") =!= col("b.n")).count()
    val sumDrift = joined.filter(
      abs(col("s.sum_value") / col("b.sum_value") - 1) > 1e-9).count()
    val batchRows = batch.count()
    require(missing == 0 && nMismatch == 0 && sumDrift == 0,
      s"finalized-window parity broke: missing=$missing nMismatch=$nMismatch " +
        s"sumDrift(>1e-9)=$sumDrift")
    println(f"[probe] parity: $rows%d finalized windows (batch total " +
      f"$batchRows%d; the gap is the final-watermark tail) — counts " +
      "bit-exact, double sums within the 1e-9 envelope, 0 missing")

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(): Unit
    }
    rmTree(tmp)
    spark.stop()
  }
}
