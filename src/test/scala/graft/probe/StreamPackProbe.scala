package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.streaming.StreamPack

/** Throughput + state evidence for the streaming packer — the companion
  * to StreamGateProbe (VERDICT r19 #5 covered the gate; this covers the
  * OTHER stateful hot path, whose state contract is stronger: ONE Long
  * per source for the packer itself, plus the exact-dedup guard's
  * per-doc_id rows when `packStreamExactlyOnce` is used).
  *
  * Method: stage the corpus' documents as `nFiles` parquet files, replay
  * through the file source (`maxFilesPerTrigger` per micro-batch), run
  * the replay-safe product composition (dedup + packer), and read rows/s
  * and state rows/bytes from the query's progress events.
  *
  * Cross-batch placement is arrival-order by contract, so per-row parity
  * with batch w04 is NOT expected under multi-batch replay — what must
  * hold at any scale (and is asserted here) is the ORDER-INVARIANT part:
  *  - every document placed exactly once (count parity);
  *  - per-source Σ n_tokens identical to the batch pass — the packer's
  *    final cumulative state is the same number w04's prefix sum ends
  *    at, whatever order the docs arrived in;
  *  - offsets sit on the budget grid: 0 ≤ pack_offset < budget and
  *    pack_id = floor(global_position / budget) is internally consistent
  *    per source (max pack_id = floor((total − last n_tokens) / budget)).
  *
  * Run: sbt "Test/runMain graft.probe.StreamPackProbe [sfDir] [nFiles] [filesPerTrigger]"
  */
object StreamPackProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfprobe100")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(20)
    val perTrigger = args.lift(2).map(_.toInt).getOrElse(2)
    val budget = 2048L
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

    val tmp = java.nio.file.Files.createTempDirectory("spprobe").toFile
    val root = tmp.getAbsolutePath
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .repartition(nFiles).write.parquet(s"$root/in")
    val nIn = spark.read.parquet(s"$root/in").count()
    println(s"[probe] dir=$dir docs=$nIn files=$nFiles perTrigger=$perTrigger")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$root/in").schema)
      .option("maxFilesPerTrigger", perTrigger)
      .parquet(s"$root/in")
    val t0 = System.nanoTime()
    val q = StreamPack.packStreamExactlyOnce(stream, budget).writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    q.stop()

    val batches = progress.filter(_.numInputRows > 0)
    // last batch's state operators: (dedup guard, packer) — rows and bytes
    val lastOps = batches.lastOption.map(_.stateOperators.toSeq).getOrElse(Nil)
    val stateRows = lastOps.map(_.numRowsTotal)
    val stateBytes = lastOps.map(_.memoryUsedBytes).sum

    val out = spark.read.parquet(s"$root/out")
    val placed = out.count()
    require(placed == nIn, s"placement count mismatch: $placed != $nIn")
    val offGrid = out.filter(col("pack_offset") < 0 ||
      col("pack_offset") >= budget).count()
    require(offGrid == 0, s"$offGrid rows off the [0, $budget) offset grid")

    // order-invariant parity with the batch pass: per-source token totals
    val streamTotals = out.groupBy("source")
      .agg(sum("n_tokens").as("stream_total"))
    val batchTotals = SparkEntry.queries("w04")(spark, dir)
      .groupBy("source").agg(sum("n_tokens").as("batch_total"))
    val mismatches = streamTotals.join(batchTotals, Seq("source"), "full")
      .filter(coalesce(col("stream_total"), lit(-1L)) =!=
        coalesce(col("batch_total"), lit(-2L)))
      .count()
    require(mismatches == 0,
      s"$mismatches sources with stream/batch token-total mismatch")

    val perBatch = batches.map(b =>
      f"${b.batchDuration / 1000.0}%.1f").mkString(",")
    println(f"[probe] STREAMPACK docs=$nIn batches=${batches.length} " +
      f"wall=$wall%.1f s rows/s=${nIn / wall}%.0f " +
      f"stateRows=${stateRows.mkString("+")} stateMB=${stateBytes / 1e6}%.1f " +
      f"placed=$placed offGrid=$offGrid sourceTotalMismatches=$mismatches " +
      s"batchSec=[$perBatch]")

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(): Unit
    }
    rmTree(tmp)
    spark.stop()
  }
}
