package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamGate

/** Throughput evidence for the streaming gate path (VERDICT r19 #5):
  * StreamGate is correctness-tested on MemoryStream micro-batches, but
  * its sustained rows/s and state footprint at probe scale were
  * unmeasured — and state size is the scale question for
  * flatMapGroupsWithState (one Owner row per distinct surviving content
  * hash, content-diversity-bounded).
  *
  * Method: stage the corpus' documents as `nFiles` parquet files, replay
  * them through the file streaming source (`maxFilesPerTrigger` files
  * per micro-batch — a deterministic replay of continuous ingest), run
  * the PRODUCT gate + dual-sink router end to end, and read rows/s and
  * state rows/bytes from the query's own progress events.
  *
  * Run: sbt "Test/runMain graft.probe.StreamGateProbe [sfDir] [nFiles] [filesPerTrigger]"
  */
object StreamGateProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfprobe100")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(20)
    val perTrigger = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("sgprobe").toFile
    val root = tmp.getAbsolutePath
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    docs.repartition(nFiles).write.parquet(s"$root/in")
    val nIn = spark.read.parquet(s"$root/in").count()
    println(s"[probe] dir=$dir docs=$nIn files=$nFiles perTrigger=$perTrigger")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$root/in").schema)
      .option("maxFilesPerTrigger", perTrigger)
      .parquet(s"$root/in")
    val t0 = System.nanoTime()
    val q = StreamGate.routeToSinks(StreamGate.gate(stream),
      s"$root/keep", s"$root/quarantine", s"$root/ckpt")
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress
    q.stop()

    val batches = progress.filter(_.numInputRows > 0)
    val rowsSeen = batches.map(_.numInputRows).sum
    val stateRows = batches.flatMap(_.stateOperators.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    val stateBytes = batches.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      .lastOption.getOrElse(-1L)
    val perBatch = batches.map(b =>
      f"${b.batchDuration / 1000.0}%.1f").mkString(",")
    val kept = spark.read.parquet(s"$root/keep").count()
    val quarantined = spark.read.parquet(s"$root/quarantine").count()
    require(kept + quarantined == nIn,
      s"verdict count mismatch: $kept + $quarantined != $nIn")
    println(f"[probe] STREAMGATE docs=$nIn batches=${batches.length} " +
      f"wall=$wall%.1f s rows/s=${nIn / wall}%.0f stateRows=$stateRows " +
      f"stateMB=${stateBytes / 1e6}%.1f kept=$kept quarantined=$quarantined " +
      s"batchSec=[$perBatch]")

    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(): Unit
    }
    rmTree(tmp)
    spark.stop()
  }
}
