package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming translation of the reference's filesystem watcher
  * (`/root/reference/src/watcher.py`, SURVEY §2.9 / §3.3):
  *
  * - watchdog `on_created` events        -> a stream of [[FileEvent]]s
  *   (production: `readStream.format("binaryFile")` over the data root;
  *   tests: MemoryStream)
  * - poll-until-stable loop (10 s / 660 s) -> stateful completeness gate:
  *   a repetition directory is emitted once its 4 required files are present
  *   (`src/checkers.py:19-46`), or flagged as timed out after the
  *   stabilization window (`src/watcher.py:38-61`)
  * - idempotence / already-processed skip -> checkpointing + downstream
  *   left_anti join (F3)
  *
  * The gate is the one genuinely stateful op of the reference (SURVEY §7.4
  * item 6); everything downstream reuses the batch stage registry via
  * `foreachBatch`.
  */
object Watcher {

  /** One created file, keyed by its repetition directory. */
  case class FileEvent(repDir: String, relPath: String, ts: Timestamp)

  /** Gate verdict: complete set of required files, or gave up. */
  case class RepetitionReady(
      repDir: String,
      nFiles: Int,
      complete: Boolean, // false = timed out incomplete
      firstSeen: Timestamp,
      decidedAt: Timestamp)

  // State must be a PUBLIC case class with Array (not Set) members: the
  // product encoder's generated code cannot access private accessors and
  // cannot codegen Scala Sets.
  case class GateState(files: Array[String], firstSeenMs: Long)

  /** The 4 required-file conditions of `checkers.py:15-16,19-46`:
    * two eiger masters + two im_craw in beam-profile subdirs, one of each at
    * top level. */
  private val eigerTop = "^eiger_\\d+_master\\.h5$".r
  private val eigerSub = "^(beam_profile|beam_profile_through_sample)/eiger_\\d+_master\\.h5$".r
  private val crawTop = "^im_craw\\.nxs$".r
  private val crawSub = "^(beam_profile|beam_profile_through_sample)/im_craw\\.nxs$".r

  def isComplete(files: Set[String]): Boolean = {
    def c(r: scala.util.matching.Regex) = files.count(f => r.findFirstIn(f).isDefined)
    c(eigerSub) >= 2 && c(crawSub) >= 2 && c(eigerTop) >= 1 && c(crawTop) >= 1
  }

  /** Stateful completeness gate. Emits each repetition directory exactly once:
    * as soon as its file set is complete, or (incomplete) when the
    * stabilization timeout elapses without new files.
    */
  def completenessGate(
      events: Dataset[FileEvent],
      stabilizationTimeoutMs: Long = 660000L): Dataset[RepetitionReady] = {
    import events.sparkSession.implicits._

    events.groupByKey(_.repDir)
      .flatMapGroupsWithState[GateState, RepetitionReady](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (repDir, newEvents, state: GroupState[GateState]) =>
          if (state.hasTimedOut) {
            // watcher gave up waiting (`watcher.py:58-61`)
            val s = state.get
            state.remove()
            Iterator(RepetitionReady(repDir, s.files.length, complete = false,
              new Timestamp(s.firstSeenMs),
              new Timestamp(System.currentTimeMillis())))
          } else {
            val evs = newEvents.toSeq
            val prev = state.getOption.getOrElse(
              GateState(Array.empty, evs.map(_.ts.getTime).min))
            val files = (prev.files.toSet ++ evs.map(_.relPath)).toArray
            if (isComplete(files.toSet)) {
              state.remove()
              Iterator(RepetitionReady(repDir, files.length, complete = true,
                new Timestamp(prev.firstSeenMs),
                new Timestamp(System.currentTimeMillis())))
            } else {
              state.update(GateState(files, prev.firstSeenMs))
              state.setTimeoutDuration(stabilizationTimeoutMs)
              Iterator.empty
            }
          }
      }
  }

  /** Production wiring: watch a data root for new files and derive
    * FileEvents from paths `.../{ymd}_{batch}_{rep}/<relPath>`
    * (`YMD_class.py:33-44` path parsing). */
  def fileEvents(spark: SparkSession, dataRoot: String): Dataset[FileEvent] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*")
      .load(dataRoot)
      .select(col("path"), col("modificationTime"))
      .withColumn("repDir",
        regexp_extract(col("path"), "(\\d{8}_\\d+_\\d+)", 1))
      .withColumn("relPath",
        regexp_extract(col("path"), "\\d{8}_\\d+_\\d+/(.*)$", 1))
      .select(col("repDir"), col("relPath"), col("modificationTime").as("ts"))
      .as[FileEvent]
  }
}
