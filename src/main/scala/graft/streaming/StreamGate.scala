package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.functions.TextFns

/** Streaming corpus-gate router — the continuous-ingest counterpart of the
  * batch c01 capstone (minus decontamination, which composes from
  * [[StreamDedup.decontaminate]] upstream when an eval set is in play).
  *
  * The row-local gates (empty / too_short / lang / low_quality) evaluate
  * STATELESSLY per micro-batch — the same codegen column predicates batch
  * c01 compiles onto its scan. The duplicate gate evaluates STATEFULLY:
  * the lowest-id document in the first micro-batch that carries a content
  * hash owns it (min-of-batch, the same keeper rule as batch d06/c01),
  * and every later arrival of that hash gates as 'duplicate'.
  *
  * One DOCUMENTED divergence from c01's verdict chain: c01 computes its
  * keeper over ALL documents of a hash, so a row-gated document (e.g.
  * wrong lang) can still shadow a clean later copy into 'duplicate'.
  * Here gated documents never reach the keyed stage, so a clean copy
  * whose only earlier twin was itself discarded becomes the owner and is
  * KEPT — the curation-correct choice (a dropped document should not
  * shadow a keepable one); StreamGateSpec pins the corner explicitly.
  *
  * State: one Long (owner doc_id) per distinct surviving content hash —
  * content-diversity-bounded, not stream-length-bounded (re-sent content
  * hits existing owners). For unbounded streams bound it further with
  * `dropDuplicatesWithinWatermark` upstream, the standing §2.9 trade.
  * Replay safety: ownership is first-write-wins, so re-delivery of the
  * owner re-emits 'kept' and re-delivery of a shadowed doc re-emits
  * 'duplicate' — verdicts are stable under at-least-once delivery, which
  * is what makes [[routeToSinks]]'s per-batch overwrite idempotent end
  * to end. Runs unchanged in batch mode (state starts empty per group),
  * keeping the module's stream/batch single-source-of-truth contract.
  */
object StreamGate {

  // Public case classes: Catalyst encoders require publicly accessible
  // types (same constraint Watcher.GateState documents).
  case class HashedDoc(doc_id: Long, h: String)
  case class Owner(doc_id: Long)
  case class Verdict(doc_id: Long, verdict: String)

  /** c01's row-local verdict chain; null = survives to the duplicate
    * gate. Kept as a Column so the streaming and any batch caller compile
    * the identical predicates.
    */
  def rowVerdict: Column = {
    val alphaRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[a-z]", ""))).cast("double") /
      length(col("text"))
    when(col("text").isNull, "empty")
      .when(size(TextFns.tokens(col("text"))) < 5, "too_short")
      .when(col("lang") =!= "en", "lang")
      .when(alphaRatio < 0.7, "low_quality")
  }

  /** docs: (doc_id: long, lang: string, text: string) — streaming or
    * batch. Emits exactly one Verdict per input row (replays re-emit the
    * same verdict).
    */
  def gate(docs: DataFrame): Dataset[Verdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rv = docs.select(col("doc_id").cast("long").as("doc_id"),
      rowVerdict.as("verdict"),
      // null-hash sentinel: c01's lesson — a null key would silently drop
      // the row from the keyed stage instead of gating it
      coalesce(md5(col("text")), lit("<null>")).as("h"))
    val failed = rv.filter(col("verdict").isNotNull)
      .select(col("doc_id"), col("verdict")).as[Verdict]
    val survivors = rv.filter(col("verdict").isNull)
      .select(col("doc_id"), col("h")).as[HashedDoc]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, ds: Iterator[HashedDoc], state: GroupState[Owner]) => {
          val docs = ds.toArray.sortBy(_.doc_id)
          val owner = state.getOption.map(_.doc_id)
            .getOrElse(docs.head.doc_id)
          if (state.getOption.isEmpty) state.update(Owner(owner))
          docs.iterator.map(d => Verdict(d.doc_id,
            if (d.doc_id == owner) "kept" else "duplicate"))
        })
    failed.union(survivors)
  }

  /** The router: 'kept' verdicts to `keepDir`, everything else to
    * `quarantineDir` (S15's quarantine-sink pattern on a stream), each
    * micro-batch OVERWRITING its own `batch_id=N` subdirectory in both
    * sinks. With [[gate]]'s replay-stable verdicts, a re-run micro-batch
    * rewrites the same files with the same rows instead of appending
    * duplicates — the at-least-once → effectively-once composition for
    * file sinks that need TWO destinations (the built-in parquet sink
    * only writes one).
    */
  def routeToSinks(verdicts: Dataset[Verdict], keepDir: String,
                   quarantineDir: String, checkpointDir: String,
                   trigger: Option[org.apache.spark.sql.streaming.Trigger] = None): StreamingQuery = {
    val w = verdicts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Verdict], batchId: Long) =>
        batch.filter(col("verdict") === "kept")
          .write.mode("overwrite").parquet(s"$keepDir/batch_id=$batchId")
        batch.filter(col("verdict") =!= "kept")
          .write.mode("overwrite").parquet(s"$quarantineDir/batch_id=$batchId")
        ()
      }
    trigger.foreach(w.trigger)
    w.start()
  }
}
