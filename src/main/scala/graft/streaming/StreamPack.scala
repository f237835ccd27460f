package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFns

/** Streaming sequence packing — the continuous-ingest counterpart of the
  * batch w04 pass (SURVEY LLM extension, §2.9 state family): as documents
  * arrive, place each into its source shard's concatenated context-window
  * stream (budget-token position grid), continuing from wherever the
  * shard's running token total left off in earlier micro-batches.
  *
  * Semantics: within a micro-batch, documents of a source are placed in
  * doc_id order (deterministic given the same batch sequence); across
  * batches, placement is append-only in arrival order — the streaming
  * contract. The state per source is ONE Long (the cumulative token
  * total), so state size is bounded by the number of sources, not the
  * stream. Replay caveat: an at-least-once source that re-delivers a
  * document would double-count its tokens and shift every later offset —
  * put a stateful `dropDuplicates("doc_id")` (or the watermarked variant)
  * upstream when the source is not exactly-once, the same bounding advice
  * as [[StreamDedup]].
  *
  * Parallelism note: per micro-batch the work is grouped by source, so a
  * batch's packing parallelism is its source count — fine for arrival-
  * bounded micro-batches. Bulk BACKFILL should use the batch
  * w04 query instead, whose two-phase (source, chunk)
  * prefix sum is corpus-scale parallel; this function also runs in batch
  * mode unchanged (state starts empty per group) and then reproduces
  * w04's placement exactly, which is the stream/batch parity contract
  * StreamOpsSpec pins.
  */
object StreamPack {

  // Public case classes: Catalyst encoders require publicly accessible
  // types (same constraint Watcher.GateState documents).
  case class DocTokens(doc_id: Long, source: String, n_tokens: Long)
  case class SourceTotal(cum: Long)
  case class Packed(doc_id: Long, source: String, n_tokens: Long,
                    pack_id: Long, pack_offset: Long)

  /** docs: (doc_id: long, source: string, text: string) — streaming or
    * batch. Emits one Packed row per document with its context-window id
    * and offset on the source's position grid (window `budget` tokens,
    * contiguous fill: documents straddle pack boundaries, as in w04).
    */
  def packStream(docs: DataFrame, budget: Long = 2048L): Dataset[Packed] = {
    require(budget >= 1, s"packStream needs budget >= 1: got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      .as[DocTokens]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, ds: Iterator[DocTokens],
         state: GroupState[SourceTotal]) => {
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          // doc_id sort for deterministic within-batch placement, the
          // same order batch w04 uses
          val out = ds.toArray.sortBy(_.doc_id).map { d =>
            val start = cum
            cum += d.n_tokens
            Packed(d.doc_id, src, d.n_tokens,
              start / budget, start - (start / budget) * budget)
          }
          state.update(SourceTotal(cum))
          out.iterator
        })
  }

  /** The replay-safe composition, one call: a stateful exact dedup on
    * doc_id ahead of the packer, so an at-least-once source that
    * re-delivers a document cannot double-count its tokens and shift
    * every later offset (the caveat on [[packStream]]). Semantics: the
    * FIRST delivery of a doc_id is placed; replays are dropped before
    * they reach the token accumulator. The dedup state grows with the
    * number of distinct documents — for unbounded streams with an event
    * time, prefer `withWatermark(...).dropDuplicatesWithinWatermark`
    * upstream of [[packStream]] directly, which bounds that state the
    * way [[EventStream]]'s watermarked dedup does.
    */
  def packStreamExactlyOnce(docs: DataFrame, budget: Long = 2048L): Dataset[Packed] =
    packStream(docs.dropDuplicates("doc_id"), budget)
}
