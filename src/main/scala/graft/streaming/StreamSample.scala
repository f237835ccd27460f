package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFns

/** Streaming per-source bottom-k sampling — the continuous-ingest
  * counterpart of the batch w08 query (SURVEY LLM extension, §2.9 state
  * family): maintain, per source, the k documents with the smallest
  * deterministic id-hashes seen so far. Because the hash is a uniform tag,
  * the k smallest tags are a uniform k-subset of everything ingested — a
  * reservoir sample whose membership is a pure function of the ids seen,
  * not of arrival order or batch boundaries.
  *
  * Bottom-k is a MERGEABLE SKETCH (bottom-k of a union is the bottom-k of
  * the per-part bottom-k's), which is exactly what makes it streamable
  * with bounded state: the state per source is the current k (hash, id)
  * pairs — k Longs, never the stream. Each micro-batch merges its
  * arrivals into the state and emits the source's CURRENT sample
  * (OutputMode.Update: a later, smaller hash evicts the largest member,
  * so rows are revisions, not appends). After any prefix of the stream,
  * the emitted sample equals the batch w08 result over the same documents
  * — the stream/batch parity contract StreamOpsSpec pins.
  *
  * Replay safety comes free, unlike [[StreamPack]]: membership is a pure
  * function of the SET of ids seen, and the bottom-k merge is idempotent
  * (re-inserting an existing (h, id) pair changes nothing), so an
  * at-least-once source that re-delivers a document cannot perturb the
  * sample.
  */
object StreamSample {

  // Public case classes: Catalyst encoders require publicly accessible
  // types (same constraint Watcher.GateState documents).
  case class DocHash(doc_id: Long, source: String, h: Long)
  case class BottomK(hs: List[Long], ids: List[Long], nDelivered: Long)
  case class Sample(source: String, doc_ids: Seq[Long], hashes: Seq[Long],
                    n_delivered: Long)

  /** docs: (doc_id: long, source: string, ...) — streaming or batch.
    * Emits one [[Sample]] row per source per micro-batch with the current
    * bottom-k membership in rank order (ascending (h, doc_id) — the same
    * order batch w08 ranks by). Hash family: seed 8, identical to w08, so
    * the two agree document-for-document. `n_delivered` counts DELIVERIES
    * to the source (monotone — the latest emission per source is the one
    * with the max), not distinct documents: exact distinct counting needs
    * unbounded state, so a replayed document inflates the counter while
    * provably NOT perturbing the membership.
    */
  def sampleStream(docs: DataFrame, k: Int = 10): Dataset[Sample] = {
    require(k >= 1, s"sampleStream needs k >= 1: got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        TextFns.md5Hash32(col("doc_id").cast("string"), seed = 8).as("h"))
      .as[DocHash]
      .groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (src: String, ds: Iterator[DocHash], state: GroupState[BottomK]) => {
          val st = state.getOption.getOrElse(BottomK(Nil, Nil, 0L))
          val arrivals = ds.map(d => (d.h, d.doc_id)).toList
          // merge + re-cut: distinct guards replayed documents (idempotent
          // insert), the (h, id) sort is the w08 rank order
          val merged = (st.hs.zip(st.ids) ++ arrivals)
            .distinct.sorted.take(k)
          val n = st.nDelivered + arrivals.size
          state.update(BottomK(merged.map(_._1), merged.map(_._2), n))
          Sample(src, merged.map(_._2), merged.map(_._1), n)
        })
  }
}
