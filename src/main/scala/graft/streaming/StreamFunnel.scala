package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming strict-ordered funnel — the continuous counterpart of the
  * batch q46 query (view → click → purchase, each stage strictly AFTER
  * the user's first completion of the previous stage).
  *
  * State per user is three Longs (the first view; the first click after
  * that view; the first purchase after that click) — never the event
  * stream, so state is bounded at 24 bytes/user regardless of volume.
  * The state machine folds each micro-batch in EVENT-TIME order
  * ((ts, event_id), the same tiebreak as batch q46's min()s), so arrival
  * order WITHIN a micro-batch is irrelevant.
  *
  * Contracts, in the StreamPack/StreamGate idiom:
  *  - Replay-idempotent: every transition is a guarded monotone min
  *    (`t < current`), so an at-least-once source re-delivering an event
  *    cannot move any stage timestamp — StreamFunnelSpec pins a full
  *    re-delivery.
  *  - Exact under per-user event-time-ordered delivery ACROSS batches
  *    (the watermarked-source regime); under cross-batch lateness it is
  *    CONSERVATIVE: a late-arriving earlier view lowers v and can only
  *    have caused missed (never fabricated) click/purchase completions,
  *    because every previously accepted click still satisfies
  *    `click > v_new ≤ v_old`. The batch q46 over the same events is the
  *    exact recompute; the parity after any in-order prefix is pinned.
  *  - Emission is OutputMode.Update: one row per user per batch with the
  *    current stage (0–3) and stage timestamps — later rows are
  *    revisions, the funnel report aggregates the latest row per user.
  */
object StreamFunnel {

  // Public case classes: Catalyst encoders require publicly accessible
  // types (same constraint Watcher.GateState documents).
  case class Ev(user_id: Long, event_type: String,
                ts: java.sql.Timestamp, event_id: Long)
  /** Stage timestamps in epoch micros; Long.MaxValue = not reached. */
  case class FunnelState(vUs: Long, cUs: Long, pUs: Long)
  case class UserFunnel(user_id: Long, stage: Int,
                        v_us: Long, c_us: Long, p_us: Long)

  private val Unset = Long.MaxValue

  private def micros(ts: java.sql.Timestamp): Long =
    ts.toInstant.getEpochSecond * 1000000L + ts.getNanos / 1000L

  /** events: (user_id, event_type, ts, event_id) — streaming or batch. */
  def funnelStream(events: DataFrame): Dataset[UserFunnel] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("event_type"),
        col("ts"), col("event_id").cast("long").as("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) => {
          val st = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset))
          var v = st.vUs
          var c = st.cUs
          var p = st.pUs
          // fold in event-time order — q46's (min ts, strictly-after)
          // semantics are sequential, and sorting makes within-batch
          // arrival order irrelevant
          val evs = it.toList.sortBy(e => (micros(e.ts), e.event_id))
          evs.foreach { e =>
            val t = micros(e.ts)
            e.event_type match {
              case "view" => if (t < v) v = t
              case "click" => if (v != Unset && t > v && t < c) c = t
              case "purchase" => if (c != Unset && t > c && t < p) p = t
              case _ => () // other event types don't participate
            }
          }
          state.update(FunnelState(v, c, p))
          val stage =
            if (p != Unset) 3 else if (c != Unset) 2 else if (v != Unset) 1
            else 0
          UserFunnel(uid, stage, v, c, p)
        })
  }
}
