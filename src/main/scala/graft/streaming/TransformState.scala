package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** The NEW arbitrary-state operator (Spark 4's `transformWithState` /
  * StatefulProcessor — the successor of mapGroupsWithState used by
  * [[StatementStream.firstSeenIndex]]): per-key ValueState survives
  * micro-batches AND checkpoint restarts inside the RocksDB state
  * store, and the handle exposes typed value/list/map state plus TTL
  * and timers the old API lacked.
  *
  * [[CumulativeCountProcessor]] is the smallest honest exercise: a
  * per-key cumulative event counter with an invocation sequence —
  * `handleInputRows` fires once per key per micro-batch (only for keys
  * WITH input), so `(key, seq)` output rows pin both the state
  * arithmetic and the invocation protocol, and a DuckDB oracle can
  * re-derive every row from the batch split (q259).
  *
  * Scale: state is one (long, long) pair per key in RocksDB — bounded
  * by distinct keys, not stream length; the operator shuffles once on
  * the grouping key per micro-batch, identical to the aggregation
  * exchange the old API paid.
  */
case class CumOut(user_id: Long, batch_seq: Long, cum_events: Long)

/** STATE BOOTSTRAP — the third face of the new API
  * (StatefulProcessorWithInitialState): a streaming job takes over
  * from a batch warehouse by seeding its per-key state from a batch
  * frame, so day one of the stream continues the historical counts
  * instead of restarting from zero (the migration pattern every
  * lakehouse→streaming cutover needs). handleInitialState runs once
  * per key of the initial-state frame BEFORE any input; subsequent
  * micro-batches accumulate on top. Output rows are identical in
  * shape to [[CumulativeCountProcessor]]'s, so the q260 oracle
  * re-derives them from the batch/stream split: cum = historical +
  * streamed-so-far, and keys present only in history stay silent
  * until they stream. */
class BootstrappedCountProcessor
    extends StatefulProcessorWithInitialState[Long, Long, CumOut, Long] {
  @transient private var cnt: ValueState[Long] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long, initial: Long, tv: TimerValues): Unit =
    cnt.update(initial)

  override def handleInputRows(
      key: Long, rows: Iterator[Long], tv: TimerValues): Iterator[CumOut] = {
    var n = 0L
    while (rows.hasNext) { rows.next(); n += 1 }
    val total = (if (cnt.exists()) cnt.get() else 0L) + n
    val s = if (seq.exists()) seq.get() else 0L
    cnt.update(total)
    seq.update(s + 1)
    Iterator.single(CumOut(key, s, total))
  }
}

/** Inactivity-timeout detection on the new API's EVENT-TIME TIMERS —
  * the half of transformWithState q259's counter does not touch. Per
  * key: every input batch re-registers one timer at
  * `last event + timeoutMs` (deleting the previous one); when the
  * event-time watermark passes a live timer, `handleExpiredTimer`
  * emits a `TimeoutOut(key, expiry)` marker. Semantics pinned
  * empirically by TransformStateSpec (timer-vs-watermark batch
  * ordering is engine-internal, so this operator is spec-gated, not
  * oracle-gated — the q248/q249 watermark family carries the oracle
  * evidence for event-time cutoffs).
  *
  * State: one long (last seen) + at most ONE live timer per key while
  * the session is ACTIVE; the expiry handler clears the key's state,
  * so RocksDB is bounded by keys with a live session, not by every
  * key ever seen — the 100 TB contract. */
case class TimeoutOut(user_id: Long, timed_out_at: Long)

class InactivityTimeoutProcessor(timeoutMs: Long)
    extends StatefulProcessor[Long, (Long, Long), TimeoutOut] {
  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long)],
      tv: TimerValues): Iterator[TimeoutOut] = {
    var maxTs = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
    while (rows.hasNext) { val t = rows.next()._2; if (t > maxTs) maxTs = t }
    if (lastSeen.exists()) getHandle.deleteTimer(lastSeen.get() + timeoutMs)
    lastSeen.update(maxTs)
    getHandle.registerTimer(maxTs + timeoutMs)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long, tv: TimerValues,
      info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TimeoutOut] = {
    // a timed-out session's state is DEAD state: clear it so RocksDB
    // holds only ACTIVE keys (a key seen again later correctly starts
    // a fresh session from its new event) — without this, state grows
    // with every key ever seen, breaking the bounded-state contract
    lastSeen.clear()
    Iterator.single(TimeoutOut(key, info.getExpiryTimeInMs))
  }
}

class CumulativeCountProcessor extends StatefulProcessor[Long, Long, CumOut] {
  @transient private var cnt: ValueState[Long] = _
  @transient private var seq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[Long], tv: TimerValues): Iterator[CumOut] = {
    var n = 0L
    while (rows.hasNext) { rows.next(); n += 1 }
    val total = (if (cnt.exists()) cnt.get() else 0L) + n
    val s = if (seq.exists()) seq.get() else 0L
    cnt.update(total)
    seq.update(s + 1)
    Iterator.single(CumOut(key, s, total))
  }
}
