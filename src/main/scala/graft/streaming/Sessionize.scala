package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization with
  * flatMapGroupsWithState — the explicit-state generalization of the
  * reference's only stateful construct (the open-blocks map with its
  * size/age flush, /root/reference/blockManager.go:54-114).
  *
  * State per user = the open session (start, last ts, count, sum). An
  * event ≥ gap after the last one closes the session and emits it —
  * exactly the reference's age-flush, but per *event-time* gap instead of
  * wall-clock, and with the count bound playing MaxSize's role available
  * via `maxEvents`.
  *
  * Scale: state is hash-distributed by user across executors; each key
  * holds O(1) state (no event buffer), so state size is #active-users ×
  * ~48 bytes regardless of throughput. An event-time timeout
  * (GroupStateTimeout.EventTimeTimeout + watermark) evicts idle users.
  */
object Sessionize {

  case class Event(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(start_us: Long, last_us: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, sum_value: Double)

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000

  def update(gapUs: Long, maxEvents: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    var cur = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    // Micro-batch iterators are not ordered by event time; sort within the
    // batch (bounded by batch size, not stream length).
    events.toSeq.sortBy(e => (e.ts_us, e.value)).foreach { e =>
      cur match {
        case Some(st) if e.ts_us - st.last_us < gapUs && st.n < maxEvents =>
          cur = Some(st.copy(last_us = e.ts_us, n = st.n + 1, sum = st.sum + e.value))
        case Some(st) =>
          closed += Session(userId, st.start_us, st.last_us, st.n, st.sum)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    cur match {
      case Some(st) => state.update(st)
      case None     => state.remove()
    }
    closed.iterator
  }

  /** Wire the stateful op onto a typed event stream. */
  def sessions(spark: SparkSession, events: Dataset[Event],
               gapUs: Long = DefaultGapUs,
               maxEvents: Long = Long.MaxValue): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update(gapUs, maxEvents))
  }

  /** [[update]] plus event-time timeout: a timed-out group emits its open
    * session even though no new event for that user ever arrives.
    */
  def updateWithTimeout(gapUs: Long, maxEvents: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      Iterator.single(Session(userId, st.start_us, st.last_us, st.n, st.sum))
    } else {
      val out = update(gapUs, maxEvents)(userId, events, state)
      state.getOption.foreach { st =>
        // close when the watermark passes last event + gap (µs → ms)
        state.setTimeoutTimestamp((st.last_us + gapUs) / 1000)
      }
      out
    }
  }

  /** Sessionization whose idle sessions ALSO close — the exact analogue of
    * the reference's wall-clock age flush
    * (/root/reference/blockManager.go:84-114: a 1 s ticker commits blocks
    * older than MaxAge with no further input), restated in event time: the
    * watermark passing (last event + gap) emits the open session even if
    * that user never produces another event. `sessions` (NoTimeout) can
    * hold an idle user's session forever; this variant cannot.
    */
  def sessionsWithTimeout(spark: SparkSession, events: Dataset[Event],
                          gapUs: Long = DefaultGapUs,
                          maxEvents: Long = Long.MaxValue,
                          lateness: String = "0 seconds"): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .withWatermark("ts_t", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateWithTimeout(gapUs, maxEvents))
  }

  // ---- streaming SFT conversation assembly (sft1's live half) -------------

  /** One rendered turn of the conversation stream: the map-side projection
    * (event_type ':' payload) happens BEFORE the stateful operator, so the
    * state never sees raw props JSON.
    */
  case class Turn(user_id: Long, ts_us: Long, event_id: Long, turn: String)
  case class ConvoState(start_us: Long, last_us: Long, n: Long,
                        turns: List[String])
  case class Convo(user_id: Long, sess_start_us: Long, n_turns: Long,
                   convo: String)

  /** Streaming conversation assembly — sft1's sessionize/flatten run LIVE:
    * the same 30-min-gap session boundaries and the same 2..maxTurns keep
    * filter, emitted as each session closes. The batch query
    * (`sft1_conversation_build`) IS this operator's replay oracle — on the
    * same event stream (delivered in event-time order) the emitted set
    * equals the batch result exactly, which StreamingSpec pins.
    *
    * State is BOUNDED at maxTurns strings per live user: a session that
    * grows past maxTurns can never be emitted, so the buffer is dropped
    * right then (only the counter keeps running for boundary tracking) —
    * a gap-free hot user costs a counter, not their history. The turn
    * count floor/cap mirror the published SFT filter (single-turn and
    * overlong sessions dropped).
    */
  def convoUpdate(gapUs: Long, minTurns: Int, maxTurns: Int)(
      userId: Long, events: Iterator[Turn],
      state: GroupState[ConvoState]): Iterator[Convo] = {
    var cur = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer.empty[Convo]
    def close(st: ConvoState): Unit =
      if (st.n >= minTurns && st.n <= maxTurns)
        closed += Convo(userId, st.start_us, st.n, st.turns.reverse.mkString("|"))
    events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      cur match {
        case Some(st) if e.ts_us - st.last_us <= gapUs =>
          val turns =
            if (st.n + 1 > maxTurns) Nil // overlong: unemittable, drop buffer
            else e.turn :: st.turns
          cur = Some(st.copy(last_us = e.ts_us, n = st.n + 1, turns = turns))
        case Some(st) =>
          close(st)
          cur = Some(ConvoState(e.ts_us, e.ts_us, 1, List(e.turn)))
        case None =>
          cur = Some(ConvoState(e.ts_us, e.ts_us, 1, List(e.turn)))
      }
    }
    cur match {
      case Some(st) => state.update(st)
      case None     => state.remove()
    }
    closed.iterator
  }

  /** Wire [[convoUpdate]] onto a typed turn stream. NoTimeout variant: a
    * session closes when the same user's next-session event arrives (the
    * parity test's sentinel idiom); the event-time-timeout eviction story
    * is [[sessionsWithTimeout]]'s, unchanged by the turn buffer.
    */
  def conversations(spark: SparkSession, turns: Dataset[Turn],
                    gapUs: Long = DefaultGapUs,
                    minTurns: Int = 2, maxTurns: Int = 64): Dataset[Convo] = {
    import spark.implicits._
    turns
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        convoUpdate(gapUs, minTurns, maxTurns))
  }
}
