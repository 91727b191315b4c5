package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary stateful streaming on the Spark 4 `transformWithState` API —
  * the successor of `flatMapGroupsWithState` (Sessionize.scala) with typed,
  * named state cells, TTL, and RocksDB-backed stores.
  *
  * The operator keeps O(1) running statistics per user (count / sum / max /
  * last-seen) and emits the refreshed row once per micro-batch in which the
  * user appears — a live per-entity profile, the streaming analogue of the
  * reference's per-partition open-block bookkeeping
  * (/root/reference/blockManager.go:54-69).
  *
  * Scale: state is one ~40-byte record per active user, hash-distributed by
  * key and stored in RocksDB (spills to disk, snapshots to the checkpoint),
  * so the operator survives key cardinalities far beyond executor memory —
  * the property `flatMapGroupsWithState`'s HDFS-backed map store lacks. A
  * TTL (`ttl`) evicts users idle longer than the retention window, bounding
  * state by *active* users, not ever-seen users.
  */
object RunningStats {

  case class Event(user_id: Long, ts_us: Long, value: Double)
  case class Stats(n: Long, sum: Double, max: Double, last_us: Long)
  case class UserStats(user_id: Long, n_events: Long, sum_value: Double,
                       max_value: Double, last_us: Long)

  class Processor(ttl: TTLConfig) extends StatefulProcessor[Long, Event, UserStats] {
    @transient private var state: ValueState[Stats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stats]("stats", Encoders.product[Stats], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[UserStats] = {
      var st = Option(state.get()).getOrElse(Stats(0L, 0.0, Double.NegativeInfinity, Long.MinValue))
      rows.foreach { e =>
        st = Stats(st.n + 1, st.sum + e.value, math.max(st.max, e.value),
          math.max(st.last_us, e.ts_us))
      }
      state.update(st)
      Iterator.single(UserStats(key, st.n, st.sum, st.max, st.last_us))
    }
  }

  /** Wire the processor onto a typed event stream. Spark 4 only honors
    * state TTL under `TimeMode.ProcessingTime` (getValueState throws for a
    * TTL'd cell in TimeMode.None), so the time mode follows the TTL config.
    */
  def userStats(spark: SparkSession, events: Dataset[Event],
                ttl: TTLConfig = TTLConfig.NONE): Dataset[UserStats] = {
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events
      .groupByKey(_.user_id)
      .transformWithState(new Processor(ttl), timeMode, OutputMode.Append())
  }
}
