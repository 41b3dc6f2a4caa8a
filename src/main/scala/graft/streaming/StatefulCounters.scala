package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Spark 4 arbitrary-state surface: a [[StatefulProcessor]] keeping one
  * running counter per key in a named [[org.apache.spark.sql.streaming.ValueState]].
  *
  * This is the next-generation replacement for mapGroupsWithState (the
  * q83 gate): typed named state cells, optional per-state TTL, timers,
  * and — critically for scale — it runs ONLY on the RocksDB state store
  * provider, the production backend whose state spills to local SSD +
  * changelog instead of living in executor heap (an HDFS-backed
  * in-memory store caps streaming state at the JVM heap; RocksDB is what
  * makes 10⁹-key state feasible). Models the reference's per-item
  * progress tracking (`worker/.../actor/task/TaskFSM.scala:40-120`) the
  * same way TaskTracker does, on the newer API.
  */
class PerKeyCounter extends StatefulProcessor[Long, Long, (Long, Long)] {

  @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Long],
                               timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (count.exists()) count.get() else 0L) + rows.size
    count.update(n)
    Iterator.single((key, n))
  }
}

/** Event-time TIMER surface of [[StatefulProcessor]]: per-key session
  * assembly where the CLOSE is driven by the watermark, not by seeing the
  * next event. State = (session_start_µs, last_ts_µs, count); every
  * update re-registers one timer at last+gap, and [[handleExpiredTimer]]
  * emits the finished session and clears the state — so an idle key's
  * state is reclaimed the moment the watermark passes its gap, the
  * property that keeps 10⁹-key session state bounded. Sessions that
  * close WITHIN a batch (gap observed between two sorted events) are
  * emitted inline; only each key's trailing open session waits on its
  * timer. Input (ts_µs), output (user, session_start_µs, n_events).
  */
class SessionFinalizer(gapMs: Long)
    extends StatefulProcessor[Long, Long, (Long, Long, Long)] {

  @transient private var sess:
    org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long)]("session",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def timerFor(lastUs: Long): Long = lastUs / 1000 + gapMs + 1

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    // per-key batch input has no ordering guarantee — session semantics
    // are defined over event order
    val ts = rows.toArray.sorted
    val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var cur = if (sess.exists()) { getHandle.deleteTimer(timerFor(sess.get()._2)); Some(sess.get()) } else None
    ts.foreach { t =>
      cur match {
        case Some((start, last, n)) if t - last < gapMs * 1000 =>
          cur = Some((start, math.max(last, t), n + 1))
        case Some(done) =>
          closed += ((key, done._1, done._3))
          cur = Some((t, t, 1L))
        case None =>
          cur = Some((t, t, 1L))
      }
    }
    cur.foreach { c =>
      sess.update(c)
      getHandle.registerTimer(timerFor(c._2))
    }
    closed.iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[(Long, Long, Long)] = {
    if (sess.exists()) {
      val (start, _, n) = sess.get()
      sess.clear()
      Iterator.single((key, start, n))
    } else Iterator.empty
  }
}
