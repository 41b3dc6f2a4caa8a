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
/** Cross-batch exact-content dedup on the arbitrary-state API: one
  * (keeper_id, dup_count) cell per content hash, updated as batches
  * arrive — the streaming twin of [[graft.operators.Dedup.exact]] for a
  * continuous ingest feed. Keeper = MIN id seen so far, so the final
  * per-key update equals the batch answer regardless of arrival order
  * or batch boundaries; state is one small tuple per DISTINCT content
  * (RocksDB-resident), never per row.
  */
class StreamingDeduper
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {

  @transient private var st: org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("keeper",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                               timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var (keeper, n) = if (st.exists()) st.get() else (Long.MaxValue, 0L)
    rows.foreach { r => n += 1; if (r._2 < keeper) keeper = r._2 }
    st.update((keeper, n))
    Iterator.single((key, keeper, n))
  }
}

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

/** Cross-batch streaming NEAR-dup detection — the continuous-ingest twin
  * of MinHash-LSH ([[graft.operators.Dedup.minhashCandidates]]): keyed by
  * (band, band_hash), state is the bucket's member list (doc id +
  * signature). Each arriving doc pairs against every member already in
  * the bucket and emits (min id, max id, signature-agreement estimate)
  * when the estimate clears `threshold` — so after the stream drains, the
  * distinct emitted set equals the batch pipeline's banded candidates
  * verified at the same signature threshold, regardless of arrival order
  * or batch boundaries (each unordered pair is emitted when its LATER
  * member arrives; cross-band duplicates collapse in the sink distinct).
  *
  * Capacity: state per bucket is its member list, RocksDB-resident, and
  * a bucket at `cap` goes SATURATED — new members are neither added nor
  * paired (the streaming analog of the batch path dropping over-cap
  * buckets; divergence: batch drops such buckets retroactively, a stream
  * cannot un-emit — documented, and at gate scale no bucket reaches cap).
  */
class BucketPairer(threshold: Double, cap: Int)
    extends StatefulProcessor[(Int, Long), (Long, Array[Long]), (Long, Long, Double)] {

  @transient private var members:
    org.apache.spark.sql.streaming.ListState[(Long, Array[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    members = getHandle.getListState[(Long, Array[Long])]("members",
      Encoders.product[(Long, Array[Long])], TTLConfig.NONE)

  override def handleInputRows(key: (Int, Long),
      rows: Iterator[(Long, Array[Long])],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var all = members.get().toSeq
    rows.toSeq.sortBy(_._1).foreach { case (id, sig) =>
      if (all.size < cap) {
        all.foreach { case (oid, osig) =>
          if (oid != id) {
            var agree = 0
            var i = 0
            while (i < sig.length) { if (sig(i) == osig(i)) agree += 1; i += 1 }
            val est = agree.toDouble / sig.length
            if (est >= threshold)
              out += ((math.min(id, oid), math.max(id, oid), est))
          }
        }
        all = all :+ ((id, sig))
        members.appendValue((id, sig))
      }
    }
    out.iterator
  }
}

/** Event-time TIMER surface of [[StatefulProcessor]]: per-key session
  * assembly where the CLOSE is driven by the watermark, not by seeing the
  * next event. State is a [[org.apache.spark.sql.streaming.ListState]]
  * of OPEN sessions (start_µs, last_µs, count), kept disjoint by
  * interval-merging every batch — so out-of-order arrivals the watermark
  * admits (late by less than the delay, even BEFORE an open session's
  * start, even bridging two open sessions) land exactly where batch
  * sessionization would put them. Each open session owns one timer at
  * last+gap; [[handleExpiredTimer]] emits the sessions whose timer fired
  * and keeps the rest — an idle key's state is reclaimed the moment the
  * watermark passes its gap, the property that keeps 10⁹-key session
  * state bounded. Input (ts_µs), output (user, session_start_µs,
  * n_events), equal to batch sessionization with the same gap.
  */
class SessionFinalizer(gapMs: Long)
    extends StatefulProcessor[Long, Long, (Long, Long, Long)] {

  @transient private var sess:
    org.apache.spark.sql.streaming.ListState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getListState[(Long, Long, Long)]("sessions",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def timerFor(lastUs: Long): Long = lastUs / 1000 + gapMs + 1

  /** Disjoint open sessions + new events → merged disjoint sessions
    * (classic interval merge; two sessions fuse when an event bridges
    * their gap, exactly like Spark's session_window).
    */
  private def merged(open: Seq[(Long, Long, Long)],
                     events: Seq[Long]): Seq[(Long, Long, Long)] = {
    val all = (open ++ events.map(t => (t, t, 1L))).sortBy(s => (s._1, s._2))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    all.foreach { s =>
      out.lastOption match {
        case Some((st, la, n)) if s._1 - la < gapMs * 1000 =>
          out(out.length - 1) = (st, math.max(la, s._2), n + s._3)
        case _ => out += s
      }
    }
    out.toSeq
  }

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val open = sess.get().toSeq
    open.foreach(s => getHandle.deleteTimer(timerFor(s._2)))
    val next = merged(open, rows.toSeq)
    if (next.nonEmpty) sess.put(next.toArray) else sess.clear()
    next.foreach(s => getHandle.registerTimer(timerFor(s._2)))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[(Long, Long, Long)] = {
    val fired = expiredTimerInfo.getExpiryTimeInMs()
    val (done, stillOpen) = sess.get().toSeq
      .partition(s => timerFor(s._2) <= fired)
    if (stillOpen.nonEmpty) sess.put(stillOpen.toArray) else sess.clear()
    // timer state must stay in lockstep with session state: every emitted
    // session's timer is deleted here (only the one that fired auto-clears)
    // — otherwise done sessions' timers linger in RocksDB and later fire
    // as no-ops, and a stale firing could emit a newly admitted session
    // ahead of its own timer
    done.foreach { s =>
      val t = timerFor(s._2)
      if (t != fired) getHandle.deleteTimer(t)
    }
    done.iterator.map(s => (key, s._1, s._3))
  }
}
