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
