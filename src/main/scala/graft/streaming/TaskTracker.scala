package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming task-lifecycle tracker — the Structured Streaming analog of
  * the reference's per-task finite-state machine plus its expired-work
  * dead-letter channel:
  *
  *   TaskFSM states/transitions   worker/.../actor/task/TaskFSM.scala:54-149
  *   expired-work dead-lettering  QueueHelpers.scala:57-82,
  *                                ResponseQueueConsumer.scala:101-115
  *
  * A stream of task events (started/progress/completed/failed) is grouped
  * by (jobId, taskNumber) into `flatMapGroupsWithState`; per-key state
  * holds the task's lifecycle, and an event-time timeout fires when the
  * watermark passes lastEventTime + workTimeout — emitting the same
  * "expired" terminal report the reference's dead-letter consumer produces.
  * Terminal tasks drop their state immediately, so state size is bounded
  * by the number of IN-FLIGHT tasks, not all tasks ever seen — the
  * property that lets this run forever against an unbounded stream.
  */
object TaskTracker {

  /** One observed task event (the WorkerInput/StatusUpdate analog). */
  final case class TaskEvent(jobId: String, taskNumber: Int, kind: String,
                             ts: Timestamp, detail: String)

  /** Mutable-per-key lifecycle state (the FSM's StateData analog). */
  final case class TaskState(status: String, startedAt: Timestamp,
                             lastEventAt: Timestamp, updates: Int)

  /** Emitted transition report (the WorkerResponse analog). */
  final case class TaskReport(jobId: String, taskNumber: Int, status: String,
                              updates: Int, reason: String)

  val Started = "started"; val Progress = "progress"
  val Completed = "completed"; val Failed = "failed"; val Expired = "expired"

  /** Wire the tracker onto a watermarked event stream. `workTimeoutMs` is
    * the reference's `hyppo.work-timeout` (1 h default, reference.conf:18-19).
    */
  def track(spark: SparkSession, events: Dataset[TaskEvent],
            workTimeoutMs: Long = 3600 * 1000L): Dataset[TaskReport] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(e => (e.jobId, e.taskNumber))
      .flatMapGroupsWithState[TaskState, TaskReport](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((jobId, taskNumber), evts, state) =>
          advance(jobId, taskNumber, evts, state, workTimeoutMs)
      }
  }

  /** Pure transition function — unit-testable without a stream. */
  private[streaming] def advance(jobId: String, taskNumber: Int,
                                 evts: Iterator[TaskEvent],
                                 state: GroupState[TaskState],
                                 workTimeoutMs: Long): Iterator[TaskReport] = {
    if (state.hasTimedOut) {
      // watermark passed lastEventAt + timeout with no terminal event:
      // the reference's TTL'd message dead-lettering into `{prefix}.expired`
      val st = state.get
      state.remove()
      return Iterator.single(
        TaskReport(jobId, taskNumber, Expired, st.updates,
          s"no terminal event within ${workTimeoutMs}ms of ${st.lastEventAt}"))
    }
    val sorted = evts.toSeq.sortBy(_.ts.getTime)
    var st = state.getOption.getOrElse {
      val first = sorted.head
      TaskState(Started, first.ts, first.ts, 0)
    }
    val out = Seq.newBuilder[TaskReport]
    sorted.foreach { e =>
      e.kind match {
        case Started =>
          st = st.copy(status = Started, startedAt = e.ts, lastEventAt = e.ts)
        case Progress =>
          st = st.copy(updates = st.updates + 1, lastEventAt = e.ts)
        case Completed | Failed =>
          st = st.copy(status = e.kind, lastEventAt = e.ts)
          out += TaskReport(jobId, taskNumber, e.kind, st.updates, e.detail)
        case other =>
          out += TaskReport(jobId, taskNumber, Failed, st.updates,
            s"unknown event kind: $other")
      }
    }
    if (st.status == Completed || st.status == Failed) {
      state.remove() // terminal: free the key's state immediately
    } else {
      state.update(st)
      state.setTimeoutTimestamp(st.lastEventAt.getTime + workTimeoutMs)
    }
    out.result().iterator
  }
}
