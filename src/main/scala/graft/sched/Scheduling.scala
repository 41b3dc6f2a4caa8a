package graft.sched

import java.time.Instant
import java.time.temporal.ChronoUnit
import scala.util.Random

/** Queue-selection machinery: the reference's scheduling operators
  * re-expressed for a Spark driver that orders pending pipeline jobs
  * rather than AMQP queues (SURVEY §2a "Scheduling operators").
  */

/** Probabilistic backoff curve (worker/.../scheduling/Sigmoid.scala:21-49):
  * a Gompertz sigmoid asymptoting at 1, used as P(retry) after resource
  * contention.
  */
object Sigmoid {
  /** y(t) = a·e^(−b·e^(−c·t)) */
  def gompertz(a: Double, b: Double, c: Double, t: Double): Double = {
    require(a != 0.0, "a must not be 0")
    require(b > 0.0 && c > 0.0, s"b and c must be > 0 (b=$b c=$c)")
    math.exp(-b * math.exp(-c * t)) * a
  }

  /** P(retry) after `seconds` since contention; asymptote hard-coded to 1. */
  def backoffFactor(seconds: Int, scaleFactor: Double, delayFactor: Double): Double = {
    require(seconds >= 0, s"seconds must be >= 0, got $seconds")
    gompertz(1.0, delayFactor, scaleFactor, seconds.toDouble)
  }
}

/** Snapshot of one pending work queue (the driver's job-class queue):
  * `size` total messages, `ready` deliverable now, `rate` recent
  * consumption rate, `idleSince` last activity.
  */
final case class QueueSnapshot(
    name: String,
    size: Int,
    ready: Int,
    rate: Double,
    idleSince: Instant,
    resources: Seq[String] = Nil) {
  def hasWork: Boolean = ready > 0
}

/** The four priority orderings of worker/.../scheduling/PriorityOrdering
  * .scala:15-49, applied lexicographically with recursive tie-breaking.
  * An Ordering where "less" = higher priority.
  */
sealed trait PriorityOrdering extends Ordering[QueueSnapshot]

/** Largest expected completion time first (ready/rate, descending —
  * PriorityOrdering.scala:17-25): the queue furthest from completion is
  * served first, so zero-rate queues (estimate = ∞) outrank draining ones.
  */
case object ExpectedCompletionOrdering extends PriorityOrdering {
  private def estimate(q: QueueSnapshot): Double =
    if (q.rate == 0.0) Double.PositiveInfinity else q.ready.toDouble / q.rate
  override def compare(x: QueueSnapshot, y: QueueSnapshot): Int =
    estimate(x).compareTo(estimate(y)) * -1
}

/** Longest-idle queue first, at minute granularity (so sub-minute noise
  * falls through to the next ordering).
  */
case object IdleSinceMinuteOrdering extends PriorityOrdering {
  private def idleMinute(q: QueueSnapshot): Long =
    q.idleSince.truncatedTo(ChronoUnit.MINUTES).getEpochSecond
  override def compare(x: QueueSnapshot, y: QueueSnapshot): Int =
    idleMinute(x).compareTo(idleMinute(y))
}

case object AbsoluteSizeOrdering extends PriorityOrdering {
  override def compare(x: QueueSnapshot, y: QueueSnapshot): Int =
    x.size.compareTo(y.size)
}

/** Random tie-break (seedable for tests, unlike the reference's global
  * Random — same distribution contract).
  */
final case class ShuffleOrdering(random: Random = new Random()) extends PriorityOrdering {
  override def compare(x: QueueSnapshot, y: QueueSnapshot): Int = random.nextInt(3) - 1
}

/** Stable lexicographic nesting of orderings: sort by the first ordering,
  * then recursively re-prioritize equal groups with the remaining chain
  * (worker/.../scheduling/WorkQueuePrioritizer.scala:14-75). Lazy per
  * group so consumers that stop after the first queue never pay for full
  * tail sorting.
  */
final class WorkQueuePrioritizer(chain: List[PriorityOrdering]) {
  require(chain.nonEmpty, "at least one ordering required")

  def prioritize(queues: Seq[QueueSnapshot]): Iterator[QueueSnapshot] =
    recurse(chain, queues.toVector)

  private def recurse(c: List[PriorityOrdering], qs: Vector[QueueSnapshot]): Iterator[QueueSnapshot] =
    if (qs.size <= 1) qs.iterator
    else {
      val sorted = qs.sorted(c.head)
      equalGroups(c.head, sorted).flatMap { group =>
        if (c.tail.isEmpty) group.iterator else recurse(c.tail, group)
      }
    }

  private def equalGroups(ord: PriorityOrdering,
                          sorted: Vector[QueueSnapshot]): Iterator[Vector[QueueSnapshot]] =
    new Iterator[Vector[QueueSnapshot]] {
      private var rest = sorted
      def hasNext: Boolean = rest.nonEmpty
      def next(): Vector[QueueSnapshot] = {
        val head = rest.head
        val n = rest.segmentLength(q => ord.compare(head, q) == 0)
        val (g, r) = rest.splitAt(math.max(n, 1))
        rest = r
        g
      }
    }
}

object WorkQueuePrioritizer {
  /** Default chain, mirroring HyppoWorkerModule.scala:67-75. */
  def default(random: Random = new Random()): WorkQueuePrioritizer =
    new WorkQueuePrioritizer(List(
      ExpectedCompletionOrdering, IdleSinceMinuteOrdering,
      AbsoluteSizeOrdering, ShuffleOrdering(random)))
}
