package graft.sched

import java.time.{Clock, Duration, Instant}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.Semaphore
import scala.util.Random

/** Work-resource leasing for the driver scheduler: the reference models
  * these as RabbitMQ token queues (WorkResource.scala:13-43); in a single
  * driver they become in-process primitives with the SAME observable
  * semantics:
  *
  *  - Concurrency(name, n): at most n concurrent holders (token queue
  *    pre-filled with n messages, QueueHelpers.scala:93-114).
  *  - Throttled(name, rate): ≤1 acquisition per `rate`; the FIRST token is
  *    immediately available and the period starts when a lease is
  *    RELEASED (token republished to the deferred queue with TTL=rate,
  *    ResourceLease.scala:41-59) — not a naive rate cap.
  *
  * Multi-resource acquisition is deadlock-free by deterministic ordering:
  * concurrency resources sorted by name first, then throttled by name,
  * with rollback of partial acquisitions (ResourceLeasing.scala:13-27).
  */
sealed trait WorkResourceSpec { def name: String }
final case class ConcurrencySpec(name: String, limit: Int) extends WorkResourceSpec
final case class ThrottledSpec(name: String, rate: Duration) extends WorkResourceSpec

final class ResourcePool(specs: Seq[WorkResourceSpec], clock: Clock = Clock.systemUTC()) {

  private val semaphores: Map[String, Semaphore] =
    specs.collect { case ConcurrencySpec(n, limit) => n -> new Semaphore(limit) }.toMap
  private val throttles: Map[String, ThrottleClock] =
    specs.collect { case ThrottledSpec(n, rate) => n -> new ThrottleClock(rate) }.toMap
  private val contention = new ConcurrentHashMap[String, Instant]()

  /** Token clock: available ⟺ now ≥ nextAvailable; consuming takes the
    * token; releasing schedules the next token one period out.
    */
  private final class ThrottleClock(rate: Duration) {
    private var nextAvailable: Instant = Instant.MIN // first token immediate
    private var held = false
    def tryAcquire(): Boolean = synchronized {
      if (!held && !Instant.now(clock).isBefore(nextAvailable)) { held = true; true }
      else false
    }
    def release(): Unit = synchronized {
      held = false
      nextAvailable = Instant.now(clock).plus(rate) // period starts on release
    }
  }

  final case class Lease(resources: Seq[WorkResourceSpec]) {
    def release(): Unit = resources.reverse.foreach {
      case ConcurrencySpec(n, _) => semaphores(n).release()
      case ThrottledSpec(n, _)   => throttles(n).release()
    }
  }

  /** Deterministic acquisition order + rollback on partial failure.
    * Returns Left(blockingResource) on failure after rollback.
    */
  def acquireAll(names: Seq[String]): Either[String, Lease] = {
    val wanted = specs.filter(s => names.contains(s.name))
    val ordered =
      wanted.collect { case c: ConcurrencySpec => c }.sortBy(_.name) ++
      wanted.collect { case t: ThrottledSpec => t }.sortBy(_.name)
    val acquired = Seq.newBuilder[WorkResourceSpec]
    for (r <- ordered) {
      val ok = r match {
        case ConcurrencySpec(n, _) => semaphores(n).tryAcquire()
        case ThrottledSpec(n, _)   => throttles(n).tryAcquire()
      }
      if (!ok) {
        Lease(acquired.result()).release()
        contention.put(r.name, Instant.now(clock))
        return Left(r.name)
      }
      acquired += r
    }
    Right(Lease(acquired.result()))
  }

  def lastContention(name: String): Option[Instant] = Option(contention.get(name))
  def clearContention(name: String): Unit = contention.remove(name)
}

/** The contention-aware queue filter of DelegationStrategy.scala:60-115:
  * per-pass consistent include/exclude decisions per resource, minimum
  * delay gate, then Gompertz-probabilistic retry.
  */
final class ContentionFilter(
    pool: ResourcePool,
    minDelay: Duration,
    scaleFactor: Double,
    random: Random = new Random(),
    clock: Clock = Clock.systemUTC()) {

  private var attempt = Set[String]()
  private var ignore = Set[String]()

  def allows(queue: QueueSnapshot): Boolean =
    queue.resources.forall(allowsResource)

  private def allowsResource(name: String): Boolean = pool.lastContention(name) match {
    case None => true
    case Some(_) if attempt.contains(name) => true
    case Some(_) if ignore.contains(name) => false
    case Some(t) =>
      val waited = Duration.between(t, Instant.now(clock))
      if (waited.minus(minDelay).isNegative) { ignore += name; false }
      else {
        val p = Sigmoid.backoffFactor(waited.getSeconds.toInt, scaleFactor,
          minDelay.getSeconds.toDouble)
        if (random.nextDouble() <= p) { attempt += name; true }
        else { ignore += name; false }
      }
  }
}
