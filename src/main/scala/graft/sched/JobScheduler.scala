package graft.sched

import graft.api.{Integration, SinkSpec, TableSink}
import graft.engine.JobRunner
import graft.model.{FailureReport, IngestionJob}
import org.apache.spark.sql.SparkSession
import java.time.{Duration, Instant}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
import scala.concurrent.{ExecutionContext, Future, Promise}
import scala.util.Random

/** Driver-side job scheduler: the reference's delegation loop
  * (WorkDelegation.scala:50-135 + WorkerFSM polling) re-expressed for
  * Spark. Pending pipeline jobs queue per integration ("queue" = job
  * class); a fixed pool of worker slots (the `worker-count` analog) pulls
  * the next job by:
  *
  *   1. affinity first — a slot that just ran integration X prefers X
  *      (warm code/caches; DelegationStrategy.scala:43-52),
  *   2. priority order over remaining queues (WorkQueuePrioritizer),
  *   3. contention filter (Gompertz backoff) + resource leasing,
  *   4. FAIR-pool isolation: each job runs under a scheduler pool named by
  *      its integration so Spark's FAIR scheduler arbitrates stage-level
  *      resources (spark.scheduler.pool local property),
  *   5. work timeout: jobs are cancelled via their job group after
  *      `workTimeout` — the analog of AMQP message TTL + expired-queue
  *      dead-lettering (QueueHelpers.scala:57-82).
  */
final class JobScheduler(
    spark: SparkSession,
    runner: JobRunner,
    pool: ResourcePool,
    workerSlots: Int = 1,
    workTimeout: Duration = Duration.ofHours(1),
    backoffMinDelay: Duration = Duration.ofSeconds(5),
    backoffScale: Double = 0.2,
    affinityWindow: Duration = Duration.ofMinutes(10),
    random: Random = new Random()) {

  final case class Submission(
      integration: Integration,
      job: IngestionJob,
      sink: SinkSpec,
      resources: Seq[String],
      enqueuedAt: Instant,
      promise: Promise[Either[FailureReport, JobRunner.JobResult]])

  private val queues = new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[Submission]]()
  private val exec = Executors.newFixedThreadPool(workerSlots)
  private implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(exec)
  private val prioritizer = WorkQueuePrioritizer.default(random)
  @volatile private var lastIntegrationBySlot = Map[Long, (String, Instant)]()

  /** Enqueue a job; returns a future of the structured result. */
  def submit(integration: Integration, job: IngestionJob,
             sink: SinkSpec = TableSink(),
             resources: Seq[String] = Nil): Future[Either[FailureReport, JobRunner.JobResult]] = {
    val p = Promise[Either[FailureReport, JobRunner.JobResult]]()
    val sub = Submission(integration, job, sink, resources, Instant.now(), p)
    queues.computeIfAbsent(integration.name, _ => new ConcurrentLinkedQueue[Submission]())
      .add(sub)
    Future(workLoop())
    p.future
  }

  /** One delegation pass: snapshot queues → affinity + priority + backoff
    * → lease resources → run. Mirrors WorkDelegation.scala:93-135 (on
    * lease failure, advance to the next queue).
    */
  private def workLoop(): Unit = {
    val slot = Thread.currentThread().getId
    val next = chooseNext(slot)
    next.foreach { sub =>
      val expired = Duration.between(sub.enqueuedAt, Instant.now())
        .compareTo(workTimeout) > 0
      if (expired) {
        // dead-letter analog: report expiry instead of running
        sub.promise.success(Left(FailureReport(
          "graft.WorkExpired", s"work expired after $workTimeout in queue", Nil, None)))
      } else pool.acquireAll(sub.resources) match {
        case Left(_) =>
          // resource contention: requeue and let backoff gate the retry
          queues.get(sub.integration.name).add(sub)
        case Right(lease) =>
          try {
            val group = s"graft-${sub.job.id}"
            spark.sparkContext.setJobGroup(group, sub.integration.name,
              interruptOnCancel = true)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", sub.integration.name)
            val timer = Executors.newSingleThreadScheduledExecutor()
            timer.schedule(new Runnable {
              def run(): Unit = spark.sparkContext.cancelJobGroup(group)
            }, workTimeout.toMillis, TimeUnit.MILLISECONDS)
            try sub.promise.success(runner.run(sub.integration, sub.job, sub.sink))
            finally {
              timer.shutdownNow()
              spark.sparkContext.clearJobGroup()
              spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
            }
            sub.resources.foreach(pool.clearContention)
            lastIntegrationBySlot += slot -> (sub.integration.name, Instant.now())
          } finally lease.release()
      }
    }
  }

  private def chooseNext(slot: Long): Option[Submission] = {
    val snapshots = snapshotQueues()
    if (snapshots.isEmpty) return None
    val filter = new ContentionFilter(pool, backoffMinDelay, backoffScale, random)
    val affinity = lastIntegrationBySlot.get(slot)
      .filter { case (_, at) =>
        Duration.between(at, Instant.now()).compareTo(affinityWindow) < 0 }
      .map(_._1)
    val (preferred, rest) = snapshots.partition(q => affinity.contains(q.name))
    val ordered = preferred.iterator ++ prioritizer.prioritize(rest).filter(filter.allows)
    ordered
      .flatMap(q => Option(queues.get(q.name)).flatMap(qq => Option(qq.poll())))
      .nextOption()
  }

  private def snapshotQueues(): Seq[QueueSnapshot] = {
    import scala.jdk.CollectionConverters._
    queues.asScala.toSeq.collect {
      case (name, q) if !q.isEmpty =>
        val subs = q.asScala.toSeq
        QueueSnapshot(name, subs.size, subs.size, rate = 1.0,
          idleSince = subs.map(_.enqueuedAt).min,
          resources = subs.headOption.map(_.resources).getOrElse(Nil))
    }
  }

  def shutdown(): Unit = { exec.shutdown(); exec.awaitTermination(30, TimeUnit.SECONDS) }
}
