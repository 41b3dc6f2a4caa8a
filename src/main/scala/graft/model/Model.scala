package graft.model

import java.time.Instant
import java.util.UUID

/** Core ingestion data model, behavior-equivalent to the reference's
  * source-api surface as observed at its call sites.
  *
  * Reference shapes (cited from /root/reference):
  *  - IngestionSource: name + config
  *    (worker/src/test/scala/com/harrys/hyppo/worker/TestObjects.scala:18-20)
  *  - DataIngestionJob: source + UUID + parameters + startedAt
  *    (TestObjects.scala:24-26)
  *  - DataIngestionTask: job + taskNumber + taskArguments
  *    (TestObjects.scala:30-32)
  */
final case class IngestionSource(
    name: String,
    configuration: Map[String, String] = Map.empty)

final case class IngestionJob(
    source: IngestionSource,
    id: UUID,
    parameters: Map[String, String] = Map.empty,
    startedAt: Instant = Instant.EPOCH)

final case class TaskSpec(
    jobId: String,
    sourceName: String,
    taskNumber: Int,
    taskArguments: Map[String, String] = Map.empty)

/** Persisting semantics drive retry policy, mirroring
  * worker-api/.../code/IntegrationDetails.scala:9-24 and the ack-placement
  * rules in worker/.../actor/queue/WorkQueueExecution.scala:20-24:
  *  - Safe   = idempotent sink, at-least-once (Spark's default task retry)
  *  - Unsafe = non-retryable sink, at-most-once (maxFailures=1 + fencing)
  */
sealed trait PersistingSemantics
object PersistingSemantics {
  case object Safe extends PersistingSemantics
  case object Unsafe extends PersistingSemantics
}

/** Structured validation outcome, mirroring
  * ValidateIntegrationResponse (worker-api/.../WorkerProtocol.scala:63-84)
  * and the error collection in
  * executor/.../run/ValidateIntegrationOperation.java:34-147.
  */
final case class ValidationError(message: String, exceptionClass: Option[String] = None)

final case class ValidationReport(
    sourceName: String,
    isValid: Boolean,
    schemaFingerprint: Option[String],
    isRawData: Boolean,
    persistingSemantics: PersistingSemantics,
    errors: Seq[ValidationError])

/** Structured failure propagation, mirroring the exception-chain summary of
  * worker-api/.../proto/IntegrationException.scala:13-68 (class, message,
  * stack frames, recursive cause).
  */
final case class FailureFrame(className: String, method: String, file: String, line: Int)
final case class FailureReport(
    exceptionClass: String,
    message: String,
    frames: Seq[FailureFrame],
    cause: Option[FailureReport]) {
  def summaryLines: Seq[String] =
    s"$exceptionClass: $message" +: cause.toSeq.flatMap(c => c.summaryLines.map("  caused by: " + _))
}

object FailureReport {
  def fromThrowable(t: Throwable, maxDepth: Int = 10): FailureReport =
    FailureReport(
      t.getClass.getName,
      Option(t.getMessage).getOrElse(""),
      t.getStackTrace.take(20).toSeq.map(f =>
        FailureFrame(f.getClassName, f.getMethodName,
          Option(f.getFileName).getOrElse(""), f.getLineNumber)),
      Option(t.getCause).filter(_ => maxDepth > 0).map(fromThrowable(_, maxDepth - 1)))
}
