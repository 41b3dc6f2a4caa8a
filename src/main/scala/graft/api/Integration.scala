package graft.api

import graft.model._
import org.apache.spark.sql.Row

/** The pluggable user-code surface — the engine's analog of the
  * reference's external source-api artifact, shaped by its call sites:
  *
  *  - schema/semantics declaration: ValidateIntegrationOperation.java:54-61
  *  - task fan-out (IngestionTaskCreator): CreateIngestionTasksOperation.java:36-57
  *  - raw fetch (RawDataCollector): FetchRawDataOperation.java:43-65
  *  - parse (RawDataProcessor): ProcessRawDataOperation.java:59-85
  *  - structured fetch: FetchProcessedDataOperation.java:54-78
  *  - persist (ProcessedDataPersister): PersistProcessedDataOperation.java:45-60
  *  - completion hook: HandleJobCompletedOperation.java:20-28
  *
  * Unlike the reference (opaque jars driven over an IPC socket by a forked
  * JVM), an Integration here is a Serializable object whose per-task
  * methods run INSIDE Spark executors: `planTasks` is partition planning,
  * `fetchRaw`/`parse`/`fetchStructured` are flatMap kernels, `persist`
  * is a sink spec. Closure serialization replaces jar staging.
  */
sealed trait Integration extends Serializable {
  def name: String

  /** Declared Avro record schema (O1 surface). */
  def schema: IntegrationSchema

  /** Safe = idempotent persist (at-least-once, Spark default retries);
    * Unsafe = at-most-once (engine fences + suppresses retry). */
  def persistingSemantics: PersistingSemantics = PersistingSemantics.Safe

  /** O2: fan a job out into tasks — the engine's input partition list. */
  def planTasks(job: IngestionJob): Seq[TaskSpec]

  /** O7: driver-side finalization hook after all tasks complete. */
  def onJobCompleted(completedAt: java.time.Instant, job: IngestionJob,
                     tasks: Seq[TaskSpec]): Unit = ()

  def isRawData: Boolean
}

/** Raw-data kind: fetch opaque bytes (O3) then parse them into typed rows
  * (O4). Mirrors RawDataIntegration.
  */
trait RawIntegration extends Integration {
  final override def isRawData: Boolean = true

  /** O3: pull the task's source bytes; one Array[Byte] per raw file. */
  def fetchRaw(task: TaskSpec): Iterator[Array[Byte]]

  /** O4: parse one raw file into rows matching `schema.structType`. */
  def parse(task: TaskSpec, raw: Array[Byte]): Iterator[Row]
}

/** Processed-data kind: fetch already-structured records (O5, the fused
  * O3∘O4 path). Mirrors ProcessedDataIntegration.
  */
trait StructuredIntegration extends Integration {
  final override def isRawData: Boolean = false

  /** O5: produce rows matching `schema.structType` directly. */
  def fetchStructured(task: TaskSpec): Iterator[Row]
}

/** O6 sink declaration. `TableSink` is the idiomatic path (columnar write,
  * exactly-once via Spark's commit protocol); `ForeachSink` mirrors the
  * reference's arbitrary user persister (openReader loop,
  * PersistProcessedDataOperation.java:45-60) as a foreachPartition kernel.
  */
sealed trait SinkSpec extends Serializable
final case class TableSink(format: String = "parquet",
                           mode: String = "overwrite",
                           path: Option[String] = None) extends SinkSpec
final case class ForeachSink(persist: (Int, Iterator[Row]) => Unit) extends SinkSpec
