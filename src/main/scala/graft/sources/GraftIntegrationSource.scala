package graft.sources

import java.util.UUID

import scala.jdk.CollectionConverters._

import graft.api.{Integration, RawIntegration, StructuredIntegration}
import graft.model.{IngestionJob, IngestionSource, TaskSpec}
import org.apache.spark.sql.{GraftSqlShim, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Factory contract for [[GraftIntegrationSource]]: a zero-arg class name
  * travels in the reader options and is instantiated by REFLECTION on
  * each executor — the engine's analog of the reference loading
  * integration code by class name + jars on its workers
  * (worker-api/.../code/IntegrationCode.scala:9-21).
  */
trait IntegrationFactory extends Serializable {
  def build(options: Map[String, String]): Integration
}

/** DataSource V2 for fetcher-style integrations (SURVEY §7.3): exposes an
  * [[Integration]] as a first-class `spark.read.format(...)` table.
  *
  *  - `planInputPartitions` IS `planTasks` (O2): one Spark input
  *    partition per ingestion task, so a 100 TB pull parallelizes to
  *    exactly the integration's task fan-out.
  *  - Each `PartitionReader` runs the task's fetch on the executor
  *    (O5 `fetchStructured`, or O3∘O4 `fetchRaw`+`parse`) and streams
  *    rows — nothing is materialized driver-side.
  *  - Column pruning (`SupportsPushDownRequiredColumns`) projects before
  *    conversion; filters on `task_number`
  *    (`SupportsPushDownFilters`) prune whole TASKS at plan time — the
  *    partition-pruning analog for external pulls.
  *  - Optional `throttle.rowsPerSec` paces each reader — the per-task
  *    rate-limit analog of the reference's ThrottledWorkResource
  *    (worker-api/.../proto/WorkResource.scala:29-43).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GraftIntegrationSource")
  *     .option("factory", classOf[DocumentsStructuredFactory].getName)
  *     .option("dir", sfDir)
  *     .load()
  * }}}
  */
class GraftIntegrationSource extends TableProvider {
  import GraftIntegrationSource._

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    fullSchema(integrationFor(toMap(options)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object GraftIntegrationSource {
  val TaskNumberCol = "task_number"

  private[sources] def toMap(o: CaseInsensitiveStringMap): Map[String, String] =
    o.asCaseSensitiveMap().asScala.toMap

  /** Optional `jars` option (comma-separated paths): the factory and
    * everything it pulls in load CHILD-FIRST from those jars
    * ([[graft.engine.IntegrationLoader]]) — per-integration dependency
    * isolation, the reference's forked-executor analog. Without it the
    * factory loads from the application classpath as before.
    */
  private[sources] def integrationFor(opts: Map[String, String]): Integration = {
    val cls = opts.getOrElse("factory",
      throw new IllegalArgumentException("option 'factory' (IntegrationFactory class) required"))
    val jars = opts.get("jars").toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    graft.engine.IntegrationLoader.instantiate[IntegrationFactory](cls, jars)
      .build(opts)
  }

  private[sources] def fullSchema(i: Integration): StructType =
    StructType(i.schema.structType.fields :+
      StructField(TaskNumberCol, IntegerType, nullable = false))

  /** Deterministic synthetic job for a read (a scan is not a tracked
    * ingestion run; the layout-writing path stays with JobRunner).
    */
  private[sources] def jobFor(i: Integration): IngestionJob =
    IngestionJob(IngestionSource(i.name),
      UUID.nameUUIDFromBytes(s"graft-read-${i.name}".getBytes("UTF-8")))

  private[sources] final class GraftTable(tableSchema: StructType,
                                          opts: Map[String, String])
      extends Table with SupportsRead {
    override def name(): String = s"graft-integration(${opts.getOrElse("factory", "?")})"
    override def schema(): StructType = tableSchema
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new GraftScanBuilder(tableSchema, opts ++ toMap(options))
  }

  private[sources] final class GraftScanBuilder(full: StructType,
                                                opts: Map[String, String])
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters {
    private var required: StructType = full
    private var taskFilters: Array[Filter] = Array.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    /** Accepts only exact task_number predicates — they prune whole
      * tasks, everything else stays with Spark.
      */
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (task, rest) = filters.partition {
        case EqualTo(TaskNumberCol, _) | In(TaskNumberCol, _) |
             GreaterThan(TaskNumberCol, _) | GreaterThanOrEqual(TaskNumberCol, _) |
             LessThan(TaskNumberCol, _) | LessThanOrEqual(TaskNumberCol, _) => true
        case _ => false
      }
      taskFilters = task
      rest
    }
    override def pushedFilters(): Array[Filter] = taskFilters

    override def build(): Scan = new GraftScan(full, required, opts, taskFilters)
  }

  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

  private[sources] def taskAdmitted(n: Int, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo(TaskNumberCol, v) => n == asLong(v)
      case In(TaskNumberCol, vs) => vs.exists(v => asLong(v) == n)
      case GreaterThan(TaskNumberCol, v) => n > asLong(v)
      case GreaterThanOrEqual(TaskNumberCol, v) => n >= asLong(v)
      case LessThan(TaskNumberCol, v) => n < asLong(v)
      case LessThanOrEqual(TaskNumberCol, v) => n <= asLong(v)
      case _ => true
    }

  private[sources] final class GraftScan(full: StructType, required: StructType,
                                         opts: Map[String, String],
                                         taskFilters: Array[Filter])
      extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftIntegrationScan(pushedTaskFilters=${taskFilters.mkString(",")})"

    override def planInputPartitions(): Array[InputPartition] = {
      val integration = integrationFor(opts)
      integration.planTasks(jobFor(integration))
        .filter(t => taskAdmitted(t.taskNumber, taskFilters))
        .map(t => TaskInputPartition(t): InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftReaderFactory(opts, full, required)
  }

  private[sources] final case class TaskInputPartition(task: TaskSpec)
      extends InputPartition

  private[sources] final class GraftReaderFactory(opts: Map[String, String],
                                                  full: StructType,
                                                  required: StructType)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val task = partition.asInstanceOf[TaskInputPartition].task
      new GraftPartitionReader(opts, full, required, task)
    }
  }

  private[sources] final class GraftPartitionReader(opts: Map[String, String],
                                                    full: StructType,
                                                    required: StructType,
                                                    task: TaskSpec)
      extends PartitionReader[InternalRow] {
    // integration instantiated PER PARTITION on the executor, the analog
    // of the reference's per-worker code loading
    private val rows: Iterator[Row] = integrationFor(opts) match {
      case s: StructuredIntegration => s.fetchStructured(task)
      case r: RawIntegration => r.fetchRaw(task).flatMap(b => r.parse(task, b))
    }
    // project full-row → required columns (+ task_number) BEFORE catalyst
    // conversion, so pruned columns are never converted
    private val dataIdx = full.fields.dropRight(1).map(_.name).zipWithIndex.toMap
    private val picks: Array[Int] =
      required.fields.map(f => dataIdx.getOrElse(f.name, -1)) // -1 = task_number
    private val toInternal = GraftSqlShim.rowToInternal(required)
    private val throttle = opts.get("throttle.rowsPerSec").map(_.toDouble)
    private val startNs = System.nanoTime()
    private var readCount = 0L
    private var current: InternalRow = _

    override def next(): Boolean =
      if (!rows.hasNext) false
      else {
        val row = rows.next()
        val vals = picks.map(i => if (i < 0) task.taskNumber else row.get(i))
        current = toInternal(Row.fromSeq(vals.toIndexedSeq))
        readCount += 1
        throttle.foreach { rate => // token pacing: stay at or under rate
          val dueNs = startNs + (readCount / rate * 1e9).toLong
          val wait = dueNs - System.nanoTime()
          if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        }
        true
      }
    override def get(): InternalRow = current
    override def close(): Unit = ()
  }
}
