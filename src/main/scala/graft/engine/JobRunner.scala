package graft.engine

import graft.api._
import graft.model._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.Instant
import scala.util.control.NonFatal

/** The engine runtime: turns an Integration + IngestionJob into the
  * reference's 7-operation dataflow (SURVEY.md §3.3), expressed as one
  * declarative Spark plan per job:
  *
  *   planTasks (O2, driver)  → Dataset[TaskSpec], one task per partition
  *   fetchRaw  (O3, executor)→ flatMap to raw byte files + manifest
  *   parse     (O4, executor)→ flatMap to typed rows
  *   fetchStructured (O5)    → fused O3∘O4 for processed-kind integrations
  *   write records           → columnar parquet under the reference layout
  *   persist   (O6)          → TableSink / ForeachSink (+ at-most-once fence)
  *   onJobCompleted (O7)     → driver callback
  *
  * Scale design: the driver never materializes record data — only the
  * per-task manifest (size/md5/recordCount, parity with
  * RemoteProcessedDataFile, worker-api/.../proto/RemoteDataFile.scala:20-27)
  * ever comes back, and even that is written as a parquet manifest table.
  * Raw bytes go executor→storage directly via the Hadoop FS API (works for
  * file:// here and s3a:// on a cluster — the reference's S3 uploads,
  * S3DataFileHandler.scala:62-96).
  */
final class JobRunner(spark: SparkSession, layout: StorageLayout) {
  import JobRunner._

  /** O1 — ValidateIntegration: structural checks + schema extraction,
    * mirroring executor/.../run/ValidateIntegrationOperation.java:34-147
    * (null-factory checks become null/parse/convert checks; errors are
    * collected, not thrown).
    */
  def validate(integration: Integration): ValidationReport = {
    val errors = Seq.newBuilder[ValidationError]
    var fp: Option[String] = None
    if (integration.name == null || integration.name.trim.isEmpty)
      errors += ValidationError("integration name is null or empty")
    try {
      val sch = integration.schema
      if (sch == null) errors += ValidationError("schema is null")
      else {
        val st = sch.structType // forces Avro JSON parse + Spark conversion
        if (st.isEmpty) errors += ValidationError("schema has no fields")
        fp = Some(sch.fingerprint)
        val recomputed = IntegrationSchema.fromJson(sch.schemaJson)
        if (!recomputed.sameAs(sch))
          errors += ValidationError(
            s"schema fingerprint mismatch: declared ${sch.fingerprint}, canonical ${recomputed.fingerprint}")
      }
    } catch {
      case NonFatal(e) =>
        errors += ValidationError(s"schema extraction failed: ${e.getMessage}",
          Some(e.getClass.getName))
    }
    if (integration.persistingSemantics == null)
      errors += ValidationError("persistingSemantics is null")
    val errs = errors.result()
    ValidationReport(integration.name, errs.isEmpty, fp,
      integration.isRawData, integration.persistingSemantics, errs)
  }

  /** O2 — CreateIngestionTasks: the task list IS the partition plan; one
    * reference task = one Spark partition (CommanderActor runs one task
    * per worker; we run them all in parallel).
    */
  def planTasks(integration: Integration, job: IngestionJob): Seq[TaskSpec] = {
    require(job.source.name == integration.name || integration.name.nonEmpty,
      "job/source mismatch")
    val tasks = integration.planTasks(job)
    require(tasks.nonEmpty, "planTasks produced no tasks")
    tasks
  }

  /** O3+O4 / O5 — produce the typed record DataFrame for the job, with a
    * `task_number` column carrying task lineage. The raw path also writes
    * each fetched byte file to the reference layout and returns its
    * manifest.
    */
  def records(integration: Integration, job: IngestionJob,
              tasks: Seq[TaskSpec]): DataFrame = {
    val schema = integration.schema.structType
    val withTask = StructType(schema.fields :+ StructField("task_number", IntegerType, false))
    val sc = spark.sparkContext
    // one task per partition — the reference's unit of parallel work
    val taskRdd = sc.parallelize(tasks, tasks.size)
    val rowRdd = integration match {
      case ri: RawIntegration =>
        val lay = layout
        val jobB = job
        val conf = new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf())
        taskRdd.flatMap { task =>
          ri.fetchRaw(task).zipWithIndex.flatMap { case (bytes, i) =>
            // land the raw file (gzipped) exactly where the reference would
            val path = new Path(lay.rawFile(jobB, task.taskNumber, i))
            val fs = path.getFileSystem(conf.value)
            val out = new java.util.zip.GZIPOutputStream(fs.create(path, true))
            try out.write(bytes) finally out.close()
            ri.parse(task, bytes)
              .map(r => Row.fromSeq(r.toSeq :+ task.taskNumber))
          }
        }
      case si: StructuredIntegration =>
        taskRdd.flatMap { task =>
          si.fetchStructured(task).map(r => Row.fromSeq(r.toSeq :+ task.taskNumber))
        }
    }
    spark.createDataFrame(rowRdd, withTask)
  }

  /** Persist the record files under the reference layout — one Avro
    * container file per task at `records/task-N/data.avro` (wire-format
    * parity with the reference's processed-record files,
    * `executor/.../run/ProcessRawDataOperation.java:70-84`) — and return
    * the per-task manifest (record count, file size, file MD5; parity with
    * RemoteProcessedDataFile, `worker-api/.../proto/RemoteDataFile.scala:
    * 20-27`).
    *
    * Everything happens in ONE executor pass: records stream straight into
    * the container encoder through a counting+digest wrapper, so there is
    * no second scan to count, no driver-side renames, and the layout path
    * is written directly (renames are copy+delete on object stores).
    * `records()` gives one task per partition; a task split across
    * partitions would clobber its own file — keep that invariant upstream.
    */
  def writeRecords(job: IngestionJob, recordsDf: DataFrame): DataFrame = {
    import graft.sources.AvroRecordFiles
    val full = recordsDf.schema
    val taskIdx = full.fieldIndex("task_number")
    val dataIdx = full.fields.indices.filterNot(_ == taskIdx)
    val dataSchema = StructType(dataIdx.map(full.fields).toArray)
    val avroJson = AvroRecordFiles.avroSchema(dataSchema).toString
    val lay = layout
    val jobB = job
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val manifestRows = recordsDf.rdd.mapPartitions { rows =>
      val schema = new org.apache.avro.Schema.Parser().parse(avroJson)
      final class Handle(task: Int) {
        val file = lay.recordsFile(jobB, task)
        private val path = new Path(file)
        private val digest = java.security.MessageDigest.getInstance("MD5")
        var bytes = 0L
        var count = 0L
        // counting + digesting tee: `out` inside the overrides is the
        // inherited FilterOutputStream field (the raw FS stream)
        private val cout = new java.io.FilterOutputStream(
            path.getFileSystem(conf.value).create(path, true)) {
          override def write(b: Int): Unit = { out.write(b); digest.update(b.toByte); bytes += 1 }
          override def write(b: Array[Byte], off: Int, len: Int): Unit = {
            out.write(b, off, len); digest.update(b, off, len); bytes += len
          }
        }
        private val writer = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
        writer.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        writer.create(schema, cout)
        def append(row: Row): Unit = {
          writer.append(AvroRecordFiles.toRecord(schema, row, dataIdx)); count += 1
        }
        def close(): String = {
          writer.close()
          digest.digest().map("%02x".format(_)).mkString
        }
        def abort(): Unit =
          try writer.close() catch { case scala.util.control.NonFatal(_) => () }
      }
      val open = scala.collection.mutable.LinkedHashMap[Int, Handle]()
      try {
        rows.foreach { row =>
          val t = row.getInt(taskIdx)
          open.getOrElseUpdate(t, new Handle(t)).append(row)
        }
      } catch {
        // a mid-write failure must not leave dangling FS streams (on
        // object stores those are stuck multipart uploads)
        case e: Throwable => open.valuesIterator.foreach(_.abort()); throw e
      }
      open.iterator.map { case (t, h) =>
        val md5 = h.close() // flush first — bytes is final only after close
        Row(t, h.count, h.bytes, md5, h.file)
      }.toVector.iterator
    }
    spark.createDataFrame(manifestRows, JobRunner.manifestSchema)
  }

  /** Reads a job's record files back (the O5-for-downstream / persist
    * input path), re-attaching `task_number` from the layout key and
    * verifying each file's MD5 against the manifest when provided —
    * download-with-checksum parity (`S3DataFileHandler.scala:138-148`).
    */
  def readRecords(integration: Integration, job: IngestionJob,
                  md5ByTask: Map[Int, String] = Map.empty): DataFrame = {
    import graft.sources.AvroRecordFiles
    val dataSchema = integration.schema.structType
    val types = dataSchema.fields.map(_.dataType).toSeq
    val root = new Path(s"${layout.jobRoot(job)}/records")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.globStatus(new Path(root, "task-*/data.avro"))
      .map(_.getPath.toString).sorted.toSeq
    def taskOf(f: String): Int =
      "task-(\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt)
        .getOrElse(sys.error(s"no task number in $f"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    // read through the CURRENT integration schema as the Avro reader
    // schema, so files written by an older integration version resolve
    // (new defaulted fields fill, dropped fields skip)
    val readerJson = AvroRecordFiles.avroSchema(dataSchema).toString
    val rows = spark.sparkContext
      .parallelize(files, math.max(files.size, 1))
      .flatMap { f =>
        val task = taskOf(f)
        val reader = new org.apache.avro.Schema.Parser().parse(readerJson)
        AvroRecordFiles.streamFile(f, types, md5ByTask.get(task), conf.value,
            Some(reader))
          .map(vals => Row.fromSeq(vals :+ task))
      }
    val withTask = StructType(dataSchema.fields :+
      StructField("task_number", IntegerType, false))
    spark.createDataFrame(rows, withTask)
  }

  /** O6 — PersistProcessedData. TableSink rides Spark's commit protocol;
    * ForeachSink mirrors the user-persister loop. Unsafe semantics get an
    * at-most-once fence: a task that already holds a fence marker is
    * skipped instead of re-run (reference ACKs before execution,
    * TaskFSM.scala:102-115).
    */
  def persist(integration: Integration, job: IngestionJob,
              recordsDf: DataFrame, sink: SinkSpec): Unit = sink match {
    case TableSink(format, mode, path) =>
      val target = path.getOrElse(s"${layout.jobRoot(job)}/persisted")
      recordsDf.write.format(format).mode(mode).save(target)
    case ForeachSink(fn) =>
      val unsafe = integration.persistingSemantics == PersistingSemantics.Unsafe
      val fenceRoot = s"${layout.jobRoot(job)}/persist-fence"
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf())
      // co-locate each task's rows, then walk task-runs within the
      // partition (a partition may hold several tasks after hashing)
      recordsDf.repartition(col("task_number"))
        .sortWithinPartitions(col("task_number"))
        .foreachPartition { (rows: Iterator[Row]) =>
          val buf = rows.buffered
          while (buf.hasNext) {
            val taskNumber = buf.head.getAs[Int]("task_number")
            val taskRows = new Iterator[Row] {
              def hasNext: Boolean =
                buf.hasNext && buf.head.getAs[Int]("task_number") == taskNumber
              def next(): Row = buf.next()
            }
            val fence = new Path(s"$fenceRoot/task-$taskNumber")
            val fs = fence.getFileSystem(conf.value)
            val alreadyRun = unsafe && !fs.createNewFile(fence)
            if (!alreadyRun) fn(taskNumber, taskRows)
            while (taskRows.hasNext) taskRows.next() // drain if fn didn't
          }
        }
  }

  /** End-to-end O1→O7 with O8 failure mapping. The execution log lands at
    * the layout's log key LAST, success or failure — the reference uploads
    * operation logs after the response (`CommanderActor.scala:292-315`).
    */
  def run(integration: Integration, job: IngestionJob,
          sink: SinkSpec = TableSink(),
          onProgress: Long => Unit = _ => ()): Either[FailureReport, JobResult] = {
    val executionId = java.util.UUID.randomUUID().toString
    val log = Seq.newBuilder[String]
    log += s"execution=$executionId job=${job.id} integration=${integration.name}"
    // StatusUpdate analog: the reference streams progress frames before the
    // operation result (executor/.../proto/StatusUpdate.java:18-42,
    // OperationHandler.scala:57-67); here a listener reports completed
    // Spark tasks for this run's job group as the job executes.
    val sc = spark.sparkContext
    val priorGroup = Option(sc.getLocalProperty("spark.jobGroup.id"))
    val group = priorGroup.getOrElse {
      val g = s"graft-run-$executionId"
      sc.setJobGroup(g, s"graft job ${job.id}", interruptOnCancel = false)
      g
    }
    val tasksDone = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(js.properties).exists(_.getProperty("spark.jobGroup.id") == group))
          js.stageIds.foreach(stages.add)
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (stages.contains(te.stageId)) onProgress(tasksDone.incrementAndGet())
    }
    sc.addSparkListener(listener)
    val result =
      try {
        val report = validate(integration)
        log += s"validate isValid=${report.isValid} errors=${report.errors.size}"
        if (!report.isValid)
          Left(FailureReport("graft.ValidationFailed",
            report.errors.map(_.message).mkString("; "), Nil, None))
        else {
          val tasks = planTasks(integration, job)
          log += s"planTasks n=${tasks.size}"
          val recs = records(integration, job, tasks)
          val manifest = writeRecords(job, recs)
            .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getString(3))).toMap
          manifest.toSeq.sortBy(_._1).foreach { case (t, (n, md5)) =>
            log += s"writeRecords task=$t records=$n md5=$md5" }
          // persist re-reads the landed record files with checksum
          // verification (never the live fetch plan — a fetch is not
          // assumed re-runnable)
          persist(integration, job,
            readRecords(integration, job, manifest.map { case (t, (_, m)) => t -> m }),
            sink)
          log += "persist ok"
          val counts = manifest.map { case (t, (n, _)) => t -> n }
          integration.onJobCompleted(Instant.now(), job, tasks)
          Right(JobResult(job, tasks.size, counts.values.sum, counts))
        }
      } catch {
        case NonFatal(e) =>
          val cause = rootSparkCause(e)
          log += s"failed ${cause.getClass.getName}: ${cause.getMessage}"
          Left(FailureReport.fromThrowable(cause))
      } finally {
        sc.removeSparkListener(listener)
        // only clear a group THIS run created — leaking it would tag (and
        // expose to cancellation) unrelated later jobs on this thread
        if (priorGroup.isEmpty) sc.clearJobGroup()
      }
    log += s"progress sparkTasksCompleted=${tasksDone.get()}"
    writeLog(job, executionId, log.result())
    result
  }

  /** Best-effort execution-log upload to the layout's log key. */
  private def writeLog(job: IngestionJob, executionId: String,
                       lines: Seq[String]): Unit =
    try {
      val p = new Path(layout.logFile(job, executionId))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val out = fs.create(p, true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    } catch { case NonFatal(_) => () } // logs must never fail the job
}

object JobRunner {
  final case class JobResult(job: IngestionJob, taskCount: Int,
                             recordCount: Long, perTask: Map[Int, Long])

  /** Per-task record-file manifest (RemoteDataFile parity). */
  val manifestSchema: StructType = StructType(Seq(
    StructField("task_number", IntegerType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_size", LongType, nullable = false),
    StructField("file_md5", StringType, nullable = false),
    StructField("records_file", StringType, nullable = false)))

  /** Unwrap Spark's task-failure wrapper to the user-code cause, the
    * analog of the reference's structured exception chain
    * (IntegrationException.scala:13-68).
    */
  def rootSparkCause(e: Throwable): Throwable = e match {
    case se: org.apache.spark.SparkException if se.getCause != null => se.getCause
    case other => other
  }
}
