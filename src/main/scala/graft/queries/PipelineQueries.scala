package graft.queries

import graft.QueryDef
import graft.engine.JobRunner
import graft.model._
import graft.sources._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files
import java.time.Instant
import java.util.UUID

/** SURVEY.md §2a dataflow operators (O1–O7) surfaced through the driver's
  * correctness gate: each query runs the real engine (JobRunner +
  * fetcher-style DocumentsIntegration) and emits a deterministic,
  * SQL-checkable result derived from the `documents` table.
  */
object PipelineQueries {

  // fixed job identity → deterministic storage keys & outputs
  private val jobId = UUID.fromString("5e2e761b-ec7f-40f3-8d55-60eb6526dcb0")
  private def job(name: String) = IngestionJob(
    IngestionSource(name), jobId, startedAt = Instant.parse("2026-08-12T00:00:00Z"))

  private def runner(spark: SparkSession): (JobRunner, StorageLayout) = {
    val lay = StorageLayout(Files.createTempDirectory("graft-pipeline").toString)
    (new JobRunner(spark, lay), lay)
  }

  /** task_number ↔ source mapping as SQL (sources sorted, 0-based). */
  private val taskMapSql =
    """(SELECT source, CAST(row_number() OVER (ORDER BY source) - 1 AS INT) AS task_number
       FROM (SELECT DISTINCT source FROM documents))"""

  def defs: Map[String, QueryDef] = Map(

    // O1 — ValidateIntegration: structured report for both integration
    // kinds; fingerprints are recomputed in the oracle literal from the
    // same canonical-MD5 definition.
    "p01_validate_integration" -> QueryDef(
      (s, d) => {
        val (r, _) = runner(s)
        val reports = Seq(new DocumentsStructuredIntegration(d),
                          new DocumentsRawIntegration(d)).map(r.validate)
        import s.implicits._
        reports.map(rep => (rep.sourceName, rep.isValid,
            rep.schemaFingerprint.getOrElse(""), rep.isRawData, rep.errors.size.toLong))
          .toDF("integration", "is_valid", "fingerprint", "is_raw", "n_errors")
      },
      Some {
        val fpS = new DocumentsStructuredIntegration("/").schema.fingerprint
        val fpR = new DocumentsRawIntegration("/").schema.fingerprint
        s"""SELECT * FROM (VALUES
            ('documents-structured', true, '$fpS', false, CAST(0 AS BIGINT)),
            ('documents-raw', true, '$fpR', true, CAST(0 AS BIGINT)))
            t(integration, is_valid, fingerprint, is_raw, n_errors)"""
      }),

    // O2 — CreateIngestionTasks: the fan-out plan (one task per source).
    "p02_plan_tasks" -> QueryDef(
      (s, d) => {
        val (r, _) = runner(s)
        val tasks = r.planTasks(new DocumentsStructuredIntegration(d), job("documents-structured"))
        import s.implicits._
        tasks.map(t => (t.taskNumber, t.taskArguments("source"), t.jobId))
          .toDF("task_number", "source", "job_id")
      },
      Some(s"""SELECT task_number, source, '$jobId' AS job_id FROM $taskMapSql""")),

    // O3+O4 — FetchRawData + ProcessRawData: raw files land gzipped under
    // the reference key scheme; parsed manifest (size/md5/words) checked
    // byte-for-byte against SQL recomputation.
    "p03_fetch_parse_raw" -> QueryDef(
      (s, d) => {
        val (r, _) = runner(s)
        val integ = new DocumentsRawIntegration(d)
        val j = job("documents-raw")
        r.records(integ, j, r.planTasks(integ, j))
          .select(col("doc_id"), col("raw_size"), col("raw_md5"), col("n_words"), col("task_number"))
      },
      Some(s"""
        SELECT doc_id,
               CAST(octet_length(encode(CAST(doc_id AS VARCHAR) || chr(9) || text)) AS BIGINT) AS raw_size,
               md5(CAST(doc_id AS VARCHAR) || chr(9) || text) AS raw_md5,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               m.task_number
        FROM documents JOIN $taskMapSql m USING (source)""")),

    // O5 — FetchProcessedData: structured fetch straight to records.
    "p05_fetch_structured" -> QueryDef(
      (s, d) => {
        val (r, _) = runner(s)
        val integ = new DocumentsStructuredIntegration(d)
        val j = job("documents-structured")
        r.records(integ, j, r.planTasks(integ, j))
      },
      Some(s"""
        SELECT doc_id, lang, n_chars, m.task_number
        FROM documents JOIN $taskMapSql m USING (source)""")),

    // O6 — PersistProcessedData: full run with a TableSink, then read the
    // PERSISTED table back and aggregate per task (proves the sink wrote
    // exactly the records the oracle predicts).
    "p06_persist_counts" -> QueryDef(
      (s, d) => {
        val (r, lay) = runner(s)
        val j = job("documents-structured")
        r.run(new DocumentsStructuredIntegration(d), j) match {
          case Left(f)  => throw new RuntimeException(f.summaryLines.mkString("; "))
          case Right(_) =>
            s.read.parquet(s"${lay.jobRoot(j)}/persisted")
              .groupBy(col("task_number"))
              .agg(count(lit(1)).as("record_count"),
                   sum(col("n_chars")).as("char_sum"))
        }
      },
      Some(s"""
        SELECT m.task_number, count(*) AS record_count,
               CAST(sum(n_chars) AS BIGINT) AS char_sum
        FROM documents JOIN $taskMapSql m USING (source)
        GROUP BY m.task_number""")),

    // O7 — HandleJobCompleted: the completion summary the driver hook sees.
    // The fetcher-style integration exposed as a first-class DataSource
    // V2 table (SURVEY §7.3): planInputPartitions = planTasks, each
    // partition reader runs the task's fetch on the executor. Same rows
    // as p05, through the public spark.read.format surface.
    "p08_dsv2_source" -> QueryDef(
      (s, d) => s.read.format("graft.sources.GraftIntegrationSource")
        .option("factory", classOf[DocumentsStructuredFactory].getName)
        .option("dir", d)
        .load(),
      Some(s"""
        SELECT doc_id, lang, n_chars, m.task_number
        FROM documents JOIN $taskMapSql m USING (source)""")),

    // The DSv2 record-file SINK under Spark's two-phase commit: write
    // per-task Avro container files + manifest, then surface the
    // committed manifest counts (oracle predicts them from the data).
    "p09_dsv2_sink" -> QueryDef(
      (s, d) => {
        val root = Files.createTempDirectory("graft-p09").toString
        s.read.parquet(s"$d/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            pmod(col("doc_id"), lit(3)).cast("int").as("task_number"))
          .repartition(col("task_number"))
          .write.format("graft.sources.GraftRecordFileSink")
          .option("root", root).mode("append").save()
        val manifest = GraftRecordFileSink.readManifest(s, root)
          .map { case (t, n, _, _) => (t, n) }
        import s.implicits._
        manifest.toDF("task_number", "record_count")
      },
      Some("""
        SELECT CAST(doc_id % 3 AS INT) AS task_number, count(*) AS record_count
        FROM documents GROUP BY 1""")),

    "p07_job_summary" -> QueryDef(
      (s, d) => {
        val (r, _) = runner(s)
        val j = job("documents-structured")
        var hook: Option[(Int, Long)] = None
        val integ = new DocumentsStructuredIntegration(d) {
          override def onJobCompleted(at: Instant, jb: IngestionJob, tasks: Seq[TaskSpec]): Unit =
            hook = Some((tasks.size, tasks.size.toLong))
        }
        val res = r.run(integ, j).toOption.get
        import s.implicits._
        Seq((res.taskCount.toLong, res.recordCount, hook.isDefined))
          .toDF("n_tasks", "n_records", "hook_fired")
      },
      Some("""
        SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_tasks,
               count(*) AS n_records, true AS hook_fired
        FROM documents"""))
  )
}
