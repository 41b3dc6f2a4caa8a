package graft.model

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** Deterministic storage layout, key-for-key with the reference
  * (worker/src/main/scala/com/harrys/hyppo/worker/data/S3DataFileHandler.scala:98-136):
  *
  *   {prefix}/{source}/{yyyy-MM-dd}/job-{uuid}/raw/task-{n}/data-{i}.raw.gz
  *   {prefix}/{source}/{yyyy-MM-dd}/job-{uuid}/records/task-{n}/data.avro
  *   {prefix}/{source}/{yyyy-MM-dd}/job-{uuid}/log/{executionId}.out
  *
  * Source names are slugified to lowercase-dashed form as the reference
  * does for queue/key naming. At 100 TB this layout is also the physical
  * partitioning: (source, date, jobId) are the partition columns of every
  * manifest table, so job-scoped reads prune to one directory.
  */
final case class StorageLayout(prefix: String) {
  // ships inside executor closures (raw-file landing) — keep it serializable
  @transient private lazy val dateFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  def slug(name: String): String =
    name.trim.toLowerCase.replaceAll("[^a-z0-9]+", "-").stripPrefix("-").stripSuffix("-")

  def jobRoot(job: IngestionJob): String =
    s"$prefix/${slug(job.source.name)}/${dateFmt.format(job.startedAt)}/job-${job.id}"

  def rawFile(job: IngestionJob, taskNumber: Int, fileIndex: Int): String =
    s"${jobRoot(job)}/raw/task-$taskNumber/data-$fileIndex.raw.gz"

  def recordsDir(job: IngestionJob, taskNumber: Int): String =
    s"${jobRoot(job)}/records/task-$taskNumber"

  def recordsFile(job: IngestionJob, taskNumber: Int): String =
    s"${recordsDir(job, taskNumber)}/data.avro"

  def logFile(job: IngestionJob, executionId: String): String =
    s"${jobRoot(job)}/log/$executionId.out"
}
