package graft.sources

import graft.api._
import graft.model._
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.Row

/** Fetcher-style integrations over the `documents` table: each task pulls
  * ONE source's documents from an external store (here the parquet file,
  * read with the raw parquet-hadoop Group API — deliberately NOT
  * spark.read, because this models the reference's executor-side user
  * fetcher hitting an external system:
  * executor/.../run/FetchRawDataOperation.java:43-65).
  *
  * Task fan-out = one task per distinct `source` value, task arguments
  * carry the source id — the reference's IngestionTaskCreator pattern
  * (CreateIngestionTasksOperation.java:36-57). At 100 TB the per-task pull
  * is a ranged scan against the upstream system; partition-per-task keeps
  * it embarrassingly parallel.
  */
object DocumentsSource {

  final case class Doc(docId: Long, text: String, lang: String, source: String, nChars: Long)

  /** Ranged scan: an optional source predicate is pushed into the parquet
    * reader (row-group stats + dictionary + record-level filtering), the
    * external-system analog of a keyed/ranged pull per task — each task
    * reads its slice, not the whole store. The reader closes on
    * exhaustion; both call sites consume the iterator fully.
    */
  def scan(sfDir: String, source: Option[String] = None): Iterator[Doc] = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.io.api.Binary
    val builder = ParquetReader
      .builder(new GroupReadSupport(), new Path(s"$sfDir/documents.parquet"))
    val reader = source.fold(builder) { src =>
      builder.withFilter(FilterCompat.get(FilterApi.eq(
        FilterApi.binaryColumn("source"), Binary.fromString(src))))
    }.build()
    val groups = new Iterator[Group] {
      private var g: Group = advance()
      private def advance(): Group = {
        val n = reader.read(); if (n == null) reader.close(); n
      }
      def hasNext: Boolean = g != null
      def next(): Group = { val c = g; g = advance(); c }
    }
    val docs = groups.map { g =>
      Doc(g.getLong("doc_id", 0), g.getString("text", 0), g.getString("lang", 0),
          g.getString("source", 0), g.getLong("n_chars", 0))
    }
    // residual filter: record-level pushdown already drops non-matching
    // rows; this keeps correctness independent of filter support
    source.fold(docs)(src => docs.filter(_.source == src))
  }

  /** Distinct sources, sorted — the deterministic task list. */
  def sources(sfDir: String): Seq[String] =
    scan(sfDir).map(_.source).toSeq.distinct.sorted

  def planTasks(sfDir: String, job: IngestionJob): Seq[TaskSpec] =
    sources(sfDir).zipWithIndex.map { case (src, i) =>
      TaskSpec(job.id.toString, job.source.name, i, Map("source" -> src, "sfDir" -> sfDir))
    }

  def docsForTask(task: TaskSpec): Iterator[Doc] =
    scan(task.taskArguments("sfDir"), Some(task.taskArguments("source")))
}

/** O5 path: fetch already-structured records (doc_id, lang, n_chars). */
class DocumentsStructuredIntegration(sfDir: String) extends StructuredIntegration {
  override def name: String = "documents-structured"
  override def schema: IntegrationSchema = IntegrationSchema.fromJson(
    """{"type":"record","name":"DocMeta","fields":[
      |  {"name":"doc_id","type":"long"},
      |  {"name":"lang","type":"string"},
      |  {"name":"n_chars","type":"long"}]}""".stripMargin)
  override def planTasks(job: IngestionJob): Seq[TaskSpec] =
    DocumentsSource.planTasks(sfDir, job)
  override def fetchStructured(task: TaskSpec): Iterator[Row] =
    DocumentsSource.docsForTask(task).map(d => Row(d.docId, d.lang, d.nChars))
}

/** Reflection factories for the DSv2 source ([[GraftIntegrationSource]]):
  * class name travels in reader options, instantiated per executor.
  */
class DocumentsStructuredFactory extends IntegrationFactory {
  override def build(o: Map[String, String]): graft.api.Integration =
    new DocumentsStructuredIntegration(o("dir"))
}
class DocumentsRawFactory extends IntegrationFactory {
  override def build(o: Map[String, String]): graft.api.Integration =
    new DocumentsRawIntegration(o("dir"))
}

/** O3+O4 path: fetch documents as opaque raw byte files, then parse them
  * into records. The fetcher PAGES its upstream — each raw file is one
  * page of up to [[DocumentsRawIntegration.PageSize]] `{doc_id}\t{text}`
  * lines (a real external pull lands one file per API page, not one per
  * record; per-doc files multiply object-store requests by corpus size).
  * Parse emits one row per document with the doc's own encoded size + md5,
  * so the output stays per-record and oracle-checkable from SQL.
  */
class DocumentsRawIntegration(sfDir: String) extends RawIntegration {
  import DocumentsRawIntegration.PageSize
  override def name: String = "documents-raw"
  override def schema: IntegrationSchema = IntegrationSchema.fromJson(
    """{"type":"record","name":"RawDocManifest","fields":[
      |  {"name":"doc_id","type":"long"},
      |  {"name":"raw_size","type":"long"},
      |  {"name":"raw_md5","type":"string"},
      |  {"name":"n_words","type":"long"}]}""".stripMargin)
  override def planTasks(job: IngestionJob): Seq[TaskSpec] =
    DocumentsSource.planTasks(sfDir, job)
  override def fetchRaw(task: TaskSpec): Iterator[Array[Byte]] =
    DocumentsSource.docsForTask(task)
      .map(d => s"${d.docId}\t${d.text}")
      .grouped(PageSize)
      .map(page => page.mkString("\n").getBytes("UTF-8"))
  override def parse(task: TaskSpec, raw: Array[Byte]): Iterator[Row] =
    new String(raw, "UTF-8").split("\n", -1).iterator.map { line =>
      val Array(id, text) = line.split("\t", 2)
      val docBytes = line.getBytes("UTF-8")
      Row(id.toLong, docBytes.length.toLong,
        IntegrationSchema.md5Hex(docBytes), text.split(" ").length.toLong)
    }
}

object DocumentsRawIntegration {
  /** Docs per fetched page (newlines never occur inside document text). */
  val PageSize = 256
}
