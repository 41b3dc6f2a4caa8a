package graft.engine

import graft.api._
import graft.model._
import org.apache.spark.sql.Row

/** Engine analogs of the reference's stub integrations (FIXTURES.md §5):
  *  - ProcessedDataStub emits exactly one record ("Name Value", 1, 2L)
  *    (worker/src/test/scala/com/harrys/hyppo/worker/ProcessedDataStub.scala:33-41)
  *  - RawDataStub fetches the bytes "hello" and parses that file into one
  *    record ("Test Name", 1, 2L) (RawDataStub.scala:30-47)
  */
object Stubs {
  val testRecordJson: String =
    """{"type":"record","name":"TestRecord","namespace":"io.ingestion.worker.api.data",
      |"fields":[
      |  {"name":"name","type":"string"},
      |  {"name":"valueOne","type":["int","null"]},
      |  {"name":"valueTwo","type":["long","null"]}]}""".stripMargin

  val testSchema: IntegrationSchema = IntegrationSchema.fromJson(testRecordJson)

  class StubStructured extends StructuredIntegration {
    override def name: String = "Test Integration"
    override def schema: IntegrationSchema = Stubs.testSchema
    override def planTasks(job: IngestionJob): Seq[TaskSpec] =
      Seq(TaskSpec(job.id.toString, job.source.name, 0))
    override def fetchStructured(task: TaskSpec): Iterator[Row] =
      Iterator(Row("Name Value", 1, 2L))
  }

  class StubRaw extends RawIntegration {
    override def name: String = "Raw Test Integration"
    override def schema: IntegrationSchema = Stubs.testSchema
    override def planTasks(job: IngestionJob): Seq[TaskSpec] =
      Seq(TaskSpec(job.id.toString, job.source.name, 0))
    override def fetchRaw(task: TaskSpec): Iterator[Array[Byte]] =
      Iterator("hello".getBytes("UTF-8"))
    override def parse(task: TaskSpec, raw: Array[Byte]): Iterator[Row] = {
      require(new String(raw, "UTF-8") == "hello", "raw bytes did not round-trip")
      Iterator(Row("Test Name", 1, 2L))
    }
  }

  /** Multi-task fan-out stub: N tasks × M records each. */
  class FanOut(n: Int, m: Int) extends StructuredIntegration {
    override def name: String = "FanOut"
    override def schema: IntegrationSchema = Stubs.testSchema
    override def planTasks(job: IngestionJob): Seq[TaskSpec] =
      (0 until n).map(i => TaskSpec(job.id.toString, job.source.name, i))
    override def fetchStructured(task: TaskSpec): Iterator[Row] =
      (0 until m).iterator.map(j => Row(s"t${task.taskNumber}-r$j", task.taskNumber, j.toLong))
  }

  class BrokenSchema extends StructuredIntegration {
    override def name: String = "Broken"
    override def schema: IntegrationSchema =
      IntegrationSchema("Broken", """{"type":"record","name":"B","fields":[{"name":"u","type":["int","string"]}]}""", "x")
    override def planTasks(job: IngestionJob): Seq[TaskSpec] = Seq.empty
    override def fetchStructured(task: TaskSpec): Iterator[Row] = Iterator.empty
  }
}
