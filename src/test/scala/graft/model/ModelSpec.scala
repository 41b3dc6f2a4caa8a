package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.types._
import java.time.Instant
import java.util.UUID

class ModelSpec extends AnyFunSuite with Matchers {

  // The reference's only test schema (FIXTURES.md §1; TestRecord.java:10)
  val testRecordJson: String =
    """{"type":"record","name":"TestRecord","namespace":"io.ingestion.worker.api.data",
      |"fields":[
      |  {"name":"name","type":"string"},
      |  {"name":"valueOne","type":["int","null"]},
      |  {"name":"valueTwo","type":["long","null"]}]}""".stripMargin

  test("fingerprint = MD5 of canonical schema string (IntegrationUtils.scala:25-29)") {
    val s = IntegrationSchema.fromJson(testRecordJson)
    val canonical = new org.apache.avro.Schema.Parser().parse(testRecordJson).toString(false)
    s.fingerprint shouldBe IntegrationSchema.md5Hex(canonical.getBytes("UTF-8"))
    s.fingerprint should fullyMatch regex "[0-9a-f]{32}"
    // stable across whitespace-differing but canonically-equal JSON
    val reparsed = IntegrationSchema.fromJson(s.schemaJson)
    reparsed.sameAs(s) shouldBe true
  }

  test("TestRecord Avro schema → StructType with union nullability") {
    val st = IntegrationSchema.fromJson(testRecordJson).structType
    st shouldBe StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("valueOne", IntegerType, nullable = true),
      StructField("valueTwo", LongType, nullable = true)))
  }

  test("full Avro type surface maps per SURVEY §1.3") {
    val json =
      """{"type":"record","name":"AllTypes","fields":[
        |  {"name":"s","type":"string"},
        |  {"name":"i","type":"int"},
        |  {"name":"l","type":"long"},
        |  {"name":"f","type":"float"},
        |  {"name":"d","type":"double"},
        |  {"name":"b","type":"boolean"},
        |  {"name":"by","type":"bytes"},
        |  {"name":"fx","type":{"type":"fixed","name":"F8","size":8}},
        |  {"name":"en","type":{"type":"enum","name":"E","symbols":["A","B"]}},
        |  {"name":"arr","type":{"type":"array","items":"int"}},
        |  {"name":"m","type":{"type":"map","values":"string"}},
        |  {"name":"rec","type":{"type":"record","name":"Inner","fields":[{"name":"x","type":"long"}]}},
        |  {"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}},
        |  {"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}}
        |]}""".stripMargin
    val st = IntegrationSchema.fromJson(json).structType
    st("s").dataType shouldBe StringType
    st("i").dataType shouldBe IntegerType
    st("l").dataType shouldBe LongType
    st("f").dataType shouldBe FloatType
    st("d").dataType shouldBe DoubleType
    st("b").dataType shouldBe BooleanType
    st("by").dataType shouldBe BinaryType
    st("fx").dataType shouldBe BinaryType
    st("en").dataType shouldBe StringType
    st("arr").dataType shouldBe ArrayType(IntegerType, containsNull = false)
    st("m").dataType shouldBe MapType(StringType, StringType, valueContainsNull = false)
    st("rec").dataType shouldBe StructType(Seq(StructField("x", LongType, nullable = false)))
    st("ts").dataType shouldBe TimestampType
    st("dec").dataType shouldBe DecimalType(10, 2)
  }

  test("schema equality = record name + fingerprint (IntegrationSchema.scala:25-28)") {
    val a = IntegrationSchema.fromJson(testRecordJson)
    val renamed = IntegrationSchema.fromJson(testRecordJson.replace("TestRecord", "OtherRecord"))
    a.sameAs(a) shouldBe true
    a.sameAs(renamed) shouldBe false
  }

  test("storage layout keys match S3DataFileHandler.scala:98-136 scheme") {
    val job = IngestionJob(
      IngestionSource("Test Integration"),
      UUID.fromString("5e2e761b-ec7f-40f3-8d55-60eb6526dcb0"),
      startedAt = Instant.parse("2026-08-12T10:00:00Z"))
    val lay = StorageLayout("/tmp/graft")
    lay.jobRoot(job) shouldBe
      "/tmp/graft/test-integration/2026-08-12/job-5e2e761b-ec7f-40f3-8d55-60eb6526dcb0"
    lay.rawFile(job, 0, 1) should endWith("/raw/task-0/data-1.raw.gz")
    lay.recordsFile(job, 3) should endWith("/records/task-3/data.avro")
    lay.logFile(job, "exec-1") should endWith("/log/exec-1.out")
  }

  test("failure report captures exception chain (IntegrationException.scala:13-68)") {
    val inner = new IllegalStateException("root cause")
    val outer = new RuntimeException("wrapper", inner)
    val r = FailureReport.fromThrowable(outer)
    r.exceptionClass shouldBe "java.lang.RuntimeException"
    r.message shouldBe "wrapper"
    r.cause.map(_.exceptionClass) shouldBe Some("java.lang.IllegalStateException")
    r.frames should not be empty
    r.summaryLines.mkString("\n") should include("root cause")
  }
}
