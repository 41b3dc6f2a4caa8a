package graft.model

import org.apache.avro.Schema
import org.apache.spark.sql.types._
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Avro-declared, fingerprinted record schema — the reference's schema
  * system (worker-api/.../code/IntegrationSchema.scala:11-31): schema JSON
  * plus an MD5 fingerprint of the canonical (non-pretty) schema string
  * (IntegrationUtils.scala:25-29,37-39). Equality = record name +
  * fingerprint (IntegrationSchema.scala:25-28).
  *
  * The Spark side converts to StructType with a hand-rolled (spark-avro is
  * not on the classpath) but complete mapping of the observed type surface
  * (SURVEY.md §1.3).
  */
final case class IntegrationSchema(recordName: String, schemaJson: String, fingerprint: String) {
  def structType: StructType =
    IntegrationSchema.toStructType(new Schema.Parser().parse(schemaJson))

  /** Reference equality semantics: name + fingerprint. */
  def sameAs(other: IntegrationSchema): Boolean =
    recordName == other.recordName && fingerprint == other.fingerprint
}

object IntegrationSchema {

  def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** Fingerprint = MD5 of the canonical one-line schema JSON, matching
    * IntegrationUtils.scala:25-29. The reference calls
    * `schema.toString(false)`; this calls `schema.toString`, which Avro
    * defines as `toString(false)` — byte-identical today, and this note
    * pins the parity contract should an Avro upgrade ever change the
    * no-arg default.
    */
  def fingerprint(schema: Schema): String =
    md5Hex(schema.toString.getBytes("UTF-8"))

  def fromJson(json: String): IntegrationSchema = {
    val schema = new Schema.Parser().parse(json)
    IntegrationSchema(schema.getFullName, schema.toString, fingerprint(schema))
  }

  /** Avro → Spark SQL type mapping (SURVEY.md §1.3 table). */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"top-level schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toSqlType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toSqlType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    =>
      if (isLogical(s, "timestamp-millis") || isLogical(s, "timestamp-micros"))
        (TimestampType, false) else (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "decimal") {
        val d = s.getLogicalType.asInstanceOf[org.apache.avro.LogicalTypes.Decimal]
        (DecimalType(d.getPrecision, d.getScale), false)
      } else (BinaryType, false)
    case Schema.Type.FIXED   => (BinaryType, false)
    case Schema.Type.ENUM    => (StringType, false)
    case Schema.Type.RECORD  => (toStructType(s), false)
    case Schema.Type.ARRAY   =>
      val (et, en) = toSqlType(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.MAP     =>
      val (vt, vn) = toSqlType(s.getValueType)
      (MapType(StringType, vt, vn), false)
    case Schema.Type.UNION   =>
      val branches = s.getTypes.asScala.toSeq
      val (nulls, rest) = branches.partition(_.getType == Schema.Type.NULL)
      rest match {
        case Seq(one) => val (dt, _) = toSqlType(one); (dt, nulls.nonEmpty)
        case _ => throw new IllegalArgumentException(
          s"unsupported non-nullable union: ${s.toString}")
      }
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def isLogical(s: Schema, name: String): Boolean =
    s.getLogicalType != null && s.getLogicalType.getName == name
}
