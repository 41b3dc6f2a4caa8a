package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary: asserts the ENGINE-VISIBLE schema (via the
  * `Tables` loaders) of every driver-generated table at every scale
  * factor. When the driver regenerates the fixtures with a different
  * encoding (as happened between rounds 4 and 5, when `events.ts` moved
  * from TIMESTAMP(NANOS)-as-long to plain timestamp[us]), this spec fails
  * in one named place instead of 30 scattered gate failures.
  *
  * Only (name, dataType) is asserted — nullability is reader-dependent
  * and not part of the contract. `events.ts` is asserted as TimestampType
  * because `Tables.events` normalizes both fixture generations to it.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  for (dir <- sfDirs; name <- Tables.names)
    test(s"$dir/$name.parquet: engine-visible schema matches the contract") {
      val actual = Tables.table(spark, dir, name)
        .schema.fields.toSeq.map(f => f.name -> f.dataType)
      assert(actual == expected(name),
        s"fixture drift in $name at $dir — update Tables/queries for the new encoding")
    }

  test("Tables.events nanos-as-long branch still normalizes (legacy fixture encoding)") {
    import org.apache.spark.sql.functions._
    // synthesize the pre-r5 encoding: ts stored as raw epoch NANOS int64
    val legacyDir = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", (unix_micros(col("ts")) * 1000L).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$legacyDir/events.parquet")
    val legacy = Tables.events(spark, legacyDir)
    legacy.schema("ts").dataType shouldBe TimestampType
    // values round-trip exactly (µs → ns → floor-truncate back to µs)
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val got = legacy.select(col("event_id"), col("ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    got shouldBe want
  }
}
