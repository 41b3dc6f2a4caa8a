package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md). Columns are
  * pruned and filters pushed down by Catalyst because every query starts
  * from a plain parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet has shipped with two encodings of `ts` across fixture
    * generations: TIMESTAMP(NANOS) (unreadable natively — surfaces as a
    * long under nanosAsLong) and plain TIMESTAMP(MICROS). Dispatch on the
    * schema actually read back: only the nanos-as-long generation needs the
    * floor-truncate to microseconds (matching DuckDB's read of the same
    * file, so oracle parity is preserved either way).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    // A nanos footer is unreadable natively — schema inference throws on
    // TIMESTAMP(NANOS) — so probe first and set nanosAsLong only for the
    // fixture generation that needs it (it must then stay set for the
    // session: executors re-convert the footer schema at scan time).
    // Micros fixtures leave the session conf untouched.
    val df =
      try load(s, d, "events")
      catch { case _: org.apache.spark.sql.AnalysisException =>
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        load(s, d, "events")
      }
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // timestamp[us] reads back as TIMESTAMP_NTZ; cast to TimestampType so
      // every downstream consumer (and Verify's parquet output) sees the same
      // type the nanos path produced. Sessions pin session.timeZone=UTC, so
      // the cast is value-preserving.
      case _ => df.withColumn("ts", df("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Engine-visible loader for any fixture table — same dispatch the
    * per-table defs use, so FixtureSchemaSpec asserts what queries see.
    */
  def table(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events" => events(s, d)
    case other    => load(s, d, other)
  }
}
