package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.WeightedAvg
import org.apache.spark.sql.functions._

/** User-code surface (SURVEY §2b UDF/UDAF/UDTF row). In the reference the
  * ENTIRE executor is this surface — tasks run opaque user JVM code over
  * records (`executor/.../run/ProcessRawDataOperation.java:59-85`,
  * `FetchRawDataOperation.java:59-64`). Spark-first, that contract splits
  * into three shapes: a registered scalar udf, a typed
  * `Aggregator[IN,BUF,OUT]`, and a generator (`Dataset.flatMap`, the
  * 1-row → N-records analog of ProcessRawData). Scalar udfs are opaque to
  * codegen — for hot paths prefer native expressions (see
  * `graft.functions.ArrayDotProduct`); these queries gate the *surface*.
  */
object UdfQueries {

  def defs: Map[String, QueryDef] = Map(

    // registered scalar UDF, invoked by name through the SQL surface
    "u01_udf_scalar" -> QueryDef(
      (s, d) => {
        s.udf.register("net_price", (price: Double, disc: Double) => price * (1 - disc))
        // round to 4: the product of two 2-decimal values has exactly ≤4
        // decimals, so no result sits on a rounding boundary (round(_, 2)
        // would disagree with the oracle on exact .xx5 products)
        Tables.lineitem(s, d).filter(col("l_orderkey") < 100)
          .selectExpr("l_orderkey", "l_linenumber",
            "round(net_price(l_extendedprice, l_discount), 4) AS net_price")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS net_price
        FROM lineitem WHERE l_orderkey < 100""")),

    // typed Aggregator UDAF (partial-aggregates + merge → map-side combine)
    "u02_udaf_weighted_avg" -> QueryDef(
      (s, d) => {
        val wavg = udaf(WeightedAvg)
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4)
            .as("w_avg_price"))
      },
      Some("""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                 AS w_avg_price
        FROM lineitem GROUP BY 1""")),

    // generator (UDTF analog): one input row → N output records via
    // arbitrary user code, the Spark-native ProcessRawData shape
    "u03_generator_tokenize" -> QueryDef(
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d).select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, text) =>
            text.split(" ", -1).iterator.zipWithIndex
              .map { case (w, i) => (id, i.toLong, w) }
          }
          .toDF("doc_id", "pos", "word")
      },
      Some("""
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[i] AS word
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
             LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) t"""))
  )
}
