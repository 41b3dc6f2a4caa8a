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

    // SQL-defined scalar function (Spark 4 `CREATE FUNCTION … RETURN`):
    // unlike the JVM closure in u01, the body is a SQL expression, so
    // Catalyst INLINES it — it stays inside whole-stage codegen and
    // pushdown keeps working. The declarative twin of the user-code
    // surface: prefer this shape over udf() wherever the logic is
    // expressible. Round to 6: the product of three 2-decimal factors
    // has at most 6 decimals, so no value sits on a rounding boundary.
    "u04_sql_udf" -> QueryDef(
      (s, d) => {
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION charge(
                   p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
                 RETURN p * (1 - disc) * (1 + tax)""")
        Tables.lineitem(s, d).filter(col("l_orderkey") < 100)
          .selectExpr("l_orderkey", "l_linenumber",
            "round(charge(l_extendedprice, l_discount, l_tax), 6) AS charge")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                 AS charge
        FROM lineitem WHERE l_orderkey < 100""")),

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
