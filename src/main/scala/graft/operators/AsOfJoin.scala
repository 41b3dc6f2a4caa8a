package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: attach to each left row the most recent right row
  * (same key, right timestamp ≤ left timestamp). The reference has no
  * relational surface at all (SURVEY §2b) — this is the canonical
  * event↔dimension-history alignment operator a training-data pipeline
  * needs, expressed Spark-first.
  *
  * Implementation: the union trick. Instead of an inequality join (which
  * Catalyst can only execute as a broadcast-nested-loop or a skewed range
  * join), both sides are tagged and unioned on a common schema, shuffled
  * ONCE by key, sorted by (ts, side), and the right payload forward-fills
  * through a running `last(ignoreNulls)` window. Cost = one shuffle + one
  * sort regardless of how many left rows each right row covers; no row
  * ever fans out. At 100 TB this is the only shape that survives — the
  * per-key history can be arbitrarily long without quadratic pairing.
  *
  * Right-side rows must be unique per (key, ts) for determinism — ties at
  * the same instant are the caller's to resolve (dedupe/aggregate first).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           payload: Seq[String]): DataFrame = {
    val rightStruct = struct(payload.map(right(_)): _*)
    val rightType = right.select(rightStruct).schema.fields.head.dataType
    val leftStruct = struct(left.columns.map(left(_)).toSeq: _*)
    val leftType = left.select(leftStruct).schema.fields.head.dataType

    // side 0 (right) sorts before side 1 (left) at equal timestamps → the
    // match condition is inclusive (rightTs ≤ leftTs)
    val lpart = left.select(
      left(leftKey).as("__k"), left(leftTs).as("__t"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    val rpart = right.select(
      right(rightKey).as("__k"), right(rightTs).as("__t"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"), rightStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lpart.union(rpart)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
