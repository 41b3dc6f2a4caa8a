package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** L1-normalized bucket histogram of an `array<long>` of bucket ids, as
  * ONE generated loop per row.
  *
  * The declarative formulation — `transform(sequence(0, B−1), b →
  * size(filter(ids, x → x = b)) / n)` — re-scans AND re-allocates the id
  * array B times per row (B filtered copies); at B = 64 it was 19.5 s of
  * the classifier trainer's 21.6 s at sf0.1. This expression walks the
  * ids once, increments a `double[B]`, and divides by max(len, 1) —
  * arithmetic bit-identical to the tree it replaces (integer counts,
  * same denominator, same division), so trained weights are unchanged.
  * Out-of-range ids are ignored (the declarative form matched nothing
  * for them). Same single-loop-kernel pattern as [[PqEncode]].
  */
object BucketHistogram {
  def of(bucketIds: Column, buckets: Int): Column =
    GraftSqlShim.column(BucketHistogramExpr(
      GraftSqlShim.expression(bucketIds), buckets))
}

case class BucketHistogramExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_bucket_histogram"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = a.numElements()
    val counts = new Array[Double](buckets)
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) {
        val b = a.getLong(i)
        if (b >= 0 && b < buckets) counts(b.toInt) += 1.0
      }
      i += 1
    }
    val n = math.max(len, 1).toDouble
    var j = 0
    while (j < buckets) { counts(j) /= n; j += 1 }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      s"""
        final int $len = $a.numElements();
        final double[] $counts = new double[$buckets];
        for (int $i = 0; $i < $len; $i++) {
          if (!$a.isNullAt($i)) {
            final long $b = $a.getLong($i);
            if ($b >= 0 && $b < $buckets) $counts[(int) $b] += 1.0;
          }
        }
        final double $n = (double) java.lang.Math.max($len, 1);
        for (int $j = 0; $j < $buckets; $j++) $counts[$j] /= $n;
        ${ev.value} =
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
