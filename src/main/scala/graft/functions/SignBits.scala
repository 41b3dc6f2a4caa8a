package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Packed random-hyperplane sign bits in one codegen'd loop.
  *
  * The declarative route — per bit, `aggregate(zip_with(v, sequence(..),
  * (x, i) => x * sign(xxhash64(seed, i))), 0.0, _ + _)` — pays an
  * interpreted lambda per ELEMENT per bit per table (HigherOrderFunction
  * is CodegenFallback) and re-hashes the hyperplane family per row even
  * though it depends only on (table, bit, dim). Since the family is
  * deterministic, the sign matrix is evaluated ONCE at plan time (same
  * catalyst XxHash64 expression, so identical bits) and carried as a
  * `double[]` reference; the per-row work is nBits·dim fused
  * multiply-adds inside whole-stage codegen.
  *
  * Parity with the fold it replaces: same left-to-right projection sum,
  * same strict `proj > 0` bit rule, and a null element (or a vector
  * shorter than `dim`) nulls that bit's projection — bit stays 0 —
  * exactly as null propagated through `zip_with`/`aggregate`.
  */
case class PackedSignBits(child: Expression, signs: Array[Double],
                          nBits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sign_bits"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var acc = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0
      var pNull = false
      var i = 0
      while (i < dim && !pNull) {
        if (i >= n || v.isNullAt(i)) pNull = true
        else s += v.getDouble(i) * signs(b * dim + i)
        i += 1
      }
      if (!pNull && s > 0) acc |= (1L << b)
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("signMatrix", signs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val pNull = ctx.freshName("pNull")
      s"""
         |int $n = $v.numElements();
         |long $acc = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $s = 0.0;
         |  boolean $pNull = false;
         |  for (int $i = 0; $i < $dim && !$pNull; $i++) {
         |    if ($i >= $n || $v.isNullAt($i)) { $pNull = true; }
         |    else { $s += $v.getDouble($i) * $sRef[$b * $dim + $i]; }
         |  }
         |  if (!$pNull && $s > 0) { $acc |= (1L << $b); }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBits {
  /** The xxhash64-derived hyperplane sign family, evaluated at plan time
    * via the SAME catalyst expression the per-row fold used
    * (`xxhash64(table·nBits + bit, i)`, seed 42) — identical bits, no
    * per-row re-hashing. Layout `[bit][dim]` flattened.
    */
  def hyperplaneSigns(dim: Int, nBits: Int, table: Int): Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    Array.tabulate(nBits * dim) { idx =>
      val b = idx / dim
      val i = idx % dim
      val h = new XxHash64(Seq(Literal(table * nBits + b), Literal(i)))
        .eval(null).asInstanceOf[Long]
      if ((h & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** `long` signature of `nBits` hyperplane sign bits for table `table`. */
  def signature(vec: Column, dim: Int, nBits: Int, table: Int): Column =
    GraftSqlShim.column(PackedSignBits(
      GraftSqlShim.expression(vec.cast("array<double>")),
      hyperplaneSigns(dim, nBits, table), nBits, dim))
}
