package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash document fingerprint: the minimum polynomial
  * hash over every `k`-byte window of the string (base 257, modulus
  * 2³¹−1). One O(n) pass — each window hash derives from the previous in
  * O(1) — against O(n·k) for hashing windows independently, which is the
  * point of a ROLLING hash at 100 TB. Like a MinHash over character
  * windows, the minimum is stable under small edits far from the
  * minimizing window, so it works as a near-identity fingerprint.
  *
  * The 31-bit Mersenne modulus keeps every intermediate product inside
  * 64-bit arithmetic on ANY engine, which is what lets the DuckDB oracle
  * replicate the value exactly (wrapping-i64 arithmetic would not be
  * portable); swap in a 61-bit prime with 128-bit modmul where
  * fingerprint density demands more bits.
  *
  * Codegen'd (same rationale as [[ArrayDotProduct]]); strings shorter
  * than `k` hash their full content as one window.
  */
case class RollingMinHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_min_hash"

  override def nullSafeEval(str: Any, kAny: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val k = kAny.asInstanceOf[Int]
    RollingMinHash.minHash(bytes, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, k) => {
      val cls = RollingMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.minHash($str.getBytes(), $k);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingMinHash {
  private final val Base = 257L
  private final val Mod = 2147483647L // 2³¹−1

  /** Min over all k-byte windows of the polynomial hash mod 2³¹−1. */
  def minHash(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(k, n)
    // hash of the first window + base^(w-1) for the rolling subtraction
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < w) {
      h = (h * Base + (bytes(i) & 0xffL)) % Mod
      if (i > 0) pow = pow * Base % Mod
      i += 1
    }
    var min = h
    i = w
    while (i < n) {
      // drop the outgoing byte (re-centered into [0, Mod)), shift, add
      h = ((h - (bytes(i - w) & 0xffL) * pow) % Mod + Mod) % Mod
      h = (h * Base + (bytes(i) & 0xffL)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API: `rollingMinHash(col, k)` over a string column. */
  def apply(str: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.lit
    GraftSqlShim.column(new RollingMinHash(
      GraftSqlShim.expression(str.cast("string")),
      GraftSqlShim.expression(lit(k))))
  }
}
