package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash of a binary payload's byte 4-gram shingles as ONE generated
  * loop per row — the fused form of [[graft.operators.Multimodal
  * .perceptualHash]]'s explode → md5 → 64-way vote aggregate.
  *
  * Bit-identical to the exploded pipeline (spec-asserted): gram `i` is
  * the 8-char uppercase-hex window `hex(payload).substr(i*2+1, 8)` —
  * i.e. bytes `i..i+3` — hashed with [[PortableHash.md5_64]]'s exact
  * recipe (MD5 over the gram's ASCII chars, first 15 hex chars of the
  * digest as a 60-bit value), each gram voting ±1 per bit, fingerprint
  * bit j set iff votes(j) > 0 (bits 60–63 stay 0, as a 60-bit hash
  * never sets them). Payloads shorter than 4 bytes contribute their
  * single short gram, exactly like `greatest(len − 3, 1)`.
  *
  * Scale: the exploded form shuffles ~1 row per payload byte into a
  * 64-buffer hash aggregate (~15M rows at sf0.1); this kernel keeps the
  * same md5-per-gram arithmetic but no rows leave the scan — the phash
  * projection is embarrassingly parallel at any corpus size.
  */
object ByteShingleSimHash {
  def of(payload: Column): Column =
    GraftSqlShim.column(ByteShingleSimHashExpr(GraftSqlShim.expression(payload)))

  private val HexDigits = "0123456789ABCDEF".getBytes("US-ASCII")

  /** Shared by interpreted eval and the generated code. */
  def compute(payload: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nb = payload.length
    val nGrams = math.max(nb - 3, 1)
    val votes = new Array[Int](64)
    val gram = new Array[Byte](8)
    var i = 0
    while (i < nGrams) {
      var glen = 0
      var k = i
      val lim = math.min(i + 4, nb)
      while (k < lim) {
        val b = payload(k) & 0xff
        gram(glen) = HexDigits(b >>> 4); glen += 1
        gram(glen) = HexDigits(b & 0xf); glen += 1
        k += 1
      }
      md.reset()
      md.update(gram, 0, glen)
      val dig = md.digest()
      var h = 0L
      var d = 0
      while (d < 7) { h = (h << 8) | (dig(d) & 0xffL); d += 1 }
      h = (h << 4) | ((dig(7) & 0xffL) >>> 4) // first 15 hex chars = 60 bits
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= 1L << j; j += 1 }
    fp
  }
}

case class ByteShingleSimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_simhash"

  override def nullSafeEval(input: Any): Any =
    ByteShingleSimHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.ByteShingleSimHash.compute($p);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
