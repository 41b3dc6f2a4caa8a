package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-replicable hash family: a 60-bit integer from the MD5 of
  * a string (first 15 hex chars). Any engine with md5() replicates it
  * bit-for-bit — the DuckDB oracle uses
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` — which turns minhash /
  * simhash / fingerprint outputs into oracle-checkable values, unlike
  * xxhash64 (Spark-only). MD5 costs ~3× xxhash64 per call; the operators
  * below pay it ONCE per input and derive k independent functions
  * arithmetically: `(a_i·(h mod p) + b_i) mod p` over the Mersenne prime
  * p = 2³¹−1, so every product fits in 63 bits on any engine with 64-bit
  * integers.
  */
object PortableHash {

  /** 2³¹−1 (Mersenne prime): a·h stays under 2⁶² for a, h < p. */
  val Mod31: Long = 2147483647L

  /** 60-bit hash of a string column (MD5-derived, engine-portable). */
  def md5_64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL computing the same value as [[md5_64]]. */
  def sqlMd5_64(expr: String): String =
    s"CAST('0x' || substr(md5($expr),1,15) AS BIGINT)"

  /** LCG-style multipliers/offsets for the derived family — plain
    * literals so oracle SQL can inline the identical constants.
    */
  def mulOf(i: Int): Long = (1103515245L * (i + 1)) % Mod31
  def addOf(i: Int): Long = (12345L * (i + 1)) % Mod31

  /** Derived hash #i of a base hash already reduced mod [[Mod31]]. */
  def derived(h31: Column, i: Int): Column =
    (lit(mulOf(i)) * h31 + lit(addOf(i))) % lit(Mod31)

  /** DuckDB SQL computing the same value as [[derived]]. */
  def sqlDerived(h31expr: String, i: Int): String =
    s"((${mulOf(i)} * $h31expr + ${addOf(i)}) % $Mod31)"
}
