package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.dot
import graft.functions.PortableHash

/** Johnson–Lindenstrauss random projection for embedding columns — the
  * standard dimensionality cut before clustering/ANN when the source
  * vectors are wide (JL: pairwise distances are preserved within 1±ε for
  * outDim = O(log n / ε²); with ±1 entries this is the Achlioptas
  * database-friendly variant, no Gaussians needed).
  *
  * Scale design: the projection matrix is DERIVED, not stored — entry
  * (i, j) is a deterministic parity of the [[PortableHash]] LCG family,
  * computed driver-side and entering the plan as `outDim` literal sign
  * vectors. Each output dimension is then ONE codegen'd dot-product
  * against the corpus scan: zero shuffle, zero model state, one pass.
  * The same arithmetic is replayed verbatim by the DuckDB oracle (the
  * sign arrays inline as SQL literals), so the gate is hash-checked.
  */
object RandomProjection {

  /** Deterministic ±1 matrix entry: parity of the LCG-derived hash of the
    * flattened index. Pure integer math — any engine reproduces it.
    */
  def signOf(i: Int, j: Int): Double = {
    val h = (PortableHash.mulOf(j) * (i + 1) + PortableHash.addOf(j)) % PortableHash.Mod31
    if (h % 2 == 0) 1.0 else -1.0
  }

  /** The literal sign vector for output dimension `j`. */
  def signVector(dim: Int, j: Int): Seq[Double] =
    (0 until dim).map(i => signOf(i, j))

  /** Projects `vecCol` (dim-wide) onto `outDim` ±1 hyperplanes, scaled by
    * 1/√outDim. Output: idCol + rp_0..rp_{outDim-1}, rounded to 6 digits.
    */
  def project(df: DataFrame, dim: Int, outDim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // stage the float→double cast ONCE — inlined, each rp_j would
    // re-convert the whole vector (outDim casts per row)
    val scale = math.sqrt(outDim.toDouble)
    val outs = (0 until outDim).map { j =>
      round(dot(col("_v"), typedLit(signVector(dim, j))) / scale, 6).as(s"rp_$j")
    }
    df.withColumn("_v", col(vecCol).cast("array<double>"))
      .select(col(idCol) +: outs: _*)
  }

  /** DuckDB SQL computing exactly [[project]] over the embeddings table. */
  def oracleSql(dim: Int, outDim: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val cols = (0 until outDim).map { j =>
      val arr = signVector(dim, j).map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"round(list_dot_product(CAST($vecCol AS DOUBLE[]), $arr) / sqrt($outDim.0), 6) AS rp_$j"
    }
    s"SELECT $idCol, ${cols.mkString(", ")} FROM embeddings"
  }
}
