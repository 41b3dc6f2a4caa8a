package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization for embedding columns — the standard 4×
  * storage/IO cut for 100 TB vector corpora: per-vector symmetric scale
  * (max|x|/127), elements rounded to [-127, 127] bytes. ANN candidate
  * generation runs on the int8 vectors; exact re-ranking dequantizes.
  * All pure codegen'd column math (transform over the array, no UDFs);
  * quantize→dequantize cosine fidelity is oracle-checked (s05) and
  * bounded in spec.
  */
object Quantization {

  private def scaleOf(vd: Column): Column =
    aggregate(transform(vd, x => abs(x)), lit(0.0),
      (acc, x) => greatest(acc, x)) / 127.0

  /** (id, scale, q: array<tinyint>) — the storage representation. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    df.select(col(idCol), vd.as("vd"))
      .withColumn("scale", scaleOf(col("vd")))
      .select(col(idCol), col("scale"),
        transform(col("vd"), x => round(x / col("scale")).cast("tinyint")).as("q"))
  }

  /** Round-trip fidelity: cosine(original, dequantized) per vector. */
  def int8Fidelity(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    df.select(col(idCol), vd.as("vd"))
      .withColumn("scale", scaleOf(col("vd")))
      .withColumn("dq",
        transform(col("vd"), x => round(x / col("scale")) * col("scale")))
      .select(col(idCol), round(col("scale"), 9).as("scale"),
        round(Similarity.cosine(col("vd"), col("dq")), 4).as("fidelity"))
  }
}
