package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.dot
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Unit coverage for the custom codegen expression and UDAF that the
  * DuckDB gate exercises only end-to-end.
  */
class FunctionsSpec extends SparkSpec {

  test("ArrayDotProduct matches the interpreted higher-order-function fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, 0.125)),
      (Array.empty[Double], Array.empty[Double])
    ).toDF("a", "b")
    val got = df.select(
      dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    got.foreach { r => r.getDouble(0) shouldBe r.getDouble(1) }
    got(0).getDouble(0) shouldBe 32.0
  }

  test("ArrayDotProduct interpreted eval (null-safe) agrees with codegen path") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)), StructField("b", ArrayType(DoubleType))))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, null, 2.0), Seq(3.0, 4.0, 5.0)),
      Row(null, Seq(1.0)),
      Row(Seq(2.0), Seq(7.0, 9.0)))
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(dot(col("a"), col("b")).as("d")).collect()
    got(0).getDouble(0) shouldBe 13.0 // null element contributes 0
    got(1).isNullAt(0) shouldBe true  // null array → null result
    got(2).getDouble(0) shouldBe 14.0 // length mismatch → shorter prefix
  }

  test("graft_dot is SQL-callable after registry injection") {
    graft.plans.GraftExtensions.register(spark)
    spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0) shouldBe 11.0
    // int arrays coerce through the injected casts
    spark.sql("SELECT graft_dot(array(1, 2), array(3, 4)) AS d")
      .head.getDouble(0) shouldBe 11.0
  }

  test("graft_sign_bits in SQL equals the Scala lshSignature kernel") {
    graft.plans.GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
      .createOrReplaceTempView("emb_sig")
    // one query computes both paths per row — no cross-job row-order
    // assumptions
    val mismatches = spark.table("emb_sig")
      .select(expr("graft_sign_bits(embedding, 64, 12, 3)").as("sql_sig"),
        graft.operators.Similarity.lshSignature(col("embedding"), 64, 12, 3)
          .as("scala_sig"))
      .filter(col("sql_sig") =!= col("scala_sig")).count()
    mismatches shouldBe 0L
    // non-literal dim is rejected, not silently misplanned
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sign_bits(embedding, vec_id, 12, 0) FROM emb_sig")
        .collect()
    }
    err.getMessage should include("literal")
  }

  test("as-of join forward-fills the latest right row per key, inclusive ties") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val left = Seq((1L, ts(5), "e1"), (1L, ts(10), "e2"), (2L, ts(3), "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, ts(5), 100L), (1L, ts(9), 101L), (3L, ts(0), 999L))
      .toDF("rk", "rt", "v")
    val got = graft.operators.AsOfJoin.asOf(left, right, "k", "rk", "t", "rt", Seq("v", "rt"))
      .select("ev", "v").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    got("e1") shouldBe Some(100L) // equal timestamp matches (inclusive)
    got("e2") shouldBe Some(101L) // latest ≤ t wins
    got("e3") shouldBe None       // no history for key 2 → null payload
  }

  test("RollingMinHash: codegen matches the reference implementation; edits far from the min window don't move it") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "", "exactly16bytes!!",
      "the quick brown fox jumps over the lazy dog with an appended tail")
    val got = texts.toDF("t")
      .select(RollingMinHash(col("t"), 16).as("fp"))
      .collect().map(_.getLong(0))
    val want = texts.map(t => RollingMinHash.minHash(t.getBytes("UTF-8"), 16))
    got.toSeq shouldBe want
    // appending a tail kept the original minimizing window in this corpus
    if (want(0) == RollingMinHash.minHash(texts(4).getBytes("UTF-8"), 16))
      got(4) shouldBe got(0)
  }

  test("WeightedAvg aggregator matches the closed-form SQL expression") {
    import spark.implicits._
    val df = Seq((10.0, 1.0), (20.0, 3.0), (30.0, 6.0)).toDF("v", "w")
    val wavg = udaf(WeightedAvg)
    val got = df.agg(wavg(col("v"), col("w"))).head.getDouble(0)
    got shouldBe (10.0 * 1 + 20.0 * 3 + 30.0 * 6) / 10.0
  }

  test("HLL sketches are MERGEABLE: per-shard sketches union to the global estimate") {
    // the 100 TB property: per-shard sketches computed independently and
    // union-merged estimate like a single global pass — what lets
    // distinct-counts run as map-side partials and daily sketches roll
    // up. (Union is register-wise max, but sparse/dense mode transitions
    // can move the estimate a hair — assert near-agreement, not bits.)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val global = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("e"))
      .head.getLong(0)
    val merged = li.withColumn("shard", pmod(col("l_partkey"), lit(8)))
      .groupBy(col("shard")).agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .head.getLong(0)
    math.abs(merged - global).toDouble / global should be < 0.01
    val exact = li.select(countDistinct(col("l_orderkey"))).head.getLong(0)
    math.abs(merged - exact).toDouble / exact should be < 0.05
  }

  test("approx aggregates are within tolerance of exact answers") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exact = li.agg(
      countDistinct(col("l_orderkey")).cast("double"),
      expr("percentile(l_extendedprice, 0.5)")).head
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey")).cast("double"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))).head
    // HLL++ default rsd is 5%; allow 2σ at this corpus size
    math.abs(approx.getDouble(0) - exact.getDouble(0)) / exact.getDouble(0) should be < 0.1
    math.abs(approx.getDouble(1) - exact.getDouble(1)) / exact.getDouble(1) should be < 0.05
  }

  test("PackedSignBits matches the interpreted xxhash64 HOF fold bit-for-bit") {
    // the fold this kernel replaced: per-bit aggregate(zip_with(...))
    // with a per-element xxhash64-derived hyperplane sign
    def foldSignature(vecCol: org.apache.spark.sql.Column, dim: Int,
                      nBits: Int, table: Int): org.apache.spark.sql.Column = {
      val vd = vecCol.cast("array<double>")
      (0 until nBits).foldLeft(lit(0L)) { (acc, b) =>
        val proj = aggregate(
          zip_with(vd, sequence(lit(0), lit(dim - 1)),
            (x, i) => x * when(xxhash64(lit(table * nBits + b), i)
              .bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
          lit(0.0), (s, x) => s + x)
        acc.bitwiseOR(when(proj > 0, lit(1L << b)).otherwise(lit(0L)))
      }
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    for (table <- Seq(0, 3, 11)) {
      val mismatches = emb.select(
          foldSignature(col("embedding"), 64, 12, table).as("hof"),
          graft.functions.SignBits.signature(col("embedding"), 64, 12, table).as("fast"))
        .filter(col("hof") =!= col("fast")).count()
      mismatches shouldBe 0L
    }
  }

  test("PqEncode/PqAdcScore/PackedSignBits interpreted eval agrees with codegen") {
    // the eval path only runs when Janino falls back — cover it directly
    // so a fallback can never silently change results
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection

    val m = 4; val cb = 3; val sub = 2; val dim = m * sub
    val rnd = new scala.util.Random(7)
    val flatCb = Array.fill(m * cb * sub)(rnd.nextDouble() - 0.5)
    val flat2c = flatCb.map(_ * 2)
    val norms = Array.tabulate(m * cb) { i =>
      (0 until sub).map(j => flatCb(i * sub + j)).map(x => x * x).sum }
    val vec = Array.fill(dim)(rnd.nextDouble() - 0.5)
    val signs = SignBits.hyperplaneSigns(dim, 6, table = 2)

    val vecRef = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val enc = PqEncode(vecRef, flat2c, norms, m, cb, sub)
    val adc = PqAdcScore(vecRef, Literal.create(
      ArrayData.toArrayData(Array(0, 1, 2, 0)), ArrayType(IntegerType)),
      flatCb, m, cb, sub)
    val sig = PackedSignBits(vecRef, signs, 6, dim)

    val row = InternalRow(ArrayData.toArrayData(vec))
    val gen = GenerateMutableProjection.generate(Seq(enc, adc, sig))
    val target = new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
      Seq(ArrayType(IntegerType), DoubleType, LongType))
    gen.target(target)(row)

    target.getArray(0).toIntArray() shouldBe
      enc.eval(row).asInstanceOf[ArrayData].toIntArray()
    target.getDouble(1) shouldBe adc.eval(row).asInstanceOf[Double]
    target.getLong(2) shouldBe sig.eval(row).asInstanceOf[Long]
  }

  test("kernel property sweep: random vectors match naive Scala reference math") {
    // deterministic pseudo-random sweep — the DataFrame path (codegen)
    // against straight-line Scala implementing the documented arithmetic
    val m = 8; val cb = 16; val sub = 8; val dim = m * sub; val nBits = 12
    val rnd = new scala.util.Random(42)
    val flatCb = Array.fill(m * cb * sub)(rnd.nextGaussian())
    val flat2c = flatCb.map(_ * 2)
    val norms = Array.tabulate(m * cb) { i =>
      (0 until sub).map(j => flatCb(i * sub + j)).map(x => x * x).sum }
    val signs = SignBits.hyperplaneSigns(dim, nBits, table = 5)
    val vecs = (0 until 50).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))

    def refEncode(v: Array[Double]): Seq[Int] = (0 until m).map { s =>
      var best = 0; var bestScore = Double.NegativeInfinity
      for (c <- 0 until cb) {
        var acc = 0.0
        for (j <- 0 until sub) acc += v(s * sub + j) * flat2c((s * cb + c) * sub + j)
        val score = acc - norms(s * cb + c)
        if (score > bestScore) { bestScore = score; best = c }
      }
      best
    }
    def refSig(v: Array[Double]): Long = (0 until nBits).foldLeft(0L) { (acc, b) =>
      var s = 0.0
      for (i <- 0 until dim) s += v(i) * signs(b * dim + i)
      if (s > 0) acc | (1L << b) else acc
    }

    import spark.implicits._
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
        org.apache.spark.sql.GraftSqlShim.column(PqEncode(
          org.apache.spark.sql.GraftSqlShim.expression(col("v")),
          flat2c, norms, m, cb, sub)).as("codes"),
        org.apache.spark.sql.GraftSqlShim.column(PackedSignBits(
          org.apache.spark.sql.GraftSqlShim.expression(col("v")),
          signs, nBits, dim)).as("sig"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getLong(2))).toMap
    vecs.foreach { case (id, v) =>
      got(id)._1 shouldBe refEncode(v)
      got(id)._2 shouldBe refSig(v)
    }
  }

  test("PackedSignBits nulls a bit's projection on null/short input like the fold") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType))))
    val rows = java.util.Arrays.asList(
      Row(Seq[Any](1.0, null, 2.0, 0.5)), // null element → all bits 0
      Row(Seq[Any](1.0, 2.0)),            // shorter than dim → all bits 0
      Row(null))                          // null array → null signature
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(
      graft.functions.SignBits.signature(col("v"), 4, 6, 0).as("sig")).collect()
    got(0).getLong(0) shouldBe 0L
    got(1).getLong(0) shouldBe 0L
    got(2).isNullAt(0) shouldBe true
  }

  test("BucketHistogram matches the declarative filter-per-bucket tree bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val buckets = 8
    val df = Seq(
      Seq(0L, 3L, 3L, 7L, 0L, 0L),
      Seq(5L),
      Seq.empty[Long],            // empty ids → all-zero over n=1
      Seq(0L, 99L, -1L, 2L))     // out-of-range ids ignored by both forms
      .toDF("bs")
    val rows = df.select(
      graft.functions.BucketHistogram.of(col("bs"), buckets).as("fast"),
      transform(sequence(lit(0), lit(buckets - 1)),
        b => org.apache.spark.sql.functions.size(
            filter(col("bs"), x => x === b.cast("long"))).cast("double") /
          greatest(org.apache.spark.sql.functions.size(col("bs")),
            lit(1)).cast("double")).as("slow"))
      .collect()
    rows.foreach { r =>
      r.getSeq[Double](0) shouldBe r.getSeq[Double](1)
    }
  }
}
