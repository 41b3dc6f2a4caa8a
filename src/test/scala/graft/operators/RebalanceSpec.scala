package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF list-skew rebalance (gate s30): hand-computed split, the
  * invariants a partitioned index layout needs from a rebalance
  * (membership preserved, un-split lists untouched, movers only into
  * fresh dense ids), the no-op policy, and bit-determinism across
  * partitionings.
  */
class RebalanceSpec extends SparkSpec {

  import spark.implicits._

  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // c0 = origin, c1 = (1,1); membership in c1 ⇔ x+y > 1 (c0 scores 0)
  private val Cb = Array(Array(0L, 0L), Array(1000000L, 1000000L))

  test("hand case: census decides, per-list 2-means splits, sub-0 keeps the list id") {
    // dyadic coordinates → floor-free quantization. List c1 holds two
    // exact clumps: {1,3} at (1,1) and {2,4,5} at (.75,.5); seeds are
    // ids 1 and 2, so the 2-means converges to the clumps in one
    // iteration and the E-step confirms it. List c0 is a singleton —
    // size < 2 never splits.
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(1.0, 1.0)),
      (2L, Seq(0.75, 0.5)),
      (3L, Seq(1.0, 1.0)),
      (4L, Seq(0.75, 0.5)),
      (5L, Seq(0.75, 0.5))).toDF("vec_id", "embedding")
    val (moves, newCb) = Similarity.rebalanceLists(
      vecs, Cb, Similarity.RebalancePolicy(3L, 2L), maxIter = 1)
    val out = moves.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    out shouldBe Array(
      (0L, 0L, 0L), // untouched singleton list
      (1L, 1L, 1L), // sub-0 keeps cid 1 …
      (2L, 1L, 2L), // … sub-1 moves to the new cid k+0
      (3L, 1L, 1L),
      (4L, 1L, 2L),
      (5L, 1L, 2L))
    newCb.map(_.toSeq) shouldBe Array(
      Seq(0L, 0L),              // un-split centroid carried verbatim
      Seq(1000000L, 1000000L),  // split list's sub-0 centroid
      Seq(750000L, 500000L))    // appended sub-1 centroid
  }

  test("membership preserved; movers only into fresh dense ids; kept rows keep their cid") {
    val cb = Similarity.kmeansTrainFixedPoint(embeddings, k = 8, maxIter = 3)
    val corpus = graft.queries.SkewFixture.skewed(embeddings)
    val (moves, newCb) = Similarity.rebalanceLists(
      corpus, cb, Similarity.RebalancePolicy(3L, 2L))
    val rows = moves.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nSplit = newCb.length - cb.length
    nSplit should be > 0 // the gate's fixture contract at this SF
    // one output row per corpus vector, no invention, no loss
    rows.map(_._1).sorted shouldBe
      embeddings.select("vec_id").as[Long].collect().sorted
    // old_cid is the fresh E-step under the input codebook
    val fresh = Similarity.assignFixedPoint(corpus, cb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, oldCid, _) => oldCid shouldBe fresh(id) }
    // a row either keeps its list or moves to a fresh dense id
    rows.foreach { case (_, oldCid, cid) =>
      if (cid < cb.length) cid shouldBe oldCid
      else cid should be < newCb.length.toLong
    }
    // each fresh id drains exactly one source list, and every source
    // list that lost rows is accounted one fresh id (dense numbering)
    val bySrc = rows.filter(t => t._3 >= cb.length)
      .groupBy(_._3).map { case (c, ts) => c -> ts.map(_._2).distinct }
    bySrc.values.foreach(_.length shouldBe 1)
    bySrc.keys.toSeq.sorted shouldBe
      (cb.length.toLong until newCb.length.toLong)
  }

  test("a bar no list reaches returns the identity movement and the codebook unchanged") {
    val cb = Similarity.kmeansTrainFixedPoint(embeddings, k = 8, maxIter = 3)
    val (moves, newCb) = Similarity.rebalanceLists(
      embeddings, cb, Similarity.RebalancePolicy(100L, 1L))
    newCb shouldBe cb
    moves.filter(col("old_cid") =!= col("cid")).count() shouldBe 0L
    moves.count() shouldBe embeddings.count()
  }

  test("merge hand case: the starved list retires; orphans re-encode among survivors") {
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)), // alone in c0 → starved at the 1/2 bar
      (1L, Seq(1.0, 1.0)),
      (2L, Seq(0.75, 0.5)),
      (3L, Seq(1.0, 1.0)),
      (4L, Seq(0.75, 0.5)),
      (5L, Seq(0.75, 0.5))).toDF("vec_id", "embedding")
    val (moves, survCb) = Similarity.mergeLists(
      vecs, Cb, Similarity.MergePolicy(1L, 2L))
    val out = moves.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // c0 (size 1, bar ≤ 1.5) retires; c1 survives as dense cid 0; the
    // orphan re-encodes to the only survivor
    out shouldBe Array(
      (0L, 0L, 0L),
      (1L, 1L, 0L), (2L, 1L, 0L), (3L, 1L, 0L),
      (4L, 1L, 0L), (5L, 1L, 0L))
    survCb.map(_.toSeq) shouldBe Array(Seq(1000000L, 1000000L))
  }

  test("an EMPTY list retires even though the census never saw it") {
    // c2 sits far from every vector — zero members, must still merge
    val cb3 = Cb :+ Array(-4000000L, -4000000L)
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(1.0, 1.0)),
      (2L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    val (moves, survCb) = Similarity.mergeLists(
      vecs, cb3, Similarity.MergePolicy(1L, 4L)) // bar 0.25 ⇒ only size 0
    survCb.map(_.toSeq) shouldBe Array(Seq(0L, 0L), Seq(1000000L, 1000000L))
    moves.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) shouldBe Array((0L, 0L, 0L), (1L, 1L, 1L), (2L, 1L, 1L))
  }

  test("merge invariants on the staged corpus; a bar retiring every list is loud") {
    val cb = Similarity.kmeansTrainFixedPoint(embeddings, k = 8, maxIter = 3)
    val corpus = graft.queries.SkewFixture.skewed(embeddings)
    val (moves, survCb) = Similarity.mergeLists(
      corpus, cb, Similarity.MergePolicy(2L, 3L))
    survCb.length should be < cb.length
    val rows = moves.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.map(_._1).sorted shouldBe
      embeddings.select("vec_id").as[Long].collect().sorted
    rows.foreach { case (_, _, cid) => cid should be < survCb.length.toLong }
    // survivor renumbering preserves cid order: old_cid asc ⇔ cid asc
    // on the kept rows (those whose centroid survived)
    val keptPairs = rows.filter { case (_, o, _) =>
      survCb.map(_.toSeq).contains(cb(o.toInt).toSeq) }
      .map { case (_, o, c) => (o, c) }.distinct.sortBy(_._1)
    keptPairs.map(_._2) shouldBe keptPairs.map(_._2).sorted
    an[IllegalArgumentException] should be thrownBy
      Similarity.mergeLists(corpus, cb, Similarity.MergePolicy(100L, 1L))
  }

  test("even-split hand case: max-spread axis, rank chunks, chunk 0 keeps the cid") {
    // list c1 (5 members) splits at the 3/2 bar; T = ⌈6/2⌉ = 3 ⇒ 2
    // chunks. Spread: dim1 (0.5e6) beats dim0 (0.25e6) ⇒ axis = 1;
    // rank by (x₁, id) = [2, 4, 5, 1, 3]; chunk = ⌊(rk−1)·2/5⌋ ⇒
    // {2,4,5} stay on cid 1, {1,3} move to the fresh cid 2.
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(1.0, 1.0)),
      (2L, Seq(0.75, 0.5)),
      (3L, Seq(1.0, 1.0)),
      (4L, Seq(0.75, 0.5)),
      (5L, Seq(0.75, 0.5))).toDF("vec_id", "embedding")
    val (moves, newCb) = Similarity.splitListsEven(
      vecs, Cb, Similarity.RebalancePolicy(3L, 2L))
    moves.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) shouldBe Array(
      (0L, 0L, 0L), (1L, 1L, 2L), (2L, 1L, 1L),
      (3L, 1L, 2L), (4L, 1L, 1L), (5L, 1L, 1L))
    newCb.map(_.toSeq) shouldBe Array(
      Seq(0L, 0L),             // un-split centroid carried verbatim
      Seq(750000L, 500000L),   // chunk-0 floor-mean replaces the split cid
      Seq(1000000L, 1000000L)) // chunk-1 floor-mean appended
  }

  test("even split SETTLES in one pass: no child re-crosses the bar it was split at") {
    // the convergence theorem the 2-means splitter measurably lacks on
    // a tight clump (ListSkewProbe): every child ≤ ⌈nTot/k⌉
    val cb = Similarity.kmeansTrainFixedPoint(embeddings, k = 8, maxIter = 3)
    val corpus = graft.queries.SkewFixture.skewed(embeddings)
    val pol = Similarity.RebalancePolicy(3L, 2L)
    val (moves, newCb) = Similarity.splitListsEven(corpus, cb, pol)
    newCb.length should be > cb.length
    val post = moves.groupBy(col("cid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nTot = post.map(_._2).sum
    post.foreach { case (cid, n) =>
      withClue(s"child/list $cid (n=$n) re-crosses the bar: ") {
        pol.splits(n, newCb.length, nTot) shouldBe false
      }
    }
    // membership preserved through the chunking
    moves.count() shouldBe embeddings.count()
    moves.select("id").distinct().count() shouldBe embeddings.count()
  }

  test("a bar-crossing list at or below the ceiling average still cuts into two chunks") {
    // tiny-corpus shape: bar·avg sits below ⌈avg⌉, so ⌈size/T⌉ would be
    // ONE chunk — a "split" that moves nothing while the census stays
    // crossed (a monitor would re-trigger forever). Crossing ⇒ ≥ 2
    // chunks. k=4, nTot=5: c1 (size 2) crosses 3/2 (2·2·4 ≥ 3·5) with
    // T = ⌈5/4⌉ = 2 ≥ size.
    val cb4 = Array(Array(0L, 0L), Array(1000000L, 1000000L),
      Array(-4000000L, -4000000L), Array(4000000L, -4000000L))
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.25, 0.0)), (2L, Seq(0.0, 0.25)),
      (3L, Seq(1.0, 1.0)), (4L, Seq(0.75, 0.75)))
      .toDF("vec_id", "embedding")
    val (moves, newCb) = Similarity.splitListsEven(
      vecs, cb4, Similarity.RebalancePolicy(3L, 2L))
    val byId = moves.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // c1's two members split 1/1: lower (value, id) rank keeps cid 1
    byId(3L)._1 shouldBe 1L
    byId(4L)._1 shouldBe 1L
    Set(byId(3L)._2, byId(4L)._2).size shouldBe 2
    newCb.length should be > cb4.length
  }

  test("even split over a SUPPLIED state bases on it, and is loud on a state/corpus mismatch") {
    // the s34 loop contract: after a previous split the served state is
    // rank-chunked, NOT the fresh argmax — the cut must respect it
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(1.0, 1.0)), (2L, Seq(0.75, 0.5)),
      (3L, Seq(1.0, 1.0)), (4L, Seq(0.75, 0.5)),
      (5L, Seq(0.75, 0.5))).toDF("vec_id", "embedding")
    // a hand state that disagrees with argmax: id 0 parked in list 1
    val st = Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "cid")
    val (moves, _) = Similarity.splitListsEven(
      vecs, Cb, Similarity.RebalancePolicy(3L, 2L), state = Some(st))
    // every old_cid comes from the state (all 1), never re-derived
    moves.collect().map(_.getLong(1)).toSet shouldBe Set(1L)
    // and a state missing corpus rows refuses loudly
    an[IllegalArgumentException] should be thrownBy
      Similarity.splitListsEven(vecs, Cb,
        Similarity.RebalancePolicy(3L, 2L),
        state = Some(st.filter(col("id") =!= 0L)))
    // …and so does the REVERSE direction (r14 advice): a state row with
    // no corpus vector is a censused-but-uncuttable ghost seat
    an[IllegalArgumentException] should be thrownBy
      Similarity.splitListsEven(vecs, Cb,
        Similarity.RebalancePolicy(3L, 2L),
        state = Some(st.unionByName(Seq((99L, 1L)).toDF("id", "cid"))))
  }

  test("even split is bit-identical across partitionings") {
    val cb = Similarity.kmeansTrainFixedPoint(embeddings, k = 8, maxIter = 3)
    val corpus = graft.queries.SkewFixture.skewed(embeddings)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (m, ncb) = Similarity.splitListsEven(
        df, cb, Similarity.RebalancePolicy(3L, 2L))
      (m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq, ncb.map(_.toSeq).toSeq)
    }
    run(corpus.repartition(1)) shouldBe
      run(corpus.repartition(13, col("vec_id")))
  }

  // (fileName, length, contents-hash) of every data file under cid=<c>
  private def dirSnapshot(root: String, cid: Long): Seq[(String, Long, Int)] = {
    val d = new java.io.File(root, s"cid=$cid")
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        (f.getName, f.length(), java.util.Arrays.hashCode(bytes))
      }.sortBy(_._1)
  }

  test("applying a movement rewrites ONLY the touched partitions — untouched dirs byte-identical") {
    // the split hand case: cid 0 untouched, cid 1 loses its sub-1
    // movers to the fresh cid 2
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(1.0, 1.0)),
      (2L, Seq(0.75, 0.5)),
      (3L, Seq(1.0, 1.0)),
      (4L, Seq(0.75, 0.5)),
      (5L, Seq(0.75, 0.5))).toDF("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("reb_apply").toString
    Similarity.assignFixedPoint(vecs, Cb)
      .select(col("id").as("vec_id"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(out)
    val before0 = dirSnapshot(out, 0L)
    before0 should not be empty
    val (moves, _) = Similarity.rebalanceLists(
      vecs, Cb, Similarity.RebalancePolicy(3L, 2L), maxIter = 1)
    val back = Similarity.applyMovementPartitioned(
      moves.select(col("id").as("vec_id"), col("old_cid"), col("cid")), out)
    // cid=0 was never touched: same files, same bytes
    dirSnapshot(out, 0L) shouldBe before0
    // cid=1 rewritten to stayers only; cid=2 created for the movers
    new java.io.File(out, "cid=2").isDirectory shouldBe true
    back.select(col("vec_id"), col("cid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L), (5L, 2L))
  }

  test("a fully drained source partition is deleted, not left stale") {
    val out = java.nio.file.Files.createTempDirectory("reb_drain").toString
    Seq((0L, 0L), (1L, 1L), (2L, 1L)).toDF("vec_id", "cid")
      .write.mode("overwrite").partitionBy("cid").parquet(out)
    // a hand movement that empties cid 1 entirely (both rows leave)
    val moves = Seq((0L, 0L, 0L), (1L, 1L, 2L), (2L, 1L, 2L))
      .toDF("vec_id", "old_cid", "cid")
    val back = Similarity.applyMovementPartitioned(moves, out)
    new java.io.File(out, "cid=1").exists() shouldBe false
    back.select(col("vec_id"), col("cid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 2L), (2L, 2L))
  }

  test("an identity movement is a no-op write: every partition keeps its bytes") {
    val out = java.nio.file.Files.createTempDirectory("reb_noop").toString
    Seq((0L, 0L), (1L, 1L)).toDF("vec_id", "cid")
      .write.mode("overwrite").partitionBy("cid").parquet(out)
    val snaps = Seq(0L, 1L).map(c => c -> dirSnapshot(out, c))
    val moves = Seq((0L, 0L, 0L), (1L, 1L, 1L))
      .toDF("vec_id", "old_cid", "cid")
    Similarity.applyMovementPartitioned(moves, out)
    snaps.foreach { case (c, snap) => dirSnapshot(out, c) shouldBe snap }
  }

  // ---- IVFADC rebalance (s37): the cut lifted to the composed index ---

  test("ADC rebalance: un-split lists carried VERBATIM; every split-list member re-encoded") {
    val emb = embeddings
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = 8, m = 4, codebookSize = 8, maxIterCoarse = 3, maxIterPq = 2)
    val corpus = graft.queries.SkewFixture.skewed(emb)
    val index = Similarity.ivfPqEncodeFixedPoint(corpus, coarse, pq)
      .localCheckpoint()
    val (reb, newCb) = Similarity.rebalanceIvfPqIndex(index, corpus,
      coarse, pq, Similarity.RebalancePolicy(3L, 2L))
    newCb.length should be > coarse.length
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq))
    val before = rows(index.select(col("id"),
      col("cid").cast("long").as("cid"), col("codes")))
    val after = rows(reb)
    // membership preserved, exactly one row per vector
    after.map(_._1).sorted shouldBe before.map(_._1).sorted
    // the split set = lists that lost a mover; everything else verbatim
    val movedFrom = before.map(r => r._1 -> r._2).toMap
    val splitSet = after.collect {
      case (id, cid, _) if cid != movedFrom(id) => movedFrom(id)
    }.toSet
    splitSet should not be empty
    val beforeByid = before.map(r => r._1 -> r).toMap
    after.foreach { case (id, cid, codes) =>
      val (_, oldCid, oldCodes) = beforeByid(id)
      if (!splitSet.contains(oldCid)) {
        // carried row: identical cid AND identical codes
        (cid, codes) shouldBe ((oldCid, oldCodes))
      } else {
        // split-list member: landed under a valid expanded id, and its
        // codes were RE-encoded (chunk 0 included — the centroid was
        // replaced, so identical-codes-by-luck is possible per row but
        // the bit-level landing is pinned by the s37 DuckDB oracle,
        // which recomputes every residual and code from nothing)
        cid should be < newCb.length.toLong
      }
    }
    // at least one split-list member's codes actually changed (the
    // centroid moved under it) — the re-encode is not a no-op
    val changedCodes = after.count { case (id, _, codes) =>
      splitSet.contains(movedFrom(id)) && codes != beforeByid(id)._3
    }
    changedCodes should be > 0
  }

  test("ADC rebalance: deterministic across partitionings, and searchable with the expanded codebook") {
    val emb = embeddings
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = 8, m = 4, codebookSize = 8, maxIterCoarse = 3, maxIterPq = 2)
    val corpus = graft.queries.SkewFixture.skewed(emb)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val idx = Similarity.ivfPqEncodeFixedPoint(df, coarse, pq)
      val (reb, ncb) = Similarity.rebalanceIvfPqIndex(idx, df, coarse, pq,
        Similarity.RebalancePolicy(3L, 2L))
      (reb.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2).toSeq)).sortBy(_._1).toSeq, ncb.map(_.toSeq).toSeq)
    }
    val a = run(corpus.repartition(1))
    a shouldBe run(corpus.repartition(13, col("vec_id")))
    // the rebalanced index serves through the standard indexed search
    val (reb, ncb) = {
      val idx = Similarity.ivfPqEncodeFixedPoint(corpus, coarse, pq)
      Similarity.rebalanceIvfPqIndex(idx, corpus, coarse, pq,
        Similarity.RebalancePolicy(3L, 2L))
    }
    val queries = corpus.orderBy("vec_id").limit(5)
    val got = Similarity.ivfPqSearchIndexed(reb, corpus, queries, 5,
      ncb, pq, nProbe = 4, rerank = 4)
    got.groupBy(col("query_id")).count().collect()
      .foreach(_.getLong(1) shouldBe 5L)
  }

  test("ADC merge: survivors carry codes VERBATIM under the dense rank; orphans land among survivors") {
    val emb = embeddings
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = 8, m = 4, codebookSize = 8, maxIterCoarse = 3, maxIterPq = 2)
    val corpus = graft.queries.SkewFixture.skewed(emb)
    val index = Similarity.ivfPqEncodeFixedPoint(corpus, coarse, pq)
      .localCheckpoint()
    val (mrg, survCb) = Similarity.mergeIvfPqIndex(index, corpus,
      coarse, pq, Similarity.MergePolicy(2L, 3L))
    survCb.length should be < coarse.length
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq))
    val before = rows(index.select(col("id"),
      col("cid").cast("long").as("cid"), col("codes"))).map(r => r._1 -> r).toMap
    val after = rows(mrg)
    after.map(_._1).sorted shouldBe before.keys.toSeq.sorted
    // survivors = old cids whose centroid survived, in cid order
    val survOld = coarse.indices.map(_.toLong).filter(c =>
      survCb.map(_.toSeq).contains(coarse(c.toInt).toSeq))
    val rankOf = survOld.zipWithIndex.map { case (c, i) => c -> i.toLong }.toMap
    after.foreach { case (id, cid, codes) =>
      val (_, oldCid, oldCodes) = before(id)
      rankOf.get(oldCid) match {
        case Some(rank) => // survivor member: renumbered, codes verbatim
          (cid, codes) shouldBe ((rank, oldCodes))
        case None => // orphan: landed among survivors (re-encoded codes
          cid should be < survCb.length.toLong // pinned by the oracle)
      }
    }
    // the merged index serves through the standard indexed search
    val queries = corpus.orderBy("vec_id").limit(5)
    Similarity.ivfPqSearchIndexed(mrg, corpus, queries, 5, survCb, pq,
        nProbe = 2, rerank = 4)
      .groupBy(col("query_id")).count().collect()
      .foreach(_.getLong(1) shouldBe 5L)
  }

  // ---- versioned apply (s35): serve-while-applying isolation ----------

  test("versioned apply: manifest routes each cid to its owner; untouched v0 dirs keep their bytes") {
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(1.0, 1.0)), (2L, Seq(0.75, 0.5)),
      (3L, Seq(1.0, 1.0)), (4L, Seq(0.75, 0.5)), (5L, Seq(0.75, 0.5)))
      .toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("reb_ver").toString
    Similarity.initIndexVersioned(
      Similarity.assignFixedPoint(vecs, Cb)
        .select(col("id").as("vec_id"), col("cid")), root)
    val before0 = dirSnapshot(s"$root/v0", 0L)
    before0 should not be empty
    val (moves, _) = Similarity.rebalanceLists(
      vecs, Cb, Similarity.RebalancePolicy(3L, 2L), maxIter = 1)
    val v = Similarity.applyMovementVersioned(
      moves.select(col("id").as("vec_id"), col("old_cid"), col("cid")), root)
    v shouldBe 1L
    // v1 holds ONLY the touched cids (1 rewritten, 2 fresh) — the
    // untouched cid 0 was never copied, rewritten, or listed
    new java.io.File(s"$root/v1", "cid=1").isDirectory shouldBe true
    new java.io.File(s"$root/v1", "cid=2").isDirectory shouldBe true
    new java.io.File(s"$root/v1", "cid=0").exists() shouldBe false
    dirSnapshot(s"$root/v0", 0L) shouldBe before0
    Similarity.readIndexVersioned(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L), (5L, 2L))
  }

  test("versioned apply: a reader pinned at v0 is undisturbed — even after its superseded dirs are stale") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_iso").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L), (2L, 1L)).toDF("vec_id", "cid"), root)
    val preV0 = Similarity.readIndexVersioned(spark, root, Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val moves = Seq((0L, 0L, 0L), (1L, 1L, 2L), (2L, 1L, 1L))
      .toDF("vec_id", "old_cid", "cid")
    Similarity.applyMovementVersioned(moves, root)
    // a reader that resolved version 0 BEFORE the apply still reads
    // version 0's immutable files — identical rows after the apply
    Similarity.readIndexVersioned(spark, root, Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      preV0
    // the strongest form (the Loop-spec convention): corrupt v0's now-
    // SUPERSEDED cid=1 dir — the latest read never routes there
    val stale = new java.io.File(s"$root/v0/cid=1")
    stale.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    }
    Similarity.readIndexVersioned(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 2L), (2L, 1L))
  }

  test("versioned apply: an uncommitted (manifest-less) data dir is invisible; identity movement commits nothing") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_crash").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L)).toDF("vec_id", "cid"), root, idCol = "vec_id")
    // a crashed apply: v1 data written, manifest never committed
    Seq((1L, 5L)).toDF("vec_id", "cid")
      .write.partitionBy("cid").parquet(s"$root/v1")
    Similarity.readIndexVersioned(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 1L))
    // identity movement: no new version, no new manifest
    val same = Seq((0L, 0L, 0L), (1L, 1L, 1L)).toDF("vec_id", "old_cid", "cid")
    Similarity.applyMovementVersioned(same, root) shouldBe 0L
    new java.io.File(s"$root/_manifests/v1").exists() shouldBe false
  }

  test("versioned apply: a fully drained cid leaves the manifest (merge-style movement)") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_drain").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L), (2L, 1L)).toDF("vec_id", "cid"), root)
    val moves = Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 1L, 0L))
      .toDF("vec_id", "old_cid", "cid")
    Similarity.applyMovementVersioned(moves, root) shouldBe 1L
    val back = Similarity.readIndexVersioned(spark, root)
    back.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 0L), (2L, 0L))
    // cid 1 is routed nowhere — v0's physical dir for it is dead weight
    back.filter(col("cid") === 1L).count() shouldBe 0L
  }

  test("versioned apply carries PAYLOAD columns: the ADC index's codes route through v<k+1>") {
    // the composed-index apply path: movement rows carry the re-encoded
    // codes; touched cids land them in the fresh version, untouched
    // cids keep serving their v0 files (codes included)
    val root = java.nio.file.Files.createTempDirectory("reb_ver_payload").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L, Seq(1, 2)), (1L, 1L, Seq(3, 4)), (2L, 1L, Seq(5, 6)))
        .toDF("vec_id", "cid", "codes"), root)
    val moves = Seq(
      (0L, 0L, 0L, Seq(1, 2)),   // untouched
      (1L, 1L, 1L, Seq(7, 8)),   // stays in cid 1, codes re-encoded
      (2L, 1L, 2L, Seq(9, 10)))  // moves to fresh cid 2 with new codes
      .toDF("vec_id", "old_cid", "cid", "codes")
    Similarity.applyMovementVersioned(moves, root) shouldBe 1L
    val back = Similarity.readIndexVersioned(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getSeq[Int](1).toSeq))
      .sortBy(_._1)
    back shouldBe Array(
      (0L, 0L, Seq(1, 2)),  // untouched: v0's codes
      (1L, 1L, Seq(7, 8)),  // rewritten in place with the new codes
      (2L, 2L, Seq(9, 10))) // landed in the fresh list with its codes
  }

  test("vacuum: referenced-ness decides deletion — an old dir the latest manifest still routes survives") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_vac").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L), (2L, 1L)).toDF("vec_id", "cid"), root)
    // v1: split cid 1 → {1, 2}; cid 0 stays owned by v0
    Similarity.applyMovementVersioned(
      Seq((1L, 1L, 1L), (2L, 1L, 2L)).toDF("vec_id", "old_cid", "cid"),
      root) shouldBe 1L
    // v2: merge id 1 into cid 0 (drains cid 1; touches 0 and 1 — the
    // movement carries one row per corpus vector, as always)
    Similarity.applyMovementVersioned(
      Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 2L, 2L))
        .toDF("vec_id", "old_cid", "cid"), root) shouldBe 2L
    val before = Similarity.readIndexVersioned(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val (droppedM, deletedD) =
      Similarity.vacuumIndexVersioned(spark, root, keepVersions = 1)
    droppedM shouldBe 2L // manifests v0, v1 dropped
    // survivors: v2/cid=0 (latest), v2/cid=1, and v1/cid=2 — an OLD
    // version's dir the latest manifest still routes to. Deleted:
    // v0/cid=0, v0/cid=1 (superseded), v1/cid=1 (superseded by v2)
    deletedD shouldBe 3L
    new java.io.File(s"$root/v1/cid=2").isDirectory shouldBe true
    new java.io.File(s"$root/v0/cid=0").exists() shouldBe false
    new java.io.File(s"$root/v1/cid=1").exists() shouldBe false
    // the latest read is byte-for-byte unaffected
    Similarity.readIndexVersioned(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe before
    // a reader pinned below the horizon now fails loudly (the contract)
    an[Exception] should be thrownBy
      Similarity.readIndexVersioned(spark, root, Some(0L)).collect()
    // idempotent: a second sweep finds nothing
    Similarity.vacuumIndexVersioned(spark, root, 1) shouldBe ((0L, 0L))
  }

  test("the ADC cut's movement feeds the versioned serving layout: apply + manifest read ≡ the rebalanced index") {
    // the s39 serving seam: the streaming census cut exposes its
    // movement (rebalanceIvfPqMovement) so a deployment can route it
    // through applyMovementVersioned with the re-encoded codes as
    // payload — touched cids (split sources AND fresh chunks, chunk-0
    // stayers included: their codes changed even though their cid
    // didn't) land in v1, untouched cids keep serving their v0 files
    // with carried-verbatim codes. The manifest read must equal the
    // in-memory rebalanced index row-for-row, codes included.
    val emb = embeddings
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = 8, m = 4, codebookSize = 8, maxIterCoarse = 2, maxIterPq = 1)
    val corpus = graft.queries.SkewFixture.skewed(emb).localCheckpoint()
    val index = Similarity.ivfPqEncodeFixedPoint(corpus, coarse, pq)
      .localCheckpoint()
    val (rebIdx0, newCb, mv) = Similarity.rebalanceIvfPqMovement(index,
      corpus, coarse, pq, Similarity.RebalancePolicy(3L, 2L))
    newCb.length should be > coarse.length
    val rebIdx = rebIdx0.localCheckpoint()
    val root = java.nio.file.Files
      .createTempDirectory("reb_ver_adc_serve").toString
    Similarity.initIndexVersioned(
      index.select(col("id").as("vec_id"),
        col("cid").cast("long").as("cid"), col("codes")), root)
    // movement + payload: each row's POST-cut codes joined from the
    // rebalanced index (un-split rows keep their original codes, so
    // the join is total)
    val payload = mv.join(rebIdx.select(col("id"),
        col("cid").cast("long").as("cid"), col("codes")),
      Seq("id", "cid"))
      .select(col("id").as("vec_id"), col("old_cid"), col("cid"),
        col("codes"))
    Similarity.applyMovementVersioned(payload, root) shouldBe 1L
    def rows(df: org.apache.spark.sql.DataFrame, idc: String) = df
      .select(col(idc), col("cid").cast("long"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toSeq)).toSet
    rows(Similarity.readIndexVersioned(spark, root), "vec_id") shouldBe
      rows(rebIdx, "id")
    // and the untouched lists' v0 files were never rewritten: every
    // cid the movement didn't touch is still owned by v0
    val touched = mv.filter(col("old_cid") =!= col("cid"))
      .select(explode(array(col("old_cid"), col("cid"))))
      .distinct().collect().map(_.getLong(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val owners = Similarity.readManifest(fs, root, 1L)
    owners.foreach { case (cid, owner) =>
      owner shouldBe (if (touched(cid)) 1L else 0L)
    }
  }

  test("ADC merge is loud on BOTH silent-drop directions: ghost index ids and out-of-range cids") {
    val emb = embeddings
    val (coarse, pq) = Similarity.ivfPqTrainFixedPoint(emb, dim = 64,
      nLists = 8, m = 4, codebookSize = 8, maxIterCoarse = 2, maxIterPq = 1)
    val corpus = graft.queries.SkewFixture.skewed(emb).localCheckpoint()
    val index = Similarity.ivfPqEncodeFixedPoint(corpus, coarse, pq)
      .localCheckpoint()
    // ghost direction: an index id with no corpus vector would vanish
    // through the orphan re-encode's inner joins
    val ghosted = index.unionByName(index.limit(1)
      .withColumn("id", lit(999999999L)))
    val e1 = the[IllegalArgumentException] thrownBy
      Similarity.mergeIvfPqIndex(ghosted, corpus, coarse, pq,
        Similarity.MergePolicy(2L, 3L))
    e1.getMessage should include("have no corpus vector")
    // stray direction: a cid outside [0, k) matches neither the
    // survivor carry nor the retire re-encode
    val strayed = index.withColumn("cid",
      when(col("id") === index.orderBy("id").first().getLong(0),
        lit(coarse.length.toLong)).otherwise(col("cid")))
    val e2 = the[IllegalArgumentException] thrownBy
      Similarity.mergeIvfPqIndex(strayed, corpus, coarse, pq,
        Similarity.MergePolicy(2L, 3L))
    e2.getMessage should include("outside")
    // the clean pairing still merges (the checks cost two bounded
    // counts, not behavior)
    val (mrg, survCb) = Similarity.mergeIvfPqIndex(index, corpus,
      coarse, pq, Similarity.MergePolicy(2L, 3L))
    mrg.count() shouldBe index.count()
    survCb.length should be < coarse.length
  }

  test("encodeAtState validates by default: a state row with no corpus vector is loud, not dropped") {
    val corpus = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cb = Array(Array(1000000L, 0L), Array(0L, 1000000L))
    val pq = Array(Array(Array(0L, 0L), Array(1000000L, 1000000L)))
    val ok = Similarity.encodeAtState(corpus,
      Seq((0L, 0L), (1L, 1L)).toDF("id", "cid"), cb, pq)
    ok.count() shouldBe 2L
    val e = the[IllegalArgumentException] thrownBy
      Similarity.encodeAtState(corpus,
        Seq((0L, 0L), (7L, 1L)).toDF("id", "cid"), cb, pq).count()
    e.getMessage should include("no corpus vector")
  }

  // ---- manifest commit + vacuum crash paths (r15 advice) --------------

  test("manifest commit: a redelivered identical commit is a no-op; a raced different commit is loud") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_race").toString
    val df = Seq((0L, 0L)).toDF("vec_id", "cid")
    Similarity.initIndexVersioned(df, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // redelivery rewrite: byte-identical content commits as a no-op
    // (the v0 manifest exists; plain FileSystem.rename on the local FS
    // would have silently REPLACED it and reported success)
    noException should be thrownBy
      Similarity.writeManifest(fs, root, 0L, Map(0L -> 0L))
    // a second writer with DIFFERENT routing fails loud instead of
    // clobbering the committed manifest
    val e = the[IllegalArgumentException] thrownBy
      Similarity.writeManifest(fs, root, 0L, Map(0L -> 0L, 5L -> 0L))
    e.getMessage should include("single-writer")
    // the committed manifest is untouched by the failed race
    Similarity.readManifest(fs, root, 0L) shouldBe Map(0L -> 0L)
    // no staging litter left behind by either path
    fs.listStatus(new org.apache.hadoop.fs.Path(root, "_manifests"))
      .map(_.getPath.getName).count(_.endsWith(".tmp")) shouldBe 0
  }

  test("TWO-APPLIER interleave: the loser fails loud naming the contract, the winner's version serves, the vacuum strands nothing") {
    // r16 verdict #5: two LIVE appliers interleaving apply → commit →
    // vacuum on one root (a violated single-writer contract). Applier
    // A claims v1 and pauses in its claim→commit window; applier B
    // runs a COMPLETE apply inside it. B's claim reclaims A's
    // uncommitted v1 (indistinguishable from a crashed attempt — the
    // documented redelivery path) and commits; A's commit-time claim
    // check then fails LOUD instead of routing a manifest at B's
    // bytes — the silent-corruption mode the pre-r17 shared-overwrite
    // data write allowed.
    val root = java.nio.file.Files
      .createTempDirectory("reb_two_appliers").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L), (2L, 0L)).toDF("vec_id", "cid"), root)
    val movA = Seq((0L, 0L, 1L), (1L, 1L, 1L), (2L, 0L, 0L))
      .toDF("vec_id", "old_cid", "cid")
    val movB = Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 0L))
      .toDF("vec_id", "old_cid", "cid")
    var bVersion = -1L
    val e = the[IllegalArgumentException] thrownBy
      Similarity.applyMovementVersionedHooked(movA, root,
        interleave = { () =>
          bVersion = Similarity.applyMovementVersioned(movB, root)
        })
    e.getMessage should include("single-writer")
    bVersion shouldBe 1L // the interleaved applier WON and committed
    // the winner's version serves ITS movement, bit-intact
    Similarity.readIndexVersioned(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      Set((0L, 0L), (1L, 0L), (2L, 0L))
    // no staging litter from either applier's exit paths
    new java.io.File(root).listFiles().map(_.getName)
      .filter(_.endsWith(".staging")) shouldBe empty
    // a CRASHED loser's orphaned staging dir (superseded version) is
    // reclaimed by the sweep…
    val orphan = new java.io.File(s"$root/.v1.deadbeef.staging")
    orphan.mkdirs() shouldBe true
    Similarity.vacuumIndexVersioned(spark, root, keepVersions = 2)
    orphan.exists() shouldBe false
    // …while an in-flight stager ABOVE the highest commit survives
    val inflight = new java.io.File(s"$root/.v2.cafe.staging")
    inflight.mkdirs() shouldBe true
    Similarity.vacuumIndexVersioned(spark, root, keepVersions = 2)
    inflight.exists() shouldBe true
  }

  test("vacuum re-run reclaims dirs whose manifests a crashed sweep already deleted") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_crashvac").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L)).toDF("vec_id", "cid"), root)
    Similarity.applyMovementVersioned(
      Seq((0L, 0L, 0L), (1L, 1L, 0L)).toDF("vec_id", "old_cid", "cid"),
      root) shouldBe 1L
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the crash: a keep=1 sweep deleted the v0 manifest, then died
    // before removing v0's unreferenced dirs — they are now orphans no
    // surviving manifest names
    fs.delete(new org.apache.hadoop.fs.Path(root, "_manifests/v0"), false)
    new java.io.File(s"$root/v0/cid=0").isDirectory shouldBe true
    // the re-run walks v<k> dirs from the ROOT listing (not from
    // surviving manifests), so it reclaims both superseded v0 dirs
    val (droppedM, deletedD) =
      Similarity.vacuumIndexVersioned(spark, root, keepVersions = 1)
    droppedM shouldBe 0L
    deletedD shouldBe 2L
    new java.io.File(s"$root/v0/cid=0").exists() shouldBe false
    new java.io.File(s"$root/v0/cid=1").exists() shouldBe false
    Similarity.readIndexVersioned(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1) shouldBe
      Array((0L, 0L), (1L, 0L))
  }

  test("vacuum leaves an IN-FLIGHT apply's uncommitted data dir alone") {
    val root = java.nio.file.Files.createTempDirectory("reb_ver_inflight").toString
    Similarity.initIndexVersioned(
      Seq((0L, 0L), (1L, 1L)).toDF("vec_id", "cid"), root)
    // an apply in flight: v1 data landed, manifest not yet committed
    Seq((1L, 2L)).toDF("vec_id", "cid")
      .write.partitionBy("cid").parquet(s"$root/v1")
    val (droppedM, deletedD) =
      Similarity.vacuumIndexVersioned(spark, root, keepVersions = 1)
    droppedM shouldBe 0L
    deletedD shouldBe 0L
    // the in-flight writer's commit still routes to intact data
    new java.io.File(s"$root/v1/cid=2").isDirectory shouldBe true
  }

  test("vacuum under a LIVE pinned reader: loud failure or correct rows, never wrong rows") {
    // the one interleaving the retention contract doesn't pin on disk
    // (r15 verdict #7): a reader resolved version 0 and is MID-SCAN of
    // a to-be-dropped directory when the sweep runs. The contract is
    // "fails loud, never wrong rows": whatever the iterator yields
    // after the sweep must be v0 rows; truncation or invention fails
    // the assertion, an exception is the documented loud mode.
    val root = java.nio.file.Files.createTempDirectory("reb_ver_race_rd").toString
    val n = 200
    Similarity.initIndexVersioned(
      (0 until n).map(i => (i.toLong, (i % 2).toLong))
        .toDF("vec_id", "cid"), root)
    Similarity.applyMovementVersioned(
      (0 until n).map(i => (i.toLong, (i % 2).toLong, ((i % 2) ^ 1).toLong))
        .toDF("vec_id", "old_cid", "cid"), root) shouldBe 1L
    val v0Rows = Similarity.readIndexVersioned(spark, root, Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // open the pinned reader and drain it PARTIALLY before the sweep
    val it = Similarity.readIndexVersioned(spark, root, Some(0L))
      .toLocalIterator()
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (it.hasNext && i < 10) { // partial drain
      val r = it.next(); got += ((r.getLong(0), r.getLong(1))); i += 1
    }
    Similarity.vacuumIndexVersioned(spark, root, keepVersions = 1)
    val outcome = try {
      while (it.hasNext) {
        val r = it.next(); got += ((r.getLong(0), r.getLong(1)))
      }
      "completed"
    } catch { case _: Exception => "loud" }
    // every row yielded — before or after the sweep — is a true v0 row
    got.foreach(r => v0Rows should contain(r))
    got.distinct.size shouldBe got.size
    if (outcome == "completed") // buffered scans may legally finish,
      got.toSet shouldBe v0Rows // but only with exactly v0's content
    // and the pinned reader cannot RE-resolve below the horizon
    an[Exception] should be thrownBy
      Similarity.readIndexVersioned(spark, root, Some(0L)).collect()
  }

  test("bit-identical movement and codebook across partitionings") {
    val cb = Similarity.kmeansTrainFixedPoint(embeddings, k = 8, maxIter = 3)
    val corpus = graft.queries.SkewFixture.skewed(embeddings)
    def run(df: org.apache.spark.sql.DataFrame) = {
      val (m, ncb) = Similarity.rebalanceLists(
        df, cb, Similarity.RebalancePolicy(3L, 2L))
      (m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq, ncb.map(_.toSeq).toSeq)
    }
    run(corpus.repartition(1)) shouldBe
      run(corpus.repartition(13, col("vec_id")))
  }
}
