package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PqAdc, PqEncode, ResidualVec}
import graft.ml.{ProductQuantization => PQ, Similarity}

/** Product-quantization ANN: kernel parity with a declarative
  * composition, the malformed-input hygiene contract, the
  * exact-reconstruction configuration against brute force, and the
  * Lloyd-iteration invariants.
  */
class PqSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(s"${SparkFixture.sfDir}/embeddings.parquet")

  private def scores(df: DataFrame): Seq[(Long, Double)] =
    df.as[(Long, Double)].collect().toSeq

  test("pqEncode kernel matches the declarative argmin composition " +
      "(same distances, first-minimum tie-break)") {
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(0.0, 1.0)),
      Array(Array(2.0, 2.0), Array(-1.0, 0.5), Array(2.0, 2.0))) // dup → first wins
    val df = Seq(
      (1L, Seq(0.1, 0.2, 1.9, 2.2)),
      (2L, Seq(0.9, 1.1, -0.8, 0.4)),
      (3L, Seq(0.0, 0.6, 2.0, 2.0)) // exact tie on subspace 1 dup cells
    ).toDF("id", "v")
    val kernel = df.select($"id",
      PqEncode.pqEncode($"v", books).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    // declarative reference: per subspace, argmin by (dist, index)
    val mat = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val dsub = 2
    val ref = df.select($"id", transform(sequence(lit(0), lit(1)), j => {
      val cb = element_at(mat, j + 1)
      val dists = transform(cb, c =>
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0), (acc, dd) => {
          val x = element_at($"v", j * dsub + dd + 1)
          val y = element_at(c, dd + 1)
          acc + (x - y) * (x - y)
        }))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }).as("c")).as[(Long, Seq[Int])].collect().toMap
    assert(kernel == ref)
    assert(kernel(3L)(1) == 0, "duplicate-centroid tie must keep the " +
      "earlier index")
  }

  test("pqEncode/pqAdc/residualVec null out malformed input instead " +
      "of misfiling it") {
    val books: Array[Array[Array[Double]]] =
      Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val bad = Seq(
      (1L, Seq[Option[Double]](Some(0.1), Some(0.2))),          // ok
      (2L, Seq[Option[Double]](Some(0.1))),                     // wrong dim
      (3L, Seq[Option[Double]](Some(0.1), None))                // null elem
    ).toDF("id", "v")
    val enc = bad.select($"id", PqEncode.pqEncode($"v", books).as("c"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(enc == Map(1L -> false, 2L -> true, 3L -> true))

    val table = Array(Array(0.5, -0.5))
    val codes = Seq(
      (1L, Some(Seq(0))),          // ok
      (2L, Some(Seq(0, 1))),       // wrong arity
      (3L, Some(Seq(7))),          // out of range
      (4L, Option.empty[Seq[Int]]) // null code
    ).toDF("id", "c")
    val adc = codes.select($"id", PqAdc.pqAdc($"c", table).as("s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(adc == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))

    val cen = Array(Array(1.0, 1.0))
    val rv = Seq(
      (1L, Seq(3.0, 4.0), Some(0)),  // ok → (2, 3)
      (2L, Seq(3.0, 4.0), Some(5)),  // cluster out of range
      (3L, Seq(3.0), Some(0)),       // dim mismatch
      (4L, Seq(3.0, 4.0), Option.empty[Int]) // null cluster
    ).toDF("id", "v", "cl")
    val res = rv.select($"id",
      ResidualVec.residualVec($"v", $"cl", cen).as("r"))
      .collect().map(r =>
        r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1)))).toMap
    assert(res(1L).contains(Seq(2.0, 3.0)))
    assert(res(2L).isEmpty && res(3L).isEmpty && res(4L).isEmpty)
  }

  test("exact-reconstruction configuration (ksub ≥ n, iters = 0, " +
      "anchors by id) + rerank equals brute force — flat and IVF-PQ") {
    val base  = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    val brute = scores(Similarity.bruteForceTopK(base, "vec_id",
      "embedding", query, "embedding", k = 10))
    val flat = scores(PQ.pqTopK(base, "vec_id", "embedding",
      query, "embedding", m = 4, ksub = 1000000, k = 10, iters = 0,
      initByIdOrder = true, rerankK = 30))
    assert(flat == brute, "flat PQ under exact reconstruction + exact " +
      "rerank must equal brute force")
    val ivfpq = scores(PQ.ivfPqTopK(base, "vec_id", "embedding",
      query, "embedding", nlist = 4, nprobe = 4, m = 4, ksub = 1000000,
      k = 10, pqIters = 0, initByIdOrder = true, rerankK = 30))
    assert(ivfpq == brute, "full-probe IVF-PQ under exact residual " +
      "reconstruction + exact rerank must equal brute force")
  }

  test("exact reconstruction makes raw ADC scores the true cosine to " +
      "double precision (no rerank needed for the values)") {
    val base  = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    val brute = scores(Similarity.bruteForceTopK(base, "vec_id",
      "embedding", query, "embedding", k = 10)).toMap
    val adc = scores(PQ.pqTopK(base, "vec_id", "embedding",
      query, "embedding", m = 4, ksub = 1000000, k = 10, iters = 0,
      initByIdOrder = true))
    assert(adc.map(_._1).toSet == brute.keySet)
    adc.foreach { case (id, s) =>
      assert(math.abs(s - brute(id)) < 1e-9,
        s"ADC score for $id drifted: $s vs ${brute(id)}") }
  }

  test("Lloyd iterations do not increase quantization error, and an " +
      "empty cell keeps its centroid") {
    val base = emb.filter($"vec_id" =!= 0)
      .select($"vec_id", Similarity.normalize($"embedding").as("nv"))
    def sqErr(books: Array[Array[Array[Double]]]): Double = {
      val dsub = books(0)(0).length
      base.select($"nv", PqEncode.pqEncode($"nv", books).as("c"))
        .select(posexplode($"nv").as(Seq("d", "x")), $"c")
        .withColumn("cc", element_at($"c", ($"d" / dsub).cast("int") + 1))
        .withColumn("cenv", element_at(
          typedlit(books.map(_.map(_.toSeq).toSeq).toSeq),
          ($"d" / dsub).cast("int") + 1))
        .withColumn("y", element_at(element_at($"cenv", $"cc" + 1),
          ($"d" % dsub) + 1))
        .select(sum(($"x" - $"y") * ($"x" - $"y")).as("e"))
        .head().getDouble(0)
    }
    val errs = (0 to 2).map(it => sqErr(PQ.pqCodebooks(base, "vec_id",
      "nv", m = 4, ksub = 8, iters = it, initByIdOrder = true)))
    errs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"Lloyd step increased error: $a -> $b")
    case _ => () }
    assert(errs.last < errs.head, "two Lloyd steps should reduce " +
      "error on real data")
    // empty cell: with ksub = 2 anchors where one anchor is duplicated,
    // the dup cell receives no assignments but must keep its centroid
    val tiny = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(10.0, 10.0))
    ).toDF("id", "v")
    val b2 = PQ.pqCodebooks(tiny, "id", "v", m = 1, ksub = 2, iters = 1,
      initByIdOrder = true)
    // anchors: (0,0) and (0,0) — cell 1 never wins the tie, keeps init
    assert(b2(0)(1).toSeq == Seq(0.0, 0.0))
    // cell 0 moves to the mean of all three points
    assert(b2(0)(0).toSeq == Seq(10.0 / 3, 10.0 / 3))
  }

  test("probe order is ascending L2 with index tie-break, and " +
      "narrower probes scan fewer rows but never rank a kept id lower") {
    val base  = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    val q = Array(1.0, 0.0)
    val coarse = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 0.0))
    assert(PQ.probeOrder(q, coarse) == Seq(1, 0, 2))
    val full = scores(PQ.ivfPqTopK(base, "vec_id", "embedding",
      query, "embedding", nlist = 4, nprobe = 4, m = 4, ksub = 16,
      k = 10, pqIters = 1, initByIdOrder = true))
    val narrow = scores(PQ.ivfPqTopK(base, "vec_id", "embedding",
      query, "embedding", nlist = 4, nprobe = 1, m = 4, ksub = 16,
      k = 10, pqIters = 1, initByIdOrder = true))
    // narrow is the top-k of a SUBSET of clusters: the full-probe
    // result dominates it position-wise, and any id both return
    // carries the same score (global codebooks + global table ⇒ a
    // row's score is probe-independent)
    full.zip(narrow).foreach { case ((_, f), (_, n)) =>
      assert(f >= n - 1e-12, s"full probe ranked worse than narrow: " +
        s"$f < $n") }
    val fullMap = full.toMap
    narrow.foreach { case (id, s) =>
      fullMap.get(id).foreach(f => assert(math.abs(f - s) < 1e-12,
        s"id $id scored differently across probe widths: $f vs $s")) }
    assert(narrow.size == 10 && full.size == 10)
  }

  test("persisted IVF-PQ index: probe identical to in-memory, " +
      "partition-pruned, rerank-from-source equals brute under the " +
      "exactness configuration") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq").toString
    val base  = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    PQ.writeIvfPqIndex(base, "vec_id", "embedding", dir,
      nlist = 4, m = 4, ksub = 1000000, pqIters = 0,
      initByIdOrder = true)
    val fromIndex = PQ.ivfPqTopKFromIndex(spark, dir, "vec_id",
      query, "embedding", nprobe = 4, k = 10)
    val inMemory = PQ.ivfPqTopK(base, "vec_id", "embedding",
      query, "embedding", nlist = 4, nprobe = 4, m = 4,
      ksub = 1000000, k = 10, pqIters = 0, initByIdOrder = true)
    assert(scores(fromIndex) == scores(inMemory),
      "persisted probe diverged from the in-memory operator")
    // the IN filter lands on the partition column — pruned scan
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("__cluster"), s"no partition pruning in:\n$plan")
    // FAISS-refine from the index: codes-only index + raw-vector
    // source join; exactness config ⇒ equals brute force
    val reranked = scores(PQ.ivfPqTopKFromIndex(spark, dir, "vec_id",
      query, "embedding", nprobe = 4, k = 10, rerankK = 30,
      rerankSource = Some((base, "embedding"))))
    val brute = scores(Similarity.bruteForceTopK(base, "vec_id",
      "embedding", query, "embedding", k = 10))
    assert(reranked == brute)
    // rerank without a source is a contract violation, not a guess
    intercept[IllegalArgumentException] {
      PQ.ivfPqTopKFromIndex(spark, dir, "vec_id", query, "embedding",
        nprobe = 4, k = 10, rerankK = 30).collect()
    }
    // an OPENED handle probes identically to the one-shot API (both
    // plain and reranked) — metadata loads once, probes reuse it
    val handle = PQ.openIvfPqIndex(spark, dir)
    assert(scores(handle.topK("vec_id", query, "embedding",
      nprobe = 4, k = 10)) == scores(fromIndex))
    assert(scores(handle.topK("vec_id", query, "embedding",
      nprobe = 4, k = 10, rerankK = 30,
      rerankSource = Some((base, "embedding")))) == reranked)
    // opening a non-IVF-PQ index fails fast on the manifest kind
    val lshDir2 = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_open_kind").toString
    Similarity.writeLshIndex(base, "vec_id", "embedding", lshDir2,
      dim = 64, planes = 4)
    intercept[IllegalArgumentException] {
      PQ.openIvfPqIndex(spark, lshDir2)
    }
  }

  test("IVF-PQ append: committed centroids+codebooks route arrivals, " +
      "probes see them, counters bump, wrong-kind index fails fast") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_app").toString
    val base  = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    val old   = base.filter($"vec_id" % 2 === 0)
    val fresh = base.filter($"vec_id" % 2 === 1)
    PQ.writeIvfPqIndex(old, "vec_id", "embedding", dir,
      nlist = 4, m = 4, ksub = 16, pqIters = 1)
    val before = scores(PQ.ivfPqTopKFromIndex(spark, dir, "vec_id",
      query, "embedding", nprobe = 4, k = 10))
    val appended = PQ.appendToIvfPqIndex(spark, dir, fresh,
      "vec_id", "embedding")
    assert(appended == fresh.count())
    val st = Similarity.indexStaleness(spark, dir)
    assert(st.indexedRows == old.count() && st.appendedRows == appended)
    val after = scores(PQ.ivfPqTopKFromIndex(spark, dir, "vec_id",
      query, "embedding", nprobe = 4, k = 10,
      maxStaleRatio = 10.0))
    // appended odd ids are now reachable; scores of surviving even
    // ids are unchanged (frozen centroids + codebooks)
    assert(after.exists(_._1 % 2 == 1), "appended rows never probed")
    val beforeMap = before.toMap
    after.filter(_._1 % 2 == 0).foreach { case (id, s) =>
      beforeMap.get(id).foreach(b => assert(math.abs(b - s) < 1e-12)) }
    // appending to an index of another kind fails fast
    val lshDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_wrongkind").toString
    Similarity.writeLshIndex(old, "vec_id", "embedding", lshDir,
      dim = 64, planes = 4)
    intercept[IllegalArgumentException] {
      PQ.appendToIvfPqIndex(spark, lshDir, fresh, "vec_id", "embedding")
    }
    // staleness surfaces at probe time: ratio ≈ 1 ⇒ default warns
    // (answer still returned), strict throws, raised threshold passes
    assert(Similarity.stalenessWarning(
      Similarity.readIndexMeta(spark, dir), dir, 1.0).isDefined)
    intercept[IllegalStateException] {
      PQ.ivfPqTopKFromIndex(spark, dir, "vec_id", query, "embedding",
        nprobe = 2, k = 5, strictStaleness = true)
    }
    assert(scores(PQ.ivfPqTopKFromIndex(spark, dir, "vec_id", query,
      "embedding", nprobe = 2, k = 5, maxStaleRatio = 10.0,
      strictStaleness = true)).nonEmpty)
  }

  test("knnClassifyPq: exactness config + rerank equals the brute " +
      "eval; the query-collect guard throws past its cap") {
    val e = emb
    val corpus  = e.filter($"vec_id" % 7 =!= 0)
    val queries = e.filter($"vec_id" % 7 === 0)
    val brute = Similarity.knnClassify(corpus, queries,
      "vec_id", "embedding", "label", k = 5)
      .collect().map(_.toSeq).toSet
    val adc = PQ.knnClassifyPq(corpus, queries,
      "vec_id", "embedding", "label", k = 5,
      m = 4, ksub = 1000000, iters = 0, initByIdOrder = true,
      rerankK = 15)
      .collect().map(_.toSeq).toSet
    assert(adc == brute, "exact-reconstruction ADC eval + exact " +
      "rerank must equal the brute majority-vote eval")
    // the coarse-pruned path at full probe is the same guarantee
    val pruned = PQ.knnClassifyPq(corpus, queries,
      "vec_id", "embedding", "label", k = 5,
      m = 4, ksub = 1000000, iters = 0, initByIdOrder = true,
      rerankK = 15, nlist = 4, nprobe = 4)
      .collect().map(_.toSeq).toSet
    assert(pruned == brute, "full-probe coarse-pruned ADC eval must " +
      "equal the brute majority-vote eval")
    // lossy production config still returns one verdict per query
    val lossy = PQ.knnClassifyPq(corpus, queries,
      "vec_id", "embedding", "label", k = 5,
      m = 8, ksub = 16, iters = 1, rerankK = 30)
    assert(lossy.count() == queries.count())
    // the driver-side table build is guarded, not unbounded
    intercept[IllegalArgumentException] {
      PQ.knnClassifyPq(corpus, queries, "vec_id", "embedding",
        "label", k = 5, m = 4, ksub = 8, maxCollectQueries = 3)
    }
  }

  test("IVF-PQ rebuild: staleness resets, probes row-identical to a " +
      "from-scratch build over the same source") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rebuild").toString
    val corpus = emb.filter($"vec_id" =!= 0)
    val query  = emb.filter($"vec_id" === 0)
    val old    = corpus.filter($"vec_id" % 2 === 0)
    val fresh  = corpus.filter($"vec_id" % 2 === 1)
    PQ.writeIvfPqIndex(old, "vec_id", "embedding", dir,
      nlist = 4, m = 4, ksub = 16, pqIters = 1)
    PQ.appendToIvfPqIndex(spark, dir, fresh, "vec_id", "embedding")
    // stale: default probe warns, strict probe throws
    assert(Similarity.stalenessWarning(
      Similarity.readIndexMeta(spark, dir), dir, 1.0).isDefined)
    intercept[IllegalStateException] {
      PQ.ivfPqTopKFromIndex(spark, dir, "vec_id", query, "embedding",
        nprobe = 4, k = 10, strictStaleness = true)
    }
    // rebuild from the raw-vector source (the index stores codes only)
    val n = PQ.rebuildIvfPqIndex(spark, dir, corpus,
      "vec_id", "embedding")
    assert(n == corpus.count())
    val st = Similarity.indexStaleness(spark, dir)
    assert(st.appendedRows == 0L && st.ratio == 0.0)
    // strict probe passes now, and equals a from-scratch build with
    // the same (manifest-derived) params over the same source frame
    val rebuilt = PQ.ivfPqTopKFromIndex(spark, dir, "vec_id",
      query, "embedding", nprobe = 4, k = 10, strictStaleness = true)
      .as[(Long, Double)].collect().toSeq
    val scratchDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rebuild_scratch").toString
    PQ.writeIvfPqIndex(corpus, "vec_id", "embedding", scratchDir,
      nlist = 4, m = 4, ksub = 16, pqIters = 1)
    val scratch = PQ.ivfPqTopKFromIndex(spark, scratchDir, "vec_id",
      query, "embedding", nprobe = 4, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(rebuilt == scratch,
      "rebuilt IVF-PQ index probes differently from a from-scratch " +
        "build")
    // wrong-kind and wrong-column rebuilds fail fast
    intercept[IllegalArgumentException] {
      PQ.rebuildIvfPqIndex(spark, dir, corpus, "vec_id", "nope")
    }
    val lshDir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rebuild_kind").toString
    Similarity.writeLshIndex(old, "vec_id", "embedding", lshDir,
      dim = 64, planes = 4)
    intercept[IllegalArgumentException] {
      PQ.rebuildIvfPqIndex(spark, lshDir, corpus, "vec_id", "embedding")
    }
  }

  test("batched IVF-PQ probe: topKBatch row-identical to a per-query " +
      "topK loop (plain and reranked), with the collect/vector guards") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_batch").toString
    val base    = emb.filter($"vec_id" % 17 =!= 0)
    val queries = emb.filter($"vec_id" % 17 === 0 && $"vec_id" < 120)
    PQ.writeIvfPqIndex(base, "vec_id", "embedding", dir,
      nlist = 4, m = 4, ksub = 16, pqIters = 1)
    val handle = PQ.openIvfPqIndex(spark, dir)
    def asTriples(df: DataFrame): Set[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSet
    val qids = queries.select($"vec_id").as[Long].collect().toSeq
    assert(qids.nonEmpty)
    val batch = asTriples(handle.topKBatch("vec_id", queries,
      "vec_id", "embedding", nprobe = 2, k = 5))
    val loop = qids.flatMap { qid =>
      scores(handle.topK("vec_id", emb.filter($"vec_id" === qid),
        "embedding", nprobe = 2, k = 5))
        .map { case (id, s) => (qid, id, s) }
    }.toSet
    assert(batch == loop,
      "batched probe diverged from the per-query loop")
    val batchR = asTriples(handle.topKBatch("vec_id", queries,
      "vec_id", "embedding", nprobe = 2, k = 5, rerankK = 15,
      rerankSource = Some((base, "embedding"))))
    val loopR = qids.flatMap { qid =>
      scores(handle.topK("vec_id", emb.filter($"vec_id" === qid),
        "embedding", nprobe = 2, k = 5, rerankK = 15,
        rerankSource = Some((base, "embedding"))))
        .map { case (id, s) => (qid, id, s) }
    }.toSet
    assert(batchR == loopR,
      "reranked batched probe diverged from the per-query loop")
    // the one-shot wrapper (open + batch) is the same probe
    assert(asTriples(PQ.ivfPqTopKBatchFromIndex(spark, dir, "vec_id",
      queries, "vec_id", "embedding", nprobe = 2, k = 5)) == batch,
      "one-shot batched probe diverged from the opened-handle batch")
    // guards: probe width, driver-collect cap, malformed query vector
    intercept[IllegalArgumentException] {
      handle.topKBatch("vec_id", queries, "vec_id", "embedding",
        nprobe = 0, k = 5)
    }
    intercept[IllegalArgumentException] {
      handle.topKBatch("vec_id", queries, "vec_id", "embedding",
        nprobe = 2, k = 5, maxCollectQueries = 1)
    }
    intercept[IllegalArgumentException] {
      handle.topKBatch("vec_id",
        queries.withColumn("embedding",
          when($"vec_id" === qids.head, lit(null)
            .cast("array<float>")).otherwise($"embedding")),
        "vec_id", "embedding", nprobe = 2, k = 5)
    }
  }

  test("zero-norm query (NaN scores) never ranks: single probe and " +
      "batch-of-one agree on the empty result (r14 advice)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_nan").toString
    val base = emb.filter($"vec_id" =!= 0)
    PQ.writeIvfPqIndex(base, "vec_id", "embedding", dir,
      nlist = 4, m = 4, ksub = 8, pqIters = 0)
    // a zero vector cannot be cosine-normalized — under ANSI the
    // normalize is a raw divide-by-zero, with ANSI off it is NaN ADC
    // scores that the heap batch and the orderBy probe rank
    // differently. Both probes now reject it at the driver guard with
    // a NAMED error, identically.
    val zeroQ = emb.filter($"vec_id" === 0)
      .withColumn("embedding",
        transform($"embedding", _ => lit(0.0f)))
    val exSingle = intercept[IllegalArgumentException] {
      PQ.ivfPqTopKFromIndex(spark, dir, "vec_id",
        zeroQ, "embedding", nprobe = 4, k = 5).collect()
    }
    assert(exSingle.getMessage.contains("zero-norm"))
    val exBatch = intercept[IllegalArgumentException] {
      PQ.openIvfPqIndex(spark, dir).topKBatch("vec_id",
        zeroQ, "vec_id", "embedding", nprobe = 4, k = 5).collect()
    }
    assert(exBatch.getMessage.contains("zero-norm"))
  }

  test("ivfPqTopK releases its build caches (at most the k-row " +
      "checkpointed result persists afterward)") {
    val base  = emb.filter($"vec_id" =!= 0)
    val query = emb.filter($"vec_id" === 0)
    graft.operators.PhysicalOps.releaseCaches(spark)
    PQ.ivfPqTopK(base, "vec_id", "embedding", query, "embedding",
      nlist = 4, nprobe = 2, m = 4, ksub = 8, k = 5).collect()
    assert(spark.sparkContext.getPersistentRDDs.size <= 1,
      "ivfPqTopK must release its build caches after materialization " +
        "(only the checkpointed k-row result may remain)")
    graft.operators.PhysicalOps.releaseCaches(spark)
  }
}
