package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostics main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Ad-hoc timing of one query in isolation:
    //   sbt "runMain graft.Scratch q41_jaccard_pairs /root/testdata/sf0.1"
    // SPARK_GRAFT_EXPLAIN=1 additionally prints the formatted plan.
    val name  = if (args.length > 0) args(0) else "q01_agg"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"

    if (name == "jaccard_profile") {
      import org.apache.spark.sql.expressions.Window
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val doubled = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val sh = doubled.select(col("doc_id").as("id"),
        sort_array(array_distinct(graft.ml.Dedup.shingleHashes(col("text"), 3))).as("sh"))
        .filter(size(col("sh")) > 0).persist()
      timed("sh")(sh.count())
      val ex = sh.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
      val freq = ex.groupBy(col("s")).agg(count(lit(1)).as("f"))
      val ranked = ex.join(freq, "s")
        .withColumn("r", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("f"), col("s"))))
      val prefixLen = col("n") - ceil(col("n") * 1 / 2) + 1
      val prefix = ranked.filter(col("r") <= prefixLen)
        .select(col("id"), col("s"), col("n"), col("r")).persist()
      println("[prof] ex rows=" + timed("ex")(ex.count()))
      println("[prof] prefix rows=" + timed("prefix")(prefix.count()))
      val posBound = (lit(1) +
        least(col("a.n") - col("a.r"), col("b.n") - col("b.r"))) * 3 >=
        (col("a.n") + col("b.n")) * 1
      val candRaw = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") && posBound)
      println("[prof] candRaw rows=" + timed("candRaw")(candRaw.count()))
      val candidates = candRaw.select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct().persist()
      println("[prof] cand rows=" + timed("cand")(candidates.count()))
      val verified = candidates
        .join(sh.select(col("id"), col("sh").as("sh_a")), col("id_a") === col("id")).drop("id")
        .join(sh.select(col("id"), col("sh").as("sh_b")), col("id_b") === col("id")).drop("id")
        .select(col("id_a"), col("id_b"),
          graft.functions.SortedIntersectCount.sortedIntersectCount(col("sh_a"), col("sh_b")).as("i"),
          size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      println("[prof] verified rows=" + timed("verify")(verified.count()))
      spark.stop(); return
    }
    if (name == "minhash_profile") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      for (round <- 1 to 2; nPart <- Seq(0, 32)) {
        println(s"[prof] --- round $round nPart=$nPart")
        val base = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
        val doubled = if (nPart > 0) base.repartition(nPart) else base
        val sig = doubled
          .select(col("doc_id"), graft.ml.Dedup.shingleHashes(col("text"), 3).as("__sh"))
          .select(col("doc_id"), graft.functions.MinHashSignature.minhashSignature(col("__sh"), 64).as("__sig"))
        timed("kernel-only")(sig.queryExecution.toRdd.count())
        val withBands = sig
          .select(col("doc_id"), graft.ml.Dedup.lshBandKeys(col("__sig"), 16, 4).as("__bands"))
        val exploded = withBands.select(col("doc_id"), explode(col("__bands")).as("__band")).persist()
        timed("exploded")(exploded.count())
        val bucketMin = exploded.groupBy(col("__band")).agg(min(col("doc_id")).as("__bucket_min"))
        timed("bucketMin")(bucketMin.count())
        val docMin = exploded.join(bucketMin, "__band")
          .groupBy(col("doc_id")).agg(min(col("__bucket_min")).as("__doc_min"))
          .filter(col("__doc_min") === col("doc_id")).select(col("doc_id"))
        timed("docMin")(docMin.count())
        val out = doubled.join(docMin, Seq("doc_id"), "left_semi")
        timed("semi")(out.queryExecution.toRdd.count())
        exploded.unpersist()
      }
      spark.stop(); return
    }
    if (name == "linkage_profile") {
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      val left = c.select(col("c_custkey").as("_lid"),
        col("c_nationkey").as("_blk"), col("c_name").as("ln"))
      val right = c.select((col("c_custkey") + 1000000L).as("_rid"),
        col("c_nationkey").as("_blk"), col("c_name").as("rn"))
      val joined = left.join(right, Seq("_blk"))
      timed("pairs only")(println("pairs=" +
        joined.filter(length(col("ln")) === length(col("rn"))).count()))
      timed("banded lev")(println("match=" +
        joined.filter(levenshtein(col("ln"), col("rn"), 2) >= 0).count()))
      timed("full lev")(println("match=" +
        joined.filter(levenshtein(col("ln"), col("rn")) <= 2).count()))
      spark.stop(); return
    }
    if (name == "ivf_probe_profile") {
      // r11 (r10 verdict #4): measure the IVF index RETRIEVAL path at
      // scale — q52's benched row is the full-scan exactness oracle;
      // the claimed scale path is ivfTopKFromIndex's partition-pruned
      // probe (reads nprobe of nlist cluster directories, ~nprobe·√n
      // rows at the autoNlist sizing, NOT n).
      //   sbt "runMain graft.Scratch ivf_probe_profile target/sf1"
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val n = emb.count()
      val nlist = graft.ml.Similarity.autoNlist(n)
      val idx = java.nio.file.Files
        .createTempDirectory("graft_ivf_prof").toString
      val t0 = System.nanoTime()
      graft.ml.Similarity.writeIvfIndex(
        emb, "vec_id", "embedding", idx, nlist = 0)
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(f"[prof] ivf build n=$n nlist=$nlist: $tBuild%.2f s")
      // 10 sequential probes with distinct query vectors — the
      // steady-state per-query retrieval cost (first probe includes
      // footer/metadata reads, printed separately)
      val qids = emb.select(col("vec_id")).orderBy(col("vec_id"))
        .limit(10).collect().map(_.getLong(0))
      var first = 0.0
      var rest = 0.0
      qids.zipWithIndex.foreach { case (qid, i) =>
        val q = emb.filter(col("vec_id") === qid)
          .select(col("embedding"))
        val t1 = System.nanoTime()
        val hits = graft.ml.Similarity.ivfTopKFromIndex(
          spark, idx, "vec_id", "embedding", q, "embedding",
          nprobe = 2, k = 10).collect()
        val dt = (System.nanoTime() - t1) / 1e9
        require(hits.nonEmpty)
        if (i == 0) first = dt else rest += dt
      }
      println(f"[prof] ivf probe first=$first%.3f s, " +
        f"mean-of-9 steady=${rest / 9}%.3f s (nprobe=2 of $nlist)")
      // the brute full-scan cost the probe path avoids, same query
      // (skippable at big SF — it rebuilds centroids AND scans all n)
      if (sys.env.getOrElse("SPARK_GRAFT_IVF_BRUTE", "1") != "0") {
        val q0 = emb.filter(col("vec_id") === qids.head)
          .select(col("embedding"))
        val t2 = System.nanoTime()
        graft.ml.Similarity.ivfTopK(emb, "vec_id", "embedding",
          q0, "embedding", nlist = 0, nprobe = 2, k = 10).collect()
        println(f"[prof] ivf in-memory (build+probe, no index): ${(System.nanoTime() - t2) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    if (name == "bpe_batched_profile") {
      // r11: production-merge-count BPE training wall clock —
      //   sbt "runMain graft.Scratch bpe_batched_profile /root/testdata/sf0.1"
      // optional extra args: merges batch table
      //   (table = documents_code for the r13 deep-merge-space corpus)
      val merges = if (args.length > 2) args(2).toInt else 256
      val batch  = if (args.length > 3) args(3).toInt else 64
      val table  = if (args.length > 4) args(4) else "documents"
      val docs = spark.read.parquet(s"$sfDir/$table.parquet")
      val t0 = System.nanoTime()
      val learned = graft.ml.TextAnalysis
        .bpeTrainBatched(docs, "text", merges = merges, batch = batch)
        .collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] bpeTrainBatched merges=$merges batch=$batch learned=${learned.length} in $dt%.2f s")
      // lineage-truncation discipline: after ~60 truncate-and-free
      // rounds the block manager must hold only the LAST state (one
      // persisted RDD), not a round-count's worth of dead blocks, and
      // the driver heap must be nowhere near its ceiling
      val live = spark.sparkContext.getPersistentRDDs
      val rt = Runtime.getRuntime
      val usedMb = (rt.totalMemory - rt.freeMemory) / 1048576
      println(s"[prof] persistent RDDs after run: ${live.size} " +
        s"(ids ${live.keys.toSeq.sorted.mkString(",")}); " +
        s"driver heap used ${usedMb} MiB of max ${rt.maxMemory / 1048576} MiB")
      val t1 = System.nanoTime()
      val seqLearned = graft.ml.TextAnalysis
        .bpeTrain(docs, "text", merges = math.min(merges, 32))
        .collect()
      val dt1 = (System.nanoTime() - t1) / 1e9
      println(f"[prof] bpeTrain(sequential) merges=${math.min(merges, 32)} learned=${seqLearned.length} in $dt1%.2f s")
      spark.stop(); return
    }
    if (name == "mp_recall_profile") {
      // r12: recall@k and probe cost of single-bucket vs Hamming-1
      // multi-probe LSH vs exact brute force, at production
      // (autoPlanes) sizing — the q200 analogue of the r11 ivf_probe
      // decade study.
      //   sbt "runMain graft.Scratch mp_recall_profile target/sf1"
      import graft.ml.Similarity
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val base = e.filter(col("vec_id") >= 100)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = base.count()
      val planes = Similarity.autoPlanes(n, 16)
      val k = 10
      val queryIds = (0L until 20L)
      def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      var rSingle = 0.0; var rMulti = 0.0
      var tSingle = 0.0; var tMulti = 0.0; var tBrute = 0.0
      queryIds.foreach { qid =>
        val q = e.filter(col("vec_id") === qid)
        val t0 = System.nanoTime()
        val brute = topIds(Similarity.bruteForceTopK(
          base, "vec_id", "embedding", q, "embedding", k)).toSet
        tBrute += (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val single = topIds(Similarity.lshTopK(base, "vec_id",
          "embedding", q, "embedding", dim = 64, k = k, planes = planes))
        tSingle += (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val multi = topIds(Similarity.lshMultiProbeTopK(base, "vec_id",
          "embedding", q, "embedding", dim = 64, k = k, planes = planes))
        tMulti += (System.nanoTime() - t2) / 1e9
        rSingle += single.count(brute) / k.toDouble
        rMulti += multi.count(brute) / k.toDouble
      }
      val m = queryIds.size
      println(f"[prof] n=$n planes=$planes (autoPlanes) queries=$m k=$k")
      println(f"[prof] recall@$k single=${rSingle / m}%.3f multi=${rMulti / m}%.3f")
      println(f"[prof] mean probe sec brute=${tBrute / m}%.3f single=${tSingle / m}%.3f multi=${tMulti / m}%.3f")
      base.unpersist()
      spark.stop(); return
    }
    if (name == "planted_recall_profile") {
      // r13 (r12 verdict #1): ANN recall in the PRODUCTION regime —
      // planted near-dup clusters (gen_sf embeddings_planted: parent +
      // 9 twins at cosine ~U(0.90, 0.99)), where a twin query's true
      // top-10 is its cluster. Measures recall@10 / parent-hit / mean
      // probe sec for single-bucket LSH, blind Hamming-1 multi-probe,
      // query-directed budget probing (r13 operator) at two plane
      // sizings, and an IVF nprobe sweep — all over persisted indexes
      // (spec-pinned result-identical to the in-memory paths).
      //   sbt "runMain graft.Scratch planted_recall_profile target/sf1"
      import graft.ml.Similarity
      import spark.implicits._
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
        .select(col("vec_id"), col("embedding"), col("parent_id"))
      val corpus = e.select(col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val k = 10
      val nQ = if (args.length > 2) args(2).toInt else 40
      // one query twin per cluster (the smallest twin id per parent)
      val queries = e.filter(col("parent_id") >= 0)
        .groupBy(col("parent_id")).agg(min(col("vec_id")).as("vec_id"))
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .orderBy(col("vec_id")).limit(nQ)
        .select(col("vec_id"), col("parent_id"), col("embedding"))
        .collect()
      // directory-count cap for the PERSISTED layouts: 2^planes
      // partition directories each hold n/2^planes rows, and past ~2^12
      // dirs on this corpus the per-probe partition LISTING dominates
      // (measured: p11 probes 3.3 s vs p8 0.58 s at sf1 — same data,
      // 8x the directories; p14 at sf10 never finished a probe in
      // minutes). On a real object store the same wall exists as
      // LIST-call volume — a persisted index wants planes ≤
      // log2(corpus/bucket) AND a directory budget; multi-probe is
      // then the recall knob, which is exactly the frontier this
      // profile measures.
      val dirCap = 12
      val planesFine   = math.min(Similarity.autoPlanes(n, 16), dirCap)
      val planesCoarse = math.min(Similarity.autoPlanes(n, 128), dirCap)
      // optional 4th arg: comma-separated label substrings — only
      // matching methods run, and only the indexes they need build
      val methodFilter =
        if (args.length > 3) Some(args(3).split(",").toSeq) else None
      def want(label: String): Boolean =
        methodFilter.forall(_.exists(label.contains))
      def tmp(p: String) =
        java.nio.file.Files.createTempDirectory(p).toString
      lazy val lshF = {
        val d = tmp("graft_pr_lshf")
        Similarity.writeLshIndex(corpus, "vec_id", "embedding", d,
          dim = 64, planes = planesFine); d
      }
      lazy val lshC = {
        val d = tmp("graft_pr_lshc")
        Similarity.writeLshIndex(corpus, "vec_id", "embedding", d,
          dim = 64, planes = planesCoarse); d
      }
      lazy val ivfDir = {
        val d = tmp("graft_pr_ivf")
        Similarity.writeIvfIndex(corpus, "vec_id", "embedding", d,
          nlist = 0); d
      }
      lazy val nlist =
        Similarity.readIndexMeta(spark, ivfDir)("nlist").toInt
      def maxB(p: Int) = 1 + p + p * (p - 1) / 2
      type Q = org.apache.spark.sql.DataFrame
      def lshMethods(dir: => String, p: Int): Seq[(String, Q => Q)] = Seq(
        s"lsh_p${p}_single" -> ((q: Q) => Similarity.lshTopKFromIndex(
          spark, dir, "vec_id", "embedding", q, "embedding",
          dim = 64, k = k + 1, planes = p)),
        s"lsh_p${p}_h1" -> ((q: Q) => Similarity.lshMultiProbeTopKFromIndex(
          spark, dir, "vec_id", "embedding", q, "embedding",
          dim = 64, k = k + 1)),
        s"lsh_p${p}_b4" -> ((q: Q) => Similarity.lshMultiProbeTopKBudgetFromIndex(
          spark, dir, "vec_id", "embedding", q, "embedding",
          dim = 64, k = k + 1, probes = 4)),
        s"lsh_p${p}_b16" -> ((q: Q) => Similarity.lshMultiProbeTopKBudgetFromIndex(
          spark, dir, "vec_id", "embedding", q, "embedding",
          dim = 64, k = k + 1, probes = 16)),
        s"lsh_p${p}_b${maxB(p)}_h2full" -> ((q: Q) =>
          Similarity.lshMultiProbeTopKBudgetFromIndex(
            spark, dir, "vec_id", "embedding", q, "embedding",
            dim = 64, k = k + 1, probes = maxB(p))))
      val methods: Seq[(String, Q => Q)] =
        (lshMethods(lshF, planesFine) ++ lshMethods(lshC, planesCoarse) ++
          Seq(1, 2, 4, 8, 16).map(np => s"ivf_np$np" -> ((q: Q) =>
            Similarity.ivfTopKFromIndex(spark, ivfDir, "vec_id",
              "embedding", q, "embedding", nprobe = np, k = k + 1))))
          .filter { case (label, _) => want(label) }
      val rec = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      val ph  = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
      val sec = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      var bruteSec = 0.0
      queries.foreach { row =>
        val qid = row.getLong(0); val parent = row.getLong(1)
        val qdf = Seq((qid, row.getSeq[Float](2)))
          .toDF("vec_id", "embedding")
        // self-exclusion: the query is an indexed corpus row, so ask
        // for k+1 and drop it from every result, ground truth included
        def ids(df: Q): Set[Long] = df.select("vec_id").collect()
          .map(_.getLong(0)).filter(_ != qid).take(k).toSet
        val t0 = System.nanoTime()
        val truth = ids(Similarity.bruteForceTopK(corpus, "vec_id",
          "embedding", qdf, "embedding", k = k + 1))
        bruteSec += (System.nanoTime() - t0) / 1e9
        require(truth.contains(parent),
          s"planted parent $parent not in brute top-$k of twin $qid")
        methods.foreach { case (label, f) =>
          val t1 = System.nanoTime()
          val got = ids(f(qdf))
          sec(label) += (System.nanoTime() - t1) / 1e9
          rec(label) += got.intersect(truth).size / k.toDouble
          if (got.contains(parent)) ph(label) += 1
        }
      }
      val m = queries.length
      val nlistStr =
        if (methods.exists(_._1.startsWith("ivf"))) nlist.toString else "-"
      println(f"[prof] n=$n queries=$m k=$k planesFine=$planesFine " +
        f"planesCoarse=$planesCoarse nlist=$nlistStr " +
        f"brute_mean_sec=${bruteSec / m}%.3f")
      methods.foreach { case (label, _) =>
        val frac =
          if (label.startsWith("ivf_np"))
            label.stripPrefix("ivf_np").toDouble / nlist
          else {
            val p = label.split('_')(1).stripPrefix("p").toInt
            val b = label.split('_')(2) match {
              case "single" => 1.0
              case "h1"     => 1.0 + p
              case s        => s.stripPrefix("b").toDouble
            }
            b / math.pow(2.0, p)
          }
        println(f"[prof] $label%-22s recall@$k=${rec(label) / m}%.3f " +
          f"parent_hit=${ph(label).toDouble / m}%.3f " +
          f"mean_sec=${sec(label) / m}%.3f est_scan_frac=$frac%.4f")
      }
      corpus.unpersist()
      spark.stop(); return
    }
    if (name == "planted_pair_recall_profile") {
      // r13: PAIR-level recall of the dedup-family candidate
      // generators on planted clusters — the q53/q86 value claim at
      // production thresholds. Ground truth = intra-cluster pairs
      // with exact cosine >= minCos (computed from the parent
      // grouping, no all-pairs scan); methods = single-table LSH at
      // the auto sizing vs banded OR-amplification.
      //   sbt "runMain graft.Scratch planted_pair_recall_profile target/sf1"
      import graft.ml.Similarity
      val minCos = if (args.length > 2) args(2).toDouble else 0.85
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
      val n = e.count()
      // cluster members: every twin plus its parent, keyed by parent
      val twins = e.filter(col("parent_id") >= 0)
        .select(col("vec_id"), col("parent_id"))
      val members = twins.unionByName(
        twins.select(col("parent_id")).distinct()
          .select(col("parent_id").as("vec_id"), col("parent_id")))
      val withVec = members.join(
        e.select(col("vec_id"), col("embedding")), "vec_id")
      val truth = withVec.as("a").join(withVec.as("b"),
          col("a.parent_id") === col("b.parent_id") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.dot(
            Similarity.normalize(col("a.embedding")),
            Similarity.normalize(col("b.embedding"))).as("c"))
        .filter(col("c") >= minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[prof] n=$n planted truth pairs at cos>=$minCos: ${truth.size}")
      val planesAuto = Similarity.autoPlanes(n, 128)
      def run(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = f.select(col("id_a"), col("id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val hit = truth.count(got)
        println(f"[prof] $label%-28s pair_recall=${hit.toDouble / truth.size}%.3f " +
          f"pairs_returned=${got.size} sec=$dt%.1f")
      }
      run(s"single_p$planesAuto",
        Similarity.nearDupPairs(e, "vec_id", "embedding", dim = 64,
          minCosine = minCos, targetBucketSize = Some(128L),
          bands = 1))
      // the r14 recall-sized DEFAULT — what a bare call now gets
      run(s"default_auto",
        Similarity.nearDupPairs(e, "vec_id", "embedding", dim = 64,
          minCosine = minCos, targetBucketSize = Some(128L)))
      // optional 4th arg: comma list of B:r band configs (candidate
      // volume is B·n²/2^r — r must grow with the corpus, and
      // bandsForRecall then asks for the extra bands)
      val configs =
        if (args.length > 3) args(3).split(",").toSeq.map { s =>
          val Array(b, r) = s.split(":"); (b.toInt, r.toInt)
        }
        else Seq((4, planesAuto), (6, 6),
          (Similarity.bandsForRecall(minCos, 6, 0.95), 6)).distinct
      configs.foreach { case (b, r) =>
        run(s"banded_B${b}_r$r",
          Similarity.nearDupPairsBanded(e, "vec_id", "embedding",
            dim = 64, minCosine = minCos, bands = b,
            planesPerBand = r))
      }
      spark.stop(); return
    }
    if (name == "isd_phase_profile") {
      // r17 optimization round: phase-level wall clock of the q215
      // bulk shape (init + 3 bulk ingests + one publishing survivors
      // closure) — which phase owns the bench row's seconds.
      //   sbt "runMain graft.Scratch isd_phase_profile /root/testdata/sf0.1"
      import graft.ml.IncrementalSemDedup
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      (0 until 2).foreach { round =>
        val root = s"target/scratch_isdp_${System.nanoTime()}"
        val store = s"$root/store"
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        timed(s"[$round] init") {
          IncrementalSemDedup.initStore(spark, store, dim = 64,
            minCosine = 0.35, planesPerBand = 4, bands = 3,
            idCol = "vec_id")
        }
        (0 to 2).foreach { k =>
          timed(s"[$round] ingest$k") {
            IncrementalSemDedup.ingestOnly(spark, store,
              e.filter(col("vec_id") % 3 === k), "vec_id", "embedding")
          }
        }
        timed(s"[$round] pairs-count") {
          spark.read.parquet(s"$store/pairs").count()
        }
        timed(s"[$round] cc-only") {
          graft.ml.Graph.connectedComponents(
            spark.read.parquet(s"$store/pairs"), "id_a", "id_b")
            .queryExecution.toRdd.count()
        }
        timed(s"[$round] survivors") {
          IncrementalSemDedup.survivors(spark, store)
            .localCheckpoint(true).count()
        }
        timed(s"[$round] survivors-again") {
          IncrementalSemDedup.survivors(spark, store)
            .localCheckpoint(true).count()
        }
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      }
      spark.stop(); return
    }
    if (name == "incremental_closure_profile") {
      // r16 verdict #1 artifact: per-ingest EMISSION cost with the
      // persisted-label closure (merge only the batch's new pairs)
      // vs the r15 shape (full connected components over the
      // accumulated pair graph per emission — replayed here as a
      // public-API twin after each batch). The label path should stay
      // flat across batches where the full closure grows.
      //   sbt "runMain graft.Scratch incremental_closure_profile target/sf1"
      import graft.ml.{Graph, IncrementalSemDedup, Similarity}
      val minCos  = if (args.length > 2) args(2).toDouble else 0.85
      val batches = if (args.length > 3) args(3).toInt else 10
      val pinnedR = if (args.length > 4) args(4).toInt else 0
      val pinnedB = if (args.length > 5) args(5).toInt else 0
      val planted = new java.io.File(s"$sfDir/embeddings_planted.parquet")
      val e = spark.read.parquet(
          if (planted.exists()) planted.getPath
          else s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val r = if (pinnedR > 0) pinnedR else Similarity.autoPlanes(n, 128)
      val store = s"target/scratch_icc_${System.nanoTime()}/store"
      val b = IncrementalSemDedup.initStore(spark, store, dim = 64,
        minCosine = minCos, planesPerBand = r, bands = pinnedB,
        idCol = "vec_id")
      println(s"[prof] n=$n family B=$b r=$r cos>=$minCos batches=$batches")
      (0 until batches).foreach { k =>
        val part = e.filter(pmod(col("vec_id"), lit(batches)) === k)
        val tI0 = System.nanoTime()
        // emission-path shape: labels maintained per batch (the bulk
        // default skips upkeep and closes once in survivors)
        IncrementalSemDedup.ingestOnly(spark, store, part,
          "vec_id", "embedding", maintainLabels = true)
        val tIngest = (System.nanoTime() - tI0) / 1e9
        // label-path emission: survivors() reads components/ — the
        // closure cost a streaming consumer now pays per micro-batch
        val tL0 = System.nanoTime()
        val nsurv = IncrementalSemDedup.survivors(spark, store).count()
        val tLabels = (System.nanoTime() - tL0) / 1e9
        // the r15 twin: full CC over everything in pairs/ (what every
        // emission used to recompute)
        val tC0 = System.nanoTime()
        val pairsSoFar = spark.read.parquet(s"$store/pairs")
        val losers = Graph.connectedComponents(pairsSoFar,
            "id_a", "id_b")
          .filter(col("id") =!= col("component")).count()
        val tFullCc = (System.nanoTime() - tC0) / 1e9
        println(f"[prof] batch_$k ingest=$tIngest%.1f s " +
          f"label_emission=$tLabels%.2f s full_cc_twin=$tFullCc%.2f s " +
          s"survivors=$nsurv losers=$losers")
      }
      spark.stop(); return
    }
    if (name == "guard_prune_profile") {
      // r16 verdict #2 artifact: the replay guard's store-id scan now
      // prunes to the batch's id range — with monotone (per-batch
      // disjoint) ids, parquet row-group stats skip every
      // non-overlapping file, so a replayed micro-batch's guard cost
      // should stay FLAT as the store grows 10×.
      //   sbt "runMain graft.Scratch guard_prune_profile target/sf1"
      import graft.ml.IncrementalSemDedup
      val batches = if (args.length > 2) args(2).toInt else 10
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val store = s"target/scratch_gp_${System.nanoTime()}/store"
      IncrementalSemDedup.initStore(spark, store, dim = 64,
        minCosine = 0.85, planesPerBand = 8, bands = 4, idCol = "vec_id")
      def batchDf(k: Int) = e
        .withColumn("vec_id", col("vec_id") + lit(k * 100000000L))
      def timedReplay(label: String): Unit = {
        // a fully-replayed first batch: every id filters out, so the
        // wall is the guard (+ a constant empty-ingest tail)
        val t0 = System.nanoTime()
        IncrementalSemDedup.ingestOnly(spark, store, batchDf(0),
          "vec_id", "embedding", skipExistingIds = true)
        println(f"[prof] $label replay_guard_wall=" +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      (0 until batches).foreach { k =>
        val t0 = System.nanoTime()
        IncrementalSemDedup.ingestOnly(spark, store, batchDf(k),
          "vec_id", "embedding", checkIdCollision = false)
        println(f"[prof] ingest_$k: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        if (k == 0) timedReplay("store_1x")
      }
      timedReplay(s"store_${batches}x")
      spark.stop(); return
    }
    if (name == "hybrid_recall_profile") {
      // r16 verdict #5 artifact: union-of-generators recall at
      // production cost in the low-threshold regime where the two
      // parents miss DIFFERENT pairs (ivf_pairs_r15 measured banding
      // capped at 0.779 total recall, IVF-np2 at 0.21 total / 1.0
      // cluster recall at minCosine 0.35).
      //   sbt "runMain graft.Scratch hybrid_recall_profile target/sf1 0.35"
      import graft.ml.Similarity
      val minCos = if (args.length > 2) args(2).toDouble else 0.35
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
      val n = e.count()
      val twins = e.filter(col("parent_id") >= 0)
        .select(col("vec_id"), col("parent_id"))
      val members = twins.unionByName(
        twins.select(col("parent_id")).distinct()
          .select(col("parent_id").as("vec_id"), col("parent_id")))
      val withVec = members.join(
        e.select(col("vec_id"), col("embedding")), "vec_id")
      val truth = withVec.as("a").join(withVec.as("b"),
          col("a.parent_id") === col("b.parent_id") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.dot(
            Similarity.normalize(col("a.embedding")),
            Similarity.normalize(col("b.embedding"))).as("c"))
        .filter(col("c") >= minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      val tEx0 = System.nanoTime()
      val exact = Similarity.nearDupPairsExact(e, "vec_id", "embedding",
          minCosine = minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      println(f"[prof] n=$n planted=${truth.size} exact=${exact.size} " +
        f"(brute ${(System.nanoTime() - tEx0) / 1e9}%.1f s)")
      def run(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = f.select(col("id_a"), col("id_b"))
          .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $label%-24s planted_recall=" +
          f"${truth.count(got).toDouble / truth.size}%.3f total_recall=" +
          f"${exact.count(got).toDouble / exact.size}%.3f " +
          f"pairs=${got.size} sec=$dt%.1f")
      }
      run("banded_default",
        Similarity.nearDupPairs(e, "vec_id", "embedding", dim = 64,
          minCosine = minCos, targetBucketSize = Some(128L),
          knownCount = Some(n)))
      run("ivf_auto_np2",
        Similarity.nearDupPairsIvf(e, "vec_id", "embedding",
          minCosine = minCos, nlist = 0, nprobe = 2,
          knownCount = Some(n)))
      val r = Similarity.autoPlanes(n, 128)
      run("hybrid_np2",
        Similarity.nearDupPairsHybrid(e, "vec_id", "embedding",
          dim = 64, minCosine = minCos, planesPerBand = r,
          nlist = 0, nprobe = 2, knownCount = Some(n)))
      spark.stop(); return
    }
    if (name == "hybrid_recall_curve_profile") {
      // r16 verdict #2: the union generator's recall-vs-cost FRONTIER
      // at the low-threshold regime — hybrid_recall_r16 had exactly
      // one production point (np2: 0.823 @ 68 s). Sweep nprobe
      // {2, 4, 8, 16}, a SECOND-seed capped band family (does another
      // independent 64-band draw buy more than more probes?), and the
      // three-stream union, against the brute crossover.
      //   sbt "runMain graft.Scratch hybrid_recall_curve_profile target/sf1 0.35"
      import graft.ml.Similarity
      val minCos = if (args.length > 2) args(2).toDouble else 0.35
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
      val n = e.count()
      val tEx0 = System.nanoTime()
      val exact = Similarity.nearDupPairsExact(e, "vec_id", "embedding",
          minCosine = minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      println(f"[prof] n=$n exact=${exact.size} " +
        f"(brute ${(System.nanoTime() - tEx0) / 1e9}%.1f s)")
      def run(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = f.select(col("id_a"), col("id_b"))
          .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $label%-22s total_recall=" +
          f"${exact.count(got).toDouble / exact.size}%.3f " +
          f"pairs=${got.size} sec=$dt%.1f")
      }
      val r = Similarity.autoPlanes(n, 128)
      Seq(2, 4, 8, 16).foreach { np =>
        run(s"hybrid_np$np",
          Similarity.nearDupPairsHybrid(e, "vec_id", "embedding",
            dim = 64, minCosine = minCos, planesPerBand = r,
            nlist = 0, nprobe = np, knownCount = Some(n)))
      }
      // a second INDEPENDENT capped band family (fresh plane draw):
      // candidates union in front of the shared verify, exactly like
      // the hybrid's IVF stream
      def banded2(seed2: Long) =
        Similarity.bandedCandidatesRaw(e, "vec_id", "embedding", 64,
            64, r, 42L, 0L, 3)
          .unionByName(Similarity.bandedCandidatesRaw(e, "vec_id",
            "embedding", 64, 64, r, seed2, 0L, 3))
      run("banded_two_seed",
        Similarity.verifyThenDedup(e, "vec_id", "embedding",
          banded2(4242L), minCos, n, 2000000L))
      // all three streams: two band families + IVF np2 cells
      val cents = Similarity.ivfCentroids(e.select(col("vec_id"),
        col("embedding")), "vec_id", "embedding",
        Similarity.autoNlist(n))
      run("hybrid_np2_two_seed",
        Similarity.verifyThenDedup(e, "vec_id", "embedding",
          banded2(4242L).unionByName(Similarity.ivfCandidatesRaw(
            e, "vec_id", "embedding", cents, 2)),
          minCos, n, 2000000L))
      spark.stop(); return
    }
    if (name == "store_hybrid_recall_profile") {
      // r16 verdict #3 spot: the incremental store's total pair recall
      // in the low-threshold regime — banded-only (the committed-
      // family ceiling) vs the committed IVF leg at production probes.
      //   sbt "runMain graft.Scratch store_hybrid_recall_profile target/sf1 0.35 4"
      import graft.ml.{IncrementalSemDedup, Similarity}
      val minCos  = if (args.length > 2) args(2).toDouble else 0.35
      val batches = if (args.length > 3) args(3).toInt else 4
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val tEx0 = System.nanoTime()
      val exact = Similarity.nearDupPairsExact(e, "vec_id", "embedding",
          minCosine = minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      println(f"[prof] n=$n exact=${exact.size} " +
        f"(brute ${(System.nanoTime() - tEx0) / 1e9}%.1f s)")
      val r = Similarity.autoPlanes(n, 128)
      val b = Similarity.autoBands(minCos, r)
      val cents = Similarity.ivfCentroids(e, "vec_id", "embedding",
        Similarity.autoNlist(n))
      println(s"[prof] family ${b}x$r, nlist=${cents.length}, " +
        s"$batches batches")
      Seq(("banded_only", 0), ("hybrid_np2", 2), ("hybrid_np4", 4))
        .foreach { case (tag, np) =>
          val st = s"target/scratch_isd_${System.nanoTime()}/store"
          IncrementalSemDedup.initStore(spark, st, dim = 64,
            minCosine = minCos, planesPerBand = r, bands = b,
            idCol = "vec_id",
            ivfClusters = if (np > 0) cents else Seq.empty, nprobe = np)
          val t0 = System.nanoTime()
          (0 until batches).foreach { k =>
            IncrementalSemDedup.ingestOnly(spark, st,
              e.filter(col("vec_id") % batches === k),
              "vec_id", "embedding")
          }
          val sv = IncrementalSemDedup.survivors(spark, st).count()
          val dt = (System.nanoTime() - t0) / 1e9
          val got = spark.read.parquet(s"$st/pairs")
            .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
          println(f"[prof] $tag%-14s total_recall=" +
            f"${exact.count(got).toDouble / exact.size}%.3f " +
            f"pairs=${got.size} survivors=$sv sec=$dt%.1f " +
            f"(recall floor ${IncrementalSemDedup.familyPairRecall(
              spark, st)}%.3f in the manifest)")
        }
      spark.stop(); return
    }
    if (name == "rebuild_order_profile") {
      // r16 verdict #1 spot: rebuildStore's pair regeneration now
      // rides verifyThenDedup — measure the full rebuild wall at the
      // q218 shape scaled to sf1, then compare the two dedup orders
      // like-for-like over the SAME rebuilt codes.
      //   sbt "runMain graft.Scratch rebuild_order_profile target/sf1 0.35"
      import graft.ml.{IncrementalSemDedup, Similarity}
      val minCos = if (args.length > 2) args(2).toDouble else 0.35
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val st = s"target/scratch_isd_rb_${System.nanoTime()}/store"
      IncrementalSemDedup.initStore(spark, st, dim = 64,
        minCosine = 0.5, planesPerBand = 4, bands = 2, idCol = "vec_id")
      (0 to 1).foreach { k =>
        IncrementalSemDedup.ingestOnly(spark, st,
          e.filter(col("vec_id") % 2 === k), "vec_id", "embedding")
      }
      val r = Similarity.autoPlanes(n, 128)
      val b = Similarity.autoBands(minCos, r)
      val t0 = System.nanoTime()
      IncrementalSemDedup.rebuildStore(spark, st, minCosine = minCos,
        planesPerBand = r, bands = b)
      println(f"[prof] rebuildStore (verify-then-distinct) to " +
        f"${b}x$r/$minCos: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // like-for-like over the rebuilt codes: regeneration only
      val rows = spark.read.parquet(s"$st/rows")
      val sk = rows.select(col("id"),
        posexplode(col("codes")).as(Seq("__band", "__code")))
      val cand = sk.as("a").join(sk.as("x"),
          col("a.__band") === col("x.__band") &&
            col("a.__code") === col("x.__code") &&
            col("a.id") < col("x.id"))
        .select(col("a.id").as("id_a"), col("x.id").as("id_b"))
      val t1 = System.nanoTime()
      val nNew = Similarity.verifyThenDedup(rows, "id", "u", cand,
        minCos, n, 2000000L, preNormalized = true).count()
      println(f"[prof] regen verify_then_distinct: pairs=$nNew " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s")
      val u0 = rows.select(col("id"), col("u"))
      val uB = broadcast(u0)
      val t2 = System.nanoTime()
      val nOld = cand.distinct()
        .join(uB.select(col("id").as("id_a"), col("u").as("ua")),
          Seq("id_a"))
        .join(uB.select(col("id").as("id_b"), col("u").as("ub")),
          Seq("id_b"))
        .filter(graft.ml.Similarity.dot(col("ua"), col("ub")) >= minCos)
        .count()
      println(f"[prof] regen distinct_first:       pairs=$nOld " +
        f"${(System.nanoTime() - t2) / 1e9}%.1f s count_equal=" +
        s"${nNew == nOld}")
      spark.stop(); return
    }
    if (name == "banded_dedup_order_profile") {
      // Experiment behind a possible r16 plan change: the hybrid
      // artifact measured verify-then-distinct over a SUPERSET of the
      // banded candidates (banded ∪ IVF) at 68 s where the banded
      // default's distinct-FIRST costs 98.6 s — under the broadcast
      // verify, deduping the multiplied candidate stream exchanges
      // every colliding pair (including sub-threshold ones) where
      // verify-then-distinct exchanges only the multiplied SURVIVOR
      // set. Measure both orders on the banded candidates alone at
      // the capped low-threshold regime AND the recall-sized high
      // threshold before touching the audited default.
      //   sbt "runMain graft.Scratch banded_dedup_order_profile target/sf1"
      // At sf10 the 0.35 pair set is tens of millions of rows — pass
      // "count" as the third arg to compare row counts instead of
      // collecting pair sets to the driver.
      import graft.ml.Similarity
      val countOnly = args.length > 2 && args(2) == "count"
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      def run(label: String, f: => org.apache.spark.sql.DataFrame): Any = {
        val t0 = System.nanoTime()
        val got: Any =
          if (countOnly) f.count()
          else f.select(col("id_a"), col("id_b"))
            .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
        val sz = got match {
          case s: Set[_] => s.size.toLong
          case c: Long   => c
        }
        println(f"[prof] $label%-34s pairs=$sz " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        got
      }
      Seq((0.35, "capped64"), (0.85, "sized")).foreach { case (mc, tag) =>
        val r = Similarity.autoPlanes(n, 128)
        val b = if (mc < 0.5) 64
          else Similarity.bandsForRecall(mc, r, 0.95)
        println(s"[prof] --- minCos=$mc family ${b}x$r")
        val df = run(s"${tag}_distinct_first",
          Similarity.nearDupPairsBanded(e, "vec_id", "embedding",
            dim = 64, minCosine = mc, bands = b, planesPerBand = r,
            knownCount = Some(n)))
        val vf = run(s"${tag}_verify_then_distinct",
          Similarity.verifyThenDedup(e, "vec_id", "embedding",
            Similarity.bandedCandidatesRaw(e, "vec_id", "embedding",
              64, b, r, 42L, 0L, 3),
            mc, n, 2000000L))
        // label what the comparison actually proves (r16 advice): in
        // count mode df/vf are row COUNTS — equal counts with
        // different pairs would still print true, so don't let the
        // artifact read as set equality
        println(s"[prof] ${tag} " +
          (if (countOnly) s"count_equal=${df == vf}"
           else s"set_equal=${df == vf}"))
      }
      spark.stop(); return
    }
    if (name == "ivf_from_index_profile") {
      // r16 verdict #6 artifact: repeated pair mining over a persisted
      // IVF index skips the k-means build — from-index wall vs the
      // in-memory operator, sets asserted identical.
      //   sbt "runMain graft.Scratch ivf_from_index_profile target/sf1 0.35"
      import graft.ml.Similarity
      val minCos = if (args.length > 2) args(2).toDouble else 0.35
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val nlist = Similarity.autoNlist(n)
      val idx = s"target/scratch_ivfidx_${System.nanoTime()}/idx"
      val tB0 = System.nanoTime()
      Similarity.writeIvfIndex(e, "vec_id", "embedding", idx,
        nlist = nlist)
      println(f"[prof] index build (nlist=$nlist): " +
        f"${(System.nanoTime() - tB0) / 1e9}%.1f s")
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id_a"), col("id_b"))
          .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      val tM0 = System.nanoTime()
      val mem = pairsOf(Similarity.nearDupPairsIvf(e, "vec_id",
        "embedding", minCosine = minCos, nlist = nlist, nprobe = 2,
        knownCount = Some(n)))
      val tMem = (System.nanoTime() - tM0) / 1e9
      val tI0 = System.nanoTime()
      val fromIdx = pairsOf(Similarity.nearDupPairsIvfFromIndex(spark,
        idx, "vec_id", "embedding", minCosine = minCos, nprobe = 2))
      val tIdx = (System.nanoTime() - tI0) / 1e9
      println(f"[prof] in_memory=$tMem%.1f s (trains k-means) " +
        f"from_index=$tIdx%.1f s pairs=${fromIdx.size} " +
        s"equal=${mem == fromIdx}")
      spark.stop(); return
    }
    if (name == "incremental_semdedup_profile") {
      // r15 verdict #1 artifact: per-increment cost of band-store
      // incremental semDedup vs the full recompute each arrival used
      // to pay. Same committed family on both sides, survivor sets
      // asserted equal.
      //   sbt "runMain graft.Scratch incremental_semdedup_profile target/sf1"
      import graft.ml.{IncrementalSemDedup, Similarity}
      val minCos  = if (args.length > 2) args(2).toDouble else 0.85
      val batches = if (args.length > 3) args(3).toInt else 10
      // planted table when present: plain sf1 noise has ZERO pairs at
      // 0.85, which makes the equality vacuous and the pair store
      // empty — the planted clusters exercise the real store
      val planted = new java.io.File(s"$sfDir/embeddings_planted.parquet")
      val e = spark.read.parquet(
          if (planted.exists()) planted.getPath
          else s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val r = Similarity.autoPlanes(n, 128)
      val store = s"target/scratch_isd_${System.nanoTime()}/store"
      val b = IncrementalSemDedup.initStore(spark, store, dim = 64,
        minCosine = minCos, planesPerBand = r, idCol = "vec_id")
      println(s"[prof] n=$n family B=$b r=$r cos>=$minCos batches=$batches")
      var totalIngest = 0.0
      // the last batch holds back a ~2.5% "daily arrival" slice so the
      // tail measurement is the production shape: a SMALL increment
      // against a big store (the 10%-increment means below understate
      // the win — ingest cost scales with the batch, full recompute
      // with the corpus)
      val smallSel = pmod(xxhash64(col("vec_id")), lit(4)) === 0
      (0 until batches).foreach { k =>
        val t0 = System.nanoTime()
        val part = e.filter(pmod(col("vec_id"), lit(batches)) === k)
        val surv = IncrementalSemDedup.ingest(spark, store,
          if (k == batches - 1) part.filter(!smallSel) else part,
          "vec_id", "embedding").count()
        val dt = (System.nanoTime() - t0) / 1e9; totalIngest += dt
        println(f"[prof] ingest_$k: $dt%.1f s batch_survivors=$surv")
      }
      val tSmall0 = System.nanoTime()
      val smallBatch = e.filter(
        pmod(col("vec_id"), lit(batches)) === (batches - 1) && smallSel)
      val smallSurv = IncrementalSemDedup.ingest(spark, store,
        smallBatch, "vec_id", "embedding").count()
      val tSmall = (System.nanoTime() - tSmall0) / 1e9
      println(f"[prof] small_increment (${smallBatch.count()} rows): " +
        f"$tSmall%.1f s survivors=$smallSurv")
      val tIncr0 = System.nanoTime()
      val incr = IncrementalSemDedup.survivors(spark, store)
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().toSet
      val tIncr = (System.nanoTime() - tIncr0) / 1e9
      // what the last arrival costs WITHOUT the store: one full
      // recompute over the whole corpus at the same family
      val tFull0 = System.nanoTime()
      val full = Similarity.semDedup(e, "vec_id", "embedding",
          dim = 64, minCosine = minCos, planes = r, bands = b,
          knownCount = Some(n))
        .select(col("vec_id"))
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().toSet
      val tFull = (System.nanoTime() - tFull0) / 1e9
      println(f"[prof] survivors incr=${incr.size} full=${full.size} " +
        s"equal=${incr == full}")
      println(f"[prof] total_ingest=$totalIngest%.1f s " +
        f"(mean/batch ${totalIngest / batches}%.1f) survivors_call=$tIncr%.1f " +
        f"full_recompute=$tFull%.1f  per_arrival_ratio=" +
        f"${totalIngest / batches / tFull}%.3f")
      spark.stop(); return
    }
    if (name == "ivf_pairs_profile") {
      // r15 verdict #5 artifact: planted-pair recall + wall of the
      // IVF cluster-local pair generator at the LOW threshold where
      // the banded default caps out (q197's regime), vs that capped
      // default. Truth = intra-cluster planted pairs at the
      // threshold, the r13 planted_pair_recall methodology.
      //   sbt "runMain graft.Scratch ivf_pairs_profile target/sf1 0.35"
      import graft.ml.Similarity
      val minCos = if (args.length > 2) args(2).toDouble else 0.35
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
      val n = e.count()
      val twins = e.filter(col("parent_id") >= 0)
        .select(col("vec_id"), col("parent_id"))
      val members = twins.unionByName(
        twins.select(col("parent_id")).distinct()
          .select(col("parent_id").as("vec_id"), col("parent_id")))
      val withVec = members.join(
        e.select(col("vec_id"), col("embedding")), "vec_id")
      val truth = withVec.as("a").join(withVec.as("b"),
          col("a.parent_id") === col("b.parent_id") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.dot(
            Similarity.normalize(col("a.embedding")),
            Similarity.normalize(col("b.embedding"))).as("c"))
        .filter(col("c") >= minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      println(s"[prof] n=$n planted truth pairs at cos>=$minCos: " +
        s"${truth.size}")
      // FULL exact truth at the threshold (planted truth only covers
      // the high-cosine clusters; at 0.35 the mass is mid-cosine
      // noise pairs — exactly the regime the banding cap warns about)
      val tEx0 = System.nanoTime()
      val exact = Similarity.nearDupPairsExact(e, "vec_id", "embedding",
          minCosine = minCos)
        .select(col("id_a"), col("id_b"))
        .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
      println(f"[prof] exact truth pairs: ${exact.size} " +
        f"(${(System.nanoTime() - tEx0) / 1e9}%.1f s brute)")
      def run(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = f.select(col("id_a"), col("id_b"))
          .collect().map(rr => (rr.getLong(0), rr.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $label%-24s planted_recall=" +
          f"${truth.count(got).toDouble / truth.size}%.3f total_recall=" +
          f"${exact.count(got).toDouble / exact.size}%.3f " +
          f"pairs=${got.size} sec=$dt%.1f")
      }
      // the capped banded default (warns its recall floor here)
      run("banded_default",
        Similarity.nearDupPairs(e, "vec_id", "embedding", dim = 64,
          minCosine = minCos, targetBucketSize = Some(128L),
          knownCount = Some(n)))
      Seq(1, 2, 4).foreach { np =>
        run(s"ivf_auto_np$np",
          Similarity.nearDupPairsIvf(e, "vec_id", "embedding",
            minCosine = minCos, nlist = 0, nprobe = np,
            knownCount = Some(n)))
      }
      spark.stop(); return
    }
    if (name == "skew_cluster_profile") {
      // r15 verdict #7 artifact: ONE giant near-dup cluster (5–10k
      // boilerplate embeddings, mutually cos ≈ 1 but NOT
      // byte-identical — exact contraction can't touch them) against
      // the banded default, then the per-bucket cap remedy.
      //   sbt "runMain graft.Scratch skew_cluster_profile target/sf1 5000"
      import graft.ml.Similarity
      val k = if (args.length > 2) args(2).toInt else 5000
      val minCos = if (args.length > 3) args(3).toDouble else 0.85
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val n0 = e.count()
      // the boilerplate cluster: k near-copies of vec 0, each with a
      // deterministic per-(member, element) relative jitter of ~1e-3
      // — mutual cosine ≈ 0.999998, never byte-identical
      val v0 = typedlit(e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble))
      val cluster = spark.range(k.toLong)
        .select((col("id") + 10000000L).as("vec_id"),
          transform(v0, (x, j) => (x * (lit(1.0) +
            (pmod(xxhash64(col("id"), j), lit(1000)).cast("double")
              - 500.0) / 500000.0)).cast("float")).as("embedding"))
      val planted = e.unionByName(cluster)
      def run(label: String, f: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val pairs = f.count()
        println(f"[prof] $label%-28s pairs=$pairs " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      }
      println(s"[prof] base n=$n0 cluster=$k")
      run("base_default",
        Similarity.nearDupPairs(e, "vec_id", "embedding", dim = 64,
          minCosine = minCos, targetBucketSize = Some(128L),
          knownCount = Some(n0)))
      run("cluster_default",
        Similarity.nearDupPairs(planted, "vec_id", "embedding",
          dim = 64, minCosine = minCos, targetBucketSize = Some(128L),
          knownCount = Some(n0 + k)))
      Seq(256L, 1024L).foreach { cap =>
        run(s"cluster_cap$cap",
          Similarity.nearDupPairs(planted, "vec_id", "embedding",
            dim = 64, minCosine = minCos,
            targetBucketSize = Some(128L), knownCount = Some(n0 + k),
            maxBucketSize = cap))
      }
      // what dedup actually needs from the cluster: connectivity —
      // semDedup under the cap must still drop the whole cluster
      // minus one (every member collides with the kept min-ids in
      // SOME band w.h.p.)
      val t0 = System.nanoTime()
      val surv = Similarity.semDedup(planted, "vec_id", "embedding",
          dim = 64, minCosine = minCos, targetBucketSize = Some(128L),
          knownCount = Some(n0 + k), maxBucketSize = 1024L)
        .filter(col("vec_id") >= 10000000L).count()
      println(f"[prof] capped semDedup keeps $surv of $k cluster " +
        f"members (sec=${(System.nanoTime() - t0) / 1e9}%.1f)")
      spark.stop(); return
    }
    if (name == "pq_recall_profile") {
      // r13: PQ-family recall on the planted clusters (the
      // planted_recall_profile discipline applied to the new
      // quantized paths) plus the BYTE story that motivates PQ at
      // 100 TB — the persisted IVF-PQ vectors/ table vs the raw
      // parquet. Flat PQ trains/encodes ONCE per (m, ksub) config and
      // reuses the encoded table per query (the production shape —
      // pqTopK's internal training is a per-call convenience);
      // IVF-PQ probes the persisted index with an nprobe sweep, with
      // and without the FAISS-refine rerank against the raw corpus.
      //   sbt "runMain graft.Scratch pq_recall_profile target/sf1"
      import graft.ml.{ProductQuantization => PQ, Similarity}
      import graft.functions.{PqAdc, PqEncode}
      import spark.implicits._
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
        .select(col("vec_id"), col("embedding"), col("parent_id"))
      val corpus = e.select(col("vec_id"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = corpus.count()
      val k = 10
      val nQ = if (args.length > 2) args(2).toInt else 40
      val queries = e.filter(col("parent_id") >= 0)
        .groupBy(col("parent_id")).agg(min(col("vec_id")).as("vec_id"))
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .orderBy(col("vec_id")).limit(nQ)
        .select(col("vec_id"), col("parent_id"), col("embedding"))
        .collect()
      def tmp(p: String) =
        java.nio.file.Files.createTempDirectory(p).toString
      val corpusNorm = corpus
        .withColumn("__nvec", Similarity.normalize(col("embedding")))
      def normQ(v: Seq[Float]): Array[Double] = {
        val d = v.map(_.toDouble).toArray
        val nrm = math.sqrt(d.map(x => x * x).sum)
        d.map(_ / nrm)
      }
      type Q = org.apache.spark.sql.DataFrame
      // flat PQ: one train+encode per ksub, persisted, reused per query
      val flatKs = if (args.length > 3)
        args(3).split(",").toSeq.map(_.toInt) else Seq(16, 64, 256)
      val flats = flatKs.map { ks =>
        val books =
          PQ.pqCodebooks(corpusNorm, "vec_id", "__nvec", 8, ks, iters = 2)
        val encoded = corpusNorm
          .withColumn("__pq_code",
            PqEncode.pqEncode(col("__nvec"), books))
          .select(col("vec_id"), col("embedding"), col("__pq_code"))
          .persist()
        encoded.count()
        (ks, books, encoded)
      }
      def flatProbe(encoded: Q, books: Array[Array[Array[Double]]],
          qn: Array[Double], qdf: Q, rerank: Int): Q = {
        val table = PQ.adcTable(qn, books)
        val scored = encoded.withColumn("score",
          PqAdc.pqAdc(col("__pq_code"), table))
        if (rerank <= 0)
          scored.orderBy(col("score").desc, col("vec_id").asc)
            .limit(k + 1).select(col("vec_id"), col("score"))
        else
          scored.orderBy(col("score").desc, col("vec_id").asc)
            .limit(rerank)
            .crossJoin(broadcast(qdf.select(col("embedding").as("__qvec"))))
            .withColumn("score",
              Similarity.cosine(col("embedding"), col("__qvec")))
            .orderBy(col("score").desc, col("vec_id").asc)
            .limit(k + 1).select(col("vec_id"), col("score"))
      }
      // persisted IVF-PQ (auto nlist, m = 8, ksub = 64)
      val ivfpqDir = tmp("graft_pq_ivfpq")
      PQ.writeIvfPqIndex(corpus, "vec_id", "embedding", ivfpqDir,
        nlist = 0, m = 8, ksub = 64)
      val nlist = Similarity.readIndexMeta(spark, ivfpqDir)("nlist").toInt
      def bytesOf(path: String): Long = {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .getContentSummary(p).getLength
      }
      val codeBytes = bytesOf(s"$ivfpqDir/vectors")
      val rawBytes  = bytesOf(s"$sfDir/embeddings_planted.parquet")
      lazy val handle = PQ.openIvfPqIndex(spark, ivfpqDir)
      val methods: Seq[(String, (Q, Array[Double]) => Q)] =
        flats.flatMap { case (ks, books, encoded) => Seq(
          s"pq_m8_k$ks" -> ((qdf: Q, qn: Array[Double]) =>
            flatProbe(encoded, books, qn, qdf, 0)),
          s"pq_m8_k${ks}_rr50" -> ((qdf: Q, qn: Array[Double]) =>
            flatProbe(encoded, books, qn, qdf, 51))) } ++
        Seq(1, 2, 4, 8, 16).map(np =>
          s"ivfpq_np$np" -> ((qdf: Q, _: Array[Double]) =>
            PQ.ivfPqTopKFromIndex(spark, ivfpqDir, "vec_id",
              qdf, "embedding", nprobe = np, k = k + 1))) ++
        Seq(2, 8).map(np =>
          s"ivfpq_np${np}_rr50" -> ((qdf: Q, _: Array[Double]) =>
            PQ.ivfPqTopKFromIndex(spark, ivfpqDir, "vec_id",
              qdf, "embedding", nprobe = np, k = k + 1, rerankK = 51,
              rerankSource = Some((corpus, "embedding"))))) ++
        // the OPENED-handle probe: same scan, metadata loaded once —
        // isolates the one-shot API's per-call parquet-read overhead
        Seq("ivfpqH_np8" -> ((qdf: Q, _: Array[Double]) =>
          handle.topK("vec_id", qdf, "embedding",
            nprobe = 8, k = k + 1)))
      val rec = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      val ph  = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
      val sec = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      var bruteSec = 0.0
      queries.foreach { row =>
        val qid = row.getLong(0); val parent = row.getLong(1)
        val qvec = row.getSeq[Float](2)
        val qdf = Seq((qid, qvec)).toDF("vec_id", "embedding")
        val qn = normQ(qvec)
        def ids(df: Q): Set[Long] = df.select("vec_id").collect()
          .map(_.getLong(0)).filter(_ != qid).take(k).toSet
        val t0 = System.nanoTime()
        val truth = ids(Similarity.bruteForceTopK(corpus, "vec_id",
          "embedding", qdf, "embedding", k = k + 1))
        bruteSec += (System.nanoTime() - t0) / 1e9
        require(truth.contains(parent),
          s"planted parent $parent not in brute top-$k of twin $qid")
        methods.foreach { case (label, f) =>
          val t1 = System.nanoTime()
          val got = ids(f(qdf, qn))
          sec(label) += (System.nanoTime() - t1) / 1e9
          rec(label) += got.intersect(truth).size / k.toDouble
          if (got.contains(parent)) ph(label) += 1
        }
      }
      val m = queries.length
      println(f"[prof] n=$n queries=$m k=$k nlist=$nlist " +
        f"code_bytes=$codeBytes raw_bytes=$rawBytes " +
        f"ratio=${codeBytes.toDouble / rawBytes}%.4f " +
        f"brute_mean_sec=${bruteSec / m}%.3f")
      methods.foreach { case (label, _) =>
        val frac =
          if (label.startsWith("ivfpq"))
            label.dropWhile(!_.isDigit).takeWhile(_.isDigit)
              .toDouble / nlist
          else 1.0
        println(f"[prof] $label%-20s recall@$k=${rec(label) / m}%.3f " +
          f"parent_hit=${ph(label).toDouble / m}%.3f " +
          f"mean_sec=${sec(label) / m}%.3f est_scan_frac=$frac%.4f")
      }
      flats.foreach(_._3.unpersist())
      corpus.unpersist()
      spark.stop(); return
    }
    if (name == "batch_probe_profile") {
      // r14 verdict #2: per-query cost of the batched probe APIs vs a
      // single-query loop — the fixed overhead (manifest reads, probe
      // planning, per-query Spark jobs) a batch amortizes. Loop leg
      // measured on `loopN` queries (default 20 — one-shot probes are
      // ~0.5 s each, a 1k loop would be ~10 min of pure overhead),
      // batch leg on the FULL query frame.
      //   sbt "runMain graft.Scratch batch_probe_profile target/sf1 1000"
      import graft.ml.{ProductQuantization => PQ, Similarity}
      val batchN = if (args.length > 2) args(2).toInt else 1000
      val loopN  = if (args.length > 3) args(3).toInt else 20
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val corpus  = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      val queries = e.filter(pmod(col("vec_id"), lit(10)) === 0)
        .limit(batchN).persist()
      val q = queries.count()
      val qids = queries.select(col("vec_id"))
        .limit(loopN).collect().map(_.getLong(0)).toSeq
      def timed(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] $label%-34s rows=$rows%-7d sec=$dt%8.2f")
      }
      // IVF-PQ over a persisted index — the family the verdict named
      val dir = java.nio.file.Files
        .createTempDirectory("graft_batchprof").toString
      PQ.writeIvfPqIndex(corpus, "vec_id", "embedding", dir,
        nlist = 0, m = 8, ksub = 32, pqIters = 1)
      val h = PQ.openIvfPqIndex(spark, dir)
      timed(s"ivfpq_loop_${qids.length}q") {
        qids.map { id =>
          h.topK("vec_id", e.filter(col("vec_id") === id), "embedding",
            nprobe = 4, k = 10).count()
        }.sum
      }
      timed(s"ivfpq_batch_${q}q") {
        h.topKBatch("vec_id", queries, "vec_id", "embedding",
          nprobe = 4, k = 10).count()
      }
      // LSH over a persisted index
      val lshDir = java.nio.file.Files
        .createTempDirectory("graft_batchprof_lsh").toString
      Similarity.writeLshIndex(corpus, "vec_id", "embedding", lshDir,
        dim = 64, planes = Similarity.autoPlanes(corpus.count(), 128L))
      timed(s"lsh_loop_${qids.length}q") {
        qids.map { id =>
          Similarity.lshTopKFromIndex(spark, lshDir, "vec_id",
            "embedding", e.filter(col("vec_id") === id), "embedding",
            dim = 64, k = 10,
            planes = Similarity.autoPlanes(corpus.count(), 128L)).count()
        }.sum
      }
      timed(s"lsh_batch_${q}q") {
        Similarity.lshTopKBatchFromIndex(spark, lshDir, "vec_id",
          "embedding", queries, "vec_id", "embedding",
          dim = 64, k = 10).count()
      }
      spark.stop(); return
    }
    if (name == "contraction_profile") {
      // r14 verdict #6: candidate-volume reduction from the exact-dup
      // contraction pre-pass. Corpus = embeddings ∪ `dupFrac` planted
      // byte-identical twins; measure the banded candidate count and
      // wall time with and without contraction (equality is q213's
      // oracle + MlSpec; this is the cost story).
      //   sbt "runMain graft.Scratch contraction_profile target/sf1"
      import graft.ml.Similarity
      val copies = if (args.length > 2) args(2).toInt else 2
      val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      // plant: every vec_id % 3 == 0 row duplicated `copies` times
      val u = (1 to copies).foldLeft(e0) { (acc, c) =>
        acc.unionByName(e0.filter(col("vec_id") % 3 === 0)
          .withColumn("vec_id", col("vec_id") + lit(c * 10000000L)))
      }.persist()
      val n = u.count()
      val r = Similarity.autoPlanes(n, 128L)
      val bands = Similarity.autoBands(0.85, r)
      println(s"[prof] n=$n (dups planted) r=$r bands=$bands")
      // candidate volume = the skinny banded self-join count (the
      // exchange the contraction exists to shrink)
      def candCount(df: org.apache.spark.sql.DataFrame): Long = {
        val all = Similarity.hyperplanes(64, bands * r, 42L)
        val codeCols = (0 until bands).map(b =>
          Similarity.lshCode(col("embedding"),
            all.slice(b * r, (b + 1) * r)).as(s"__c$b"))
        val skinny = df.select(col("vec_id").as("id") +: codeCols: _*)
          .select(col("id"), posexplode(
            array((0 until bands).map(b => col(s"__c$b")): _*))
            .as(Seq("__band", "__code")))
        skinny.as("a").join(skinny.as("x"),
            col("a.__band") === col("x.__band") &&
              col("a.__code") === col("x.__code") &&
              col("a.id") < col("x.id")).count()
      }
      val reps = u.select(col("vec_id"), col("embedding"))
        .groupBy(col("embedding")).agg(min(col("vec_id")).as("vec_id"))
      println(s"[prof] reps=${reps.count()} of $n")
      println(s"[prof] cand_uncontracted=${candCount(u)}")
      println(s"[prof] cand_contracted=${candCount(
        reps.select(col("vec_id"), col("embedding")))}")
      def timed(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val rows = f
        println(f"[prof] $label%-22s rows=$rows%-9d " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%8.2f")
      }
      timed("banded_plain") {
        Similarity.nearDupPairsBanded(u, "vec_id", "embedding",
          dim = 64, minCosine = 0.85, bands = bands,
          planesPerBand = r).count()
      }
      timed("banded_contracted") {
        Similarity.nearDupPairsBandedContracted(u, "vec_id",
          "embedding", dim = 64, minCosine = 0.85, bands = bands,
          planesPerBand = r).count()
      }
      spark.stop(); return
    }
    if (name == "semdedup_profile") {
      // r14: the DEFAULT-flip claim measured at the OPERATOR level —
      // of the planted twins that ARE duplicates at the threshold
      // (cosine to parent >= minCos), what fraction does semDedup
      // actually remove? Pairs-level recall (banded_default_r14) is
      // the mechanism; this is the user-visible outcome.
      //   sbt "runMain graft.Scratch semdedup_profile target/sf1"
      import graft.ml.Similarity
      val minCos = if (args.length > 2) args(2).toDouble else 0.85
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
      val n = e.count()
      val parents = e.select(col("vec_id").as("parent_id"),
        col("embedding").as("__pv"))
      val eligible = e.filter(col("parent_id") >= 0)
        .join(parents, "parent_id")
        .filter(Similarity.dot(
          Similarity.normalize(col("embedding")),
          Similarity.normalize(col("__pv"))) >= minCos)
        .select(col("vec_id")).as[Long](org.apache.spark.sql.Encoders
          .scalaLong).collect().toSet
      println(s"[prof] n=$n eligible planted dups at cos>=$minCos: " +
        s"${eligible.size}")
      Seq(("default_auto", 0), ("single_table", 1)).foreach {
        case (label, bands) =>
          val t0 = System.nanoTime()
          val surv = Similarity.semDedup(e, "vec_id", "embedding",
              dim = 64, minCosine = minCos,
              targetBucketSize = Some(128L), bands = bands)
            .select(col("vec_id")).as[Long](org.apache.spark.sql
              .Encoders.scalaLong).collect().toSet
          val removed = eligible.count(id => !surv.contains(id))
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[prof] $label%-14s removed=$removed/${eligible.size} " +
            f"(recall=${removed.toDouble / eligible.size}%.3f) " +
            f"survivors=${surv.size} sec=$dt%.1f")
      }
      spark.stop(); return
    }
    if (name == "pq_dedup_profile") {
      // r14 verdict #7: PQ-code dedup recall on planted image twins —
      // the fraction of (twin, parent) pairs that collapse into one
      // code word at each (m, ksub), plus the survivor contraction.
      //   sbt "runMain graft.Scratch pq_dedup_profile target/sf1"
      import graft.ml.{ProductQuantization => PQ}
      val e = spark.read.parquet(s"$sfDir/embeddings_planted.parquet")
      val n = e.count()
      val twinPairs = e.filter(col("parent_id") >= 0).count()
      println(s"[prof] n=$n planted twin pairs=$twinPairs")
      Seq((2, 16), (4, 4), (4, 16), (8, 16), (8, 64), (16, 64))
        .foreach { case (m, ksub) =>
        val t0 = System.nanoTime()
        // survivors (min id per code word); a twin is CAUGHT when it
        // is not a survivor... not exactly — recall = twin shares its
        // parent's word. Recompute codes directly for the pair check.
        val corpus = e.select(col("vec_id"),
          graft.ml.Similarity.normalize(col("embedding")).as("__nvec"))
        val books = PQ.pqCodebooks(corpus, "vec_id", "__nvec", m, ksub,
          iters = 1, seed = 42L)
        val coded = corpus.select(col("vec_id"),
          graft.functions.PqEncode.pqEncode(col("__nvec"), books)
            .as("__code"))
        val joined = e.filter(col("parent_id") >= 0)
          .select(col("vec_id"), col("parent_id"))
          .join(coded.select(col("vec_id"), col("__code").as("__ct")),
            "vec_id")
          .join(coded.select(col("vec_id").as("parent_id"),
            col("__code").as("__cp")), "parent_id")
        val caught = joined
          .filter(col("__ct") === col("__cp")).count()
        val survivors = PQ.pqCodeDedup(e, "vec_id", "embedding",
          m, ksub, iters = 1).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[prof] m=$m%-3d ksub=$ksub%-4d twin_recall=" +
          f"${caught.toDouble / twinPairs}%.3f survivors=$survivors " +
          f"(${survivors.toDouble / n}%.2f of corpus) sec=$dt%.1f")
      }
      spark.stop(); return
    }
    if (name == "vocab_bytes_profile") {
      // r12 verdict #6: the VocabEncode kernel guard counts ENTRIES;
      // measure the serialized map (what rides the task binary via
      // addReferenceObj, Java-serialized like the closure serializer
      // does) at and below the limit, so the default can be derived
      // from a BYTE budget instead of asserted.
      //   sbt "runMain graft.Scratch vocab_bytes_profile ."
      def measure(n: Int): (Long, Double) = {
        val rnd = new java.util.Random(42)
        val entries = Array.tabulate(n) { i =>
          // identifier-ish tokens, 7-20 chars (base-36 of a random
          // long) — the realistic shape for a word-type vocabulary
          (java.lang.Long.toString(
            rnd.nextLong() & Long.MaxValue, 36), i.toLong)
        }
        val m = graft.functions.VocabEncode.buildMap(entries)
        val counter = new java.io.OutputStream {
          var count = 0L
          def write(b: Int): Unit = count += 1
          override def write(b: Array[Byte], off: Int, len: Int): Unit =
            count += len
        }
        val t0 = System.nanoTime()
        val oos = new java.io.ObjectOutputStream(counter)
        oos.writeObject(m); oos.close()
        (counter.count, (System.nanoTime() - t0) / 1e9)
      }
      Seq(250000, 1000000, 4000000).foreach { n =>
        val (bytes, secs) = measure(n)
        println(f"[prof] vocab entries=$n serialized=${bytes / 1048576.0}%.1f MiB " +
          f"(${bytes.toDouble / n}%.1f B/entry) serialize=$secs%.2f s")
      }
      spark.stop(); return
    }
    if (name == "q104_profile") {
      // r12: which q104 stage grows — chunk, vocab census, vocab
      // collect, kernel encode, pack prefix-sum, final assembly.
      //   sbt "runMain graft.Scratch q104_profile target/sf10"
      import graft.ml.{Curation, TextAnalysis}
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val chunks = Curation.chunkDocuments(
          d, "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .select((col("doc_id") * 100000 + col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      println("[prof] chunks rows=" +
        timed("chunk scan+count")(chunks.count()))
      val vocab = TextAnalysis.buildVocab(d.select(col("text")),
        "text", minCount = 5)
      val vrows = timed("vocab census+collect")(
        vocab.select(col("token"), col("token_id")).collect())
      println("[prof] vocab rows=" + vrows.length)
      val map = graft.functions.VocabEncode.buildMap(
        vrows.map(r => (r.getString(0), r.getLong(1))))
      val toks = filter(TextAnalysis.tokens(col("chunk_text")),
        t => length(t) > 0)
      // zero-token guard on raw text, as in production encodeDocuments
      // — a filter on the kernel struct would inline a second kernel
      // evaluation via pushdown and misreport the stage cost
      val enc = chunks.filter(col("chunk_text").rlike("\\S"))
        .select(col("chunk_id"),
          graft.functions.VocabEncode.vocabEncode(toks, map, -1L).as("__e"))
        .select(col("chunk_id"), col("__e.n_tokens").as("n_tokens"),
          col("__e.n_oov").as("n_oov"), col("__e.token_ids").as("token_ids"))
      timed("kernel encode (materialize)")(
        enc.queryExecution.toRdd.count())
      val packed = TextAnalysis.packingManifestFrom(
        enc, "chunk_id", "n_tokens", seqLen = 128)
      timed("encode+packFrom (materialize)")(
        packed.queryExecution.toRdd.count())
      val full = packed.select(col("chunk_id"), col("n_tokens"),
        col("n_oov"), col("offset"), col("seq_first"), col("seq_last"),
        array_join(transform(col("token_ids"), x => x.cast("string")),
          " ").as("token_ids"))
      timed("full q104 (materialize)")(
        full.queryExecution.toRdd.count())
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) full.explain("formatted")
      spark.stop(); return
    }
    if (name == "tri_profile") {
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      // in-row pair derivation (mirrors SparkEntry.coPurchaseEdges)
      val parts = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val pairArr = flatten(transform(col("ps"), (x, i) =>
        transform(
          slice(col("ps"), i + lit(2),
            greatest(lit(0), size(col("ps")) - i - lit(1))),
          y => struct(x.as("p1"), y.as("p2")))))
      val e = parts.select(explode(pairArr).as("p"))
        .select(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .distinct()
      timed("edges derive")(println("m=" + e.count()))
      // phase replay of the EDGE-CENTRIC triangleCounts (r9): canon →
      // degree-oriented DAG → adjacency arrays → per-edge native
      // intersection closure
      val canon = e
        .select(col("p1").cast("long").as("u"), col("p2").cast("long").as("v"))
        .persist()
      timed("canon")(println("canon=" + canon.count()))
      val deg = canon.select(col("u").as("n"))
        .unionAll(canon.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val ranked = canon
        .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), Seq("u"))
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), Seq("v"))
      val oriented = ranked.select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b")))
          .as("en"))
        .select(col("en.a").as("a"), col("en.b").as("b"))
        .persist()
      timed("orient")(println("m=" + oriented.count()))
      val adj = oriented.groupBy(col("a"))
        .agg(sort_array(collect_list(col("b"))).as("ns"))
        .persist()
      timed("adj")(println("nodes=" + adj.count()))
      val e2 = oriented.select(col("a").as("x"), col("b").as("y"))
      val withAdj = e2
        .join(broadcast(adj.select(col("a").as("x"), col("ns").as("nx"))), Seq("x"))
        .join(broadcast(adj.select(col("a").as("y"), col("ns").as("ny"))), Seq("y"))
      val withCommon = withAdj.select(col("x"), col("y"),
        graft.functions.SortedIntersect
          .sortedIntersect(col("nx"), col("ny")).as("zs"))
      val out = withCommon
        .select(explode(when(size(col("zs")) > 0, concat(
          array(
            struct(col("x").as("node"), size(col("zs")).cast("long").as("c")),
            struct(col("y").as("node"), size(col("zs")).cast("long").as("c"))),
          transform(col("zs"), z => struct(z.as("node"), lit(1L).as("c")))))
          .otherwise(array().cast("array<struct<node:bigint,c:bigint>>")))
          .as("t"))
        .groupBy(col("t.node")).agg(sum(col("t.c")).as("n_tri"))
      timed("close+agg")(println("n=" + out.count()))
      timed("full q129 fresh")(println("rows=" +
        SparkEntry.queries("q129_triangles")(spark, sfDir)
          .queryExecution.toRdd.count()))
      spark.stop(); return
    }
    if (name == "fuzzy_profile") {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val doubled = d.unionByName(d.withColumn("doc_id", col("doc_id") + 100000))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val pairs = timed("pairs construct")(
        graft.ml.Dedup.jaccardPairs(doubled, "text", "doc_id")
          .select(col("id_a"), col("id_b")))
      val labels = timed("cc")(
        graft.ml.Graph.connectedComponents(pairs, "id_a", "id_b"))
      val losers = labels.filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      val out = doubled.join(losers, Seq("doc_id"), "left_anti")
      timed("anti-join")(out.queryExecution.toRdd.count())
      spark.stop(); return
    }
    // bench-only twins are runnable by name too (q197/q198/q203/q206)
    SparkEntry.queries.get(name)
      .orElse(SparkEntry.benchOnlyQueries.get(name)).foreach { fn =>
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n  = df.queryExecution.toRdd.count()
      println(f"[scratch] $name: rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // post-execution: the FINAL adaptive plan (shows ReusedExchange)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("2"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
