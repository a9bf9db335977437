package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GlueFrame, GType}
import graft.functions.{GlueFunctions, SimHash64}
import graft.ml.{Curation, Dedup, Graph, Multimodal, ProductQuantization, Similarity, Sketches, TextAnalysis}
import graft.operators.{ChoiceOps, FieldOps, Joins, NestedOps, Sessionize}
import graft.operators.FieldOps.Mapping

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 implemented so far is exposed here
  * as a named query over the driver's TPC-H-ish parquet tables, paired
  * with an ANSI-SQL oracle run by DuckDB on the same tables. Aliases in
  * the Spark plan and the oracle SQL are kept identical (the driver's
  * compare sorts columns by name before hashing).
  *
  * Numeric-stability policy for oracles:
  * - double-typed SUM/AVG go through DECIMAL on both sides (float
  *   addition order would otherwise differ between engines);
  * - double→int casts go through FLOOR (DuckDB rounds, Spark
  *   truncates);
  * - final decimal-typed OUTPUT columns are cast to DOUBLE on both
  *   sides — the driver's hasher represents decimals inconsistently
  *   between the Spark parquet dump and the DuckDB result. The
  *   decimal→double cast is value-exact only while the scaled unscaled
  *   value stays below 2^53 (~9e13 currency units at scale 2); a
  *   larger-SF run that trips a hash mismatch on a sum column should
  *   check this bound first.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Session-scoped scratch dir for queries that tee through the
    * filesystem (q51/q73/q74/q78/q177): java.io.tmpdir + the Spark
    * applicationId, so paths neither depend on the cwd nor race
    * between concurrent bench/verify runs (ADVICE r9 — two runs
    * sharing `target/tmp_spigot` could read each other's half-written
    * tee). The per-application dir is removed on JVM exit, so runs do
    * not accumulate garbage the way per-query UUID dirs would.
    */
  private val scratchHooked =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def scratchDir(s: SparkSession, name: String): String = {
    val base = new java.io.File(new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_scratch"),
      s.sparkContext.applicationId)
    if (scratchHooked.putIfAbsent(base.getPath, java.lang.Boolean.TRUE) == null)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
          f.delete(); ()
        }
        rm(base)
      }))
    new java.io.File(base, name).getPath
  }

  /** Co-purchase part graph (parts sharing an order) — the edge set
    * q129 (triangles) and q137 (k-core) both consume. Pairs generate
    * IN-ROW from each order's sorted distinct part array (the same
    * suffix-transform used for wedges in
    * [[graft.ml.Graph.triangleCounts]]) instead of the former
    * (order, part) self-join: ONE shuffle — the groupBy(order) —
    * replaces the join's two sorted exchanges, and the per-order
    * arrays are tiny (≈4 parts/order at every SF, bounded by order
    * size, not data size). Derived fresh per query — Bench's
    * release() discipline measures each query cold, so a cross-query
    * cache would be both unfair and (post-release) dangling.
    *
    * SKEW GUARD (r10 — found by the Zipf gate, not hypothesized):
    * baskets above `MaxBasketSize` distinct parts are DROPPED before
    * pair expansion. The expansion is quadratic in basket size, so a
    * single hot basket (the Zipf sf0.1 twin has a 152k-line order)
    * otherwise emits ~10⁹ pairs from one row — measured 122× (q129)
    * and 40× (q137) vs the uniform twin, with one outright OOM crash.
    * Dropping, not sampling, is the standard market-basket treatment:
    * a basket containing a large share of the catalog asserts
    * co-occurrence between essentially everything and carries no
    * per-pair signal. The cap is far above any uniform basket (~4
    * parts ±Poisson at every SF), so it binds ONLY on pathological
    * hubs; the oracles encode the same cap, so both engines agree by
    * construction, not corpus luck.
    */
  private[graft] val MaxBasketSize = 256

  /** q193/q194 deterministic graph-sampling parameters — shared
    * between the engine calls and the oracle replays (the q179
    * discipline: one constant, interpolated into both sides).
    * Power-of-two denominators so the oracle's unsigned `mod` equals
    * the engine's signed `pmod` bit-for-bit; keep = 1 so the 1/p³
    * DOULION scale factor is an exact integer.
    */
  private[graft] val GraphSampleDenomTri  = 4  // p = 1/4 (triangles)
  private[graft] val GraphSampleDenomCore = 2  // p = 1/2 (k-core)
  private[graft] val GraphSampleSeed      = 61
  /** q194's sampled peel threshold: ⌈k·p⌉ for q137's k = 80 at
    * p = 1/2 — sampled degree concentrates at p·deg, so the sampled
    * 40-core approximates the exact 80-core membership.
    */
  private[graft] val KcoreSampledK = 40

  /** q199 constants: the eval/train split point within the pinned
    * [[Q188Cardinality]] slice, the contamination threshold, and the
    * bucket-size dial the derived plane count comes from.
    */
  private[graft] val Q199EvalSplit    = 100L
  private[graft] val Q199MinCosine    = 0.35
  private[graft] val Q199TargetBucket = 32L

  /** q196 constants, interpolated into both engine call and oracle.
    * The oracle's plane count derives from the SAME
    * `autoPlanes(Q188Cardinality, Q196TargetBucket)` call the engine
    * makes over its pinned input (the q188/q179 discipline).
    */
  private[graft] val Q196Cap          = 20
  private[graft] val Q196SampleSeed   = 17
  private[graft] val Q196TargetBucket = 32L

  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) <= MaxBasketSize)
    val pairArr = flatten(transform(col("ps"), (x, i) =>
      transform(
        slice(col("ps"), i + lit(2),
          greatest(lit(0), size(col("ps")) - i - lit(1))),
        y => struct(x.as("p1"), y.as("p2")))))
    parts.select(explode(pairArr).as("p"))
      .select(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .distinct()
  }

  /** [[coPurchaseEdges]] with the q193/q194 sampling predicate pushed
    * BELOW the dedup exchange: the keep decision is a pure hash of
    * the pair's own endpoints, so filtering right after the in-row
    * pair expansion yields EXACTLY the set that filtering the final
    * distinct edges would — but the `.distinct()` shuffle (the
    * derivation's dominant exchange at scale) now carries only ~p of
    * the pair stream. Equality with filter-after-distinct is
    * spec-pinned.
    */
  private[graft] def coPurchaseEdgesSampled(
      s: SparkSession, dir: String,
      denom: Int, keep: Int, seed: Int): DataFrame = {
    val parts = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) <= MaxBasketSize)
    val pairArr = flatten(transform(col("ps"), (x, i) =>
      transform(
        slice(col("ps"), i + lit(2),
          greatest(lit(0), size(col("ps")) - i - lit(1))),
        y => struct(x.as("p1"), y.as("p2")))))
    parts.select(explode(pairArr).as("p"))
      .select(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .filter(Graph.edgeSampleKeep(
        col("p1"), col("p2"), denom, keep, seed))
      .distinct()
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join revenue rollup: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    * region with broadcast dims — the shape every warehouse load in the
    * reference feeds (SURVEY §1.5).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li  = t(spark, dir, "lineitem")
    val o   = t(spark, dir, "orders")
    val c   = t(spark, dir, "customer")
    val n   = t(spark, dir, "nation")
    val r   = t(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,2)")).cast("decimal(18,2)").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------- A4 / A1
    // Grouped aggregation (TPC-H Q1 shape) over lineitem.
    // Sums route through DECIMAL for engine-exact addition, then the
    // FINAL column is cast to DOUBLE: the driver's hasher represents
    // decimal outputs differently between the Spark parquet dump and
    // the DuckDB result even when values are equal (round-1 lesson).
    // Exact while sums stay below 2^53/10^scale — see the header
    // policy; holds through sf0.1 with ~9 orders of magnitude to spare.
    "q01_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // ---------------------------------------------------------------- P1
    "q02_select_fields" -> ((s, dir) =>
      FieldOps.selectFields(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_mktsegment"))),

    // ---------------------------------------------------------------- P2
    "q03_drop_fields" -> ((s, dir) =>
      FieldOps.dropFields(t(s, dir, "orders"),
        Seq("o_orderpriority", "o_orderdate"))),

    // ---------------------------------------------------------------- P3
    "q04_rename_field" -> ((s, dir) =>
      FieldOps.renameField(t(s, dir, "nation"), "n_name", "nation_name")),

    // ---------------------------------------------------------------- R2
    "q05_apply_mapping" -> ((s, dir) =>
      // decimal target exercises the cast machinery; the final
      // double cast keeps the driver's decimal-hostile hasher happy
      FieldOps.applyMapping(t(s, dir, "orders"), Seq(
        Mapping.cast("o_orderkey", "order_id", "long"),
        Mapping.cast("o_orderstatus", "status", "string"),
        Mapping.cast("o_totalprice", "total", "decimal(12,2)"),
        Mapping.cast("o_orderdate", "odate", "date")))
        .withColumn("total", col("total").cast("double"))),

    // ---------------------------------------------------------------- P4
    "q06_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))),

    // ---------------------------------------------------------------- P7
    "q07_split_rows_match" -> ((s, dir) => {
      val (m, _) = FieldOps.splitRows(t(s, dir, "lineitem"),
        Map("l_quantity" -> Map(">" -> 10, "<=" -> 40)))
      m.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),
    "q08_split_rows_nomatch" -> ((s, dir) => {
      val (_, nm) = FieldOps.splitRows(t(s, dir, "lineitem"),
        Map("l_quantity" -> Map(">" -> 10, "<=" -> 40)))
      nm.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // ---------------------------------------------------------------- P8
    "q09_split_fields" -> ((s, dir) => {
      val (selected, _) = FieldOps.splitFields(t(s, dir, "part"),
        Seq("p_partkey", "p_name", "p_retailprice"))
      selected
    }),

    // ---------------------------------------------------------------- P9
    "q10_cast" -> ((s, dir) =>
      FieldOps.castColumns(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            floor(col("l_quantity")).as("qty"),
            col("l_shipdate").cast("date").as("ship_date")),
        Map("qty" -> "int"))),

    // ---------------------------------------------------------------- J1
    "q11_equi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = Joins.autoBroadcast(t(s, dir, "nation"))
      val r = Joins.autoBroadcast(t(s, dir, "region"))
      Joins.equiJoin(
        Joins.equiJoin(c, Seq("c_nationkey"), n, Seq("n_nationkey")),
        Seq("n_regionkey"), r, Seq("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
    }),

    // ---------------------------------------------------------------- J3
    // Incremental dim-load semantics: only orders whose customer is NOT
    // already in the "existing" warehouse extract (anti-join).
    "q12_anti_join_new" -> ((s, dir) => {
      val existing = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("o_custkey"))
      Joins.insertOnlyNew(t(s, dir, "orders"), existing, Seq("o_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    }),

    // ---------------------------------------------------------------- J4
    // Composite-key fact anti-join (4-way in the reference; 2-way key
    // here, same plan shape).
    "q13_composite_anti" -> ((s, dir) => {
      val li       = t(s, dir, "lineitem")
      val existing = li.filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"))
      Joins.insertOnlyNewComposite(li, existing,
        Seq("l_orderkey", "l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // ---------------------------------------------------------------- R8
    "q14_merge_upsert" -> ((s, dir) => {
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val staging = src.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Joins.mergeFrames(src, staging, Seq("o_orderkey"))
    }),

    // ---------------------------------------------------------------- A2
    "q15_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      o.filter(col("o_orderstatus") === "F")
        .unionByName(o.filter(col("o_orderstatus") === "O"))
    }),

    // ---------------------------------------------------------------- R3
    "q16_unnest" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      NestedOps.unnest(
        c.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          struct(col("c_name"), col("c_acctbal")).as("info")))
    }),

    // ---------------------------------------------------------------- R4
    "q17_relationalize_root" -> ((s, dir) => {
      val p = t(s, dir, "part").withColumn("words", split(col("p_name"), " "))
      NestedOps.relationalize(p, "part", idCol = Some("p_partkey"))("part")
    }),
    "q18_relationalize_child" -> ((s, dir) => {
      val p = t(s, dir, "part").withColumn("words", split(col("p_name"), " "))
      NestedOps.relationalize(p, "part", idCol = Some("p_partkey"))("part_words")
    }),

    // ---------------------------------------------------------------- R5
    "q19_unbox" -> ((s, dir) =>
      NestedOps.unbox(t(s, dir, "events"), "props", "json",
        Map("withSchema" -> "k BIGINT"))
        .select(col("event_id"), col("props").getField("k").as("k"))),

    // ---------------------------------------------------------------- R1
    "q20_choice_cast" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("props", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .select(col("event_id"), col("props").getField("k").as("kv"))
      val withChoice = ChoiceOps.withChoiceColumn(e, "k", Seq(
        GType.GLong   -> when(col("event_id") % 2 === 0, col("kv")),
        GType.GString -> when(col("event_id") % 2 === 1,
          col("kv").cast("string"))))
      ChoiceOps.resolveChoice(withChoice, Seq("k" -> "cast:long"))
        .select(col("event_id"), col("k"))
    }),
    "q21_choice_make_cols" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("props", from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))))
        .select(col("event_id"), col("props").getField("k").as("kv"))
      val withChoice = ChoiceOps.withChoiceColumn(e, "k", Seq(
        GType.GLong   -> when(col("event_id") % 2 === 0, col("kv")),
        GType.GString -> when(col("event_id") % 2 === 1,
          col("kv").cast("string"))))
      ChoiceOps.resolveChoice(withChoice, Seq("k" -> "make_cols"))
        .select(col("event_id"), col("k_long"), col("k_string"))
    }),

    // ------------------------------------------------------- A2 (choice)
    // Union of frames that disagree on a column's type: the merged
    // column becomes a choice, then resolves by cast.
    "q22_union_choice" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
          .cast("long"))
        .select(col("event_id"), col("k"))
      val longs   = e.filter(col("event_id") % 2 === 0)
        .withColumn("v", col("k")).drop("k")
      val strings = e.filter(col("event_id") % 2 === 1)
        .withColumn("v", concat(lit("v"), col("k").cast("string"))).drop("k")
      ChoiceOps.resolveChoice(ChoiceOps.union(longs, strings),
        Seq("v" -> "cast:string"))
    }),

    // ---------------------------------------------------------------- R7
    "q30_drop_nulls" -> ((s, dir) =>
      FieldOps.dropNullFields(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .withColumn("junk", lit(null))
          .withColumn("junk2", lit(null)))),

    // ------------------------------------------------------------ P4/C4
    // Error-channel filter: lookup-style failures drop the row; other
    // exceptions divert rows to the error channel, keeping data clean.
    "q31_filter_errors" -> ((s, dir) => {
      val o  = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val gf = GlueFrame(o).filterRecords({ row =>
        if (row.getString(1) == "P")
          throw new RuntimeException("status P unsupported")
        row.getDouble(2) > 100.0
      }, stage = "filter1")
      gf.data
    }),

    // ------------------------------------------------------------ P5/P6
    "q32_map_records" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      GlueFrame(o).mapRecords(
        row => org.apache.spark.sql.Row(
          row.getLong(0), math.round(row.getDouble(1) * 100)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("total_cents",
            org.apache.spark.sql.types.LongType)))).data
    }),

    // ---------------------------------------------------------------- A4
    "q23_window_topn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
    }),
    "q24_distinct" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey"), col("c_mktsegment"))
        .distinct()),
    "q25_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("total"))),
    "q26_sort_limit" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))),

    // ---------------------------------------------------------------- F1
    "q27_replace_array_element" -> ((s, dir) => {
      val p   = t(s, dir, "part")
      val arr = array(col("p_brand"), col("p_type"), col("p_name"))
      p.select(col("p_partkey"),
        array_join(
          GlueFunctions.replaceArrayElement(arr, upper(col("p_type")), 1),
          " ").as("replaced"))
    }),

    // ---------------------------------------------------------------- F3
    "q28_explode_index" -> ((s, dir) =>
      GlueFunctions.explodeWithIndex(
        t(s, dir, "part").withColumn("words", split(col("p_name"), " ")),
        "words", Seq("p_partkey"))),

    // --------------------------------------------------------------- P10
    "q29_ingest_cols" -> ((s, dir) =>
      FieldOps.addIngestionTimeColumns(
        t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        granularity = "hour",
        now = to_timestamp(lit("2026-01-01 10:30:00")))),

    // ===================== LLM-data-pipeline operators =====================

    // Exact dedup: smallest doc_id per identical text survives.
    "q33_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("n_chars"))),

    // Content fingerprinting (MD5 — engine-portable exact-dup key).
    "q34_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"))),

    // Token counting (whitespace tokenizer).
    "q35_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    // Quality scoring: integer-exact metrics + keep flag.
    "q36_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          col("n_alpha"), col("mean_word_len_x100"), col("quality_keep"))),

    // Language ID via stopword-hit scoring.
    "q37_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))),

    // Brute-force cosine top-k (exact ANN baseline).
    "q38_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding", k = 10)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // MinHash+LSH near-dup dedup (survivor ids; no SQL oracle —
    // rows-only check; exactness covered by MlSpec on planted dups).
    "q39_minhash_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.minhashDedup(doubled, "text", "doc_id")
        .select(col("doc_id"))
    }),

    // SimHash fingerprints via the native Catalyst expression
    // (custom hash — no SQL oracle; determinism + Hamming behavior
    // covered by MlSpec).
    "q40_simhash" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))),

    // SimHash near-dup dedup, end to end: rotated prefix buckets +
    // exact Hamming verification, min-id winner — survivors of the
    // doubled corpus (clones are Hamming-0 and always drop).
    "q55_simhash_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.simhashDedup(doubled, "text", "doc_id")
        .select(col("doc_id"))
    }),

    // N-gram Jaccard near-dup pairs: candidates share a shingle hash,
    // then integer-exact verification (2·|∩| ≥ |∪| ⇔ J ≥ 0.5).
    "q41_jaccard_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      // PPJoin-style prefix filter (exact — MlSpec proves it equal to
      // the direct all-pairs variant): on the doubled corpus every
      // shingle has document frequency ≥ 2, so the direct shared-shingle
      // self-join is quadratic in per-shingle frequency; the prefix
      // filter collapses the candidate set and is the only variant that
      // survives a 100× scale-up (r2 verdict: 98s → target well under
      // half of bench total). This runs the DEFAULT kernel, which since
      // r9 carries the 100×-survivable frequency cap
      // (Dedup.DefaultMaxShingleFreq = 256); the cap does not bind on
      // this corpus (distinct-text shingle DF max = 7 at sf0.01), so
      // the all-shared-shingle shortcut oracle stays exact — q109
      // oracle-gates a BINDING cap with the full candidate-discipline
      // replay.
      Dedup.jaccardPairs(doubled, "text", "doc_id", prefixFilter = true)
        .select(col("id_a"), col("id_b"),
          col("intersection").cast("int").as("n_inter"),
          col("union").cast("int").as("n_union"))
    }),

    // The 100x-SURVIVABLE pair-kernel configuration, correctness-gated
    // (r7 verdict #4): prefix filter PLUS the distinct-text
    // shingle-frequency cap. Candidate generation skips shingles
    // hotter than the cap (bounded skew at the cost of bounded,
    // DEFINED recall loss), so the oracle replays the full PPJoin
    // discipline — FNV shingle hashes, global (freq, hash) prefix
    // ranks, the positional bound, the cap — rather than q41's
    // all-shared-shingle shortcut, which is only equivalent for the
    // exact (uncapped) configuration. Cap = 4 on this corpus: the
    // distinct-text DF distribution at sf0.01 is p99 = 4, max = 7, so
    // the cap's candidate pruning is exercised (shingles up to f = 7
    // are excluded from generation), while every surviving pair still
    // shares a rarer shingle — the oracle replay would catch either a
    // wrongly-lost or a wrongly-kept pair. The recall-LOSS semantics
    // (a pair whose every shared prefix shingle is hot) are
    // spec-gated in MlSpec's capped-vs-uncapped cases.
    "q109_jaccard_capped" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.jaccardPairs(doubled, "text", "doc_id", prefixFilter = true,
          maxShingleFreq = Some(4L))
        .select(col("id_a"), col("id_b"),
          col("intersection").cast("int").as("n_inter"),
          col("union").cast("int").as("n_union"))
    }),

    // Streaming incremental NEAR-dedup (the band-store twin of q108's
    // exact policy): batch 1 = even docs deduped within-batch by the
    // min-id band policy, its survivors' band keys persisted; batch 2
    // = odd docs dropped on any band collision with the store, then
    // within-batch policy over the remainder. A doc near-dupping only
    // a DROPPED batch-1 doc still emits — the store holds survivor
    // bands, and the oracle replays exactly that.
    "q110_stream_near_dedup" -> ((s, dir) => {
      val store = s"${System.getProperty("java.io.tmpdir")}/graft_snd_" +
        java.util.UUID.randomUUID().toString.take(8) + "/bands"
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val o1 = graft.streaming.StreamDedup.nearDedupBatch(
        d.filter(col("doc_id") % 2 === 0), "text", "doc_id", store)
      val o2 = graft.streaming.StreamDedup.nearDedupBatch(
        d.filter(col("doc_id") % 2 === 1), "text", "doc_id", store)
      o1.unionByName(o2)
    }),

    // SCD Type-2 dimension maintenance — the history-keeping variant
    // of the reference's Dim* overwrite loads (pipeline.py's star
    // loads are Type-1). One batch against an all-open customer dim
    // exercises every branch: %7==0 keys change (close + new
    // version), %7==3 keys arrive identical (pass through), %7==5
    // keys arrive shifted to unseen ids (fresh insert), everything
    // else has no update. batchDate is a literal — retries are
    // byte-identical.
    "q111_scd2" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val current = c
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("eff_from", lit(java.sql.Date.valueOf("2020-01-01")))
        .withColumn("eff_to", lit(null).cast("date"))
        .withColumn("is_current", lit(true))
      val updates = c.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), lit("MOVED").as("c_mktsegment"),
          (col("c_acctbal") + 100.0).as("c_acctbal"))
        .unionByName(c.filter(col("c_custkey") % 7 === 3)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")))
        .unionByName(c.filter(col("c_custkey") % 7 === 5)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit("FRESH").as("c_mktsegment"), col("c_acctbal")))
      graft.pipeline.Scd.scd2Apply(current, updates,
          keys = Seq("c_custkey"),
          tracked = Seq("c_mktsegment", "c_acctbal"),
          batchDate = lit(java.sql.Date.valueOf("2024-06-01")))
        .withColumn("is_current", col("is_current").cast("int"))
    }),

    // Substring-level duplication (Lee et al. 2022's suffix-array
    // use-case, relationally): maximal token spans whose 3-gram
    // content appears in >= 2 distinct documents. The oracle replays
    // the positional FNV gram kernel (q43's), the >= 2-doc gram
    // filter, and the islands coalescing.
    "q112_dup_spans" -> ((s, dir) =>
      graft.ml.SpanDedup.duplicateSpans(
        t(s, dir, "documents"), "doc_id", "text", width = 3, minDocs = 2)),

    // Data-quality ruleset (the EvaluateDataQuality surface the
    // reference's GlueContext imports, awsglue/context.py:45-46) —
    // seven DQDL-style rules over orders, ALL evaluated in one
    // aggregation pass; the oracle recomputes each metric + verdict.
    "q113_dq_rules" -> ((s, dir) =>
      graft.operators.DataQuality.evaluate(t(s, dir, "orders"), Seq(
        graft.operators.DataQuality.RowCountBetween(1L, 1000000000L),
        graft.operators.DataQuality.IsComplete("o_custkey"),
        graft.operators.DataQuality.IsUnique("o_orderkey"),
        graft.operators.DataQuality.IsUnique("o_custkey"),
        graft.operators.DataQuality.ValuesBetween(
          "o_totalprice", 0.0, 100000.0, minRatio = 0.95),
        graft.operators.DataQuality.ValuesIn(
          "o_orderstatus", Seq("F", "O", "P")),
        graft.operators.DataQuality.MeanBetween(
          "o_totalprice", 1000.0, 500000.0)))),

    // S1/S8 ORC round-trip: part → ORC files via the sink factory →
    // back through the source factory. Exercises the non-parquet
    // columnar leg of the format dispatch end-to-end (types must
    // survive: int32 p_size, int64 keys, double price).
    "q114_orc_roundtrip" -> ((s, dir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_orc_" +
        java.util.UUID.randomUUID().toString.take(8)
      graft.sources.Sinks.write(t(s, dir, "part"), "file", format = "orc",
        options = Map("path" -> s"$base/part"), mode = "overwrite")
      graft.sources.Sources.source(s, "orc",
        options = Map("path" -> s"$base/part"))
    }),

    // Temperature-resampled mixture (α=0.5): per-lang √count shares
    // derived in-plan with integer-only weight math, then the q75
    // stateless replicate/sample kernel. Oracle replays isqrt, the
    // integer floor-div weight, and the mix64 bucket rule.
    "q115_temperature_mix" -> ((s, dir) =>
      Sketches.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", targetRows = 2000)),

    // Null imputation: mean (decimal-summed, 4dp) for a numeric
    // column, mode (count-desc, value-asc tie-break) for a
    // categorical — stats attach via a broadcast one-row cross join,
    // no collect. Nulls injected deterministically so the repair is
    // oracle-checkable.
    "q116_impute" -> ((s, dir) => {
      val b = t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_custkey") % 11 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal"),
        when(col("c_custkey") % 13 === 0, lit(null).cast("string"))
          .otherwise(col("c_mktsegment")).as("seg"))
      graft.operators.Cleanse.imputeNulls(b,
        meanCols = Seq("bal"), modeCols = Seq("seg"))
    }),

    // z-score outlier flagging: μ and population σ from exact decimal
    // sums, rounded to 6dp so both engines draw the same boundary.
    "q117_outliers" -> ((s, dir) =>
      graft.operators.Cleanse.flagOutliers(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        "l_extendedprice", k = 2.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("is_outlier"))),

    // Per-group exact quantiles: one exchange, all quantiles from the
    // same per-group value map. The interpolation formula matches
    // quantile_cont; 4dp rounding absorbs last-ulp expression-order
    // differences between engines.
    "q118_group_quantiles" -> ((s, dir) =>
      Sketches.groupQuantiles(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity",
        Seq(("p50", 0.5), ("p90", 0.9)))),

    // Fixed-point PageRank over the part→supplier edge multiset:
    // integer rank units make every iteration order-free and
    // engine-exact, so an ITERATIVE numeric algorithm lands on the
    // oracle scoreboard (a float PageRank never could). Part ids
    // offset by 1e7 to keep the bipartite id spaces disjoint.
    "q119_pagerank" -> ((s, dir) =>
      Graph.pageRankFixedPoint(
        t(s, dir, "lineitem").select(
          (col("l_partkey") + 10000000L).as("src"),
          col("l_suppkey").as("dst")),
        "src", "dst", iters = 3)),

    // BM25 scored retrieval: query-term filter pushed onto the token
    // stream, broadcast DFs/stats, decimal-summed 6dp contributions
    // so multi-term float addition order cannot diverge.
    "q120_bm25" -> ((s, dir) =>
      TextAnalysis.bm25Scores(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id",
        queryTerms = Seq("join", "vector", "stream", "hash", "big"))),

    // Winsorization: exact-percentile bounds (4dp), broadcast one-row
    // stats, stateless clamp — tail repair without dropping rows.
    "q121_winsorize" -> ((s, dir) =>
      graft.operators.Cleanse.winsorize(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        "l_extendedprice", loQ = 0.05, hiQ = 0.95)),

    // Shuffle-skew pre-flight report: top-20 heaviest join keys with
    // row share and the salt factor that levels each back to a
    // mean-sized task (feeds saltedJoin). TakeOrdered top-k, not a
    // global sort; integer/ratio math throughout.
    "q122_skew_report" -> ((s, dir) =>
      graft.operators.Profile.skewReport(
        t(s, dir, "lineitem"), Seq("l_suppkey"), k = 20)),

    // Incremental rollup refresh (MV maintenance): base rollup (80%
    // of orders at grain) + delta batch aggregated to the same grain,
    // merged as partial aggregates. The oracle is the FULL
    // aggregation — merged-partials ≡ re-aggregating the world is
    // exactly the algebraic-aggregate contract being gated. Sums ride
    // DECIMAL so the merge is addition-order-exact.
    "q123_incremental_rollup" -> ((s, dir) => {
      import graft.operators.IncrementalAgg
      val orders = t(s, dir, "orders")
      val keys = Seq("o_orderstatus", "o_orderpriority")
      val sums = Seq("total" -> col("o_totalprice").cast("decimal(18,2)"))
      val base = IncrementalAgg.atGrain(
        orders.filter(col("o_orderkey") % 5 =!= 0), keys, sums,
        minCols = Seq("o_totalprice"), maxCols = Seq("o_totalprice"))
      val delta = IncrementalAgg.atGrain(
        orders.filter(col("o_orderkey") % 5 === 0), keys, sums,
        minCols = Seq("o_totalprice"), maxCols = Seq("o_totalprice"))
      IncrementalAgg.merge(base, delta, keys, Seq("total"),
          minCols = Seq("o_totalprice"), maxCols = Seq("o_totalprice"))
        .withColumn("total", col("total").cast("double"))
    }),

    // Temporal dimension lookup (the fact-side companion of q111):
    // each fact date picks the dimension VERSION valid at that date —
    // equi-join on the key with the validity range as a residual,
    // never a nested loop.
    "q124_dim_lookup" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val v1 = c.select(col("c_custkey"), col("c_mktsegment").as("seg"),
        lit(java.sql.Date.valueOf("2020-01-01")).as("eff_from"),
        lit(java.sql.Date.valueOf("2024-06-01")).as("eff_to"))
      val v2 = c.select(col("c_custkey"),
        concat(col("c_mktsegment"), lit("_V2")).as("seg"),
        lit(java.sql.Date.valueOf("2024-06-01")).as("eff_from"),
        lit(null).cast("date").as("eff_to"))
      val fact = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        date_add(lit("2024-01-01").cast("date"),
          (col("o_orderkey") % 365).cast("int")).as("odate"))
      graft.pipeline.Scd.dimLookup(fact, v1.unionByName(v2),
          keys = Seq("o_custkey" -> "c_custkey"), factDateCol = "odate")
        .select(col("o_orderkey"), col("odate"), col("seg"))
    }),

    // Ordered funnel: earliest view -> click -> purchase chain per
    // user in ONE shuffle (sorted-list fold), vs the oracle's chained
    // min-after-previous definition.
    "q125_funnel" -> ((s, dir) =>
      Sessionize.funnelMatch(t(s, dir, "events"),
        "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"))),

    // Cohort retention matrix: first-seen week x whole weeks since,
    // distinct users per cell. Integer week arithmetic.
    "q126_cohort" -> ((s, dir) =>
      Sessionize.cohortRetention(t(s, dir, "events"), "user_id", "ts")),

    // Tumbling event-time windows as a batch oracle row (T3's window
    // semantics on the scoreboard): 1-day windows x type, decimal
    // value sums.
    "q127_tumbling_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("total"))
        .select(col("w.start").cast("date").as("day"), col("event_type"),
          col("n"), col("total"))),

    // CDC log compaction: latest-wins upsert/delete collapse as ONE
    // map-side-combinable max_by aggregation (never a window — a
    // window would shuffle+sort the whole log). Synthetic log derived
    // from orders: insert for every key, update for key%3==0
    // (seq 2, price+10, decimal-exact), delete for key%7==0 (seq 3).
    "q128_cdc_compact" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val ins = o.select(col("o_orderkey"), lit(1L).as("seq"),
        lit("I").as("op"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val upd = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"),
          (col("o_totalprice").cast("decimal(18,2)") + lit(10))
            .cast("decimal(18,2)").as("price"))
      val del = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit(3L).as("seq"), lit("D").as("op"),
          lit(null).cast("decimal(18,2)").as("price"))
      graft.pipeline.Cdc.compact(
          ins.unionByName(upd).unionByName(del),
          keys = Seq("o_orderkey"), seqCol = "seq", opCol = "op")
        .withColumn("price", col("price").cast("double"))
    }),

    // Per-node triangle counts, degree-oriented (wedge volume
    // O(m^1.5) regardless of hub skew). Co-purchase graph: parts
    // sharing an order — ~C(4,2) pairs per order over a 20k-part
    // universe stays SPARSE at every SF (the co-supplier variant
    // saturates to a near-complete graph at sf0.1 because the
    // supplier universe is small — 1.6e8 triangles is the workload,
    // not the plan, so the benched graph must be one whose density
    // scales with the data).
    // broadcastEdgeLimit raised above the library default here: this
    // driver runs a 24g heap (build.sbt), where broadcasting the sf1
    // twin graph's 12M-edge adjacency is comfortably cheaper than the
    // shuffled closure; a default-sized driver keeps the safe 8M.
    "q129_triangles" -> ((s, dir) =>
      Graph.triangleCounts(coPurchaseEdges(s, dir), "p1", "p2",
        broadcastEdgeLimit = 32000000L, canonical = true)),

    // Blocked fuzzy record linkage: customers vs a deterministically
    // corrupted copy (dirty last digit for key%2==0), summed
    // per-field Levenshtein <= 2 via the banded native kernel. The
    // block key is (nation, middle name digits) — its CARDINALITY
    // scales with the data, so per-block size (and the pair volume)
    // stays bounded as the corpus grows; a fixed-cardinality block
    // (nation alone) made the pair space quadratic and tripped the
    // 10x-step scaling gate at sf0.1. The corruption never touches
    // the blocked characters, so every planted twin stays in-block.
    "q130_linkage" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val blk = concat(col("c_nationkey").cast("string"), lit("_"),
        substring(col("c_name"), 13, 3))
      val left = c.select(col("c_custkey"), blk.as("blk"),
        col("c_name"))
      val dirty = c.select((col("c_custkey") + 1000000L).as("d_custkey"),
        blk.as("blk"),
        when(col("c_custkey") % 2 === 0,
            concat(substring(col("c_name"), 1, 17),
              translate(substring(col("c_name"), 18, 1),
                "0123456789", "1234567890")))
          .otherwise(col("c_name")).as("d_name"))
      graft.ml.Linkage.linkPairs(left, dirty,
        leftIdCol = "c_custkey", rightIdCol = "d_custkey",
        blockCol = "blk",
        compareCols = Seq("c_name" -> "d_name"), maxDistance = 2)
    }),

    // Daily resample + forward fill: per-user complete day grid over
    // the user's own span (sequence+explode — output-proportional,
    // no calendar cross join), one key shuffle, running last() carry.
    "q131_fill_forward" -> ((s, dir) =>
      graft.operators.Resample.dailyFillForward(
        t(s, dir, "events"), "user_id", "ts", "value")),

    // Robust outlier rule: |x − median| > 3·MAD — median/MAD have a
    // 50% breakdown point, so heavy tails can't mask themselves the
    // way they inflate z-score σ (q117). Two exact-quantile passes
    // (histogram + prefix sums, never a value-counting aggregate).
    "q132_mad_outliers" -> ((s, dir) =>
      graft.operators.Cleanse.flagOutliersMad(
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        "l_extendedprice", k = 3.0)),

    // Equi-width histogram with empty buckets surfaced: one stats
    // row broadcast, one stateless bucket projection, one count agg,
    // driver-sized grid join. No global sort.
    "q133_histogram" -> ((s, dir) =>
      graft.operators.Profile.histogram(
        t(s, dir, "lineitem"), "l_extendedprice", nb = 20)),

    // First-order Markov transition matrix over per-user event
    // sequences: one lead() window keyed on user (event_id breaks
    // timestamp ties — total order or counts go partition-dependent),
    // then a |states|²-sized transition aggregate.
    "q134_transitions" -> ((s, dir) =>
      Sessionize.transitionMatrix(t(s, dir, "events"),
        "user_id", "ts", "event_type", tieCols = Seq("event_id"))),

    // Hopping (sliding) event-time windows as a batch oracle row:
    // 7-day windows sliding 1 day — each event lands in 7 windows,
    // the overlap the streaming T3 path computes incrementally.
    "q135_hopping_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "7 days", "1 day").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("total"))
        .select(col("w.start").cast("date").as("wstart"),
          col("event_type"), col("n"), col("total"))),

    // Trailing 7-row moving average over the gap-filled grid (q131's
    // output — on a holey grid a 7-row frame spans >7 days, the bug
    // fill-forward exists to prevent). Same key sort serves fill and
    // frame; decimal-summed, 6dp.
    "q136_rolling_mean" -> ((s, dir) => {
      val grid = graft.operators.Resample.dailyFillForward(
        t(s, dir, "events"), "user_id", "ts", "value")
      graft.operators.Resample.rollingMean(
        grid, "user_id", "day", "filled", windowRows = 7)
    }),

    // Bounded k-core peeling (3 level-synchronous peels at k=80 on
    // the co-purchase graph): per round one degree agg + two
    // semi-joins on 8-byte keys, per-round lineage truncation.
    "q137_kcore" -> ((s, dir) =>
      Graph.kCorePeel(coPurchaseEdges(s, dir), "p1", "p2",
        k = 80, iters = 3, canonical = true)),

    // Chi-square contingency cells (event type x weekday): observed,
    // independence-expected, per-cell chi2 term — all from one count
    // aggregation plus broadcast marginals.
    "q138_chi2" -> ((s, dir) =>
      graft.operators.Profile.chiSquare(
        t(s, dir, "events")
          .select(col("event_type"), dayofweek(col("ts")).as("dow")),
        "event_type", "dow")),

    // Hierarchical fallback lookup: per-customer override dim, else
    // per-nation rule, else default — fact streams through N
    // broadcast joins in ONE stage, scanned once.
    "q139_fallback_lookup" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val fact = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(cust.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .drop("c_custkey")
      val dim1 = cust.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), (col("c_custkey") % 5 + 1).as("adj"))
      val dim2 = t(s, dir, "nation")
        .select(col("n_nationkey"),
          (col("n_nationkey") % 3 + 100).as("adj"))
      graft.operators.Joins.coalesceLookup(fact,
          Seq((dim1, Seq("o_custkey" -> "c_custkey"), "adj"),
            (dim2, Seq("c_nationkey" -> "n_nationkey"), "adj")),
          outCol = "adj", default = lit(0L))
        .select(col("o_orderkey"), col("adj"))
    }),

    // A/B readout: splitmix64 unit->variant assignment (stable across
    // runs/engines/partitionings), per-variant decimal means, lift vs
    // control via one broadcast row.
    "q140_ab_report" -> ((s, dir) =>
      graft.operators.Experiment.abReport(
        t(s, dir, "orders"), "o_custkey", "o_totalprice",
        variants = 2, seed = 17)),

    // Dwell time by state: integer-microsecond gaps to the successor
    // event (float seconds would be partition-order-dependent),
    // summed per event type.
    "q141_dwell" -> ((s, dir) =>
      Sessionize.dwellByState(t(s, dir, "events"),
        "user_id", "ts", "event_type", tieCols = Seq("event_id"))),

    // Per-group min-max scaling: group extrema ride ONE unordered
    // whole-partition window — a single key shuffle serves extrema
    // and the scale projection.
    "q142_minmax_scale" -> ((s, dir) =>
      graft.operators.Cleanse.minMaxScale(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"), col("l_suppkey"), col("l_extendedprice")),
        Seq("l_suppkey"), "l_extendedprice")),

    // Weighted priority sample: fixed n per language, selection odds
    // prop. to weight, integer priorities (hash div weight), winners
    // via the bounded-state top-k heap — never a data sort.
    "q143_weighted_sample" -> ((s, dir) =>
      Sketches.weightedPrioritySample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        weights = Map("en" -> 4L, "zh" -> 2L, "es" -> 2L, "de" -> 1L,
          "fr" -> 1L),
        n = 5, seed = 7)),

    // Equi-depth (quantile) binning: nearest-rank quartile edges as
    // one broadcast row, stateless bucket projection — the skew-proof
    // complement of q133's equi-width histogram.
    "q144_equidepth_bins" -> ((s, dir) =>
      graft.operators.Profile.equiDepthBins(
        t(s, dir, "lineitem").select(col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice")),
        "l_extendedprice", nb = 4)),

    // Pairwise association rules on co-purchased parts: support from
    // the per-basket self-join (min-support prunes BEFORE item stats
    // attach), conf/lift as 6dp ratios of exact counts.
    "q145_assoc_rules" -> ((s, dir) =>
      graft.ml.Association.pairRules(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        minSupport = 2L)),

    // Join fan-out pre-flight: exact output cardinality of a
    // (possibly accidental) self-join on l_partkey from per-key
    // counts only — the join never runs.
    "q146_join_fanout" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.operators.Profile.joinFanout(li, li,
        Seq("l_partkey" -> "l_partkey"), k = 20)
    }),

    // Funnel time-to-convert: exact quantiles (integer microseconds)
    // of purchase-minus-view over fully converted users — composes
    // q125's one-shuffle funnel with q87's quantile kernel.
    "q147_funnel_time" -> ((s, dir) => {
      val f = Sessionize.funnelMatch(t(s, dir, "events"),
        "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"))
      val dt = f.filter(col("depth") === 3)
        .select((unix_micros(col("t_purchase").cast("timestamp")) -
          unix_micros(col("t_view").cast("timestamp"))).as("dt_us"))
      Sketches.exactQuantiles(dt, "dt_us", Seq(0.25, 0.5, 0.75, 0.9))
    }),

    // Referential-integrity audit vs a parent with a simulated lost
    // partition (o_orderkey%97==0 dropped): fact collapses to per-key
    // counts map-side, ONE anti-join against distinct parent keys.
    "q148_ref_integrity" -> ((s, dir) =>
      graft.operators.DataQuality.referentialCheck(
        t(s, dir, "lineitem"),
        t(s, dir, "orders").filter(col("o_orderkey") % 97 =!= 0),
        keys = Seq("l_orderkey" -> "o_orderkey"))),

    // Feed completeness: daily counts vs the exact median day, thin
    // days flagged — the half-arrived-partition detector.
    "q149_feed_completeness" -> ((s, dir) =>
      graft.operators.Drift.feedCompleteness(
        t(s, dir, "events"), "ts", threshold = 0.5)),

    // PSI drift between the lineitem price distribution (reference)
    // and order totals (current): reference equi-depth buckets, 6dp
    // floored shares, per-bucket (p-q)ln(p/q) terms.
    "q150_psi_drift" -> ((s, dir) =>
      graft.operators.Drift.psi(
        t(s, dir, "lineitem").select(col("l_extendedprice").as("v")),
        t(s, dir, "orders").select(col("o_totalprice").as("v")),
        "v", nb = 4)),

    // Pareto report: parts ranked by revenue with running share —
    // the cumulative sum is the DISTRIBUTED prefix-sum shape (range
    // repartition + per-partition windows + broadcast offsets), never
    // a global single-task window.
    "q151_pareto" -> ((s, dir) =>
      graft.operators.Profile.paretoShare(
        t(s, dir, "lineitem"), Seq("l_partkey"), "l_extendedprice")),

    // Per-type OLS trend of daily totals: five decimal sums in ONE
    // map-side-combined aggregate; only the closed-form division
    // drops to rounded doubles.
    "q152_group_trend" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("y"))
        .withColumn("x",
          datediff(col("day"), lit("2024-01-01").cast("date")))
      Sketches.groupTrend(daily, Seq("event_type"), "x", "y")
    }),

    // Rolling-baseline anomaly flags on the gap-filled grid: each day
    // vs mean±2σ of its 7 PRECEDING days (the current row never votes
    // on its own baseline); moments from exact decimal frame sums.
    "q153_rolling_anomaly" -> ((s, dir) => {
      val grid = graft.operators.Resample.dailyFillForward(
        t(s, dir, "events"), "user_id", "ts", "value")
      graft.operators.Resample.rollingAnomaly(
        grid, "user_id", "day", "filled")
    }),

    // Last-touch attribution: running last non-purchase touch per
    // user (O(1) window carry), purchases credited per channel.
    "q154_attribution" -> ((s, dir) =>
      Sessionize.lastTouchAttribution(t(s, dir, "events"),
        "user_id", "ts", "event_type",
        conversionType = "purchase", valueCol = "value",
        tieCols = Seq("event_id"))),

    // SCD validity-chain audit over deliberately flawed versions:
    // overlaps (key%3==0), gaps (key%3==1), open-not-last (key%5==0)
    // — one lead() window per key, no joins; clean keys emit nothing.
    "q155_scd_audit" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"))
      def d(s0: String) = lit(java.sql.Date.valueOf(s0))
      val v1 = c.select(col("c_custkey"), lit(1).as("ver"),
        d("2020-01-01").as("eff_from"), d("2022-01-01").as("eff_to"))
      val v2 = c.select(col("c_custkey"), lit(2).as("ver"),
        when(col("c_custkey") % 3 === 0, d("2021-06-01"))
          .when(col("c_custkey") % 3 === 1, d("2022-06-01"))
          .otherwise(d("2022-01-01")).as("eff_from"),
        when(col("c_custkey") % 5 === 0, lit(null).cast("date"))
          .otherwise(d("2024-01-01")).as("eff_to"))
      val v3 = c.select(col("c_custkey"), lit(3).as("ver"),
        d("2024-01-01").as("eff_from"), lit(null).cast("date").as("eff_to"))
      graft.pipeline.Scd.validityAudit(
        v1.unionByName(v2).unionByName(v3), Seq("c_custkey"))
    }),

    // Token-budget selection: greedy fill of a 10k-token budget in
    // descending score order — running total via the distributed
    // prefix sum, never a one-task global window.
    "q156_token_budget" -> ((s, dir) =>
      graft.ml.Curation.selectToBudget(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", "n_chars", budgetTokens = 10000L)),

    // Top first-5-step user paths: per-key ordered sequence built in
    // ONE aggregation buffer (sort_array over (ts, tie, state)
    // structs — total order, partition-independent), TakeOrdered
    // top-k.
    "q157_top_paths" -> ((s, dir) =>
      Sessionize.topPaths(t(s, dir, "events"),
        "user_id", "ts", "event_type", tieCols = Seq("event_id"),
        k = 20, maxSteps = 5)),

    // Audience growth: new keys per first-seen day + running total —
    // two tiny aggregations and a calendar-sized running sum.
    "q158_user_growth" -> ((s, dir) =>
      Sessionize.userGrowth(t(s, dir, "events"), "user_id", "ts")),

    // Growth accounting: day-over-day revenue bridge split into
    // new/resurrected/expansion/contraction/churned — decimal-exact,
    // the bucket identity sums to the day's total delta.
    "q159_growth_accounting" -> ((s, dir) =>
      Sessionize.growthAccounting(t(s, dir, "events"),
        "user_id", "ts", "value")),

    // Truncated EWMA over the filled grid: integer-scaled binary
    // weights make the sequential recurrence an order-free exact
    // windowed dot product.
    "q160_ewma" -> ((s, dir) => {
      val grid = graft.operators.Resample.dailyFillForward(
        t(s, dir, "events"), "user_id", "ts", "value")
      graft.operators.Resample.ewma(grid, "user_id", "day", "filled")
    }),

    // Window-function parity suite: row_number/ntile over a total
    // order; rank/dense_rank/percent_rank/cume_dist over the tied
    // price order (ties are the point — rank semantics differ from
    // row_number exactly there).
    "q161_rank_suite" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wt = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
      val wp = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"),
          row_number().over(wt).as("rn"),
          rank().over(wp).as("rnk"),
          dense_rank().over(wp).as("drnk"),
          // raw doubles: both engines derive these from the same
          // integer rank/count ratios, so they are bit-identical —
          // a 6dp round would reintroduce half-up-vs-half-even skew
          percent_rank().over(wp).as("prnk"),
          cume_dist().over(wp).as("cdist"),
          ntile(4).over(wt).as("quartile"))
    }),

    // Day-over-day deltas per event type: lag arithmetic, null-safe
    // first day.
    "q162_dod_change" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily.select(col("event_type"), col("day"), col("n"),
        (col("n") - lag(col("n"), 1).over(w)).as("delta"),
        try_divide(col("n") - lag(col("n"), 1).over(w),
          lag(col("n"), 1).over(w)).as("pct_change"))
    }),

    // Sorted-neighborhood linkage (the merge-purge discipline): both
    // sides rank globally by name via the distributed prefix-count
    // rank, then each record compares only against the next w-1
    // positions — candidate volume exactly n*(w-1), skew-free, no
    // blocking key needed.
    "q163_sorted_neighbors" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val left = c.select(col("c_custkey"), col("c_name"))
      val dirty = c.select((col("c_custkey") + 1000000L).as("d_custkey"),
        when(col("c_custkey") % 2 === 0,
            concat(substring(col("c_name"), 1, 17),
              translate(substring(col("c_name"), 18, 1),
                "0123456789", "1234567890")))
          .otherwise(col("c_name")).as("d_name"))
      graft.ml.Linkage.sortedNeighborPairs(left, dirty,
        leftIdCol = "c_custkey", rightIdCol = "d_custkey",
        sortKeyLeft = "c_name", sortKeyRight = "d_name",
        compareLeft = "c_name", compareRight = "d_name",
        maxDistance = 2, windowSize = 10)
    }),

    // Rolling 7-day active users + stickiness: windowed DISTINCT via
    // explode-to-window-ends + re-distinct — strictly linear in
    // activity x window, never a per-day self-join.
    "q164_rolling_actives" -> ((s, dir) =>
      Sessionize.rollingActiveUsers(t(s, dir, "events"),
        "user_id", "ts", windowDays = 7)),

    // GROUPING SETS multi-grain report (A4 completeness beyond the
    // q45-q47 rollup/cube rows): three explicit grains in one pass,
    // GROUPING() flags disambiguating the null-key rows.
    "q165_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_q165")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          GROUPING(o_orderstatus) AS g_status,
          GROUPING(o_orderpriority) AS g_priority,
          count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS total
        FROM orders_q165
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      """)
    }),

    // argmin/argmax aggregates: per status the order ids carrying the
    // extreme prices, with a composite integer order key so ties
    // break identically on every engine.
    "q166_argminmax" -> ((s, dir) => {
      val v = (floor(col("o_totalprice") * 100).cast("long") *
        lit(100000000L) + col("o_orderkey")).as("__ord")
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice"), v)
        .groupBy(col("o_orderstatus"))
        .agg(
          max_by(col("o_orderkey"), col("__ord")).as("max_order"),
          min_by(col("o_orderkey"), col("__ord")).as("min_order"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
    }),

    // Per-(source, lang) corpus quality scorecard: keep-rate and mean
    // size ratios straight off integer sums (raw doubles — identical
    // IEEE on both engines, no rounding).
    "q167_quality_scorecard" -> ((s, dir) => {
      val q = TextAnalysis.qualityMetrics(
        t(s, dir, "documents"), "text")
      q.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("quality_keep"), 1L).otherwise(0L)).as("n_keep"),
          sum(col("n_tokens").cast("long")).as("total_tokens"))
        .select(col("source"), col("lang"), col("n_docs"),
          col("n_keep"),
          try_divide(col("n_keep"), col("n_docs")).as("keep_rate"),
          try_divide(col("total_tokens"), col("n_docs"))
            .as("avg_tokens"))
    }),

    // Per-group Pearson correlation: six decimal sums, one aggregate,
    // closed form in doubles.
    "q168_correlation" -> ((s, dir) =>
      Sketches.groupCorrelation(t(s, dir, "lineitem"),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice")),

    // k-NN majority-vote label eval: queries broadcast, corpus
    // streams once, neighbors via the bounded top-k heap,
    // deterministic tie-breaks end to end.
    // The eval set is PINNED (vec_id < 2000), not a corpus fraction:
    // an eval harness scores a fixed benchmark against a growing
    // corpus, so the brute kernel stays linear in the data. Letting
    // the query side grow with sf made the benched workload
    // inherently quadratic (the r9 sf1 sweep measured 49× on the 10×
    // step); per-query retrieval at scale is the ANN index family's
    // job (q44/q52), not this eval's.
    "q169_knn_classify" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.knnClassify(
        e.filter(col("vec_id") % 7 =!= 0),
        e.filter(col("vec_id") % 7 === 0 && col("vec_id") < 2000),
        "vec_id", "embedding", "label", k = 5)
    }),

    // Fulfillment-lag quantiles per priority: ship-minus-order days
    // through the per-group quantile kernel (lag is a SMALL-domain
    // integer, exactly where the value-counting percentile aggregate
    // is the right plan — contrast q87/q121's histogram path for
    // high-cardinality measures).
    "q170_fulfillment_lag" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val lag = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).as("lag_days"))
      Sketches.groupQuantiles(lag, Seq("o_orderpriority"), "lag_days",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
    }),

    // On-time shipment rate by order month: integer-count ratio as a
    // raw double (engine-identical), calendar-sized output.
    "q171_ontime_rate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(datediff(col("l_shipdate"), col("o_orderdate"))
            <= 30, 1L).otherwise(0L)).as("n_ontime"))
        .withColumn("ontime_rate",
          try_divide(col("n_ontime"), col("n_lines")))
    }),

    // Repeat-purchase intervals: per-customer order-date gaps (lag
    // window, orderkey tie-break), quantiles per priority via the
    // value-counting kernel (small-domain integer days).
    "q172_repurchase_interval" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).as("gap_days"))
        .filter(col("gap_days").isNotNull)
      Sketches.groupQuantiles(gaps, Seq("o_orderpriority"), "gap_days",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
    }),

    // Market share by nation and order year (the TPC-H Q8 shape):
    // revenue share = decimal nation sum / decimal year total, raw
    // double ratio; dims broadcast, one fact scan.
    "q173_market_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)").as("rev"))
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"), year(col("o_orderdate")).as("yr"))
      val c = t(s, dir, "customer").select(col("c_custkey"),
        col("c_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"),
        col("n_name"))
      val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("yr"), col("n_name"))
        .agg(sum(col("rev")).as("rev"))
      val totals = base.groupBy(col("yr"))
        .agg(sum(col("rev")).as("__tot"))
      base.join(broadcast(totals), Seq("yr"))
        .select(col("yr"), col("n_name"),
          col("rev").cast("double").as("revenue"),
          (col("rev").cast("double") / col("__tot").cast("double"))
            .as("share"))
    }),

    // Discount-response curve: quantity and revenue by discount band
    // (integer floor banding — DuckDB rounds double->int casts, so
    // both sides band via explicit floor), decimal means.
    "q174_discount_bands" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_discount") * 100).cast("int").as("disc_pct"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double") / count(lit(1)), 6).as("avg_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("revenue"))),

    // Supplier concentration (Herfindahl index) per ship year:
    // HHI = Σ rev_i² / (Σ rev_i)² with the squares summed as EXACT
    // decimals — a float Σ share² would be partition-order-dependent.
    "q175_supplier_hhi" -> ((s, dir) => {
      val sup = t(s, dir, "lineitem")
        .groupBy(year(col("l_shipdate")).as("yr"), col("l_suppkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
      sup.groupBy(col("yr"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("rev")).cast("double").as("total_rev"),
          sum((col("rev") * col("rev")).cast("decimal(38,4)"))
            .cast("double").as("__sq"))
        .select(col("yr"), col("n_suppliers"), col("total_rev"),
          // round(…,6): the decimal(38,4)→double cast is correctly
          // rounded in Spark but doubly-rounded in DuckDB (hugeint /
          // 10^scale), so the raw quotients differ by ~2 ULP at 1e-18
          // — rounding both sides to the repo's 6-dp ratio convention
          // makes the row comparator-proof
          round(col("__sq") / (col("total_rev") * col("total_rev")), 6)
            .as("hhi"))
    }),

    // Customer-LTV deciles: per-customer revenue through the
    // equi-depth binning kernel, then per-decile counts, totals and
    // revenue share — the classic value-segmentation report.
    "q176_ltv_deciles" -> ((s, dir) => {
      val custRev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .withColumn("rev_d", col("rev").cast("double"))
      val binned = graft.operators.Profile.equiDepthBins(
        custRev, "rev_d", nb = 10)
      // ONE pass over the binned customers; the grand total is the
      // sum of the ≤ nb per-bucket decimal sums (associative — same
      // value as summing the rows), taken as a constant-partition
      // window over the nb-row aggregate instead of a second
      // execution of the whole binning subplan (r17: `binned` was
      // referenced twice and the customer aggregate ran twice)
      binned.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev")).as("__rev"))
        .withColumn("__t", sum(col("__rev")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(pmod(col("bucket"), lit(1)))))
        .select(col("bucket"), col("n_customers"),
          col("__rev").cast("double").as("revenue"),
          (col("__rev").cast("double") / col("__t").cast("double"))
            .as("rev_share"))
    }),

    // S11 spigot graduated from spec-only to the oracle scoreboard
    // (r8 verdict #6): tee the first k rows of a deterministically
    // ordered stream to a JSON side-path, then return the SIDE-WRITTEN
    // file read back (types pinned by explicit schema — JSON carries
    // no parquet types). The sort + coalesce(1) make limit(k)
    // deterministic, so a plain LIMIT replay is the exact oracle.
    "q177_spigot" -> ((s, dir) => {
      val base = scratchDir(s, "tmp_spigot/customer")
      val in = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey")).coalesce(1)
      val teed = graft.sources.Sinks.spigot(in, base, topk = 50)
      teed.unpersist()
      s.read.schema("c_custkey long, c_name string, c_nationkey long")
        .json(base)
    }),

    // S5 sampled source graduated to the oracle scoreboard (r8
    // verdict #6): getSampleFrame(num) ≡ first-N — over a sorted
    // stream Spark plans it as TakeOrdered, so the N rows are exact
    // and a LIMIT replay oracles it.
    "q178_sampled_source" -> ((s, dir) =>
      graft.sources.Sources.sample(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .orderBy(col("o_orderkey")), 500)),

    // LSH banding S-curve (1 − (1 − s^r)^b) over a (threshold × band
    // grid) — the tuning report behind q39's (16, 4) banding choice.
    // Integer-millionths folds, floor after every multiply, so the
    // curve is engine-exact (float pow never could be).
    "q179_lsh_tuning" -> ((s, dir) => Dedup.lshTuningCurve(s)),

    // Cluster-aware leakage-free split: the split key is the near-dup
    // COMPONENT representative, so near-duplicates can never straddle
    // train/valid/test (q91's exact-key split leaks under re-crawls).
    // Oracle replays the q67 pair-graph CC and the q91 mix64 buckets
    // over coalesce(component, doc_id).
    "q180_cluster_split" -> ((s, dir) =>
      Curation.clusterAwareSplit(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id", valid1024 = 64, test1024 = 64)
        .select(col("doc_id"), col("component"), col("split"))),

    // Split leakage audit: near-dup pairs straddling the q91 exact-key
    // split — the contamination report q180's cluster-aware split
    // exists to zero out. One row per (split, split) combination.
    "q184_split_leakage" -> ((s, dir) => {
      val split = Curation.datasetSplit(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", valid1024 = 64, test1024 = 64)
      Curation.splitLeakageAudit(split, "text", "doc_id", "split")
    }),

    // S4/S10 catalog source+sink graduated: write a frame to the
    // session metastore through the sink factory, read it back with
    // the catalog source (push_down_predicate applied on read). The
    // oracle replays the filtered projection straight from parquet.
    "q185_catalog_roundtrip" -> ((s, dir) => {
      val src = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
      // a managed-table location left by an EARLIER session is orphan
      // state to a fresh in-memory catalog — saveAsTable refuses the
      // name (LOCATION_ALREADY_EXISTS); drop both table and location
      s.sql("DROP TABLE IF EXISTS default.graft_q185")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_q185")
      val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.sources.Sinks.write(src, "catalog",
        options = Map("table" -> "default.graft_q185"),
        mode = "overwrite")
      graft.sources.Sources.fromCatalog(s, "default", "graft_q185",
        pushDownPredicate = Some(col("s_acctbal") > 0))
    }),

    // X1/X2 physical ops graduated: repartition then shuffle-coalesce
    // must be CONTENT-neutral — the oracle is the untouched table, so
    // any row lost or duplicated by the exchanges fails the hash.
    "q186_physical_roundtrip" -> ((s, dir) => {
      val p = graft.operators.PhysicalOps.repartition(
        t(s, dir, "part"), 16)
      graft.operators.PhysicalOps.coalesce(p, 4, shuffle = true)
    }),

    // C1/C2/C3 collection combinators graduated to the scoreboard:
    // build a {high, low} price-band collection, map an aggregation
    // over every member, flatMap a band tag back in, select both legs
    // and union — each combinator's output feeds the next, so the
    // oracle (one grouped CASE aggregation) gates the whole chain.
    "q181_collection_ops" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import graft.core.{GlueFrame, GlueFrameCollection}
      val o = t(s, dir, "orders")
      val coll = GlueFrameCollection(Map(
        "high" -> GlueFrame(o.filter(col("o_totalprice") > 250000)),
        "low"  -> GlueFrame(o.filter(col("o_totalprice") <= 250000))))
      val mapped = coll.map(g => g.transform(df =>
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("total"))))
      val tagged = mapped.flatMap((k, g) =>
        Seq(k -> g.transform(_.withColumn("band", lit(k)))))
      tagged.select("high").data
        .unionByName(tagged.select("low").data)
    }),

    // S6 RDD source graduated: a Row RDD wrapped back into a frame
    // with an explicit schema — the create_dynamic_frame_from_rdd
    // path — must round-trip values and types exactly.
    "q182_rdd_source" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      graft.sources.Sources.fromRdd(s, base.rdd, base.schema)
    }),

    // R9 with_frame_schema graduated: reshape a frame to a TARGET
    // schema (prune to two columns, reorder, retype n_chars to int)
    // via Dataset.to — the reader-schema contract end-to-end.
    "q183_with_schema" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      t(s, dir, "documents").to(StructType(Seq(
        StructField("lang", StringType),
        StructField("n_chars", IntegerType),
        StructField("doc_id", LongType))))
    }),

    // Auto-sized LSH near-dup pairs (r9 verdict #2): the q53 kernel
    // with `planes` DERIVED from corpus cardinality —
    // autoPlanes(count, targetBucket=16) — so the bucketed self-join's
    // candidate volume stays ~n·16/2 per band at every scale instead
    // of drifting quadratic on a fixed plane count; since r14 the
    // default ALSO auto-sizes the band count (autoBands at the derived
    // r). The input is PINNED to `vec_id < 500` (ADVICE r10): the
    // oracle inlines the plane matrix for autoPlanes(500, 16) and the
    // band count autoBands(0.35, 5), so the engine must derive the
    // same cardinality on every data dir — the pin (plus gen_sf.py's
    // 500-row embeddings floor) makes that true by construction
    // instead of by generator-version luck. The derivation itself is
    // still live: the engine counts the pinned frame and sizes from
    // the count; the growth path is exercised by MlSpec's autoPlanes
    // cases and the q197 twin.
    "q188_auto_lsh_pairs" -> ((s, dir) =>
      Similarity.nearDupPairs(
        t(s, dir, "embeddings").filter(col("vec_id") < Q188Cardinality),
        "vec_id", "embedding",
        dim = 64, minCosine = 0.35, targetBucketSize = Some(16L))
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))),

    // Cap-default audit (ADVICE r9): the visibility companion to
    // Dedup.DefaultMaxShingleFreq — distinct-shingle DF census with
    // the candidate-pair mass the 256 cap would remove on THIS
    // corpus, so the approximate-by-default semantics of
    // jaccardPairs/clusters is a measured number at the call site,
    // not a silent knob. One shuffle on 8-byte shingle hashes.
    "q187_shingle_cap_audit" -> ((s, dir) =>
      Dedup.shingleCapStats(t(s, dir, "documents"), "text")),

    // T1 batch policy graduated (r9 verdict #4): drive
    // MicroBatch.runBatch over five deterministic "micro-batches" of
    // orders (batch b = o_orderkey % 4; batch 4 is EMPTY) with an
    // injected batch function that throws on its first (b % 3)
    // attempts. The collected metrics table then oracle-checks the
    // whole policy arithmetic — empty-batch skip (no row for batch 4),
    // retry-until-success attempt counts, exact per-batch record
    // counts — against plain SQL. Wall-clock processingTimeMs is
    // dropped (nondeterministic by nature); sleeps are injected no-ops.
    "q189_batch_policy" -> ((s, dir) => {
      import graft.streaming.MicroBatch
      val o = t(s, dir, "orders")
      val metrics =
        scala.collection.mutable.ArrayBuffer.empty[MicroBatch.BatchMetrics]
      (0L to 4L).foreach { b =>
        val batch =
          if (b == 4L) o.filter(lit(false)) // the empty-batch skip leg
          else o.filter(col("o_orderkey") % 4 === b)
        var failuresLeft = (b % 3).toInt
        MicroBatch.runBatch(
          batch, b,
          (_, _) => if (failuresLeft > 0) {
            failuresLeft -= 1
            throw new RuntimeException(s"injected failure, batch $b")
          },
          batchMaxRetries = 3,
          storageLevel = org.apache.spark.storage.StorageLevel.MEMORY_ONLY,
          onMetrics = metrics += _,
          sleepMs = _ => ())
      }
      import s.implicits._
      metrics.toSeq
        .map(m => (m.batchId, m.numRecords, m.attempts))
        .toDF("batch_id", "num_records", "attempts")
    }),

    // X3/X4 partition probes graduated (r9 verdict #4): the physical
    // controls emitted as a one-row frame against a constant oracle —
    // repartition lands exactly n, shuffle-coalesce shrinks through a
    // repartition, X4 widens a small scan to the floor and is a
    // provable NO-OP (reference identity) when the scan already meets
    // it. getNumPartitions answers post-AQE; the probe numbers are
    // partition-layout facts, independent of the data scale the
    // driver verifies at.
    "q190_partition_probe" -> ((s, dir) => {
      import graft.operators.PhysicalOps
      val o = t(s, dir, "orders")
      val widened = PhysicalOps.withMinPartitions(o, 9)
      val noop = PhysicalOps.withMinPartitions(o, 1)
      import s.implicits._
      Seq((
        PhysicalOps.getNumPartitions(PhysicalOps.repartition(o, 7)),
        PhysicalOps.getNumPartitions(
          PhysicalOps.coalesce(PhysicalOps.repartition(o, 8), 3,
            shuffle = true)),
        PhysicalOps.getNumPartitions(widened),
        noop eq o))
        .toDF("n_repart", "n_coalesce", "n_widened", "noop_identity")
    }),

    // Distributed BPE merge learning (r9 verdict #5 — the one missing
    // step of the corpus→model data path): 8 merge rounds over the
    // word-type table, each a map-side-combined pair census + a
    // one-row argmax + a broadcast greedy merge. The oracle replays
    // every round in generated SQL with the identical tie-break.
    "q191_bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(t(s, dir, "documents"), "text",
        merges = bpeRounds)),

    // The learned merges applied back to the corpus: word types
    // segment once, documents reassemble from a size-guarded lookup
    // join (broadcast only under the measured word-type cardinality
    // limit — r10 verdict #1) — subword tokens flattened to one
    // space-joined string per doc.
    "q192_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val m = TextAnalysis.bpeTrain(docs, "text", merges = bpeRounds)
        .orderBy(col("merge_rank"))
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      TextAnalysis.bpeEncode(docs, "text", "doc_id", m)
    }),

    // Batched BPE merge learning (r10 verdict #3 — sequential
    // bpeTrain at production merge counts costs one driver round-trip
    // PER MERGE): up to `batch` symbol-disjoint top census pairs per
    // round, applied in one pass. batch = 3 < merges forces several
    // rounds, so the oracle replays multi-round selection, the
    // cumulative budget cap, and multi-merge application — including
    // the greedy disjoint scan itself (a recursive CTE).
    "q195_bpe_train_batched" -> ((s, dir) =>
      TextAnalysis.bpeTrainBatched(t(s, dir, "documents"), "text",
        merges = bpeRounds, batch = bpeBatchSize)),

    // DOULION sampled triangle estimate (r10 verdict #2 — the named
    // scale path for q129's exact Θ(m^1.5) closure): the co-purchase
    // pairs sparsify at p = 1/4 by a deterministic mix64 edge hash
    // pushed BELOW the derivation's dedup exchange (no RNG state —
    // the oracle replays every keep decision; the pushed filter is
    // set-identical to sampling the final edges), the exact
    // edge-centric closure runs on the sample, and the count scales
    // by 1/p³ = 64 (unbiased; variance T·(1/p³−1) + 2k·(1/p−1) per
    // the DOULION paper). One output row.
    "q193_triangles_sampled" -> ((s, dir) =>
      Graph.triangleEstimateFromSample(
        coPurchaseEdgesSampled(s, dir,
          GraphSampleDenomTri, 1, GraphSampleSeed),
        "p1", "p2", denom = GraphSampleDenomTri, keep = 1,
        broadcastEdgeLimit = 32000000L, canonical = true)),

    // Semantic-bucket balanced sampling: LSH sign-pattern buckets
    // (semantically close docs collide) capped per bucket by a
    // deterministic mix64 priority — topic de-biasing without a topic
    // model, the content-side analogue of q79's domain caps. Cap via
    // the size-capped TopK heap (no window over hot buckets). The
    // q188 discipline: input PINNED to Q188Cardinality so the
    // engine-derived plane count equals the oracle's inlined matrix;
    // the growth path benches un-pinned as q198.
    "q196_semantic_balance" -> ((s, dir) =>
      Curation.semanticBalancedSample(
        t(s, dir, "embeddings").filter(col("vec_id") < Q188Cardinality),
        "vec_id", "embedding", dim = 64, planes = 0,
        capPerBucket = Q196Cap, sampleSeed = Q196SampleSeed,
        targetBucketSize = Q196TargetBucket)),

    // Semantic decontamination: training embeddings near an EVAL-set
    // embedding (bucket-local candidates, exact cosine rerank) — the
    // embedding-space complement of q70's n-gram contamination check
    // (paraphrased benchmark leaks share no n-grams). Pinned input +
    // derived plane count, the q188/q196 discipline; auto sizing off
    // the TRAIN side.
    "q199_semantic_decon" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Curation.semanticContaminationPairs(
        e.filter(col("vec_id") >= Q199EvalSplit &&
          col("vec_id") < Q188Cardinality),
        e.filter(col("vec_id") < Q199EvalSplit),
        "vec_id", "embedding", dim = 64, minCosine = Q199MinCosine,
        planes = 0, targetBucketSize = Q199TargetBucket)
    }),

    // Sparsified k-core (r10 verdict #2 — q137's named scale path):
    // the same bounded peeling on the deterministic p = 1/2 edge
    // sample at threshold k·p = 40; sampled degrees concentrate at
    // p·deg, so the surviving membership approximates the exact
    // 80-core on half the edge volume. Exact-replayable: the oracle
    // applies the identical keep decisions and peels.
    "q194_kcore_sampled" -> ((s, dir) =>
      Graph.kCorePeel(
        coPurchaseEdgesSampled(s, dir,
          GraphSampleDenomCore, 1, GraphSampleSeed),
        "p1", "p2", k = KcoreSampledK, iters = 3, canonical = true)),

    // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    // positional 3-gram FNV hashes, minimum of every 4-hash window,
    // distinct per doc — the standard plagiarism/overlap fingerprint
    // at ~2/(w+1) the density of the full shingle set. Both kernels
    // are native expressions; one codegen pass per row, no shuffle.
    "q43_winnow" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextAnalysis.winnowFingerprint(col("text"), 3, 4))
            .as("fp"))),

    // Gopher-style repetition signals: duplicate-token ratio and
    // dominant-bigram count, integer-exact, one codegen pass per row.
    "q56_repetition" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.repetitionMetrics(col("text")).as("r"))
        .select(col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          col("r.n_distinct").as("n_distinct"),
          col("r.top_bigram").as("top_bigram"))),

    // TF-IDF top-5 keywords per document: TF and DF map-side-combined
    // aggregations, token-keyed join of count triples (text never
    // shuffles), broadcast corpus size, windowed top-k.
    "q57_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id", k = 5)),

    // PII redaction over a corpus seeded with synthetic emails/ids —
    // engine-portable ASCII regex classes, replacement verified
    // string-exact against the oracle.
    "q58_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.redactPii(concat(col("text"),
            lit(" contact: user"), col("doc_id").cast("string"),
            lit("@example.com case 123456789"))).as("redacted"))),

    // As-of join (point-in-time lookup): every event picks up the most
    // recent purchase by the same user at-or-before its timestamp.
    // Union-sort shape: one key shuffle, a running-last window, no
    // range cross-product. The purchase side is pre-deduplicated to
    // one row per (user, ts) so ties are deterministic in any engine.
    "q59_asof" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"),
          max_by(col("value"), col("event_id")).as("purchase_value"))
      Joins.asOfJoin(
        e.select(col("event_id"), col("user_id"), col("ts")),
        purchases, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("purchase_id"), col("purchase_value"))
    }),

    // Int8 scalar quantization + quantized ANN: explicit-floor affine
    // codes (bit-identical across engines), 64-bit integer dot-product
    // scores — the 4×-compressed storage/scan path for 100 TB
    // embedding tables.
    "q60_ann_quantized" -> ((s, dir) =>
      Similarity.quantizedTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 10)),

    // Gap-based sessionization: one key shuffle, two windows over the
    // same sort order, one aggregation — no self-join, no range
    // blow-up. Timestamps normalized to epoch-MICROS on both sides
    // (the oracle engine's timestamp type is micro-precision),
    // 30-minute gap in the same unit. events.ts has shipped as both
    // TIMESTAMP(NANOS) (long under nanosAsLong) and TIMESTAMP(MICROS)
    // across testdata generations — branch on the read type.
    "q61_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val tsUs = e.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => expr("ts div 1000")
        case _ => unix_micros(col("ts").cast("timestamp"))
      }
      Sessionize.sessions(
        e.select(col("user_id"), tsUs.as("ts_us")),
        "user_id", "ts_us", gap = 1800L * 1000 * 1000)
        .select(col("user_id"), col("session_seq").cast("long")
          .as("session_seq"),
          col("session_start"), col("session_end"), col("n_events"))
    }),

    // Pivot: per-user event-type counts over an EXPLICIT value list
    // (no driver-side distinct scan — the two-arg pivot with inferred
    // values runs an extra job and makes the schema data-dependent).
    "q62_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +: types.map(v =>
        coalesce(col(v), lit(0L)).as(s"n_$v")): _*)
    }),

    // CUBE over orders: all four grouping sets in one pass (Expand +
    // single aggregation — Spark rewrites cube to one shuffle, not
    // 2^k scans). Sum routes through DECIMAL per the header policy.
    "q63_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("total"))),

    // Deterministic stratified sampling: keep iff mix64(doc_id) mod
    // 1024 clears the stratum's integer threshold — a stateless
    // codegen'd projection (no shuffle, no RNG state), reproducible
    // under task retry/re-splitting, downsampling the dominant
    // language 4× harder than the rest (the usual corpus-balancing
    // move).
    "q64_stratified_sample" -> ((s, dir) =>
      Sketches.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        rates1024 = Map("en" -> 128, "de" -> 512, "es" -> 512,
          "fr" -> 512, "zh" -> 512), seed = 7)),

    // Exact heavy hitters + count-min cross-check: top-20 corpus
    // tokens by exact frequency, each with its CMS estimate (4×1024
    // counter matrix, mergeable by addition; est ≥ exact always, the
    // gap is collision error).
    "q65_heavy_hitters" -> ((s, dir) => {
      val tok = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(length(col("token")) > 0)
      Sketches.heavyHitters(tok, "token", k = 20)
    }),

    // Per-doc token Shannon entropy: boilerplate/diffuse-repetition
    // quality signal; integer counts, 4-dp-rounded double output.
    "q66_entropy" -> ((s, dir) =>
      TextAnalysis.tokenEntropy(
        t(s, dir, "documents"), "text", "doc_id")),

    // Near-dup CLUSTERS: connected components over the exact Jaccard
    // pair graph — pairs to transitive keep/drop decisions, the step
    // every dedup pipeline needs after candidate verification.
    // Exact-duplicate groups contract to one representative BEFORE
    // the pair kernel (a component-preserving graph quotient — equal
    // texts pair identically), then min-label propagation, one
    // (id,label)-keyed shuffle per round. The expansion restores
    // every uncontracted node, so the output is frame-identical to
    // CC over the full pair graph (the oracle closes that full graph).
    "q67_dedup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.clusters(doubled, "text", "doc_id")
        .select(col("id"), col("component"))
    }),

    // Bloom-prefiltered semi-join: lineitems of high-value orders.
    // The probe side sheds non-matching rows in a codegen'd stateless
    // pass BEFORE the shuffle (8 KiB driver-built bitset, portable
    // mix64 hashes); the exact semi-join on survivors makes the
    // result identical to the plain semi-join.
    "q68_bloom_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val hot = t(s, dir, "orders")
        .filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"))
      Joins.bloomSemiJoin(li, "l_orderkey", hot, "o_orderkey")
    }),

    // Corpus-wide line dedup (C4 preprocessing): documents are chunked
    // into deterministic 8-token lines (the corpus has no newlines),
    // then every line is kept only at its first (doc_id, idx)
    // occurrence and documents reassemble from survivors. Two
    // map-side-combined shuffles, no join — line text crosses the wire
    // at most once per distinct line.
    "q69_line_dedup" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      val chunked = t(s, dir, "documents")
        .select(col("doc_id"),
          array_join(
            transform(
              sequence(lit(0), floor((size(toks) - 1) / 8).cast("int")),
              i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")),
            "\n").as("text"))
      Dedup.dedupLines(chunked, "text", "doc_id")
        .select(col("doc_id"), col("n_kept"),
          col("text").as("clean_text"))
    }),

    // Benchmark contamination (GPT-3/PaLM decontamination): distinct
    // 3-gram overlap of every document against an eval split (here
    // doc_id % 50 = 0). Eval shingles broadcast; corpus text never
    // shuffles — only (id, count) partial-agg rows move.
    "q70_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.ngramContamination(
        d, d.filter(col("doc_id") % 50 === 0), "text", "doc_id")
    }),

    // Exact column profile over orders: one aggregation job (Expand for
    // the exact distincts), exploded to a row per column. The 100 TB
    // variant is Profile.approxProfile (single-pass HLL++, no Expand) —
    // same shape, asserted against this exact one in ApiSpec.
    "q71_profile" -> ((s, dir) =>
      graft.operators.Profile.profile(
        t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_totalprice"))),

    // Salted skewed join, graduated to a correctness row: lineitem's
    // hot order keys spread over 4 salts (deterministic row-hash), the
    // urgent-orders side replicated 4× — result-identical to the plain
    // equi-join (the oracle). The variant for skew AQE's sort-merge
    // split can't reach: bucketed inputs, hot post-shuffle partitions.
    "q72_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_totalprice"))
      Joins.saltedJoin(li, Seq("l_orderkey"), urgent, Seq("o_orderkey"),
          salts = 4)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("o_totalprice"))
    }),

    // Partition-layout ETL: write orders hive-partitioned by status,
    // read back with a partition filter — at 100 TB this is the
    // difference between scanning a directory and scanning the lake
    // (the plan's PartitionFilters row, asserted in ApiSpec).
    "q73_partitioned_etl" -> ((s, dir) => {
      val path = scratchDir(s, "tmp_part/orders")
      t(s, dir, "orders").write.mode("overwrite")
        .partitionBy("o_orderstatus").parquet(path)
      s.read.parquet(path)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderstatus"))
    }),

    // JSONL round-trip: write documents through the JSON-lines sink,
    // read back with schema inference — the interchange format every
    // crawl/training-data feed actually arrives in.
    "q74_jsonl_roundtrip" -> ((s, dir) => {
      val path = scratchDir(s, "tmp_jsonl/documents")
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
        .write.mode("overwrite").json(path)
      s.read.json(path)
        .select(col("doc_id"), col("lang"), col("text"))
    }),

    // Data-mixture resampling: English 1.5 epochs (one copy always,
    // a second for half the ids by mix64 bucket), everything else
    // down-sampled to 0.5 — stateless projection + explode, no
    // shuffle, task-retry-reproducible.
    "q75_data_mixture" -> ((s, dir) =>
      Sketches.weightedMix(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", Map("en" -> 1536), default1024 = 512)),

    // Sequence-packing manifest: global token offsets via distributed
    // prefix sum (range partition → parallel local sums → broadcast
    // partition totals), then each doc's fixed-512-token sequence
    // range. The oracle's global window IS the single-task plan this
    // operator exists to avoid.
    "q76_seq_pack" -> ((s, dir) =>
      TextAnalysis.packingManifest(
        t(s, dir, "documents"), "doc_id", "text", seqLen = 512)),

    // Incremental ingestion dedup: a new crawl batch (two thirds of it
    // verbatim re-crawls) anti-joined on fingerprint against the base
    // corpus — only genuinely new text survives.
    "q77_incremental_dedup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = base.select(
        (col("doc_id") + 200000).as("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" fresh tail")))
          .otherwise(col("text")).as("text"))
      Dedup.incrementalExact(batch, base, "text")
    }),

    // Choice inference on read — the Glue-distinctive ingest path:
    // JSON lines whose "v" is an int for most keys but a quoted
    // string for every third; the reader folds per-record variant
    // schemas through the ported mergeDataTypes, surfaces the
    // conflict as an encoded choice column, and resolveChoice
    // cast:string flattens it for output.
    "q78_choice_infer" -> ((s, dir) => {
      val path = scratchDir(s, "tmp_choice_json/customer")
      t(s, dir, "customer")
        .select(concat(
          lit("{\"k\": "), col("c_custkey").cast("string"),
          lit(", \"v\": "),
          when(col("c_custkey") % 3 === 0,
            concat(lit("\"id-"), col("c_custkey").cast("string"),
              lit("\"")))
            .otherwise(col("c_custkey").cast("string")),
          lit("}")).as("value"))
        .write.mode("overwrite").text(path)
      val inferred = graft.sources.ChoiceInfer.readJson(s, path)
      ChoiceOps.resolveChoice(inferred, Seq("v" -> "cast:string"))
        .select(col("k"), col("v"))
    }),

    // Per-domain document caps (C4/RefinedWeb curation): at most 10
    // docs per URL host, smallest doc_ids win deterministically.
    // Two bounded aggregations, not a window — a hot domain never
    // lands in one task.
    "q79_domain_cap" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          concat(lit("https://"), col("source"),
            lit(".example.com/doc/"), col("doc_id").cast("string"))
            .as("url"))
      Curation.domainCap(d, "url", "doc_id", maxPerDomain = 10)
        .select(col("doc_id"), col("lang"))
    }),

    // End-to-end fuzzy dedup: verified Jaccard pairs -> transitive
    // closure -> keep each cluster's min id + unpaired docs. The
    // oracle replays the closure with a recursive CTE.
    "q80_fuzzy_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      Dedup.fuzzyDedup(doubled, "text", "doc_id")
        .select(col("doc_id"))
    }),

    // Governed-table transactions (context.py:676-683): two committed
    // appends and one cancelled write against a manifest-versioned
    // table; the latest-snapshot read must see exactly the committed
    // rows. The oracle is the relational shadow of the two commits.
    "q81_governed_txn" -> ((s, dir) => {
      // per-run temp location: never mutates the repo tree, safe under
      // a parallel bench or a read-only checkout
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_governed_" +
        java.util.UUID.randomUUID().toString.take(8) + "/nation"
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sessionState.newHadoopConf())
        .delete(new org.apache.hadoop.fs.Path(path), true) // fresh re-runs
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val t1 = graft.sources.GovernedTable.startTransaction(s, path)
      graft.sources.GovernedTable.write(s, t1, n.filter(col("n_regionkey") <= 1))
      graft.sources.GovernedTable.commitTransaction(s, t1)
      val bad = graft.sources.GovernedTable.startTransaction(s, path)
      graft.sources.GovernedTable.write(s, bad, n.filter(col("n_regionkey") === 2))
      graft.sources.GovernedTable.cancelTransaction(s, bad)
      val t2 = graft.sources.GovernedTable.startTransaction(s, path)
      graft.sources.GovernedTable.write(s, t2, n.filter(col("n_regionkey") >= 3))
      graft.sources.GovernedTable.commitTransaction(s, t2)
      graft.sources.GovernedTable.read(s, path)
    }),

    // Bucketed co-located join: orders and lineitem written bucketBy
    // the order key, then joined and aggregated with ZERO exchanges —
    // the write-once-join-often layout (BucketingSpec asserts the
    // exchange-free plan; this query gates the numbers).
    "q82_bucketed_join" -> ((s, dir) => {
      // EXTERNAL tables under a per-run temp dir: the warehouse and
      // the repo tree are never touched (parallel-bench / read-only
      // FS safe). DROP clears any stale same-name catalog entry from
      // an earlier query in this session.
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_" +
        java.util.UUID.randomUUID().toString.take(8)
      Seq("graft_b_orders", "graft_b_lineitem").foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
      }
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      graft.operators.Bucketing.writeBucketed(
        o, "graft_b_orders", Seq("o_orderkey"), 8,
        sortCols = Seq("o_orderkey"), location = Some(s"$base/orders"))
      graft.operators.Bucketing.writeBucketed(
        l, "graft_b_lineitem", Seq("o_orderkey"), 8,
        sortCols = Seq("o_orderkey"), location = Some(s"$base/lineitem"))
      graft.operators.Bucketing
        .bucketedJoin(s, "graft_b_orders", "graft_b_lineitem", Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          count(lit(1)).as("n_lines"))
    }),

    // Deterministic epoch shuffle: every epoch is a reproducible
    // pseudo-random permutation — (shard, pos) assigned from the
    // epoch-keyed mix64, no RNG state. The oracle replays the mix in
    // SQL and ranks within shards.
    "q83_epoch_shuffle" -> ((s, dir) =>
      Curation.epochShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", epoch = 3, numShards = 8)),

    // Corpus n-gram LM familiarity scoring (CCNet-shaped quality
    // signal): trigram counts trained on the corpus itself, Zipf tail
    // pruned below minCount, every doc scored by an integer
    // floor(log2) log-likelihood proxy — engine-exact, no floating
    // point log.
    "q84_ngram_lm_score" -> ((s, dir) =>
      TextAnalysis.ngramLmScore(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id")),

    // Fuzzy incremental ingestion dedup: a re-crawl batch where most
    // docs differ from the corpus only by a boilerplate tail (which
    // defeats q77's exact fingerprint anti-join) and every fifth doc
    // is genuinely novel; LSH band collision against the corpus index
    // drops the near-dups, the novel docs survive.
    "q85_incremental_minhash" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = base.select(
        (col("doc_id") + 200000).as("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("novel crawl page "), col("doc_id").cast("string"),
            lit(" entirely unseen content "),
            (col("doc_id") * 31).cast("string")))
          .otherwise(concat(col("text"), lit(" boilerplate tail")))
          .as("text"))
      Dedup.incrementalMinhash(batch, base, "text", "doc_id")
    }),

    // Leak-free deterministic dataset split: mix64(doc_id) buckets →
    // valid/test/train labels; a document can never migrate between
    // splits across runs or corpus snapshots.
    "q91_dataset_split" -> ((s, dir) =>
      Curation.datasetSplit(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", valid1024 = 64, test1024 = 64)),

    // Z-order (Morton) layout key: bit-interleave two join/filter
    // dimensions so range-sorted files carry compact bounding boxes in
    // BOTH — file-statistics pruning for either predicate.
    "q92_zorder_key" -> ((s, dir) =>
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.Layout.zOrderKey(
          col("l_partkey"), col("l_suppkey"), 10).as("zkey"))),

    // Collocation mining: document co-occurrence counts for df-banded
    // term pairs — the integer sufficient statistics for PMI.
    "q94_cooccurrence" -> ((s, dir) =>
      TextAnalysis.cooccurrence(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id", minDf = 20, maxDf = 4000, minPairCount = 5)),

    // End-to-end curation pipeline (the composed flagship): quality
    // floor -> exact dedup -> leak-free split -> train shard ->
    // sequence-packing manifest. One oracle replays the whole chain,
    // so the COMPOSITION is hash-checked, not just the parts.
    "q93_curation_pipeline" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val quality = base.filter(TextAnalysis.tokenCount(col("text")) >= 5)
      val deduped = Dedup.exact(quality, "text", "doc_id")
      val train = Curation.datasetSplit(deduped, "doc_id", 64, 64)
        .filter(col("split") === "train").drop("split")
      TextAnalysis.packingManifest(train, "doc_id", "text", seqLen = 512)
    }),

    // URL canonicalization: messy crawl URLs (mixed-case scheme/host,
    // default ports, userinfo, trailing slash, tracking params,
    // fragments) normalized to the dedup key form. Regex-only, so the
    // oracle replays the identical ASCII rules.
    "q89_url_canonical" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 3 === 0, lit("HTTP://WWW.Example.COM:80"))
            .when(col("doc_id") % 3 === 1, lit("https://CDN.example.com:443"))
            .otherwise(lit("https://user@Example.com:8443")),
          lit("/Docs/"), col("doc_id").cast("string"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&b=2&a=1&gclid=x#frag")).as("url"))
      d.select(col("doc_id"),
        Curation.canonicalizeUrl(col("url")).as("canon_url"))
    }),

    // Corpus-overlap estimate: two snapshots (half the docs replaced
    // by novel text) reduce to 64-row corpus MinHash signatures; the
    // estimator is the fraction of agreeing seeds — no corpus join.
    "q90_corpus_overlap" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val snap = base.select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(lit("novel snapshot page "), col("doc_id").cast("string"),
            lit(" fresh content "), (col("doc_id") * 17).cast("string")))
          .otherwise(col("text")).as("text"))
      Dedup.corpusOverlap(base, snap, "text")
    }),

    // SemDeDup (semantic dedup over embeddings): q53's banded pairs
    // (the r14 recall-sized default) -> transitive closure -> keep
    // each cluster's min id + every unpaired vector. The oracle
    // replays the deterministic banded bucketing and closes over the
    // pair graph with a recursive CTE.
    "q86_semdedup" -> ((s, dir) =>
      Similarity.semDedup(
        t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", dim = 64, minCosine = 0.35, planes = 4)
        .select(col("vec_id"))),

    // Exact distributed quantiles (no global sort): value histogram ->
    // range-partitioned prefix sums -> broadcast rank probe. The
    // oracle computes the same lower-interpolation ranks by window.
    "q87_exact_quantiles" -> ((s, dir) =>
      Sketches.exactQuantiles(
        t(s, dir, "lineitem").select(col("l_extendedprice")),
        "l_extendedprice", Seq(0.01, 0.25, 0.5, 0.75, 0.99))),

    // Inverted index with df-band pruning: census first ([minDf,
    // maxDf] — the upper bound keeps every posting-assembly task
    // bounded), postings only for surviving terms. The array is
    // flattened to a space-joined scalar for the harness comparator
    // (order is already deterministic: ids ascend).
    "q88_inverted_index" -> ((s, dir) =>
      TextAnalysis.invertedIndex(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id", minDf = 2, maxDf = 4000)
        .withColumn("postings",
          array_join(transform(col("postings"), x => x.cast("string")),
            " "))),

    // Bucketized range join: value-to-band lookup as an EQUI-join on
    // interval buckets (Spark's native plan for a bare BETWEEN is a
    // nested loop). Integer-derived points/intervals so the oracle
    // replays exactly; counts per interval aggregate the pair table.
    "q95_range_join" -> ((s, dir) => {
      val pts = t(s, dir, "lineitem")
        .select((col("l_partkey") * 20 + col("l_linenumber")).as("p"))
      val iv = t(s, dir, "part").select(col("p_partkey"),
        (col("p_partkey") * 20).as("lo"),
        (col("p_partkey") * 20 + 3 + pmod(col("p_partkey"), lit(25)))
          .as("hi"))
      Joins.rangeJoin(pts, iv, "p", "lo", "hi", bucketWidth = 16)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_pts"), sum(col("p")).as("sum_p"))
    }),

    // Token-window chunking (RAG / context packing): 64-token chunks
    // overlapping by 16, redundant tails suppressed, stable
    // (doc, chunk_idx) identity.
    "q96_doc_chunks" -> ((s, dir) =>
      Curation.chunkDocuments(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", chunkTokens = 64, overlapTokens = 16)),

    // Filter-funnel audit: one scan, one aggregation, per-stage
    // survivor counts of the cumulative cascade.
    "q97_filter_funnel" -> ((s, dir) =>
      Curation.filterFunnel(t(s, dir, "documents"), Seq(
        "min_chars" -> (col("n_chars") >= 150),
        "lang_en" -> (col("lang") === "en"),
        "token_floor" -> (TextAnalysis.tokenCount(col("text")) >= 30)))),

    // Vocabulary build: occurrence census, minCount prune, contiguous
    // frequency-ranked ids via distributed prefix sum (no single-task
    // global sort).
    "q98_vocab" -> ((s, dir) =>
      TextAnalysis.buildVocab(
        t(s, dir, "documents").select(col("text")), "text", minCount = 5)),

    // Snapshot diff: a synthetic next release (every 7th doc removed,
    // every 5th edited, every 10th re-added under a new id) diffed
    // against the current corpus by fingerprint full-outer join.
    "q99_snapshot_diff" -> ((s, dir) => {
      val old = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val neu = old
        .filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(old.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 500000).as("doc_id"), col("text")))
      Curation.snapshotDiff(old, neu, "doc_id", Seq("text"))
    }),

    // Per-key top-n via the bounded-state TopK aggregate (map-side
    // combine; no per-key window sort): each customer's 2 priciest
    // orders, orderkey tie-break.
    "q100_topn_per_key" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.operators.TopN.topNPerKey(o, Seq("o_custkey"),
        Seq(col("o_totalprice") * -1, col("o_orderkey")), n = 2)
    }),

    // Dedup-key normalization: case/punct/digit/whitespace-invariant
    // text view for hashing; regex-only so both engines replay it.
    "q101_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.normalizeForDedup(col("text")).as("norm_text"))),

    // Tokenizer application: train the q98 vocabulary, then encode
    // every document to ordered token ids with OOV classing — the
    // vocab broadcasts, the corpus never shuffles against it. The id
    // array is flattened to a space-joined scalar for the harness
    // comparator (order is already deterministic: positions ascend).
    "q102_encode" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val vocab = TextAnalysis.buildVocab(d.select(col("text")),
        "text", minCount = 5)
      TextAnalysis.encodeDocuments(d, "text", "doc_id", vocab)
        .withColumn("token_ids",
          array_join(transform(col("token_ids"), x => x.cast("string")),
            " "))
    }),

    // Compaction planning: a synthetic file listing (one row per
    // part) binned to ~64 MB rewrite groups per brand directory.
    "q103_compaction_plan" -> ((s, dir) => {
      val listing = t(s, dir, "part").select(
        col("p_brand").as("dir"),
        concat(lit("f"), col("p_partkey").cast("string")).as("file"),
        (pmod(col("p_partkey") * 2654435761L, lit(97L)) * 1048576L)
          .as("bytes"))
      graft.operators.Layout.compactionPlan(
        listing, "dir", "file", "bytes", targetBytes = 64L * 1048576L)
    }),

    // ---------------------------------------------------------------- R7
    // Chained embedding-pipeline stage (the q93 composition pattern):
    // token-window chunking → vocabulary encode of each chunk →
    // packing manifest over the encoded stream. One query exercises
    // the full chunk→encode→pack path a pretraining-shard writer
    // runs; ids stay synthetic-composite (doc*100000+chunk — room for
    // ~4.8M-token documents without collision) so both
    // engines order identically, and token_ids flattens to the
    // harness-sortable scalar (q88/q102 discipline).
    "q104_chunk_encode_pack" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val chunks = Curation.chunkDocuments(
          d, "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
        .select((col("doc_id") * 100000 + col("chunk_idx")).as("chunk_id"),
          col("chunk_text"))
      val vocab = TextAnalysis.buildVocab(d.select(col("text")),
        "text", minCount = 5)
      // Fused encode→pack: offsets computed in-lineage on the encoded
      // frame (its n_tokens — identical to a re-tokenization by
      // construction, and oracle-checked), so the token_ids payload
      // crosses exactly ONE exchange (the pack's range repartition)
      // instead of the old regroup + rejoin pair; the encode itself
      // is map-only via the VocabEncode kernel (r11 verdict #3: the
      // q104 sf10 step).
      val enc = TextAnalysis.encodeDocuments(
        chunks, "chunk_text", "chunk_id", vocab)
      TextAnalysis.packingManifestFrom(
        enc, "chunk_id", "n_tokens", seqLen = 128)
        .select(col("chunk_id"), col("n_tokens"), col("n_oov"),
          col("offset"), col("seq_first"), col("seq_last"),
          array_join(transform(col("token_ids"), x => x.cast("string")),
            " ").as("token_ids"))
    }),

    // Governed-table maintenance end-to-end: three committed append
    // snapshots of deliberately-small files, one atomic OPTIMIZE
    // overwrite version via compact(), then a reference-aware
    // vacuum() retiring the pre-compaction history and its now-
    // unreferenced files — content must still be exactly the
    // committed rows (the oracle is the relational shadow; file-count
    // shrink, time-travel validity, and the minAgeHours guard are
    // spec-asserted in GovernedTableSpec).
    "q105_governed_compact" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_gcompact_" +
        java.util.UUID.randomUUID().toString.take(8) + "/nation"
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      Seq(col("n_regionkey") <= 1, col("n_regionkey") === 2,
          col("n_regionkey") >= 3).foreach { pred =>
        val txn = graft.sources.GovernedTable.startTransaction(s, path)
        graft.sources.GovernedTable.write(s, txn,
          n.filter(pred).repartition(4))
        graft.sources.GovernedTable.commitTransaction(s, txn)
      }
      graft.sources.GovernedTable.compact(s, path)
      // minAgeHours=0 is the quiesced-maintenance opt-in (this query
      // is the only writer); the production default is 168h so a
      // concurrent transaction's staged files survive
      graft.sources.GovernedTable.vacuum(s, path, keepVersions = 1,
        minAgeHours = 0)
      graft.sources.GovernedTable.read(s, path)
    }),

    // S12 transition end-to-end on the driver scoreboard: write, age
    // past retention, tier to the hidden .tier=cold mirror, read the
    // tier root back — content must round-trip exactly (file movement
    // and retention selectivity are spec-asserted in LifecycleSpec).
    "q106_lifecycle_tier" -> ((s, dir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_tier_" +
        java.util.UUID.randomUUID().toString.take(8)
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      n.write.mode("overwrite").parquet(s"$base/data")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sessionState.newHadoopConf())
      val old = System.currentTimeMillis() - 200L * 3600000L
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$base/data"), true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) fs.setTimes(st.getPath, old, -1)
      }
      graft.sources.Lifecycle.transitionPath(s, s"$base/data",
        storageClass = "cold", retentionHours = 168)
      s.read.parquet(s"$base/data/.tier=cold")
    }),

    // Streaming incremental dedup's POLICY on the driver scoreboard:
    // two micro-batches (even ids, then odd ids) through dedupBatch
    // against a fresh fingerprint store — within-batch first
    // occurrence by min id, cross-batch suppression via the store.
    // The oracle replays both batch passes relationally.
    "q108_stream_dedup" -> ((s, dir) => {
      val store = s"${System.getProperty("java.io.tmpdir")}/graft_sdq_" +
        java.util.UUID.randomUUID().toString.take(8) + "/fps"
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val o1 = graft.streaming.StreamDedup.dedupBatch(
        d.filter(col("doc_id") % 2 === 0), "text", "doc_id", store)
      val o2 = graft.streaming.StreamDedup.dedupBatch(
        d.filter(col("doc_id") % 2 === 1), "text", "doc_id", store)
      o1.unionByName(o2)
    }),

    // S8 collection fan-out on the driver scoreboard: relationalize →
    // ONE writeCollection call (the useFrameName contract) → read the
    // child table back from its member path; the oracle is q18's
    // relational replay, so the fan-out naming and the written
    // content are both hash-checked.
    "q107_collection_sink" -> ((s, dir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_coll_" +
        java.util.UUID.randomUUID().toString.take(8)
      val p = t(s, dir, "part").withColumn("words", split(col("p_name"), " "))
      val tables = NestedOps.relationalize(p, "part", idCol = Some("p_partkey"))
      val coll = graft.core.GlueFrameCollection(
        tables.map { case (k, v) => k -> GlueFrame(v) })
      graft.sources.Sinks.writeCollection(coll, "file",
        options = Map("path" -> base), mode = "overwrite")
      s.read.parquet(s"$base/part_words")
    }),

    // ---------------------------------------------------------------- R6
    // DynamoDB-JSON unnest: typed encodings (M of S/N scalars + an SS
    // set) constructed from events, collapsed recursively to plain
    // values in one Project.
    "q54_ddb_unnest" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"),
        struct(struct(
          struct(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("S"))
            .as("k_attr"),
          struct(col("event_id").cast("string").as("N")).as("n_attr"))
          .as("M")).as("attrs"),
        struct(array(lit("x"), lit("y")).as("SS")).as("tags"))
      NestedOps.unnestDdbJson(e)
        .select(col("event_id"),
          col("attrs").getField("k_attr").as("k_val"),
          col("attrs").getField("n_attr").as("n_val"),
          size(col("tags")).as("n_tags"))
    }),

    // Multimodal plumbing: binary payload column + batched
    // feature-extraction over mapPartitions (deterministic fake decode).
    "q42_multimodal" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.extractFeatures(d, "payload")
        .select(col("doc_id"),
          col("features").getField("byte_len").as("byte_len"),
          col("features").getField("first_byte").as("first_byte"),
          col("features").getField("width").as("width"),
          col("features").getField("height").as("height"))
    }),

    // ------------------------------------------------- A4 set operations
    "q45_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_acctbal") > 0).select(col("c_nationkey"))
        .intersect(c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey")))
    }),
    "q46_except" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      c.except(sup)
    }),

    // ----------------------------------------------- A4 aggregate family
    "q47_agg_family" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          min(col("o_totalprice")).as("min_total"),
          max(col("o_totalprice")).as("max_total"),
          countDistinct(col("o_custkey")).as("n_customers"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_total"))),

    // ------------------------------------------- F4 scalar string / date
    "q48_string_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))),
    "q49_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"))),

    // LSH-bucketed ANN (scale path; recall-dependent → rows-only).
    "q44_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        dim = 64, k = 10, planes = 4)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // Embedding near-dup pairs, exact threshold variant (oracle-able).
    // The benched input is PINNED (vec_id < 2000, the q169
    // discipline): the exact all-pairs kernel is the per-sample
    // recall oracle — quadratic BY CONTRACT — so the benched row
    // draws a fixed-size sample from the growing corpus instead of
    // inheriting corpus cardinality (the r9 sf1 sweep measured the
    // expected ~100x on a 10x corpus when it did). Corpus-scale
    // near-dup detection is q53 (LSH buckets) / q86 (SemDeDup).
    "q50_embed_pairs" -> ((s, dir) =>
      Similarity.nearDupPairsExact(
        t(s, dir, "embeddings").filter(col("vec_id") < 2000),
        "vec_id", "embedding", minCosine = 0.35)),

    // TSV round-trip: write through the TSV sink, read with the S1
    // reader, restore types — proves the headerless all-string contract.
    "q51_tsv_roundtrip" -> ((s, dir) => {
      val path = scratchDir(s, "tmp_tsv/nation")
      t(s, dir, "nation").coalesce(1).write.mode("overwrite")
        .option("sep", "\t").csv(path)
      FieldOps.castColumns(
        FieldOps.renamePositional(
          graft.sources.Sources.readTsv(s, path),
          Seq("n_nationkey", "n_name", "n_regionkey")),
        Map("n_nationkey" -> "int", "n_regionkey" -> "int"))
    }),

    // Embedding near-dup pairs — the SCALE path for q50's exact
    // variant, run with the r14 DEFAULT: recall-sized OR-amplified
    // banding (autoBands(0.35, 4) = 20 bands of 4 planes), candidates
    // on any band collision, normalized-dot verify. The oracle replays
    // the deterministic banded bucketing end-to-end, so the default
    // path is exact-checked without a recall assumption.
    "q53_embed_pairs_lsh" -> ((s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, minCosine = 0.35, planes = 4)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))),

    // IVF ANN with full probe (nprobe = nlist): machinery exercised
    // end-to-end, result provably equal to the exact top-k oracle.
    "q52_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        nlist = 8, nprobe = 8, k = 10)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // Multi-probe LSH ANN (q44's recall-recovery knob): the query
    // bucket PLUS its `planes` Hamming-1 neighbors probed, exact
    // rerank — the read-path answer to a fixed plane count outgrown
    // by its corpus (the write-path answer is an autoPlanes rebuild).
    // planes = 6 so single-bucket recall is genuinely lossy and the
    // neighbor probes do real work; the oracle filters on
    // xor(bk, qbk) ∈ {0} ∪ {2^p} — Hamming ≤ 1 as arithmetic.
    "q200_ann_lsh_multiprobe" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshMultiProbeTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        dim = 64, k = 10, planes = 6)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // Query-directed multi-probe LSH under a probe BUDGET (Lv et al.
    // VLDB'07 §4): q200 probes all Hamming-1 flips blindly; this
    // orders perturbations by the query's squared hyperplane margins
    // and takes `probes` buckets total. planes = 8 with budget 12 >
    // planes + 1 forces the sequence past the 8 single flips into
    // Hamming-2 masks — the oracle replays the margin ordering, the
    // mask tie-break, and the LIMIT, so the probe-set derivation
    // itself is exact-checked, not just the rerank.
    "q201_ann_lsh_qdprobe" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshMultiProbeTopKBudget(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        dim = 64, k = 10, planes = 8, probes = 12)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // Banded (OR-amplified) embedding near-dup pairs — q53's recall
    // fix for high thresholds: 3 independent 4-plane bands, candidate
    // on ANY band collision, exact verify. Band 0 buckets exactly like
    // q53's single table (one hyperplane draw, sliced), so this is a
    // provable candidate superset; the oracle replays all three band
    // bucketings, the cross-band distinct, and the normalized-dot
    // rerank.
    "q202_embed_pairs_banded" -> ((s, dir) =>
      Similarity.nearDupPairsBanded(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, minCosine = 0.35, bands = 3, planesPerBand = 4)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))),

    // Flat product quantization (Jégou TPAMI'11): m = 4 subspaces of
    // 16 dims, ksub = 4 centroids each, iters = 0 with anchors in id
    // order — the SQL-replayable configuration. The oracle replays the
    // WHOLE derivation: normalization, anchor subvector slicing, the
    // per-subspace argmin with the (dist, index) tie-break, the ADC
    // table, and the j-ordered score sum — so the encode itself is
    // exact-checked, not just the final ranking (the q201 discipline
    // applied to PQ).
    "q204_ann_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      ProductQuantization.pqTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        m = 4, ksub = 4, k = 10, iters = 0, initByIdOrder = true)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // IVF-PQ under the exact-reconstruction configuration (ksub ≥ n
    // anchors in id order, pqIters = 0 → every residual is its own
    // centroid; full probe + exact rerank): provably equal to brute
    // force, so the oracle is the exact top-k — the q52 discipline.
    // Input PINNED to the Q188Cardinality slice (the q188 pattern):
    // ksub = n is O(n²), which is an exactness-oracle cost, not the
    // operator's; the live-sized production shape runs as the q206
    // growth twin with lossy codebooks and linear cost.
    "q205_ann_ivfpq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .filter(col("vec_id") < Q188Cardinality)
      ProductQuantization.ivfPqTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        nlist = 4, nprobe = 4, m = 4, ksub = 1000000, k = 10,
        coarseIters = 2, pqIters = 0, initByIdOrder = true,
        rerankK = 30)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),

    // Batched ADC k-NN eval (q169's scale answer): the corpus encodes
    // once into PQ codes, per-query ADC tables precompute driver-side,
    // one scan scores every (row, query) pair at O(m) lookups, and
    // the exact-cosine rerank re-ranks the bounded candidate frame.
    // Exact-reconstruction configuration + rerank ⇒ provably equal to
    // the brute majority-vote eval, so the oracle is q169's replay on
    // the pinned slice (both sides < Q188Cardinality — ksub = n cost
    // stays an oracle artifact, not the operator's; q208 runs the
    // production shape).
    "q207_knn_eval_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .filter(col("vec_id") < Q188Cardinality)
      ProductQuantization.knnClassifyPq(
        e.filter(col("vec_id") % 7 =!= 0),
        e.filter(col("vec_id") % 7 === 0),
        "vec_id", "embedding", "label", k = 5,
        m = 4, ksub = 1000000, iters = 0, initByIdOrder = true,
        rerankK = 15)
    }),

    // DSIR data selection (Xie et al. NeurIPS'23): hashed-ngram
    // importance weights in integer ppm — the FNV 1+2-gram features,
    // the Laplace-smoothed bucket models of both sides, the per-doc
    // BIGINT weight sum, and the top-n head are ALL replayed in SQL
    // (integer fixed-point makes every sum order-free and hash-exact;
    // the only float op is ln(integer) rounded to a millionth on both
    // engines). Target = the doc_id % 5 slice standing in for a
    // curated domain.
    "q209_dsir_select" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Curation.dsirTopK(d, d.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", n = 200)
    }),

    // Batched LSH ANN (r13 verdict #2): a query FRAME probes in ONE
    // distributed pass — both sides code in a projection, the bucket
    // join pairs each query with its own bucket's candidates, per-
    // query heaps fold map-side (no driver loop, no per-query jobs).
    // The oracle replays the q44 bucketing for every query and ranks
    // per query_id — the whole batch semantics is exact-checked.
    "q211_ann_lsh_batch" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.lshTopKBatch(
        e.filter(col("vec_id") % 97 =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") % 97 === 0), "vec_id", "embedding",
        dim = 64, k = 5, planes = 4)
        .select(col("query_id"), col("vec_id"),
          round(col("score"), 4).as("score"))
    }),

    // Batched IVF ANN under the full-probe exactness configuration
    // (nprobe = nlist — the q52 discipline): the cluster machinery is
    // exercised end-to-end and the result is provably each query's
    // exact top-k, so the oracle is per-query brute force.
    "q212_ann_ivf_batch" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopKBatch(
        e.filter(col("vec_id") % 131 =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") % 131 === 0), "vec_id", "embedding",
        nlist = 8, nprobe = 8, k = 5)
        .select(col("query_id"), col("vec_id"),
          round(col("score"), 4).as("score"))
    }),

    // Exact-dup contraction behind the banded pairs (the first escape
    // hatch past broadcastVectorLimit, wired — r13 verdict #6): plant
    // byte-identical twins (vec_id % 29 shifted by 1e6), contract to
    // representatives, band THOSE, expand membership after. The
    // oracle replays the UNCONTRACTED banded run over the same
    // planted union — equality IS the proof the contraction loses
    // nothing.
    "q213_banded_pairs_contracted" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val planted = e.filter(col("vec_id") % 29 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      Similarity.nearDupPairsBandedContracted(e.unionByName(planted),
        "vec_id", "embedding", dim = 64, minCosine = 0.35,
        bands = 3, planesPerBand = 4)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))
    }),

    // Multimodal composition through the PQ-coded dedup path (r13
    // verdict #7): image-embedding near-dup at codebook resolution —
    // group by the m-subspace code word, keep each word's min id —
    // with the media modality's typed metadata riding the survivors
    // (packMedia byte_len). ksub = 4, m = 4, iters = 0, anchors by id:
    // the q204 exactness config, so the oracle replays the encode,
    // the code-word grouping, and the metadata join end-to-end.
    "q214_multimodal_pq_dedup" -> ((s, dir) => {
      val media = Multimodal.packMedia(
        t(s, dir, "documents").select(col("doc_id"),
          col("text").cast("binary").as("payload")),
        "payload", "image/fake")
        .select(col("doc_id"),
          col("media").getField("byte_len").as("byte_len"))
      ProductQuantization.pqCodeDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        m = 4, ksub = 4, iters = 0, initByIdOrder = true)
        .join(media, col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("n_dups"), col("byte_len"))
    }),

    // Incremental SemDeDup (r14 verdict #1 — the last full-recompute
    // default in the dedup family): the corpus arrives in three
    // interleaved batches, each ingested against a persisted store
    // (band codes + normalized vectors + verified pairs) under the
    // committed 3×4 family; the final survivor set must EQUAL
    // full-recompute semDedup over the union — the oracle replays the
    // full-corpus banded closure, so batch-boundary transitivity is
    // exact-checked, not assumed. Batches load through the bulk path
    // (ingestOnly — one closure at the end, not one per batch: the
    // replay-a-history shape); the per-batch EMISSION path is
    // spec-gated (MlSpec/StreamingSpec pin its provisional contract).
    "q215_semdedup_incremental" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_isd_" +
        java.util.UUID.randomUUID().toString.take(8)
      val store = s"$root/store"
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.ml.IncrementalSemDedup.initStore(s, store, dim = 64,
        minCosine = 0.35, planesPerBand = 4, bands = 3,
        idCol = "vec_id")
      (0 to 2).foreach { k =>
        graft.ml.IncrementalSemDedup.ingestOnly(s, store,
          e.filter(col("vec_id") % 3 === k), "vec_id", "embedding")
      }
      // materialize BEFORE deleting the temp store (r15 advice: each
      // bench/verify invocation used to leave an orphan UUID store —
      // rows/ holding the whole embeddings table — under tmpdir)
      val out = graft.ml.IncrementalSemDedup.survivors(s, store)
        .localCheckpoint(true)
      rmTree(s, root)
      out
    }),

    // Store re-commit under a NEW band family from store contents
    // (r15 verdict #3): the corpus bulk-loads under a 2×4 family at a
    // 0.5 threshold, then rebuildStore re-codes the persisted unit
    // vectors to the 3×4/0.35 family — survivors must EQUAL
    // full-recompute semDedup at the TARGET family, with the oracle
    // coding from the NORMALIZED vectors exactly as the rebuild does
    // (sign-LSH codes are scale-invariant; the u-coded replay proves
    // the rebuilt store equals a fresh init + re-ingest).
    "q218_semdedup_rebuild" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_isd_" +
        java.util.UUID.randomUUID().toString.take(8)
      val store = s"$root/store"
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.ml.IncrementalSemDedup.initStore(s, store, dim = 64,
        minCosine = 0.5, planesPerBand = 4, bands = 2,
        idCol = "vec_id")
      (0 to 1).foreach { k =>
        graft.ml.IncrementalSemDedup.ingestOnly(s, store,
          e.filter(col("vec_id") % 2 === k), "vec_id", "embedding")
      }
      graft.ml.IncrementalSemDedup.rebuildStore(s, store,
        minCosine = 0.35, planesPerBand = 4, bands = 3)
      val out = graft.ml.IncrementalSemDedup.survivors(s, store)
        .localCheckpoint(true)
      rmTree(s, root)
      out
    }),

    // IVF cluster-local exact pairs (r14 verdict #5 — the third
    // documented escape hatch past the banding wall, now a callable
    // operator) at the exactness configuration: nprobe = nlist means
    // every pair shares every probed cell, so the operator provably
    // degenerates to exact all-pairs and the oracle is the
    // brute-force cosine join (the q205/q212 proof pattern).
    // Production configs (nprobe << nlist) are spec-gated subsets
    // plus the ivf_pairs_r15 planted-recall artifact.
    "q216_pairs_ivf" -> ((s, dir) =>
      Similarity.nearDupPairsIvf(t(s, dir, "embeddings"), "vec_id",
        "embedding", minCosine = 0.5, nlist = 4, nprobe = 4)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))),

    // Hybrid candidate generator (r15 verdict #5 — banding and IVF
    // miss DIFFERENT pairs in the low-threshold regime; their union
    // buys recall neither reaches alone) at the exactness config:
    // nprobe = nlist makes the IVF side exact all-pairs, so the union
    // is too and the oracle is the unsliced brute cosine join (the
    // q216 proof pattern). Production configs are spec-gated
    // (union-of-parents equality + subset-of-exact) plus the
    // hybrid_recall_r16 planted artifact.
    "q217_pairs_hybrid" -> ((s, dir) =>
      Similarity.nearDupPairsHybrid(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, minCosine = 0.5, bands = 3,
        planesPerBand = 4, nlist = 4, nprobe = 4)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))),

    // Hybrid-generator semantic dedup at the exactness config: with
    // nprobe = nlist the pair graph IS the exact near-dup graph, so
    // survivors equal the transitive closure over brute all-pairs —
    // the strongest survivor statement in the family (no generator
    // recall caveat; the oracle replays brute pairs + the recursive
    // closure). Production (low-threshold) configs are spec-gated:
    // hybrid survivors ⊆ banded survivors at the same family.
    "q219_semdedup_hybrid" -> ((s, dir) =>
      Similarity.semDedupHybrid(t(s, dir, "embeddings"), "vec_id",
        "embedding", dim = 64, minCosine = 0.5, bands = 3,
        planesPerBand = 4, nlist = 4, nprobe = 4)
        .select(col("vec_id"))),

    // Hybrid INCREMENTAL store at the exactness config (r16 verdict
    // #3 — the store's low-threshold recall was capped by its
    // committed band family; batch callers got nearDupPairsHybrid,
    // incremental corpora didn't): initStore commits an IVF leg
    // (trained centroids + nprobe) next to the band family, every
    // ingest unions the cell-local candidate stream with the banded
    // one, and at nprobe = nlist every pair shares every cell — so
    // survivors after batch-by-batch ingestion provably equal the
    // closure over brute all-pairs (the q219 oracle, incrementally;
    // production configs are spec-gated richer-graph subsets).
    "q220_semdedup_store_hybrid" -> ((s, dir) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_isd_" +
        java.util.UUID.randomUUID().toString.take(8)
      val store = s"$root/store"
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cents = graft.ml.Similarity.ivfCentroids(e, "vec_id",
        "embedding", nlist = 4)
      graft.ml.IncrementalSemDedup.initStore(s, store, dim = 64,
        minCosine = 0.5, planesPerBand = 4, bands = 3,
        idCol = "vec_id", ivfClusters = cents, nprobe = 4)
      (0 to 2).foreach { k =>
        graft.ml.IncrementalSemDedup.ingestOnly(s, store,
          e.filter(col("vec_id") % 3 === k), "vec_id", "embedding")
      }
      val out = graft.ml.IncrementalSemDedup.survivors(s, store)
        .localCheckpoint(true)
      rmTree(s, root)
      out
    }),
  )

  /** Recursive temp-dir cleanup for queries that stage a managed
    * store under java.io.tmpdir (materialize the result FIRST — the
    * returned plan must not lazily re-read the deleted directory).
    */
  private def rmTree(s: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(s.sessionState.newHadoopConf()).delete(p, true)
    ()
  }

  /** BENCH-ONLY registry (r11 verdict #1): queries the bench measures
    * but the driver's DuckDB comparator never sees. The oracle-gated
    * rows q188/q196 pin their input cardinality so a static oracle can
    * inline the derived plane matrix — which also FREEZES their
    * benched workload. These twins run the SAME operators over the
    * full embeddings table with live auto sizing, so the bench tracks
    * plane growth and join volume at every scale. No static SQL oracle
    * can express a data-dependent plane count — and round 11 proved an
    * oracle-less entry in [[queries]] zeroes the driver's correctness
    * artifact — so they live here. [[graft.Bench]] unions this map in;
    * [[graft.Verify]] reads only [[queries]]. RegistrySpec asserts the
    * queries↔oracleSql key sets stay 1:1 and this map stays disjoint.
    * Engine-side correctness gate: BenchOnlySpec pins each twin to its
    * oracle-gated sibling on the pinned slice (same operator, pinned
    * vs live sizing agree where the cardinalities coincide).
    */
  def benchOnlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q197_auto_lsh_growth" -> ((s, dir) =>
      Similarity.nearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, minCosine = 0.35, targetBucketSize = Some(16L))
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))),
    "q198_semantic_balance_growth" -> ((s, dir) =>
      Curation.semanticBalancedSample(t(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, planes = 0,
        capPerBucket = Q196Cap, sampleSeed = Q196SampleSeed,
        targetBucketSize = Q196TargetBucket)),
    // q202's growth twin: per-band planes from autoPlanes (cost
    // tracks the corpus) and the band count from bandsForRecall at
    // the SAME threshold (recall floor holds as r grows) — both
    // data-dependent, so no static oracle; RegistrySpec pins the
    // semantics (superset of the single table at the derived r with
    // identical scores, subset of the exact all-pairs oracle).
    "q203_banded_pairs_growth" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val r = Similarity.autoPlanes(e.count(), 128L)
      Similarity.nearDupPairsBanded(e, "vec_id", "embedding",
        dim = 64, minCosine = 0.35,
        bands = Similarity.bandsForRecall(0.35, r, 0.95),
        planesPerBand = r)
        .select(col("id_a"), col("id_b"),
          round(col("score"), 4).as("score"))
    }),
    // q205's growth twin: production-shaped IVF-PQ — auto-sized
    // coarse list (autoNlist tracks the corpus), lossy codebooks
    // (m = 8, ksub = 32, one Lloyd step), seeded-hash anchor init,
    // narrow probe, FAISS-refine rerank. Linear cost (n·m·ksub·dsub
    // encode work), unlike q205's pinned O(n²) exactness oracle. No
    // static SQL can express the data-dependent nlist or the trained
    // codebooks; RegistrySpec pins the semantics instead (k exact-
    // cosine-scored rows, each dominated by the brute-force top-k).
    "q206_ann_ivfpq_growth" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      ProductQuantization.ivfPqTopK(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        e.filter(col("vec_id") === 0), "embedding",
        nlist = 0, nprobe = 4, m = 8, ksub = 32, k = 10,
        pqIters = 1, rerankK = 50)
        .select(col("vec_id"), round(col("score"), 4).as("score"))
    }),
    // q207's growth twin: the production ADC eval — live corpus,
    // auto-sized coarse cells pruning each query's pair stream to
    // ~nprobe/nlist (the lever that actually beats the brute eval —
    // flat ADC measured SLOWER than brute at sf1: pair generation,
    // not per-pair scoring, dominates), lossy codebooks, rerank-50
    // refine. The eval set stays PINNED (vec_id < 2000 — the q169
    // discipline: an eval harness scores a fixed benchmark against a
    // growing corpus). Trained codebooks have no static oracle;
    // RegistrySpec pins the output shape and label fidelity, PqSpec
    // pins the machinery's exactness configuration against brute.
    "q208_knn_eval_pq_growth" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      ProductQuantization.knnClassifyPq(
        e.filter(col("vec_id") % 7 =!= 0),
        e.filter(col("vec_id") % 7 === 0 && col("vec_id") < 2000),
        "vec_id", "embedding", "label", k = 5,
        m = 8, ksub = 32, iters = 1, rerankK = 50,
        nlist = 0, nprobe = 8)
    }),
    // q209's sampling twin: the Gumbel-top-k importance RESAMPLE (the
    // DSIR paper's actual selection mode). The Gumbel key mixes a
    // mix64-derived uniform with ln twice — float transcendentals on
    // non-integer inputs, outside the ppm replay discipline — so no
    // static oracle; RegistrySpec pins determinism (same seed → same
    // set), the exact sample size, and raw-membership.
    "q210_dsir_resample_growth" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Curation.dsirResample(d, d.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", n = 200, seed = 13)
    }),
  )

  /** The q44 hyperplane matrix as a DuckDB array literal — generated
    * from the SAME deterministic [[graft.ml.Similarity.hyperplanes]]
    * call the Spark query makes, so the oracle buckets with bit-equal
    * plane constants (Double.toString round-trips exactly).
    */
  private def lshPlaneMatrixSqlFor(planes: Int): String =
    graft.ml.Similarity.hyperplanes(64, planes, 42L)
      .map(_.map(_.toString).mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  private def lshPlaneMatrixSql: String = lshPlaneMatrixSqlFor(4)

  /** The plane matrix as a MATERIALIZED one-row CTE (`__mat(m)`).
    * Inlining the literal directly into the per-row bucket expression
    * makes DuckDB REBUILD the planes×64 list-of-lists for every
    * (row, plane, component) lambda evaluation — measured 18s → 0.05s
    * on q196 at sf0.01 just from hoisting it here (r11 verdict #2:
    * the oracle suite's DuckDB budget). Bucketing CTEs cross-join
    * `__mat` (one row — free) and index `__mat.m[p][i]`.
    */
  private def sqlPlaneMatCte(planes: Int): String =
    s"__mat AS MATERIALIZED (SELECT ${lshPlaneMatrixSqlFor(planes)} AS m)"

  /** q188's pinned input cardinality: both the engine query
    * (`vec_id < 500`) and the oracle's WHERE clause restrict the
    * embeddings table to the same 500 vectors, so the engine-derived
    * plane count equals [[q188Planes]] on every data dir — including
    * gen_sf.py twins, whose embeddings table now floors at 500 rows
    * (ADVICE r10: the checked-in sf0.01 dir has 500 embeddings from
    * an older generator; an unfloored regeneration would have 200 and
    * the derivation would silently land on 4 planes vs the oracle's
    * inlined 5-plane matrix).
    */
  private[graft] val Q188Cardinality = 500L

  /** q188's derived plane count, computed by the SAME
    * [[graft.ml.Similarity.autoPlanes]] call the engine makes at run
    * time (the q179 discipline: engine-derived constants are inlined
    * into the oracle, never re-derived by hand) over the SAME pinned
    * cardinality ([[Q188Cardinality]]).
    */
  private def q188Planes: Int =
    graft.ml.Similarity.autoPlanes(Q188Cardinality, 16L)

  /** q196's derived plane count — the same engine call over the same
    * pinned cardinality, inlined into the oracle's plane matrix.
    */
  private def q196Planes: Int =
    graft.ml.Similarity.autoPlanes(Q188Cardinality, Q196TargetBucket)

  /** q53/q86's derived band count under the r14 recall-sized banded
    * DEFAULT: the same [[graft.ml.Similarity.autoBands]] call the
    * engine makes for a default `nearDupPairs`/`semDedup` at
    * minCosine = 0.35 with 4 planes per band (the q179 discipline —
    * engine-derived constants inline into the oracle, never re-derived
    * by hand). 20 at the current recall math.
    */
  private def q53Bands: Int =
    graft.ml.Similarity.autoBands(0.35, 4)

  /** q188's derived band count — [[graft.ml.Similarity.autoBands]] at
    * the derived per-band plane count over the pinned cardinality.
    */
  private def q188Bands: Int =
    graft.ml.Similarity.autoBands(0.35, q188Planes)

  /** The banded near-dup candidate CTEs (codes / u / cand), shared by
    * every oracle replaying [[graft.ml.Similarity.nearDupPairsBanded]]
    * at a pinned (bands, planesPerBand): band b buckets on plane rows
    * [b·r+1, b·r+r] of ONE inlined hyperplane draw (the engine's
    * single-draw slicing, so band 0 IS the single-table bucketing),
    * candidates collide in ANY band (DISTINCT merges multi-band hits),
    * `u` carries the L2-normalized vectors for the exact verify.
    * `where` pins the input slice (e.g. " WHERE vec_id < 500").
    */
  private def sqlBandedCandCtes(
      bands: Int, r: Int, where: String = "",
      table: String = "embeddings"): String =
    s"""${sqlPlaneMatCte(bands * r)},
       |codes AS MATERIALIZED (
       |  SELECT vec_id, b,
       |    list_sum(list_transform(range(1, ${r + 1}), p ->
       |      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
       |          i -> CAST(embedding[i] AS DOUBLE) * __mat.m[b * $r + p][i])) >= 0
       |        THEN (1 << (p - 1)) ELSE 0 END)) AS code
       |  FROM $table, __mat, range(0, $bands) t(b)$where),
       |u AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
       |  FROM $table$where),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, x.vec_id AS id_b
       |  FROM codes a JOIN codes x
       |    ON a.b = x.b AND a.code = x.code AND a.vec_id < x.vec_id)""".stripMargin

  /** A full banded near-dup pairs oracle at (bands, r): the candidate
    * CTEs plus the normalized-dot verify and the threshold filter —
    * q202's replay generalized to any pinned sizing.
    */
  private def sqlBandedPairs(
      bands: Int, r: Int, minCosine: Double,
      where: String = ""): String =
    s"""WITH ${sqlBandedCandCtes(bands, r, where)},
       |sc AS (SELECT id_a, id_b,
       |  list_sum(list_transform(range(1, len(a.u) + 1),
       |    i -> a.u[i] * b2.u[i])) AS raw
       | FROM cand JOIN u a ON a.vec_id = cand.id_a
       |           JOIN u b2 ON b2.vec_id = cand.id_b)
       |SELECT id_a, id_b, round(raw, 4) AS score FROM sc
       |WHERE raw >= $minCosine""".stripMargin

  /** Full-recompute SemDeDup survivor replay at a pinned (bands, r):
    * banded candidates → exact normalized-dot verify → recursive
    * transitive closure → keep unpaired vectors plus each cluster's
    * min id. q86 replays the r14 recall-sized default; q215 replays
    * the incremental store's committed 3×4 family — batch-by-batch
    * ingestion must converge to EXACTLY this full-corpus set, which
    * is what makes incremental-vs-full equality the oracle gate.
    */
  private def sqlSemDedupSurvivors(
      bands: Int, r: Int, minCosine: Double): String =
    s"""WITH RECURSIVE ${sqlBandedCandCtes(bands, r)},
       |p AS MATERIALIZED (SELECT id_a, id_b
       | FROM cand JOIN u a ON a.vec_id = cand.id_a
       |           JOIN u b2 ON b2.vec_id = cand.id_b
       | WHERE list_sum(list_transform(range(1, len(a.u) + 1),
       |     i -> a.u[i] * b2.u[i])) >= $minCosine),
       |sym AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
       |        UNION ALL SELECT id_b, id_a FROM p),
       |reach(id, r) AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
       |m AS (SELECT id, min(r) AS mn FROM reach GROUP BY id)
       |SELECT e.vec_id FROM embeddings e LEFT JOIN m ON m.id = e.vec_id
       |WHERE m.id IS NULL OR m.mn >= e.vec_id""".stripMargin

  /** q218's rebuild replay: the same full-recompute SemDeDup survivor
    * derivation as [[sqlSemDedupSurvivors]], except the band codes
    * compute from the NORMALIZED vectors — exactly what
    * `IncrementalSemDedup.rebuildStore` does (the store persists `u`,
    * not the raw vectors; sign-LSH codes are invariant under positive
    * scaling, and this oracle proves the bit-level parity end-to-end
    * rather than assuming the invariance survives floating point).
    */
  private def sqlSemDedupSurvivorsU(
      bands: Int, r: Int, minCosine: Double): String =
    s"""WITH RECURSIVE ${sqlPlaneMatCte(bands * r)},
       |u AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
       |  FROM embeddings),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, b,
       |    list_sum(list_transform(range(1, ${r + 1}), p ->
       |      CASE WHEN list_sum(list_transform(range(1, len(u.u) + 1),
       |          i -> u.u[i] * __mat.m[b * $r + p][i])) >= 0
       |        THEN (1 << (p - 1)) ELSE 0 END)) AS code
       |  FROM u, __mat, range(0, $bands) t(b)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, x.vec_id AS id_b
       |  FROM codes a JOIN codes x
       |    ON a.b = x.b AND a.code = x.code AND a.vec_id < x.vec_id),
       |p AS MATERIALIZED (SELECT id_a, id_b
       | FROM cand JOIN u a ON a.vec_id = cand.id_a
       |           JOIN u b2 ON b2.vec_id = cand.id_b
       | WHERE list_sum(list_transform(range(1, len(a.u) + 1),
       |     i -> a.u[i] * b2.u[i])) >= $minCosine),
       |sym AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
       |        UNION ALL SELECT id_b, id_a FROM p),
       |reach(id, r) AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
       |m AS (SELECT id, min(r) AS mn FROM reach GROUP BY id)
       |SELECT e.vec_id FROM embeddings e LEFT JOIN m ON m.id = e.vec_id
       |WHERE m.id IS NULL OR m.mn >= e.vec_id""".stripMargin

  /** q199's derived plane count — autoPlanes over the pinned TRAIN
    * cardinality (the engine sizes off the train side).
    */
  private def q199Planes: Int =
    graft.ml.Similarity.autoPlanes(
      Q188Cardinality - Q199EvalSplit, Q199TargetBucket)

  /** q191/q192: the BPE merge-learning replay, unrolled round by round
    * (the q119 PageRank discipline — K deterministic iterations become
    * K generated CTE stages). Per round r over word-type states
    * w{r-1}(word, cnt, toks):
    *
    *  - p_r: adjacent-pair census weighted by word count (BIGINT-cast
    *    — DuckDB sum(BIGINT) is HUGEINT);
    *  - b_r: the argmax with the engine's tie-break
    *    (count desc, left, right), filtered at the engine's
    *    [[graft.ml.TextAnalysis.DefaultMinPairCount]] stop floor
    *    (ADVICE r10): when no pair reaches the floor, b_r is EMPTY —
    *    the q191 UNION leg contributes no row (matching the engine's
    *    early stop) and every later round is a no-op by NULL
    *    plumbing: the scalar subselects go NULL, `hit` is NULL/false,
    *    `sel` = `NULL AND false` = false, so w_r = w_{r-1} and the
    *    census (hence the empty b) is stable for all remaining
    *    rounds;
    *  - greedy non-overlapping application via gaps-and-islands: hit
    *    positions island on (word, hit) runs, odd island-ranks are the
    *    selected merge STARTS, the following position is consumed
    *    (lag), and the survivors re-list into w{r}. Only `left = right`
    *    runs ever produce islands longer than one, and the odd-rank
    *    rule is exactly the left-to-right greedy scan.
    */
  private def bpeRounds: Int = 8

  private def bpeOracleCtes(k: Int): String = {
    // every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
    // with b_r referenced twice per round and w_r chaining through
    // seven layers, inlining re-evaluates the round pipeline
    // exponentially across 8 rounds (measured: minutes for a 31-row
    // base table); materialization makes each round evaluate once
    val sb = new StringBuilder
    sb.append(
      """w0 AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |    list_transform(range(1, length(word) + 1),
        |      i -> substr(word, i, 1)) AS toks
        |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)),
        |      '\s+')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin)
    for (r <- 1 to k) {
      val w = s"w${r - 1}"
      sb.append(s""",
        |p$r AS MATERIALIZED (
        |  SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS c
        |  FROM (SELECT cnt, unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(l := toks[i], r := toks[i + 1]))) AS p
        |    FROM $w WHERE len(toks) >= 2)
        |  GROUP BY p.l, p.r),
        |b$r AS MATERIALIZED (
        |  SELECT l, r, c FROM p$r
        |  WHERE c >= ${TextAnalysis.DefaultMinPairCount}
        |  ORDER BY c DESC, l, r LIMIT 1),
        |m$r AS (SELECT word, cnt, toks,
        |    unnest(range(1, len(toks) + 1)) AS i FROM $w),
        |h$r AS (SELECT word, cnt, toks, i,
        |    i < len(toks) AND toks[i] = (SELECT l FROM b$r)
        |      AND toks[i + 1] = (SELECT r FROM b$r) AS hit FROM m$r),
        |g$r AS (SELECT *, i - row_number()
        |    OVER (PARTITION BY word, hit ORDER BY i) AS isl FROM h$r),
        |s$r AS (SELECT *, CASE WHEN hit THEN row_number()
        |    OVER (PARTITION BY word, hit, isl ORDER BY i) ELSE 0 END AS rn
        |  FROM g$r),
        |n$r AS (SELECT word, cnt, i,
        |    CASE WHEN hit AND rn % 2 = 1 THEN toks[i] || toks[i + 1]
        |      ELSE toks[i] END AS nt,
        |    hit AND rn % 2 = 1 AS sel FROM s$r),
        |x$r AS (SELECT *, coalesce(lag(sel)
        |    OVER (PARTITION BY word ORDER BY i), false) AS consumed
        |  FROM n$r),
        |w$r AS MATERIALIZED (
        |  SELECT word, cnt, list(nt ORDER BY i) AS toks
        |  FROM x$r WHERE NOT consumed GROUP BY word, cnt)""".stripMargin)
    }
    sb.toString
  }

  /** q195's batch size — small enough that the verify corpus needs
    * several census rounds to learn [[bpeRounds]] merges, so the
    * oracle exercises multi-round selection, the cumulative-want cap,
    * AND the single-pass multi-merge application.
    */
  private def bpeBatchSize: Int = 3

  /** The [[graft.ml.TextAnalysis.bpeTrainBatched]] replay, unrolled
    * round by round like [[bpeOracleCtes]] but with the argmax
    * replaced by the batched selection:
    *
    *  - c_r: the top-`batch` census rows in the sequential tie-break
    *    order, ranked;
    *  - q_r: the GREEDY SYMBOL-DISJOINT scan as a recursive CTE — one
    *    row per candidate rank, threading the `used` symbol list and
    *    the kept count; a candidate keeps iff its left, right, and
    *    merged string are all unseen and the round's budget
    *    (`merges − Σ prior kept`, the engine's `want`) is not
    *    exhausted;
    *  - k_r: the kept set. Hit detection becomes a LEFT JOIN against
    *    k_r (at most one pair matches a position — symbols are
    *    disjoint), and the islands/odd-rank/consumed machinery is
    *    unchanged: under disjointness a run of consecutive hits is
    *    always a same-pair run, exactly the single-merge case.
    *
    * When a round keeps nothing (census dry or budget spent) the left
    * join misses everywhere, w_r = w_{r-1}, and every later round is
    * stable — the engine's early stop, by construction. The WHOLE
    * statement must be `WITH RECURSIVE` (DuckDB's one recursive-CTE
    * header covers the mixed list).
    */
  private def bpeBatchedOracleCtes(k: Int, batch: Int, mTotal: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """w0 AS MATERIALIZED (
        |  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
        |    list_transform(range(1, length(word) + 1),
        |      i -> substr(word, i, 1)) AS toks
        |  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)),
        |      '\s+')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word)""".stripMargin)
    for (r <- 1 to k) {
      val w = s"w${r - 1}"
      // the engine's want = merges − already-learned (bounded below
      // by the keep-count check; the batch cap is the LIMIT on c_r)
      val priorKept =
        if (r == 1) "0"
        else (1 until r).map(p => s"(SELECT count(*) FROM k$p)")
          .mkString(" + ")
      val keepCond = s"""q.n_kept < $mTotal - ($priorKept)
        |      AND NOT list_contains(q.used, cr.l)
        |      AND NOT list_contains(q.used, cr.r)
        |      AND NOT list_contains(q.used, cr.l || cr.r)""".stripMargin
      sb.append(s""",
        |p$r AS MATERIALIZED (
        |  SELECT p.l AS l, p.r AS r, CAST(sum(cnt) AS BIGINT) AS c
        |  FROM (SELECT cnt, unnest(list_transform(range(1, len(toks)),
        |      i -> struct_pack(l := toks[i], r := toks[i + 1]))) AS p
        |    FROM $w WHERE len(toks) >= 2)
        |  GROUP BY p.l, p.r),
        |c$r AS MATERIALIZED (
        |  SELECT l, r, c, row_number() OVER (ORDER BY c DESC, l, r) AS rk
        |  FROM (SELECT l, r, c FROM p$r
        |    WHERE c >= ${TextAnalysis.DefaultMinPairCount}
        |    ORDER BY c DESC, l, r LIMIT $batch)),
        |q$r AS (
        |  SELECT 0 AS rk, CAST(NULL AS VARCHAR) AS l,
        |    CAST(NULL AS VARCHAR) AS r, CAST(NULL AS BIGINT) AS c,
        |    false AS keep, CAST([] AS VARCHAR[]) AS used, 0 AS n_kept
        |  UNION ALL
        |  SELECT cr.rk, cr.l, cr.r, cr.c,
        |    ($keepCond) AS keep,
        |    CASE WHEN $keepCond
        |      THEN list_concat(q.used, [cr.l, cr.r, cr.l || cr.r])
        |      ELSE q.used END AS used,
        |    q.n_kept + CASE WHEN $keepCond THEN 1 ELSE 0 END AS n_kept
        |  FROM q$r q JOIN c$r cr ON cr.rk = q.rk + 1),
        |k$r AS MATERIALIZED (
        |  SELECT l, r, c, rk FROM q$r WHERE keep),
        |m$r AS (SELECT word, cnt, toks,
        |    unnest(range(1, len(toks) + 1)) AS i FROM $w),
        |h$r AS (SELECT m.word, m.cnt, m.toks, m.i AS i,
        |    (kk.l IS NOT NULL) AS hit
        |  FROM m$r m LEFT JOIN k$r kk
        |    ON m.i < len(m.toks) AND m.toks[m.i] = kk.l
        |      AND m.toks[m.i + 1] = kk.r),
        |g$r AS (SELECT *, i - row_number()
        |    OVER (PARTITION BY word, hit ORDER BY i) AS isl FROM h$r),
        |s$r AS (SELECT *, CASE WHEN hit THEN row_number()
        |    OVER (PARTITION BY word, hit, isl ORDER BY i) ELSE 0 END AS rn
        |  FROM g$r),
        |n$r AS (SELECT word, cnt, i,
        |    CASE WHEN hit AND rn % 2 = 1 THEN toks[i] || toks[i + 1]
        |      ELSE toks[i] END AS nt,
        |    hit AND rn % 2 = 1 AS sel FROM s$r),
        |x$r AS (SELECT *, coalesce(lag(sel)
        |    OVER (PARTITION BY word ORDER BY i), false) AS consumed
        |  FROM n$r),
        |w$r AS MATERIALIZED (
        |  SELECT word, cnt, list(nt ORDER BY i) AS toks
        |  FROM x$r WHERE NOT consumed GROUP BY word, cnt)""".stripMargin)
    }
    sb.toString
  }

  /** 64-bit wrap-around helpers for the q39/q40 oracles, as DuckDB SQL
    * fragments over HUGEINT (DuckDB integer ops trap on overflow, so
    * mod-2^64 arithmetic is explicit):
    * - xor64: xor via 32-bit halves (BIGINT xor, halves always fit);
    * - mul64 by a constant: split the constant into 32-bit halves so
    *   every product stays below 2^127;
    * - the FNV-1a step multiplies directly (the prime is < 2^41).
    *
    * All power-of-two `%`/`//` are spelled `&`/`>>`: every value here
    * is non-negative by construction (each step masks back to
    * [0, 2^64)), where the two families are identical — and int128
    * DIVISION is what the old spelling paid per op (measured 22x on a
    * 1M-row mul64 microbench; the minhash-family oracles dropped
    * ~2.5x end to end). r11 verdict #2: the DuckDB oracle budget.
    */
  private def sqlXor64(a: String, b: String): String =
    s"(xor(CAST(($a) >> 32 AS BIGINT), CAST(($b) >> 32 AS BIGINT))::HUGEINT * 4294967296" +
    s" + xor(CAST(($a) & 4294967295 AS BIGINT), CAST(($b) & 4294967295 AS BIGINT))::HUGEINT)"

  private def sqlMul64(u: String, c: Long): String = {
    val hi = java.lang.Long.divideUnsigned(c, 4294967296L)
    val lo = java.lang.Long.remainderUnsigned(c, 4294967296L)
    s"(((($u) & 4294967295) * $lo" +
    s" + (((($u) & 4294967295) * $hi + (($u) >> 32) * $lo) & 4294967295) * 4294967296" +
    s") & 18446744073709551615)"
  }

  /** FNV-1a reduce over a byte-step list (one xor-then-multiply step
    * per element) starting from the FNV offset basis; yields HUGEINT in
    * [0, 2^64). `steps` must be a DuckDB list<int> expression.
    */
  private def sqlFnv(steps: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(14695981039346656037 AS HUGEINT), $steps),
       |  (acc, b) -> (((acc >> 16) << 16)
       |      + xor(CAST(acc & 65535 AS BIGINT), CAST(b AS BIGINT)))
       |    * 1099511628211 & 18446744073709551615)""".stripMargin

  /** One splitmix64 finalizer stage pair (shift-xor then multiply) as a
    * chained CTE body: z := mul64(xor64(z, z >> shift), const).
    */
  private def sqlMixStage(shift: Int, const: Long): String =
    sqlMul64(sqlXor64("z", s"z >> $shift"), const)

  /** Unsigned decimal literal for the mix64 seed step (seed+1)·golden
    * mod 2^64 — precomputed HERE so the SQL replay adds a constant.
    */
  private def sqlMixAdd(seed: Int): String =
    java.lang.Long.toUnsignedString((seed + 1).toLong * 0x9e3779b97f4a7c15L)

  /** The three splitmix64 finalizer stages as chained CTEs z1..z3 over
    * a caller-provided z0 (HUGEINT column `z` plus `carry` columns) —
    * the SQL replay of [[graft.functions.Mix64]].
    */
  private def sqlMixFinal(carry: String): String =
    s"""z1 AS (SELECT $carry, ${sqlMixStage(30, 0xbf58476d1ce4e5b9L)} AS z FROM z0),
       |z2 AS (SELECT $carry, ${sqlMixStage(27, 0x94d049bb133111ebL)} AS z FROM z1),
       |z3 AS (SELECT $carry, ${sqlXor64("z", "z >> 31")} AS z FROM z2)""".stripMargin

  /** The q193/q194 deterministic edge-sampling replay: from a
    * canonical edge CTE `e(u, v)` to the sampled CTE `sm(u, v)` —
    * the shift-combined edge key through the seeded splitmix64 chain
    * ([[graft.ml.Graph.sampleEdgesDeterministic]]'s exact
    * arithmetic: the engine's `(u << 32) | v` on 32-bit-id graphs
    * equals `u·2^32 + v`, and the unsigned `mod 2^d` here equals the
    * engine's signed `pmod` because the denominators divide 2^64).
    */
  private def sqlSampledEdges(denom: Int, keep: Int): String =
    s"""z0 AS (SELECT u, v,
       |    ((CAST(u AS HUGEINT) * 4294967296 + v
       |      + ${sqlMixAdd(GraphSampleSeed)}) & 18446744073709551615) AS z
       |  FROM e),
       |${sqlMixFinal("u, v")},
       |sm AS MATERIALIZED (
       |  SELECT u, v FROM z3 WHERE (z & ${denom - 1}) < $keep)""".stripMargin

  /** The Morton interleave of [[graft.operators.Layout.zOrderKey]] as
    * a bitwise-OR chain — one term list drives both engines (the
    * Spark side folds the same shifts over the same bit indices).
    */
  private def sqlZOrder(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))")
      .mkString(" | ")

  /** The MinHash band replay as a CTE chain over `source`
    * (doc_id, text): token trigram FNV shingles, the 64-seed splitmix
    * kernel, per-seed minima, 16 bands of 4 ordered values — ending in
    * `<p>bands(doc_id, b, content)`. Band equality is compared on
    * (b, content) directly, so the engine's xxhash64 band-key step
    * needs no replay. CTE names carry prefix `p` so two corpora can be
    * banded in one statement (q85). Shared by the q39 dedup oracle.
    */
  private def sqlMinhashBands(source: String, p: String): String = {
    val mix1 = sqlMixStage(30, 0xbf58476d1ce4e5b9L)
    val mix2 = sqlMixStage(27, 0x94d049bb133111ebL)
    val mix3 = sqlXor64("z", "z >> 31")
    // The 64-seed splitmix chain (~15 HUGEINT ops per stage per row)
    // runs over DISTINCT shingles, not per-document occurrences —
    // shingle hashes are shared ~3x across this corpus, and the chain
    // is a pure function of (s_u, seed), so per-occurrence rows only
    // pay a BIGINT join + min. Measured at sf0.01: q39 52→20 s
    // (r11 verdict #2: the DuckDB oracle budget). MATERIALIZED on the
    // distinct set and the chained values — each feeds a downstream
    // join, and default inlining would re-expand the chain per
    // reference (the q193 lesson).
    s"""${p}tok AS (SELECT doc_id,
       |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM $source),
       |${p}sh AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
       |      i -> ${sqlFnv(
      // [:-2] drops the trailing separator: DuckDB slice bounds are
      // INCLUSIVE, so [:-1] keeps the whole list (sf0.1 lesson — the
      // stray 0x20 step made a consistent-but-wrong hash family that
      // only diverged observably on one near-dup pair)
      """flatten(list_transform(
        |            list_filter([toks[i], toks[i + 1], toks[i + 2]], t -> t IS NOT NULL),
        |            t -> list_append(
        |              flatten(list_transform(string_split(t, ''),
        |                ch -> [unicode(ch) % 256, unicode(ch) // 256])), 32))
        |          )[:-2]""".stripMargin)})) AS s_u
       |  FROM ${p}tok
       |),
       |${p}us AS MATERIALIZED (SELECT DISTINCT s_u FROM ${p}sh),
       |${p}z0 AS (SELECT s_u, seed,
       |    ((s_u + (seed + 1) * 11400714819323198485) & 18446744073709551615) AS z
       |  FROM ${p}us, (SELECT unnest(range(0, 64)) AS seed)),
       |${p}z1 AS (SELECT s_u, seed, $mix1 AS z FROM ${p}z0),
       |${p}z2 AS (SELECT s_u, seed, $mix2 AS z FROM ${p}z1),
       |${p}z3 AS (SELECT s_u, seed, $mix3 AS z FROM ${p}z2),
       |${p}uz AS MATERIALIZED (
       |  SELECT s_u, seed,
       |    CASE WHEN z >= 9223372036854775808
       |      THEN CAST(z - 18446744073709551616 AS BIGINT)
       |      ELSE CAST(z AS BIGINT) END AS v
       |  FROM ${p}z3),
       |${p}sig AS (
       |  SELECT doc_id, seed, min(v) AS v
       |  FROM ${p}sh JOIN ${p}uz USING (s_u) GROUP BY doc_id, seed),
       |${p}bands AS MATERIALIZED (
       |  SELECT doc_id, seed // 4 AS b, list(v ORDER BY seed) AS content
       |  FROM ${p}sig GROUP BY doc_id, seed // 4)""".stripMargin
  }

  /** The SimHash64 kernel replay as a CTE chain over `source`
    * (doc_id, text), ending in `sigs(doc_id, sig BIGINT)` — shared by
    * the q40 fingerprint oracle and the q55 dedup oracle.
    */
  private def sqlSimhashSigs(source: String): String =
    s"""t AS (
       |  SELECT doc_id,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
       |  FROM $source
       |),
       |h AS (
       |  SELECT doc_id, ${sqlFnv(
      """flatten(list_transform(string_split(tok, ''),
        |          ch -> [unicode(ch) % 256, unicode(ch) // 256]))""".stripMargin)} AS hu
       |  FROM t
       |),
       |bits AS (
       |  SELECT doc_id, b,
       |    CASE WHEN b < 32
       |      THEN (CAST(hu & 4294967295 AS BIGINT) >> b) & 1
       |      ELSE (CAST(hu >> 32 AS BIGINT) >> (b - 32)) & 1
       |    END AS bit
       |  FROM h, (SELECT unnest(range(0, 64)) AS b)
       |),
       |votes AS (
       |  SELECT doc_id, b, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
       |  FROM bits GROUP BY doc_id, b
       |),
       |sigs AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0 AND b < 63 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
       |      + sum(CASE WHEN v > 0 AND b = 63 THEN -9223372036854775808 ELSE 0 END)
       |      AS BIGINT) AS sig
       |  FROM votes GROUP BY doc_id
       |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_select_fields" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "q03_drop_fields" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
    "q04_rename_field" ->
      "SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation",
    "q05_apply_mapping" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS order_id,
        |  CAST(o_orderstatus AS VARCHAR) AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total,
        |  CAST(o_orderdate AS DATE) AS odate
        |FROM orders""".stripMargin,
    "q06_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'""".stripMargin,
    "q07_split_rows_match" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 10 AND l_quantity <= 40""".stripMargin,
    "q08_split_rows_nomatch" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE NOT (l_quantity > 10 AND l_quantity <= 40)""".stripMargin,
    "q09_split_fields" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part",
    "q10_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(FLOOR(l_quantity) AS INT) AS qty,
        |  CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem""".stripMargin,
    "q11_equi_join" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin,
    "q12_anti_join_new" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_acctbal < 0 AND c.c_custkey = o.o_custkey)""".stripMargin,
    "q13_composite_anti" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem e
        |  WHERE e.l_quantity > 45 AND e.l_orderkey = l.l_orderkey
        |    AND e.l_linenumber = l.l_linenumber)""".stripMargin,
    "q14_merge_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 10 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice * 2 AS o_totalprice
        |FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
    "q15_union" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O'""".stripMargin,
    "q16_unnest" ->
      """SELECT c_custkey, c_nationkey, c_mktsegment,
        |  c_name AS "info.c_name", c_acctbal AS "info.c_acctbal"
        |FROM customer""".stripMargin,
    "q17_relationalize_root" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
        |  CAST(p_partkey AS BIGINT) AS words
        |FROM part""".stripMargin,
    "q18_relationalize_child" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CAST(unnest(range(len(arr))) AS INT) AS index,
        |  unnest(arr) AS "words.val"
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS arr FROM part)""".stripMargin,
    "q19_unbox" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q20_choice_cast" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q21_choice_make_cols" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 2 = 0 THEN k END AS k_long,
        |  CASE WHEN event_id % 2 = 1 THEN CAST(k AS VARCHAR) END AS k_string
        |FROM (SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events)""".stripMargin,
    "q22_union_choice" ->
      """SELECT event_id, CAST(k AS VARCHAR) AS v
        |FROM (SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events) WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, 'v' || CAST(k AS VARCHAR) AS v
        |FROM (SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |  FROM events) WHERE event_id % 2 = 1""".stripMargin,
    "q30_drop_nulls" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders""".stripMargin,
    "q31_filter_errors" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus <> 'P' AND o_totalprice > 100.0""".stripMargin,
    "q32_map_records" ->
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents
        |FROM orders""".stripMargin,
    "q23_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q24_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    "q25_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "q26_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 10""".stripMargin,
    "q27_replace_array_element" ->
      """SELECT p_partkey,
        |  p_brand || ' ' || upper(p_type) || ' ' || p_name AS replaced
        |FROM part""".stripMargin,
    "q28_explode_index" ->
      """SELECT p_partkey,
        |  CAST(unnest(range(len(arr))) AS INT) AS index,
        |  unnest(arr) AS val
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS arr FROM part)""".stripMargin,
    "q29_ingest_cols" ->
      """SELECT s_suppkey, s_name, 2026 AS ingest_year, 1 AS ingest_month,
        |  1 AS ingest_day, 10 AS ingest_hour
        |FROM supplier""".stripMargin,
    "q33_dedup_exact" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""".stripMargin,
    "q34_fingerprint" ->
      "SELECT doc_id, md5(text) AS fp FROM documents",
    "q35_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS INT)
        |    AS n_tokens
        |FROM documents""".stripMargin,
    "q36_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(n_alpha AS INT) AS n_alpha,
        |  CAST(floor((length(text) - n_space) * 100 / greatest(n_tokens, 1)) AS INT)
        |    AS mean_word_len_x100,
        |  (n_tokens >= 5 AND n_tokens <= 100000
        |    AND (length(text) - n_space) <= n_tokens * 15
        |    AND n_alpha * 2 >= length(text)) AS quality_keep
        |FROM (SELECT doc_id, text,
        |  len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
        |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
        |  length(regexp_replace(text, '[^ \t\n\r]', '', 'g')) AS n_space
        |  FROM documents)""".stripMargin,
    "q37_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN de >= en AND de >= es AND de >= fr AND de >= 2 THEN 'de'
        |       WHEN en >= es AND en >= fr AND en >= 2 THEN 'en'
        |       WHEN es >= fr AND es >= 2 THEN 'es'
        |       WHEN fr >= 2 THEN 'fr'
        |       ELSE 'und' END AS lang_pred
        |FROM (SELECT doc_id,
        |  CAST(list_contains(toks,'the') AS INT) + CAST(list_contains(toks,'a') AS INT)
        |    + CAST(list_contains(toks,'and') AS INT) + CAST(list_contains(toks,'of') AS INT)
        |    + CAST(list_contains(toks,'to') AS INT) + CAST(list_contains(toks,'in') AS INT)
        |    + CAST(list_contains(toks,'is') AS INT) + CAST(list_contains(toks,'that') AS INT)
        |    + CAST(list_contains(toks,'it') AS INT) + CAST(list_contains(toks,'for') AS INT) AS en,
        |  CAST(list_contains(toks,'el') AS INT) + CAST(list_contains(toks,'la') AS INT)
        |    + CAST(list_contains(toks,'de') AS INT) + CAST(list_contains(toks,'que') AS INT)
        |    + CAST(list_contains(toks,'y') AS INT) + CAST(list_contains(toks,'en') AS INT)
        |    + CAST(list_contains(toks,'un') AS INT) + CAST(list_contains(toks,'una') AS INT)
        |    + CAST(list_contains(toks,'los') AS INT) + CAST(list_contains(toks,'por') AS INT) AS es,
        |  CAST(list_contains(toks,'der') AS INT) + CAST(list_contains(toks,'die') AS INT)
        |    + CAST(list_contains(toks,'das') AS INT) + CAST(list_contains(toks,'und') AS INT)
        |    + CAST(list_contains(toks,'ist') AS INT) + CAST(list_contains(toks,'von') AS INT)
        |    + CAST(list_contains(toks,'mit') AS INT) + CAST(list_contains(toks,'den') AS INT)
        |    + CAST(list_contains(toks,'ein') AS INT) + CAST(list_contains(toks,'zu') AS INT) AS de,
        |  CAST(list_contains(toks,'le') AS INT) + CAST(list_contains(toks,'la') AS INT)
        |    + CAST(list_contains(toks,'les') AS INT) + CAST(list_contains(toks,'de') AS INT)
        |    + CAST(list_contains(toks,'et') AS INT) + CAST(list_contains(toks,'est') AS INT)
        |    + CAST(list_contains(toks,'un') AS INT) + CAST(list_contains(toks,'une') AS INT)
        |    + CAST(list_contains(toks,'dans') AS INT) + CAST(list_contains(toks,'que') AS INT) AS fr
        |FROM (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents))""".stripMargin,
    "q38_ann_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id,
        |  list_sum(list_transform(range(1, len(e.embedding)+1),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(e.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(q.qe,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        | FROM embeddings e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, round(raw, 4) AS score FROM sc
        |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // MinHash+LSH dedup: full kernel replay — FNV-1a shingle hashes
    // (token separator is ONE 0x20 step), splitmix64 signature minima
    // over SIGNED longs, 16×4 band grouping by band CONTENT (equivalent
    // to Spark's band-hash buckets absent 64-bit hash collisions), a
    // doc survives iff no band bucket holds a smaller id.
    "q39_minhash_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text FROM documents
         |),
         |${sqlMinhashBands("d", "")},
         |bucket_min AS (
         |  SELECT b, content, min(doc_id) AS m FROM bands GROUP BY b, content)
         |SELECT bands.doc_id FROM bands
         |JOIN bucket_min USING (b, content)
         |GROUP BY bands.doc_id
         |HAVING min(m) = bands.doc_id""".stripMargin,
    // SimHash64: FNV-1a per token (two byte-steps per UTF-16 unit),
    // ±1 votes per bit via 32-bit halves, sign bits reassembled into a
    // signed BIGINT.
    "q40_simhash" ->
      s"""WITH ${sqlSimhashSigs("documents")}
         |SELECT doc_id, sig FROM sigs""".stripMargin,
    // SimHash dedup: same signature pipeline over the doubled corpus,
    // then the 4 rotated 16-bit prefix buckets (rotate-left in unsigned
    // HUGEINT arithmetic: (u·2^k mod 2^64) + u÷2^(64−k)), exact Hamming
    // verification, and the min-id drop policy.
    "q55_simhash_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 100000, text FROM documents
         |),
         |${sqlSimhashSigs("d")},
         |u AS (SELECT doc_id, sig,
         |  CASE WHEN sig < 0 THEN CAST(sig AS HUGEINT) + 18446744073709551616
         |       ELSE CAST(sig AS HUGEINT) END AS us FROM sigs),
         |bk AS (
         |  SELECT doc_id, sig, t,
         |    ((us * c) % 18446744073709551616 + us // inv) // 281474976710656 AS b
         |  FROM u, (VALUES
         |    (0, CAST(1 AS HUGEINT), CAST(18446744073709551616 AS HUGEINT)),
         |    (1, CAST(65536 AS HUGEINT), CAST(281474976710656 AS HUGEINT)),
         |    (2, CAST(4294967296 AS HUGEINT), CAST(4294967296 AS HUGEINT)),
         |    (3, CAST(281474976710656 AS HUGEINT), CAST(65536 AS HUGEINT))
         |  ) ts(t, c, inv)
         |),
         |dropped AS (
         |  SELECT DISTINCT x.doc_id FROM bk a
         |  JOIN bk x ON a.t = x.t AND a.b = x.b AND a.doc_id < x.doc_id
         |  WHERE bit_count(xor(a.sig, x.sig)) <= 3
         |)
         |SELECT doc_id FROM sigs
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin,
    // LSH ANN: the oracle replays the deterministic bucketing with the
    // SAME plane constants (inlined literals), then reranks the bucket
    // exactly — checks bucket membership AND scores, not just shape.
    "q44_ann_lsh" ->
      s"""WITH ${sqlPlaneMatCte(4)},
         |coded AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    list_sum(list_transform(range(1, 5), p ->
         |      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
         |          i -> CAST(embedding[i] AS DOUBLE) * __mat.m[p][i])) >= 0
         |        THEN (1 << (p - 1)) ELSE 0 END)) AS bk
         |  FROM embeddings, __mat),
         |q AS (SELECT embedding AS qe, bk AS qbk FROM coded WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id,
         |  list_sum(list_transform(range(1, len(c.embedding) + 1),
         |    i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
         |  (sqrt(list_sum(list_transform(c.embedding,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |   sqrt(list_sum(list_transform(q.qe,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
         | FROM coded c, q WHERE c.vec_id <> 0 AND c.bk = q.qbk)
         |SELECT vec_id, round(raw, 4) AS score FROM sc
         |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // q44's replay at planes = 6 with the Hamming ≤ 1 probe set:
    // xor(bk, qbk) is 0 (same bucket) or a single set bit (one
    // hyperplane sign apart).
    "q200_ann_lsh_multiprobe" ->
      s"""WITH ${sqlPlaneMatCte(6)},
         |coded AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    list_sum(list_transform(range(1, 7), p ->
         |      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
         |          i -> CAST(embedding[i] AS DOUBLE) * __mat.m[p][i])) >= 0
         |        THEN (1 << (p - 1)) ELSE 0 END)) AS bk
         |  FROM embeddings, __mat),
         |q AS (SELECT embedding AS qe, bk AS qbk FROM coded WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id,
         |  list_sum(list_transform(range(1, len(c.embedding) + 1),
         |    i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
         |  (sqrt(list_sum(list_transform(c.embedding,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |   sqrt(list_sum(list_transform(q.qe,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
         | FROM coded c, q WHERE c.vec_id <> 0
         |   AND xor(c.bk, q.qbk) IN (0, 1, 2, 4, 8, 16, 32))
         |SELECT vec_id, round(raw, 4) AS score FROM sc
         |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // Query-directed budget probing at planes = 8, budget 12: the
    // oracle replays the ENGINE'S probe-set derivation — per-plane
    // signed projections for the query, perturbation masks of Hamming
    // ≤ 2 scored by the sum of squared flipped margins, ordered
    // (score, mask), LIMIT budget − 1, base-code XOR — then the
    // standard bucket-IN rerank. The margin comparisons ride the same
    // bit-equal dot replay every sign comparison (q44/q200) already
    // depends on.
    "q201_ann_lsh_qdprobe" ->
      s"""WITH ${sqlPlaneMatCte(8)},
         |coded AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    list_transform(range(1, 9), p ->
         |      list_sum(list_transform(range(1, len(embedding) + 1),
         |        i -> CAST(embedding[i] AS DOUBLE) * __mat.m[p][i]))) AS dots
         |  FROM embeddings, __mat),
         |ck AS MATERIALIZED (
         |  SELECT vec_id, embedding, dots,
         |    CAST(list_sum(list_transform(range(1, 9), p ->
         |      CASE WHEN dots[p] >= 0 THEN (1 << (p - 1)) ELSE 0 END))
         |      AS BIGINT) AS bk
         |  FROM coded),
         |q AS (SELECT embedding AS qe, bk AS qbk, dots AS qd
         |      FROM ck WHERE vec_id = 0),
         |masks AS (
         |  SELECT CAST(1 << (p - 1) AS BIGINT) AS mask,
         |         qd[p] * qd[p] AS s
         |  FROM q, range(1, 9) t(p)
         |  UNION ALL
         |  SELECT CAST((1 << (p1 - 1)) | (1 << (p2 - 1)) AS BIGINT) AS mask,
         |         qd[p1] * qd[p1] + qd[p2] * qd[p2] AS s
         |  FROM q, range(1, 9) t1(p1), range(1, 9) t2(p2)
         |  WHERE p1 < p2),
         |probes AS (
         |  SELECT xor(q.qbk, mask) AS code FROM masks, q
         |  ORDER BY s, mask LIMIT 11),
         |pset AS (
         |  SELECT qbk AS code FROM q
         |  UNION ALL SELECT code FROM probes),
         |sc AS (SELECT c.vec_id,
         |  list_sum(list_transform(range(1, len(c.embedding) + 1),
         |    i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
         |  (sqrt(list_sum(list_transform(c.embedding,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |   sqrt(list_sum(list_transform(q.qe,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
         | FROM ck c, q
         | WHERE c.vec_id <> 0 AND c.bk IN (SELECT code FROM pset))
         |SELECT vec_id, round(raw, 4) AS score FROM sc
         |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // Banded near-dup pairs: 12 planes = 3 bands x 4; band b buckets
    // on planes [4b+1, 4b+4], candidates collide in ANY band
    // (DISTINCT merges multi-band hits), exact rerank over the
    // normalized vectors — q53's replay lifted to OR-amplification.
    "q202_embed_pairs_banded" -> sqlBandedPairs(3, 4, 0.35),
    // Flat PQ (m = 4 × dsub = 16, ksub = 4, iters = 0, anchors by id):
    // the oracle replays the engine's ENTIRE derivation — L2
    // normalization, the 4 anchor rows' subvector slices as codebooks,
    // the per-subspace argmin with the (dist, index) tie-break
    // (row_number), the query's ADC table, and the subspace-ordered
    // score sum (a fixed-parenthesization addition, never an
    // unordered SUM — float addition order must match the kernel's
    // j-ascending fold for round-4 hash equality).
    "q204_ann_pq" ->
      """WITH corpus AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        |  FROM embeddings WHERE vec_id <> 0),
        |anch AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, nv
        |  FROM corpus ORDER BY vec_id LIMIT 4),
        |d AS (
        |  SELECT x.vec_id, j.j, a.c,
        |    list_sum(list_transform(range(1, 17), i ->
        |      (x.nv[j.j * 16 + i] - a.nv[j.j * 16 + i]) *
        |      (x.nv[j.j * 16 + i] - a.nv[j.j * 16 + i]))) AS dist
        |  FROM corpus x, range(0, 4) j(j), anch a),
        |enc AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c, row_number()
        |      OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
        |    FROM d) WHERE rn = 1),
        |q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        |  FROM embeddings WHERE vec_id = 0),
        |part AS (
        |  SELECT e.vec_id, e.j,
        |    list_sum(list_transform(range(1, 17), i ->
        |      q.nv[e.j * 16 + i] * a.nv[e.j * 16 + i])) AS p
        |  FROM enc e JOIN anch a ON a.c = e.c, q),
        |sc AS (
        |  SELECT vec_id,
        |    ((max(CASE WHEN j = 0 THEN p END) +
        |      max(CASE WHEN j = 1 THEN p END)) +
        |      max(CASE WHEN j = 2 THEN p END)) +
        |      max(CASE WHEN j = 3 THEN p END) AS raw
        |  FROM part GROUP BY vec_id)
        |SELECT vec_id, round(raw, 4) AS score FROM sc
        |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // IVF-PQ exactness configuration (full probe, every residual its
    // own centroid, exact-cosine rerank): provably the exact top-k on
    // the pinned slice, so the oracle is brute force — the q52
    // discipline (the rerank reuses bruteForceTopK's scoring
    // expression, so values replay bit-identically).
    "q205_ann_ivfpq" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id,
        |  list_sum(list_transform(range(1, len(e.embedding)+1),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(e.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(q.qe,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        | FROM embeddings e, q WHERE e.vec_id <> 0 AND e.vec_id < 500)
        |SELECT vec_id, round(raw, 4) AS score FROM sc
        |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    // Batched ADC eval under the exact-reconstruction configuration +
    // exact rerank == the brute majority-vote eval: q169's replay on
    // the pinned slice.
    "q207_knn_eval_pq" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe,
        |    label AS qlabel FROM embeddings
        |  WHERE vec_id % 7 = 0 AND vec_id < 500),
        |sc AS (SELECT q.qid, q.qlabel, e.vec_id AS cid,
        |    e.label AS clabel,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> CAST(e.embedding[i] AS DOUBLE)
        |        * CAST(q.qe[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(e.embedding,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(q.qe,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        |  FROM embeddings e, q
        |  WHERE e.vec_id % 7 <> 0 AND e.vec_id < 500),
        |nn AS (SELECT qid, qlabel, clabel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY raw DESC, cid) AS rn
        |  FROM sc),
        |v AS (SELECT qid, qlabel, clabel, count(*) AS n
        |  FROM nn WHERE rn <= 5 GROUP BY qid, qlabel, clabel),
        |p AS (SELECT qid, qlabel, clabel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY n DESC, clabel) AS rn
        |  FROM v)
        |SELECT qid AS vec_id, qlabel AS true_label,
        |  clabel AS predicted,
        |  CAST(qlabel = clabel AS INT) AS correct
        |FROM p WHERE rn = 1""".stripMargin,
    // DSIR: FNV word 1+2-gram features masked into 8192 buckets,
    // Laplace-smoothed bucket models of raw (all documents) and
    // target (doc_id % 5), per-doc weight as an exact BIGINT sum of
    // per-bucket ppm log-ratios plus n_feats·const, top-200 by
    // (weight, id). The 2-gram window replays the engine's
    // fewer-than-n rule (one shingle of the available tokens) via the
    // NULL-filtered pair and greatest(len-1, 1); [:-2] drops the
    // trailing separator (the q39 lesson).
    "q209_dsir_select" ->
      s"""WITH tok AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |      t -> t <> '') AS toks
         |  FROM documents),
         |occ1 AS (SELECT doc_id, unnest(list_transform(toks,
         |    t -> ${sqlFnv(
        """flatten(list_transform(string_split(t, ''),
          |            ch -> [unicode(ch) % 256, unicode(ch) // 256]))""".stripMargin)})) AS hu
         |  FROM tok WHERE len(toks) >= 1),
         |occ2 AS (SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(toks) - 1, 1) + 1),
         |    i -> ${sqlFnv(
        """flatten(list_transform(
          |            list_filter([toks[i], toks[i + 1]], t -> t IS NOT NULL),
          |            t -> list_append(
          |              flatten(list_transform(string_split(t, ''),
          |                ch -> [unicode(ch) % 256, unicode(ch) // 256])), 32))
          |          )[:-2]""".stripMargin)})) AS hu
         |  FROM tok WHERE len(toks) >= 1),
         |occ AS MATERIALIZED (
         |  SELECT doc_id, CAST(hu & 8191 AS BIGINT) AS b FROM (
         |    SELECT doc_id, hu FROM occ1
         |    UNION ALL SELECT doc_id, hu FROM occ2)),
         |rawc AS MATERIALIZED (SELECT b, count(*) AS c FROM occ GROUP BY b),
         |tgtc AS MATERIALIZED (SELECT b, count(*) AS c FROM occ
         |  WHERE doc_id % 5 = 0 GROUP BY b),
         |tot AS (SELECT (SELECT count(*) FROM occ) AS tr,
         |  (SELECT count(*) FROM occ WHERE doc_id % 5 = 0) AS tt),
         |ratio AS MATERIALIZED (
         |  SELECT r.b,
         |    CAST(round(ln(COALESCE(t.c, 0) + 1) * 1000000, 0) AS BIGINT)
         |    - CAST(round(ln(r.c + 1) * 1000000, 0) AS BIGINT) AS ppm
         |  FROM rawc r LEFT JOIN tgtc t USING (b)),
         |cst AS (SELECT
         |    CAST(round(ln(tr + 8192) * 1000000, 0) AS BIGINT)
         |    - CAST(round(ln(tt + 8192) * 1000000, 0) AS BIGINT) AS cppm
         |  FROM tot),
         |w AS (SELECT o.doc_id, SUM(ratio.ppm) AS s, count(*) AS nf
         |  FROM occ o JOIN ratio USING (b) GROUP BY o.doc_id),
         |wf AS (SELECT t.doc_id,
         |    COALESCE(w.s, 0) + COALESCE(w.nf, 0) * cst.cppm AS weight_ppm
         |  FROM tok t LEFT JOIN w ON w.doc_id = t.doc_id, cst)
         |SELECT doc_id, CAST(weight_ppm AS BIGINT) AS weight_ppm FROM wf
         |ORDER BY weight_ppm DESC, doc_id LIMIT 200""".stripMargin,
    // Batched LSH ANN: the q44 bucketing replayed for EVERY query in
    // the batch (vec_id % 97 = 0), ranked per query_id — row_number
    // over (raw desc, vec_id) mirrors the engine's per-query heap
    // tie-break.
    "q211_ann_lsh_batch" ->
      s"""WITH ${sqlPlaneMatCte(4)},
         |coded AS MATERIALIZED (
         |  SELECT vec_id, embedding,
         |    list_sum(list_transform(range(1, 5), p ->
         |      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
         |          i -> CAST(embedding[i] AS DOUBLE) * __mat.m[p][i])) >= 0
         |        THEN (1 << (p - 1)) ELSE 0 END)) AS bk
         |  FROM embeddings, __mat),
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id,
         |  list_sum(list_transform(range(1, len(c.embedding) + 1),
         |    i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) /
         |  (sqrt(list_sum(list_transform(c.embedding,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         |   sqrt(list_sum(list_transform(q.embedding,
         |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
         | FROM coded c JOIN coded q ON c.bk = q.bk
         | WHERE c.vec_id % 97 <> 0 AND q.vec_id % 97 = 0),
         |rk AS (SELECT query_id, vec_id, raw, row_number()
         |    OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rn
         |  FROM sc)
         |SELECT query_id, vec_id, round(raw, 4) AS score FROM rk
         |WHERE rn <= 5""".stripMargin,
    // Batched IVF ANN at full probe: provably each query's exact
    // top-k, so the oracle is per-query brute force over the corpus.
    "q212_ann_ivf_batch" ->
      """WITH sc AS (SELECT q.vec_id AS query_id, c.vec_id,
        |  list_sum(list_transform(range(1, len(c.embedding) + 1),
        |    i -> CAST(c.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(c.embedding,
        |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(q.embedding,
        |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS raw
        | FROM embeddings c, embeddings q
        | WHERE c.vec_id % 131 <> 0 AND q.vec_id % 131 = 0),
        |rk AS (SELECT query_id, vec_id, raw, row_number()
        |    OVER (PARTITION BY query_id ORDER BY raw DESC, vec_id) AS rn
        |  FROM sc)
        |SELECT query_id, vec_id, round(raw, 4) AS score FROM rk
        |WHERE rn <= 5""".stripMargin,
    // Contracted banded pairs: the oracle replays the UNCONTRACTED
    // banded generation over the same planted union (base table +
    // vec_id % 29 twins shifted by 1e6) — the contraction is exact or
    // the hash diverges.
    "q213_banded_pairs_contracted" ->
      s"""WITH eu AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000 AS vec_id, embedding
         |  FROM embeddings WHERE vec_id % 29 = 0),
         |${sqlBandedCandCtes(3, 4, "", "eu")},
         |sc AS (SELECT id_a, id_b,
         |  list_sum(list_transform(range(1, len(a.u) + 1),
         |    i -> a.u[i] * b2.u[i])) AS raw
         | FROM cand JOIN u a ON a.vec_id = cand.id_a
         |           JOIN u b2 ON b2.vec_id = cand.id_b)
         |SELECT id_a, id_b, round(raw, 4) AS score FROM sc
         |WHERE raw >= 0.35""".stripMargin,
    // Multimodal PQ-code dedup: the q204 encode replay over ALL
    // embeddings (anchors = 4 smallest ids), grouped by the 4-tuple
    // code word (min id + group size), metadata joined from the
    // documents modality (octet_length = the packMedia byte_len).
    "q214_multimodal_pq_dedup" ->
      """WITH corpus AS MATERIALIZED (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
        |  FROM embeddings),
        |anch AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, nv
        |  FROM corpus ORDER BY vec_id LIMIT 4),
        |d AS (
        |  SELECT x.vec_id, j.j, a.c,
        |    list_sum(list_transform(range(1, 17), i ->
        |      (x.nv[j.j * 16 + i] - a.nv[j.j * 16 + i]) *
        |      (x.nv[j.j * 16 + i] - a.nv[j.j * 16 + i]))) AS dist
        |  FROM corpus x, range(0, 4) j(j), anch a),
        |enc AS (
        |  SELECT vec_id, j, c FROM (
        |    SELECT vec_id, j, c, row_number()
        |      OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
        |    FROM d) WHERE rn = 1),
        |cw AS (SELECT vec_id,
        |    max(CASE WHEN j = 0 THEN c END) AS c0,
        |    max(CASE WHEN j = 1 THEN c END) AS c1,
        |    max(CASE WHEN j = 2 THEN c END) AS c2,
        |    max(CASE WHEN j = 3 THEN c END) AS c3
        |  FROM enc GROUP BY vec_id),
        |surv AS (SELECT min(vec_id) AS vec_id, count(*) AS n_dups
        |  FROM cw GROUP BY c0, c1, c2, c3)
        |SELECT s.vec_id, s.n_dups,
        |  CAST(strlen(d2.text) AS BIGINT) AS byte_len
        |FROM surv s JOIN documents d2 ON d2.doc_id = s.vec_id""".stripMargin,
    // Incremental SemDeDup: the oracle is full-recompute semDedup over
    // the whole table at the store's committed 3×4 family — the
    // batch-by-batch engine run must converge to exactly this set
    // (decomposing candidates by arrival order loses nothing; the
    // closure runs over the accumulated pair graph).
    "q215_semdedup_incremental" -> sqlSemDedupSurvivors(3, 4, 0.35),
    // IVF cluster-local exact pairs at nprobe = nlist: every pair
    // shares every cell, so the oracle is exact all-pairs cosine (the
    // q50 replay at the 0.5 threshold, unsliced).
    "q216_pairs_ivf" ->
      """WITH sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(a.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(b.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        | FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(raw, 4) AS score FROM sc
        |WHERE raw >= 0.5""".stripMargin,
    // Hybrid generator at nprobe = nlist: the IVF side alone is exact
    // all-pairs, the banded side is a subset, so the union is exact —
    // the oracle is the same unsliced brute cosine join as q216.
    "q217_pairs_hybrid" ->
      """WITH sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(a.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(b.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        | FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(raw, 4) AS score FROM sc
        |WHERE raw >= 0.5""".stripMargin,
    // Store rebuild: survivors after re-committing the 3×4/0.35
    // family from the store's persisted unit vectors — the oracle
    // codes from u exactly as the rebuild does.
    "q218_semdedup_rebuild" -> sqlSemDedupSurvivorsU(3, 4, 0.35),
    // Hybrid semantic dedup at nprobe = nlist: the pair graph is the
    // exact near-dup graph, so the oracle is brute all-pairs at the
    // threshold plus the recursive transitive closure — no banding
    // replay, no generator recall caveat.
    "q219_semdedup_hybrid" ->
      """WITH RECURSIVE p AS MATERIALIZED (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < b.vec_id AND
        |    list_sum(list_transform(range(1, len(a.embedding)+1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.embedding,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.embedding,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) >= 0.5),
        |sym AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
        |        UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
        |m AS (SELECT id, min(r) AS mn FROM reach GROUP BY id)
        |SELECT e.vec_id FROM embeddings e LEFT JOIN m ON m.id = e.vec_id
        |WHERE m.id IS NULL OR m.mn >= e.vec_id""".stripMargin,
    // Hybrid incremental store at nprobe = nlist: the IVF leg makes
    // every pair a candidate regardless of arrival order, so the
    // oracle is the same brute-pairs + recursive-closure replay as
    // q219 — no banding replay, no generator recall caveat, and the
    // batch-boundary transitivity is exact-checked.
    "q220_semdedup_store_hybrid" ->
      """WITH RECURSIVE p AS MATERIALIZED (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < b.vec_id AND
        |    list_sum(list_transform(range(1, len(a.embedding)+1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.embedding,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.embedding,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) >= 0.5),
        |sym AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
        |        UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
        |m AS (SELECT id, min(r) AS mn FROM reach GROUP BY id)
        |SELECT e.vec_id FROM embeddings e LEFT JOIN m ON m.id = e.vec_id
        |WHERE m.id IS NULL OR m.mn >= e.vec_id""".stripMargin,
    "q41_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id, text FROM documents
        |           UNION ALL SELECT doc_id + 100000, text FROM documents),
        |t AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM d),
        |s AS (SELECT doc_id, CASE
        |  WHEN len(toks) = 1 AND toks[1] = '' THEN CAST([] AS VARCHAR[])
        |  WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
        |  ELSE list_distinct(list_transform(
        |    range(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |  END AS sh FROM t),
        |pg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM pg x JOIN pg y ON x.g = y.g AND x.doc_id < y.doc_id),
        |p AS (SELECT id_a, id_b,
        |  len(list_intersect(a.sh, b.sh)) AS n_inter,
        |  len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_union
        |  FROM cand JOIN s a ON a.doc_id = cand.id_a
        |            JOIN s b ON b.doc_id = cand.id_b)
        |SELECT id_a, id_b, CAST(n_inter AS INT) AS n_inter,
        |  CAST(n_union AS INT) AS n_union
        |FROM p WHERE n_inter * 2 >= n_union""".stripMargin,
    // Capped pair kernel: q41's all-shared-shingle candidate shortcut
    // is only valid for the EXACT configuration, so this oracle
    // replays the engine's actual candidate discipline — exact-dup
    // contraction to distinct texts, FNV shingle hashes (the q39/q43
    // byte-step kernel), per-doc prefix ranks ordered by global
    // (frequency, hash), the PPJoin positional bound, the frequency
    // cap — then exact verification and member expansion (cross-group
    // pairs inherit the representative pair; within-group copies pair
    // at J = 1).
    "q109_jaccard_capped" ->
      s"""WITH d AS (SELECT doc_id, text FROM documents
         |           UNION ALL SELECT doc_id + 100000, text FROM documents),
         |grp AS (SELECT text, min(doc_id) AS rep FROM d GROUP BY text),
         |mem AS (SELECT d.doc_id AS id, grp.rep FROM d
         |  JOIN grp ON d.text = grp.text),
         |rd AS (SELECT doc_id, text FROM d
         |  WHERE doc_id IN (SELECT rep FROM grp)),
         |tok AS (SELECT doc_id,
         |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM rd),
         |hs AS (SELECT doc_id, list_transform(
         |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         |      i -> ${sqlFnv(
        """flatten(list_transform(
          |            list_filter([toks[i], toks[i + 1], toks[i + 2]], t -> t IS NOT NULL),
          |            t -> list_append(
          |              flatten(list_transform(string_split(t, ''),
          |                ch -> [unicode(ch) % 256, unicode(ch) // 256])), 32))
          |          )[:-2]""".stripMargin)}),
         |    u -> CASE WHEN u >= 9223372036854775808
         |      THEN CAST(u - 18446744073709551616 AS BIGINT)
         |      ELSE CAST(u AS BIGINT) END) AS h
         |  FROM tok),
         |sh AS (SELECT doc_id, list_sort(list_distinct(h)) AS sh FROM hs
         |  WHERE len(list_distinct(h)) > 0),
         |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
         |f AS (SELECT s, count(*) AS f FROM ex GROUP BY s),
         |rk AS (SELECT ex.doc_id, ex.s, ex.n, f.f,
         |    row_number() OVER (PARTITION BY ex.doc_id
         |      ORDER BY f.f, ex.s) AS r
         |  FROM ex JOIN f USING (s)),
         |pre AS (SELECT doc_id, s, n, r FROM rk
         |  WHERE r <= n - CAST(ceil(n / 2) AS BIGINT) + 1 AND f <= 4),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM pre a JOIN pre b ON a.s = b.s AND a.doc_id < b.doc_id
         |   AND (1 + least(a.n - a.r, b.n - b.r)) * 3 >= (a.n + b.n)),
         |rp AS (SELECT id_a, id_b,
         |    len(list_intersect(a.sh, b.sh)) AS n_inter,
         |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_union
         |  FROM cand JOIN sh a ON a.doc_id = cand.id_a
         |            JOIN sh b ON b.doc_id = cand.id_b),
         |rpf AS (SELECT * FROM rp WHERE n_inter * 2 >= n_union),
         |crossp AS (SELECT least(ma.id, mb.id) AS id_a,
         |    greatest(ma.id, mb.id) AS id_b, n_inter, n_union
         |  FROM rpf JOIN mem ma ON ma.rep = rpf.id_a
         |           JOIN mem mb ON mb.rep = rpf.id_b),
         |withinp AS (SELECT x.id AS id_a, y.id AS id_b,
         |    len(s.sh) AS n_inter, len(s.sh) AS n_union
         |  FROM mem x JOIN mem y ON x.rep = y.rep AND x.id < y.id
         |  JOIN sh s ON s.doc_id = x.rep)
         |SELECT id_a, id_b, CAST(n_inter AS INT) AS n_inter,
         |  CAST(n_union AS INT) AS n_union
         |FROM (SELECT * FROM crossp UNION ALL SELECT * FROM withinp)""".stripMargin,
    // Winnowing: the q39 FNV-1a 3-gram kernel kept POSITIONAL (no
    // distinct/sort), signed view, then the min of every 4-hash window
    // (DuckDB slices are 1-based INCLUSIVE: h[i:i+3] is 4 elements,
    // clipped at the end for short docs → the single clipped window).
    "q43_winnow" ->
      s"""WITH tok AS (SELECT doc_id,
         |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents),
         |hs AS (
         |  SELECT doc_id, list_transform(
         |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         |      i -> ${sqlFnv(
        """flatten(list_transform(
          |            list_filter([toks[i], toks[i + 1], toks[i + 2]], t -> t IS NOT NULL),
          |            t -> list_append(
          |              flatten(list_transform(string_split(t, ''),
          |                ch -> [unicode(ch) % 256, unicode(ch) // 256])), 32))
          |          )[:-2]""".stripMargin)}),
         |    u -> CASE WHEN u >= 9223372036854775808
         |      THEN CAST(u - 18446744073709551616 AS BIGINT)
         |      ELSE CAST(u AS BIGINT) END) AS h
         |  FROM tok)
         |SELECT doc_id,
         |  unnest(list_distinct(list_transform(
         |    range(1, greatest(len(h) - 3, 1) + 1),
         |    i -> list_aggregate(h[i:i+3], 'min')))) AS fp
         |FROM hs""".stripMargin,
    // Repetition metrics: bigram mode via unnest + GROUP BY (the
    // relational mirror of the engine's in-row run-length pass).
    "q56_repetition" ->
      """WITH tok AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS b
        |  FROM tok),
        |cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |top AS (SELECT doc_id, CAST(max(c) AS INT) AS top_bigram
        |  FROM cnt GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        |  coalesce(top.top_bigram, 0) AS top_bigram
        |FROM tok t LEFT JOIN top ON t.doc_id = top.doc_id""".stripMargin,
    // TF-IDF: DF derived from the TF table, natural-log scores rounded
    // to 4 dp BEFORE ranking, (score desc, token) tie-break.
    "q57_tfidf" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS INT) AS tf
        |  FROM tok GROUP BY doc_id, token),
        |dft AS (SELECT token, CAST(count(*) AS INT) AS df_t
        |  FROM tf GROUP BY token),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf),
        |scored AS (SELECT doc_id, token, tf, df_t,
        |    round(tf * ln(n_docs / df_t), 4) AS score
        |  FROM tf JOIN dft USING (token), n),
        |rk AS (SELECT *, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, token) AS rk
        |  FROM scored)
        |SELECT doc_id, token, tf, df_t, score, CAST(rk AS INT) AS rk
        |FROM rk WHERE rk <= 5""".stripMargin,
    // PII redaction: same ASCII-class regexes (no lookarounds — they
    // mean the same thing to Java regex and RE2), global replacement.
    "q58_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      text || ' contact: user' || CAST(doc_id AS VARCHAR)
        |        || '@example.com case 123456789',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+',
        |      '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g') AS redacted
        |FROM documents""".stripMargin,
    // As-of join: DuckDB's native ASOF LEFT JOIN is the oracle for the
    // engine's union-sort implementation (backward, inclusive).
    "q59_asof" ->
      """WITH p AS (SELECT user_id, ts, max(event_id) AS purchase_id,
        |    arg_max(value, event_id) AS purchase_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts)
        |SELECT e.event_id, p.purchase_id, p.purchase_value
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin,
    // Quantized ANN: the oracle replays the explicit-floor affine
    // quantization (same IEEE double steps) and the integer dot.
    "q60_ann_quantized" ->
      """WITH base AS (SELECT vec_id, embedding,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)), 'min') AS mn,
        |    list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE)), 'max') AS mx
        |  FROM embeddings),
        |c AS (SELECT vec_id,
        |    CASE WHEN mx = mn THEN list_transform(embedding, x -> 0)
        |      ELSE list_transform(embedding, x ->
        |        CAST(floor((CAST(x AS DOUBLE) - mn)
        |          / ((mx - mn) / 255) + 0.5) AS INT))
        |    END AS codes
        |  FROM base),
        |q AS (SELECT codes AS qc FROM c WHERE vec_id = 0),
        |sc AS (SELECT c.vec_id,
        |    list_sum(list_transform(range(1, len(codes) + 1),
        |      i -> CAST(codes[i] AS BIGINT) * qc[i])) AS score
        |  FROM c, q WHERE c.vec_id <> 0)
        |SELECT vec_id, CAST(score AS BIGINT) AS score FROM sc
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    // Sessionization: same lag/cumsum windows with an EXPLICIT ROWS
    // frame (DuckDB's default with ORDER BY is RANGE, which merges
    // tie rows); tie order inside (user, ts) cannot change session
    // assignment (gap 0 never opens a boundary).
    "q61_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events),
        |b AS (SELECT user_id, tsn,
        |  CASE WHEN lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn) IS NULL
        |         OR tsn - lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn)
        |            > 1800000000
        |       THEN 1 ELSE 0 END AS nb
        |  FROM e),
        |s AS (SELECT user_id, tsn,
        |  sum(nb) OVER (PARTITION BY user_id ORDER BY tsn
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM b)
        |SELECT user_id, CAST(seq AS BIGINT) AS session_seq,
        |  min(tsn) AS session_start, max(tsn) AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, seq""".stripMargin,
    "q62_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        |FROM events GROUP BY user_id""".stripMargin,
    "q63_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    // Stratified sample: full mix64 kernel replay on doc_id (seed 7),
    // low 10 bits vs per-language integer thresholds.
    "q64_stratified_sample" ->
      s"""WITH z0 AS (SELECT doc_id, lang,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(7)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id, lang")}
         |SELECT doc_id, lang FROM z3
         |WHERE z % 1024 < CASE WHEN lang = 'en' THEN 128 ELSE 512 END""".stripMargin,
    // Heavy hitters: exact top-20 plus the count-min estimate — the
    // counter matrix replayed from per-distinct-token FNV hashes (the
    // same q39 byte-step kernel) through the 4 seeded mix64 chains
    // (seed constants precomputed mod 2^64), counters summed from
    // exact token counts (all occurrences of a token share buckets).
    "q65_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest(regexp_split_to_array(
         |    trim(lower(text)), '\\s+')) AS token FROM documents),
         |tc AS (SELECT token, count(*) AS c FROM tok
         |       WHERE token <> '' GROUP BY token),
         |h AS (SELECT token, c, ${sqlFnv(
        """flatten(list_transform(string_split(token, ''),
          |          ch -> [unicode(ch) % 256, unicode(ch) // 256]))""".stripMargin)} AS hu
         |  FROM tc),
         |z0 AS (SELECT token, c, d, (hu + k) % 18446744073709551616 AS z
         |  FROM h, (VALUES
         |    (0, CAST(${sqlMixAdd(1000)} AS HUGEINT)),
         |    (1, CAST(${sqlMixAdd(1001)} AS HUGEINT)),
         |    (2, CAST(${sqlMixAdd(1002)} AS HUGEINT)),
         |    (3, CAST(${sqlMixAdd(1003)} AS HUGEINT))) sd(d, k)),
         |${sqlMixFinal("token, c, d")},
         |bk AS (SELECT token, c, d, CAST(z % 1024 AS INT) AS bucket FROM z3),
         |counters AS (SELECT d, bucket, sum(c) AS cnt2
         |             FROM bk GROUP BY d, bucket),
         |exact AS (SELECT token, c AS cnt FROM tc
         |          ORDER BY c DESC, token LIMIT 20)
         |SELECT e.token, e.cnt, CAST(min(c2.cnt2) AS BIGINT) AS cms_est
         |FROM exact e JOIN bk USING (token) JOIN counters c2 USING (d, bucket)
         |GROUP BY e.token, e.cnt""".stripMargin,
    "q66_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(
        |    trim(lower(text)), '\s+')) AS token FROM documents),
        |tc AS (SELECT doc_id, token, count(*) AS c
        |       FROM tok GROUP BY doc_id, token),
        |a AS (SELECT doc_id, sum(c) AS n, sum(c * log2(c)) AS s2
        |      FROM tc GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |  round(log2(CAST(n AS DOUBLE)) - s2 / n, 4) AS entropy
        |FROM a""".stripMargin,
    // Dedup clusters: the q41 pair graph closed transitively with a
    // recursive CTE — min reachable id per node is the component.
    "q67_dedup_clusters" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents
        |           UNION ALL SELECT doc_id + 100000, text FROM documents),
        |t AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM d),
        |s AS MATERIALIZED (SELECT doc_id, CASE
        |  WHEN len(toks) = 1 AND toks[1] = '' THEN CAST([] AS VARCHAR[])
        |  WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
        |  ELSE list_distinct(list_transform(
        |    range(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |  END AS sh FROM t),
        |ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM s),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id),
        |p AS MATERIALIZED (SELECT id_a, id_b
        |  FROM cand JOIN s sa ON sa.doc_id = cand.id_a
        |            JOIN s sb ON sb.doc_id = cand.id_b
        |  WHERE len(list_intersect(sa.sh, sb.sh)) * 2 >=
        |        len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
        |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |nd AS (SELECT DISTINCT src AS id FROM e),
        |cc(id, comp) AS (
        |  SELECT id, id FROM nd
        |  UNION
        |  SELECT e.dst, cc.comp FROM cc JOIN e ON cc.id = e.src
        |)
        |SELECT id, min(comp) AS component FROM cc GROUP BY id""".stripMargin,
    // Bloom prefilter admits only false positives; the exact semi-join
    // removes them, so the oracle is the plain semi-join.
    "q68_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)""".stripMargin,
    // Line dedup: same deterministic 8-token chunking (DuckDB slices
    // are 1-based inclusive: toks[a : a+7] is 8 elements, clipped at
    // the end), first occurrence by (doc_id, idx) via row_number.
    "q69_line_dedup" ->
      """WITH tok AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |ch AS (SELECT doc_id,
        |  list_transform(range(0, (len(toks) - 1) // 8 + 1),
        |    i -> array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' '))
        |  AS lines FROM tok),
        |l AS (SELECT doc_id, unnest(range(len(lines))) AS idx,
        |  unnest(lines) AS line FROM ch),
        |r AS (SELECT doc_id, idx, line, row_number() OVER (
        |  PARTITION BY line ORDER BY doc_id, idx) AS rn FROM l),
        |k AS (SELECT doc_id, idx, line FROM r WHERE rn = 1)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_kept,
        |  string_agg(line, chr(10) ORDER BY idx) AS clean_text
        |FROM k GROUP BY doc_id""".stripMargin,
    // Contamination: distinct trigram overlap vs the doc_id % 50 = 0
    // eval split — string shingles here, hashed shingles in the engine;
    // counts agree (same policy as q41's oracle).
    "q70_contamination" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |  range(1, len(toks)-1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t),
        |ref AS (SELECT DISTINCT unnest(sh) AS sg FROM s
        |        WHERE doc_id % 50 = 0),
        |e AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS sg FROM s
        |      WHERE len(sh) > 0)
        |SELECT e.doc_id, CAST(max(e.n_sh) AS INT) AS n_sh,
        |  CAST(sum(CASE WHEN ref.sg IS NULL THEN 0 ELSE 1 END) AS INT)
        |    AS n_hit
        |FROM e LEFT JOIN ref ON e.sg = ref.sg
        |GROUP BY e.doc_id""".stripMargin,
    "q71_profile" ->
      """SELECT 'o_orderkey' AS col_name,
        |  count(o_orderkey) AS n_nonnull,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_val,
        |  CAST(max(o_orderkey) AS DOUBLE) AS max_val FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(o_custkey), count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
        |FROM orders""".stripMargin,
    // Salting is an execution-layer trick; relationally it IS the join.
    "q72_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    // The partition round-trip must not change a row.
    "q73_partitioned_etl" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    // Neither must the JSONL round-trip.
    "q74_jsonl_roundtrip" ->
      "SELECT doc_id, lang, text FROM documents",
    // Mixture: the q64 mix64 bucket replay, plus whole-epoch copies
    // unnested from range(copies).
    "q75_data_mixture" ->
      s"""WITH z0 AS (SELECT doc_id, lang,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(7)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id, lang")},
         |c AS (SELECT doc_id, lang,
         |  (CASE WHEN lang = 'en' THEN 1536 ELSE 512 END) // 1024
         |  + CASE WHEN z % 1024 <
         |      (CASE WHEN lang = 'en' THEN 1536 ELSE 512 END) % 1024
         |    THEN 1 ELSE 0 END AS copies
         |  FROM z3)
         |SELECT doc_id, lang, CAST(e AS INT) AS epoch FROM
         |  (SELECT doc_id, lang, unnest(range(copies)) AS e
         |   FROM c WHERE copies > 0)""".stripMargin,
    // Packing manifest: the relational mirror is one global window —
    // exactly the single-task plan the engine-side prefix sum avoids.
    "q76_seq_pack" ->
      """WITH n AS (SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |    AS BIGINT) AS n_tokens FROM documents),
        |o AS (SELECT doc_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS "offset" FROM n)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, "offset",
        |  "offset" // 512 AS seq_first,
        |  ("offset" + n_tokens - 1) // 512 AS seq_last FROM o""".stripMargin,
    // Incremental dedup: NOT EXISTS on the text itself (the engine
    // compares 16-byte fingerprints — identical modulo md5 collision).
    "q77_incremental_dedup" ->
      """WITH batch AS (SELECT doc_id + 200000 AS doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN text || ' fresh tail'
        |       ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id, text FROM batch b
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM documents d WHERE d.text = b.text)""".stripMargin,
    // Choice inference: the JSON detour is invisible relationally —
    // the oracle rebuilds the same mixed values straight from the
    // source column.
    "q78_choice_infer" ->
      """SELECT c_custkey AS k,
        |  CASE WHEN c_custkey % 3 = 0
        |       THEN 'id-' || CAST(c_custkey AS VARCHAR)
        |       ELSE CAST(c_custkey AS VARCHAR) END AS v
        |FROM customer""".stripMargin,
    // Domain cap: the relational mirror IS the window the operator
    // avoids — fine at oracle scale.
    "q79_domain_cap" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY source || '.example.com'
        |                       ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 10""".stripMargin,
    // Fuzzy dedup: q41's exact pair kernel + a recursive-CTE
    // transitive closure; a doc survives iff nothing smaller is
    // reachable over the pair graph (the component min reaches only
    // itself-or-larger).
    "q80_fuzzy_dedup" ->
      """WITH RECURSIVE d AS (SELECT doc_id, text FROM documents
        |       UNION ALL SELECT doc_id + 100000, text FROM documents),
        |t AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM d),
        |s AS (SELECT doc_id, list_distinct(list_transform(
        |  range(1, len(toks)-1),
        |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM t WHERE len(toks) >= 3),
        |pg AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM pg x JOIN pg y ON x.g = y.g AND x.doc_id < y.doc_id),
        |p AS (SELECT id_a, id_b
        |  FROM cand JOIN s a ON a.doc_id = cand.id_a
        |            JOIN s b ON b.doc_id = cand.id_b
        |  WHERE len(list_intersect(a.sh, b.sh)) * 2 >=
        |        len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p
        |        UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT a, b FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
        |m AS (SELECT id, min(r) AS mn FROM reach GROUP BY id)
        |SELECT d.doc_id FROM d LEFT JOIN m ON m.id = d.doc_id
        |WHERE m.id IS NULL OR m.mn >= d.doc_id""".stripMargin,
    // Governed txns: the cancelled write (region 2) is invisible, so
    // the snapshot is exactly the two committed append predicates.
    "q81_governed_txn" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey <= 1 OR n_regionkey >= 3""".stripMargin,
    // Bucketing is physical layout only — relationally it is the
    // plain join+agg.
    "q82_bucketed_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_lines
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // Epoch shuffle: splitmix64 replay, then Spark's SIGNED long view
    // of the key drives both the pmod shard and the rank order.
    "q83_epoch_shuffle" ->
      s"""WITH z0 AS (SELECT doc_id, lang,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(3)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id, lang")},
         |sgn AS (SELECT doc_id, lang,
         |  CASE WHEN z >= 9223372036854775808
         |       THEN z - 18446744073709551616 ELSE z END AS sk
         |  FROM z3)
         |SELECT doc_id, lang,
         |  CAST(((sk % 8) + 8) % 8 AS INT) AS shard,
         |  row_number() OVER (PARTITION BY ((sk % 8) + 8) % 8
         |                     ORDER BY sk, doc_id) - 1 AS pos
         |FROM sgn""".stripMargin,
    // N-gram LM scoring: string trigrams stand in for the engine's
    // 64-bit shingle hashes (counts agree absent hash collisions —
    // the q41 equivalence), floor(log2) replayed as exact string
    // arithmetic on the binary representation.
    "q84_ngram_lm_score" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |gr AS (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |    i -> array_to_string(list_filter(
        |      [toks[i], toks[i + 1], toks[i + 2]], x -> x IS NOT NULL),
        |      ' '))) AS g
        |  FROM t),
        |m AS (SELECT g, count(*) AS c FROM gr GROUP BY g
        |      HAVING count(*) >= 2)
        |SELECT gr.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_ngrams,
        |  CAST(count(CASE WHEN m.c IS NULL THEN 1 END) AS BIGINT)
        |    AS n_rare,
        |  CAST(coalesce(sum(length(bin(m.c)) - 1), 0) AS BIGINT)
        |    AS bits_score
        |FROM gr LEFT JOIN m USING (g)
        |GROUP BY gr.doc_id""".stripMargin,
    // Incremental MinHash: both corpora run the full band replay;
    // batch docs sharing any (b, content) band with the corpus drop.
    "q85_incremental_minhash" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |batch AS (SELECT doc_id + 200000 AS doc_id,
         |  CASE WHEN doc_id % 5 = 0
         |       THEN 'novel crawl page ' || CAST(doc_id AS VARCHAR)
         |         || ' entirely unseen content '
         |         || CAST(doc_id * 31 AS VARCHAR)
         |       ELSE text || ' boilerplate tail' END AS text
         |  FROM documents),
         |${sqlMinhashBands("base", "c")},
         |${sqlMinhashBands("batch", "n")},
         |hit AS (SELECT DISTINCT nbands.doc_id FROM nbands
         |  JOIN cbands ON nbands.b = cbands.b
         |             AND nbands.content = cbands.content)
         |SELECT doc_id, text FROM batch
         |WHERE doc_id NOT IN (SELECT doc_id FROM hit)""".stripMargin,
    // Streaming near-dedup: batch 1's within-batch min-id band policy
    // (the q39 bucket-min replay), survivor bands as the store, batch
    // 2 anti-joined on (b, content) band equality (the q85 replay)
    // then the same within-batch policy over what remains.
    "q110_stream_near_dedup" ->
      s"""WITH b1 AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % 2 = 0),
         |b2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
         |${sqlMinhashBands("b1", "a")},
         |${sqlMinhashBands("b2", "n")},
         |am AS (SELECT b, content, min(doc_id) AS m FROM abands
         |  GROUP BY b, content),
         |s1 AS (SELECT abands.doc_id FROM abands JOIN am USING (b, content)
         |  GROUP BY abands.doc_id HAVING min(m) = abands.doc_id),
         |store AS (SELECT DISTINCT b, content FROM abands
         |  WHERE doc_id IN (SELECT doc_id FROM s1)),
         |hit AS (SELECT DISTINCT nbands.doc_id FROM nbands
         |  JOIN store ON nbands.b = store.b
         |            AND nbands.content = store.content),
         |k2 AS (SELECT * FROM nbands
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
         |km AS (SELECT b, content, min(doc_id) AS m FROM k2
         |  GROUP BY b, content),
         |s2 AS (SELECT k2.doc_id FROM k2 JOIN km USING (b, content)
         |  GROUP BY k2.doc_id HAVING min(m) = k2.doc_id)
         |SELECT doc_id, text FROM b1
         |  WHERE doc_id IN (SELECT doc_id FROM s1)
         |UNION ALL SELECT doc_id, text FROM b2
         |  WHERE doc_id IN (SELECT doc_id FROM s2)""".stripMargin,
    "q45_intersect" ->
      """SELECT c_nationkey FROM customer WHERE c_acctbal > 0
        |INTERSECT
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "q46_except" ->
      """SELECT DISTINCT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT DISTINCT s_nationkey AS nk FROM supplier""".stripMargin,
    "q47_agg_family" ->
      """SELECT o_orderstatus,
        |  min(o_totalprice) AS min_total,
        |  max(o_totalprice) AS max_total,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q48_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  substring(p_name, 1, 5) AS prefix5,
        |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  p_brand || '-' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q49_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30
        |FROM orders""".stripMargin,
    "q50_embed_pairs" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 2000),
        |sc AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_sum(list_transform(range(1, len(a.embedding)+1),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(a.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(b.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        | FROM e a, e b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(raw, 4) AS score FROM sc
        |WHERE raw >= 0.35""".stripMargin,
    "q51_tsv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // SCD2: replay the batch construction, the full-outer key join,
    // the null-safe change test (IS DISTINCT FROM), and both output
    // legs. Dates are literals; the double bal+100.0 is the same
    // single IEEE add in both engines.
    "q111_scd2" ->
      """WITH cur AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    DATE '2020-01-01' AS eff_from, CAST(NULL AS DATE) AS eff_to
        |  FROM customer),
        |upd AS (
        |  SELECT c_custkey, 'MOVED' AS seg, c_acctbal + 100.0 AS bal
        |    FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL SELECT c_custkey, c_mktsegment, c_acctbal
        |    FROM customer WHERE c_custkey % 7 = 3
        |  UNION ALL SELECT c_custkey + 1000000, 'FRESH', c_acctbal
        |    FROM customer WHERE c_custkey % 7 = 5),
        |j AS (SELECT cur.c_custkey, cur.c_mktsegment, cur.c_acctbal,
        |    cur.eff_from, cur.eff_to, upd.c_custkey AS uk, upd.seg, upd.bal
        |  FROM cur FULL OUTER JOIN upd ON cur.c_custkey = upd.c_custkey),
        |chg AS (SELECT *, uk IS NOT NULL AND
        |    (seg IS DISTINCT FROM c_mktsegment OR
        |     bal IS DISTINCT FROM c_acctbal) AS changed FROM j),
        |fromopen AS (SELECT c_custkey, c_mktsegment, c_acctbal, eff_from,
        |    CASE WHEN changed THEN DATE '2024-06-01' ELSE eff_to END AS eff_to,
        |    CASE WHEN changed THEN 0 ELSE 1 END AS is_current
        |  FROM chg WHERE c_custkey IS NOT NULL),
        |fresh AS (SELECT uk AS c_custkey, seg AS c_mktsegment,
        |    bal AS c_acctbal, DATE '2024-06-01' AS eff_from,
        |    CAST(NULL AS DATE) AS eff_to, 1 AS is_current
        |  FROM chg WHERE uk IS NOT NULL AND (c_custkey IS NULL OR changed))
        |SELECT * FROM fromopen UNION ALL SELECT * FROM fresh""".stripMargin,
    // Duplicated-span detection: q43's positional FNV 3-gram kernel,
    // zipped with 0-based positions, grams kept when >= 2 distinct
    // docs carry them, adjacent positions coalesced with the islands
    // trick (pos - row_number constant within a run).
    "q112_dup_spans" ->
      s"""WITH tok AS (SELECT doc_id,
         |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents),
         |hs AS (
         |  SELECT doc_id, list_transform(
         |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
         |      i -> ${sqlFnv(
        """flatten(list_transform(
          |            list_filter([toks[i], toks[i + 1], toks[i + 2]], t -> t IS NOT NULL),
          |            t -> list_append(
          |              flatten(list_transform(string_split(t, ''),
          |                ch -> [unicode(ch) % 256, unicode(ch) // 256])), 32))
          |          )[:-2]""".stripMargin)}),
         |    u -> CASE WHEN u >= 9223372036854775808
         |      THEN CAST(u - 18446744073709551616 AS BIGINT)
         |      ELSE CAST(u AS BIGINT) END) AS h
         |  FROM tok),
         |g AS (SELECT doc_id, unnest(h) AS h,
         |    unnest(range(len(h))) AS pos FROM hs),
         |f AS (SELECT h FROM g GROUP BY h
         |  HAVING count(DISTINCT doc_id) >= 2),
         |hit AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (h)),
         |isl AS (SELECT doc_id, pos, pos - row_number()
         |    OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM hit)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 2 AS span_end,
         |  count(*) AS n_grams
         |FROM isl GROUP BY doc_id, grp""".stripMargin,
    // DQ ruleset: one aggregate row, seven verdicts. Ratios are
    // BIGINT/BIGINT double division rounded to 6dp on both sides;
    // the mean routes through DECIMAL then divides as double (4dp).
    "q113_dq_rules" ->
      """WITH a AS (SELECT count(*) AS nrows,
        |    count(o_custkey) AS c_cust,
        |    count(DISTINCT o_orderkey) AS d_ok, count(o_orderkey) AS c_ok,
        |    count(DISTINCT o_custkey) AS d_cust,
        |    count(CASE WHEN o_totalprice BETWEEN 0 AND 100000 THEN 1 END)
        |      AS in_tp,
        |    count(o_totalprice) AS c_tp,
        |    count(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 END)
        |      AS in_st,
        |    count(o_orderstatus) AS c_st,
        |    sum(CAST(o_totalprice AS DECIMAL(28,4))) AS s_tp
        |  FROM orders)
        |SELECT 0 AS ord, 'RowCountBetween(1,1000000000)' AS rule,
        |  CASE WHEN nrows BETWEEN 1 AND 1000000000
        |    THEN 'Passed' ELSE 'Failed' END AS outcome,
        |  CAST(nrows AS DOUBLE) AS metric FROM a
        |UNION ALL SELECT 1, 'IsComplete(o_custkey)',
        |  CASE WHEN round(c_cust / nrows, 6) >= 1.0
        |    THEN 'Passed' ELSE 'Failed' END,
        |  round(c_cust / nrows, 6) FROM a
        |UNION ALL SELECT 2, 'IsUnique(o_orderkey)',
        |  CASE WHEN d_ok = c_ok THEN 'Passed' ELSE 'Failed' END,
        |  round(d_ok / c_ok, 6) FROM a
        |UNION ALL SELECT 3, 'IsUnique(o_custkey)',
        |  CASE WHEN d_cust = c_cust THEN 'Passed' ELSE 'Failed' END,
        |  round(d_cust / c_cust, 6) FROM a
        |UNION ALL SELECT 4, 'ColumnValues(o_totalprice between 0.0 100000.0 >= 0.95)',
        |  CASE WHEN round(in_tp / c_tp, 6) >= 0.95
        |    THEN 'Passed' ELSE 'Failed' END,
        |  round(in_tp / c_tp, 6) FROM a
        |UNION ALL SELECT 5, 'ColumnValues(o_orderstatus in F|O|P)',
        |  CASE WHEN round(in_st / c_st, 6) >= 1.0
        |    THEN 'Passed' ELSE 'Failed' END,
        |  round(in_st / c_st, 6) FROM a
        |UNION ALL SELECT 6, 'Mean(o_totalprice between 1000.0 500000.0)',
        |  CASE WHEN round(CAST(s_tp AS DOUBLE) / nrows, 4)
        |      BETWEEN 1000.0 AND 500000.0
        |    THEN 'Passed' ELSE 'Failed' END,
        |  round(CAST(s_tp AS DOUBLE) / nrows, 4) FROM a""".stripMargin,
    "q114_orc_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part""".stripMargin,
    // Temperature mixture: integer isqrt/total/floor-div weight
    // replay + the q75 mix64 bucket kernel (seed 7).
    "q115_temperature_mix" ->
      s"""WITH cts AS (SELECT lang, count(*) AS c FROM documents
         |  GROUP BY lang),
         |iq AS (SELECT lang, c, CAST(floor(sqrt(c)) AS BIGINT) AS isq
         |  FROM cts),
         |tt AS (SELECT sum(isq) AS tot FROM iq),
         |w AS (SELECT lang, (1024 * 2000 * isq) // (tot * c) AS w
         |  FROM iq, tt),
         |z0 AS (SELECT doc_id, lang,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(7)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id, lang")},
         |j AS (SELECT z3.doc_id, z3.lang, z3.z, w.w
         |  FROM z3 JOIN w USING (lang)),
         |cp AS (SELECT doc_id, lang,
         |    CAST(w // 1024 + CASE WHEN z % 1024 < w % 1024
         |      THEN 1 ELSE 0 END AS BIGINT) AS copies
         |  FROM j)
         |SELECT doc_id, lang, CAST(e AS INT) AS epoch FROM
         |  (SELECT doc_id, lang, unnest(range(copies)) AS e
         |   FROM cp WHERE copies > 0)""".stripMargin,
    // Imputation: mean via decimal sum / count rounded 4dp; mode =
    // highest count, smallest value tie-break.
    "q116_impute" ->
      """WITH b AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 11 = 0 THEN NULL
        |      ELSE c_acctbal END AS bal,
        |    CASE WHEN c_custkey % 13 = 0 THEN NULL
        |      ELSE c_mktsegment END AS seg
        |  FROM customer),
        |m AS (SELECT round(CAST(sum(CAST(bal AS DECIMAL(28,4)))
        |    AS DOUBLE) / count(bal), 4) AS mean_bal FROM b),
        |md AS (SELECT seg AS mode_seg FROM b WHERE seg IS NOT NULL
        |  GROUP BY seg ORDER BY count(*) DESC, seg ASC LIMIT 1)
        |SELECT c_custkey, COALESCE(bal, mean_bal) AS bal,
        |  COALESCE(seg, mode_seg) AS seg
        |FROM b, m, md""".stripMargin,
    "q118_group_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // PageRank: three unrolled integer iterations — floor-div damped
    // contributions, grouped integer sums, 150000 teleport mass.
    "q119_pagerank" ->
      """WITH e AS (SELECT l_partkey + 10000000 AS src, l_suppkey AS dst
        |  FROM lineitem),
        |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |dg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000 AS pr FROM n),
        |c1 AS (SELECT e.dst AS node,
        |    sum((r0.pr * 85) // (100 * dg.deg)) AS m
        |  FROM e JOIN r0 ON r0.node = e.src JOIN dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.node, 150000 + COALESCE(c1.m, 0) AS pr
        |  FROM n LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.dst AS node,
        |    sum((r1.pr * 85) // (100 * dg.deg)) AS m
        |  FROM e JOIN r1 ON r1.node = e.src JOIN dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.node, 150000 + COALESCE(c2.m, 0) AS pr
        |  FROM n LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.dst AS node,
        |    sum((r2.pr * 85) // (100 * dg.deg)) AS m
        |  FROM e JOIN r2 ON r2.node = e.src JOIN dg ON dg.src = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.node, 150000 + COALESCE(c3.m, 0) AS pr
        |  FROM n LEFT JOIN c3 USING (node))
        |SELECT node, CAST(pr AS BIGINT) AS pr FROM r3""".stripMargin,
    // BM25: identical expression shapes (promotions, parenthesization)
    // on both engines; ln absorbed by 6dp contribution rounding.
    "q120_bm25" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |qtf AS (SELECT doc_id, token, count(*) AS tf FROM tok
        |  WHERE token IN ('join','vector','stream','hash','big')
        |  GROUP BY doc_id, token),
        |qdf AS (SELECT token, count(*) AS df_t FROM qtf GROUP BY token),
        |c AS (SELECT qtf.doc_id,
        |    round(ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0) *
        |      ((tf * (1.2 + 1.0)) /
        |       (tf + 1.2 * (1.0 - 0.75 + (0.75 * dl) / avgdl))), 6) AS c
        |  FROM qtf JOIN qdf USING (token) JOIN dl USING (doc_id), st)
        |SELECT doc_id,
        |  round(CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE), 4) AS bm25,
        |  CAST(count(*) AS INT) AS n_terms
        |FROM c GROUP BY doc_id""".stripMargin,
    // Winsorize: nearest-rank bound replay — rank floor(q*(n-1))+1
    // over the sorted values, then the clamp.
    "q121_winsorize" ->
      """WITH n AS (SELECT count(*) AS n FROM lineitem),
        |ks AS (SELECT CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1 AS klo,
        |    CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1 AS khi FROM n),
        |sorted AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS r
        |  FROM lineitem),
        |q AS (SELECT
        |    (SELECT v FROM sorted, ks WHERE r = klo) AS lo,
        |    (SELECT v FROM sorted, ks WHERE r = khi) AS hi)
        |SELECT l_orderkey, l_linenumber,
        |  least(greatest(l_extendedprice, lo), hi) AS l_extendedprice
        |FROM lineitem, q""".stripMargin,
    "q122_skew_report" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem
        |  GROUP BY l_suppkey),
        |s AS (SELECT count(*) AS nkeys, sum(cnt) AS nrows FROM c)
        |SELECT l_suppkey, cnt, round(cnt / nrows, 6) AS share,
        |  least(CAST(ceil((CAST(cnt AS DOUBLE) * nkeys) / nrows) AS INT), 64)
        |    AS suggested_salts
        |FROM c, s ORDER BY cnt DESC, l_suppkey LIMIT 20""".stripMargin,
    // Incremental rollup: the oracle is the FULL re-aggregation.
    "q123_incremental_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  min(o_totalprice) AS min_o_totalprice,
        |  max(o_totalprice) AS max_o_totalprice,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin,
    "q124_dim_lookup" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |    DATE '2020-01-01' AS eff_from, DATE '2024-06-01' AS eff_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment || '_V2',
        |    DATE '2024-06-01', CAST(NULL AS DATE)
        |  FROM customer),
        |fact AS (SELECT o_orderkey, o_custkey,
        |    DATE '2024-01-01' + CAST(o_orderkey % 365 AS INT) AS odate
        |  FROM orders)
        |SELECT o_orderkey, odate, seg
        |FROM fact LEFT JOIN dim ON o_custkey = c_custkey
        |  AND odate >= eff_from
        |  AND (eff_to IS NULL OR odate < eff_to)""".stripMargin,
    // Funnel: chained min-after-previous — the relational definition
    // the one-shuffle fold must reproduce.
    "q125_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ts) AS t_click FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t_click
        |  GROUP BY e.user_id)
        |SELECT u.user_id, t_view, t_click, t_purchase,
        |  CAST(t_view IS NOT NULL AS INT) + CAST(t_click IS NOT NULL AS INT)
        |    + CAST(t_purchase IS NOT NULL AS INT) AS depth
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)""".stripMargin,
    "q126_cohort" ->
      """WITH fs AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |  FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events)
        |SELECT cohort,
        |  CAST(date_diff('day', cohort, wk) // 7 AS INT) AS weeks_since,
        |  count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN fs USING (user_id)
        |GROUP BY cohort, weeks_since""".stripMargin,
    "q127_tumbling_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events GROUP BY day, event_type""".stripMargin,
    // CDC: latest-wins replay via a window (the relational definition
    // the max_by aggregation must reproduce).
    "q128_cdc_compact" ->
      """WITH log AS (
        |  SELECT o_orderkey, 1 AS seq, 'I' AS op,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U',
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 10
        |      AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', CAST(NULL AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |w AS (SELECT *,
        |    row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC) AS rn,
        |    count(*) OVER (PARTITION BY o_orderkey) AS n_ops
        |  FROM log)
        |SELECT o_orderkey, CAST(price AS DOUBLE) AS price, n_ops
        |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin,
    // Triangles: canonical a<b<c three-way join — each triangle once.
    // The basket cap interpolates the ENGINE constant (ADVICE r10:
    // bumping MaxBasketSize must not silently desync the oracle).
    "q129_triangles" ->
      s"""WITH pd AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS sv
        |  FROM lineitem),
        |ok AS (SELECT o FROM pd GROUP BY o
        |  HAVING count(*) <= $MaxBasketSize),
        |ps AS (SELECT o, sv FROM pd WHERE o IN (SELECT o FROM ok)),
        |e AS (SELECT DISTINCT a.sv AS u, b.sv AS v
        |  FROM ps a JOIN ps b ON a.o = b.o AND a.sv < b.sv),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n AS (SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, count(*) AS n_tri FROM n GROUP BY node""".stripMargin,
    "q130_linkage" ->
      """WITH lft AS (SELECT c_custkey,
        |    CAST(c_nationkey AS VARCHAR) || '_' ||
        |      substring(c_name, 13, 3) AS blk, c_name
        |  FROM customer),
        |dirty AS (
        |  SELECT c_custkey + 1000000 AS d_custkey,
        |    CAST(c_nationkey AS VARCHAR) || '_' ||
        |      substring(c_name, 13, 3) AS blk,
        |    CASE WHEN c_custkey % 2 = 0
        |      THEN substring(c_name, 1, 17) ||
        |        translate(substring(c_name, 18, 1),
        |          '0123456789', '1234567890')
        |      ELSE c_name END AS d_name
        |  FROM customer)
        |SELECT l.c_custkey, d.d_custkey,
        |  levenshtein(l.c_name, d.d_name) AS d_c_name,
        |  levenshtein(l.c_name, d.d_name) AS distance
        |FROM lft l JOIN dirty d ON l.blk = d.blk
        |WHERE levenshtein(l.c_name, d.d_name) <= 2""".stripMargin,
    "q131_fill_forward" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY user_id, day),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM span)
        |SELECT g.user_id, g.day,
        |  CAST(last_value(d.v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day) AS DOUBLE) AS filled,
        |  CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM grid g LEFT JOIN daily d
        |  ON g.user_id = d.user_id AND g.day = d.day""".stripMargin,
    "q136_rolling_mean" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY user_id, day),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM span),
        |f AS (SELECT g.user_id, g.day,
        |    CAST(last_value(d.v IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.day) AS DOUBLE) AS filled,
        |    CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_gap
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day = d.day)
        |SELECT user_id, day, filled, is_gap,
        |  round(CAST(sum(CAST(filled AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / count(*) OVER w, 6) AS mean_7
        |FROM f
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,
    // k-core: three unrolled peels, then degrees on the survivor
    // edge set filtered at k.
    "q137_kcore" ->
      s"""WITH pd AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |ok AS (SELECT o FROM pd GROUP BY o
        |  HAVING count(*) <= $MaxBasketSize),
        |ps AS (SELECT o, p FROM pd WHERE o IN (SELECT o FROM ok)),
        |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM ps a JOIN ps b ON a.o = b.o AND a.p < b.p),
        |d1 AS MATERIALIZED (SELECT n, count(*) AS c FROM
        |  (SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY n),
        |k1 AS MATERIALIZED (SELECT n FROM d1 WHERE c >= 80),
        |e1 AS MATERIALIZED (SELECT u, v FROM e0
        |  WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)),
        |d2 AS MATERIALIZED (SELECT n, count(*) AS c FROM
        |  (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1) GROUP BY n),
        |k2 AS MATERIALIZED (SELECT n FROM d2 WHERE c >= 80),
        |e2 AS MATERIALIZED (SELECT u, v FROM e1
        |  WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2)),
        |d3 AS MATERIALIZED (SELECT n, count(*) AS c FROM
        |  (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2) GROUP BY n),
        |k3 AS MATERIALIZED (SELECT n FROM d3 WHERE c >= 80),
        |e3 AS MATERIALIZED (SELECT u, v FROM e2
        |  WHERE u IN (SELECT n FROM k3) AND v IN (SELECT n FROM k3)),
        |df AS (SELECT n, count(*) AS deg FROM
        |  (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3) GROUP BY n)
        |SELECT n, deg FROM df WHERE deg >= 80""".stripMargin,
    "q138_chi2" ->
      """WITH base AS (SELECT event_type,
        |    CAST(date_part('dow', ts) AS INT) + 1 AS dow FROM events),
        |cells AS (SELECT event_type, dow, count(*) AS o FROM base
        |  GROUP BY event_type, dow),
        |rt AS (SELECT event_type, sum(o) AS ra FROM cells
        |  GROUP BY event_type),
        |ct AS (SELECT dow, sum(o) AS cb FROM cells GROUP BY dow),
        |tt AS (SELECT sum(o) AS n FROM cells),
        |j AS (SELECT cells.event_type, cells.dow, o,
        |    round(CAST(ra AS DOUBLE) * cb / n, 6) AS e
        |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), tt)
        |SELECT event_type, dow, o, e,
        |  round(pow(o - e, 2) / e, 6) AS chi2_cell FROM j""".stripMargin,
    "q139_fallback_lookup" ->
      """WITH fact AS (SELECT o_orderkey, o_custkey, c_nationkey
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |d1 AS (SELECT c_custkey, c_custkey % 5 + 1 AS adj
        |  FROM customer WHERE c_custkey % 10 = 0),
        |d2 AS (SELECT n_nationkey, n_nationkey % 3 + 100 AS adj
        |  FROM nation)
        |SELECT o_orderkey, coalesce(d1.adj, d2.adj, 0) AS adj
        |FROM fact
        |LEFT JOIN d1 ON o_custkey = d1.c_custkey
        |LEFT JOIN d2 ON c_nationkey = d2.n_nationkey""".stripMargin,
    // A/B: the splitmix64 finalizer replayed in HUGEINT; variant =
    // low bit (power-of-two buckets keep signed/unsigned out of it).
    "q140_ab_report" ->
      s"""WITH z0 AS (SELECT o_custkey, o_totalprice,
         |    (CAST(o_custkey AS HUGEINT) + ${sqlMixAdd(17)})
         |      % 18446744073709551616 AS z
         |  FROM orders),
         |${sqlMixFinal("o_custkey, o_totalprice")},
         |a AS (SELECT CAST(z % 2 AS BIGINT) AS variant, o_totalprice
         |  FROM z3),
         |s AS (SELECT variant, count(*) AS n,
         |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
         |      AS DOUBLE) / count(*), 6) AS mean
         |  FROM a GROUP BY variant),
         |c AS (SELECT mean AS m0 FROM s WHERE variant = 0)
         |SELECT variant, n, mean, round(mean - m0, 6) AS lift
         |FROM s, c""".stripMargin,
    "q141_dwell" ->
      """WITH seq AS (SELECT event_type AS state,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS gap
        |  FROM events)
        |SELECT state, count(*) AS n,
        |  CAST(sum(gap) AS BIGINT) AS total_us,
        |  round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS avg_us
        |FROM seq WHERE gap IS NOT NULL GROUP BY state""".stripMargin,
    "q142_minmax_scale" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
        |  CASE WHEN l_extendedprice IS NULL THEN NULL
        |    WHEN mx = mn THEN 0.0
        |    ELSE round((l_extendedprice - mn) / (mx - mn), 6) END
        |    AS scaled
        |FROM (SELECT l_orderkey, l_linenumber, l_suppkey,
        |    l_extendedprice,
        |    min(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mn,
        |    max(l_extendedprice) OVER (PARTITION BY l_suppkey) AS mx
        |  FROM lineitem)""".stripMargin,
    // Weighted sample: priority = (mix64 with the sign bit cleared)
    // floor-div weight; n smallest (priority, id) per stratum.
    "q143_weighted_sample" ->
      s"""WITH z0 AS (SELECT doc_id, lang,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(7)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id, lang")},
         |p AS (SELECT doc_id, lang,
         |    CAST((z % 9223372036854775808) //
         |      (CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 2
         |        WHEN 'es' THEN 2 WHEN 'de' THEN 1 WHEN 'fr' THEN 1
         |        ELSE 0 END) AS BIGINT) AS priority
         |  FROM z3
         |  WHERE lang IN ('en', 'zh', 'es', 'de', 'fr')),
         |r AS (SELECT doc_id, lang, priority,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY priority, doc_id) AS rn
         |  FROM p)
         |SELECT doc_id, lang, priority FROM r WHERE rn <= 5""".stripMargin,
    "q144_equidepth_bins" ->
      """WITH n1 AS (SELECT count(l_extendedprice) AS n FROM lineitem),
        |ks AS (SELECT
        |    CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1 AS k0,
        |    CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 AS k1,
        |    CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1 AS k2 FROM n1),
        |srt AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS r
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |e AS (SELECT
        |    (SELECT v FROM srt, ks WHERE r = k0) AS e0,
        |    (SELECT v FROM srt, ks WHERE r = k1) AS e1,
        |    (SELECT v FROM srt, ks WHERE r = k2) AS e2)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CASE WHEN l_extendedprice IS NULL THEN NULL
        |    ELSE CAST(l_extendedprice > e0 AS INT)
        |      + CAST(l_extendedprice > e1 AS INT)
        |      + CAST(l_extendedprice > e2 AS INT) END AS bucket
        |FROM lineitem, e""".stripMargin,
    "q145_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem),
        |ic AS (SELECT i, count(*) AS supp FROM bi GROUP BY i),
        |nb AS (SELECT count(DISTINCT b) AS n FROM bi),
        |pc AS (SELECT a.i AS i, b.i AS j, count(*) AS sp
        |  FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
        |  GROUP BY a.i, b.i HAVING count(*) >= 2),
        |dr AS (SELECT i AS ante, j AS cons, sp FROM pc
        |  UNION ALL SELECT j, i, sp FROM pc)
        |SELECT ante, cons, sp AS supp_pair,
        |  a.supp AS supp_ante, c.supp AS supp_cons,
        |  round(sp / a.supp, 6) AS conf,
        |  round(CAST(sp AS DOUBLE) * n
        |    / (CAST(a.supp AS DOUBLE) * c.supp), 6) AS lift
        |FROM dr JOIN ic a ON ante = a.i JOIN ic c ON cons = c.i, nb"""
        .stripMargin,
    "q146_join_fanout" ->
      """WITH c AS (SELECT l_partkey, count(*) AS n FROM lineitem
        |  GROUP BY l_partkey),
        |j AS (SELECT l_partkey, n AS n_left, n AS n_right,
        |    n * n AS out_rows FROM c),
        |t AS (SELECT sum(out_rows) AS tot FROM j)
        |SELECT l_partkey, n_left, n_right, out_rows,
        |  round(out_rows / tot, 6) AS share
        |FROM j, t ORDER BY out_rows DESC, l_partkey LIMIT 20"""
        .stripMargin,
    "q147_funnel_time" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(ts) AS t_click FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND ts > t_view GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(ts) AS t_purchase FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t_click
        |  GROUP BY e.user_id),
        |dt AS (SELECT epoch_us(t_purchase) - epoch_us(t_view) AS dt_us
        |  FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)),
        |n1 AS (SELECT count(*) AS n FROM dt),
        |srt AS (SELECT dt_us,
        |    row_number() OVER (ORDER BY dt_us) AS r FROM dt),
        |q AS (SELECT CAST(0.25 AS DOUBLE) AS p UNION ALL
        |  SELECT 0.5 UNION ALL SELECT 0.75 UNION ALL SELECT 0.9),
        |k AS (SELECT p, CAST(floor(p * (n - 1)) AS BIGINT) + 1 AS kk
        |  FROM q, n1)
        |SELECT k.p, srt.dt_us FROM k JOIN srt ON srt.r = k.kk"""
        .stripMargin,
    "q148_ref_integrity" ->
      """WITH par AS (SELECT DISTINCT o_orderkey FROM orders
        |  WHERE o_orderkey % 97 <> 0),
        |c AS (SELECT l_orderkey, count(*) AS n_orphan_rows
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |  GROUP BY l_orderkey)
        |SELECT l_orderkey, n_orphan_rows FROM c
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM par)"""
        .stripMargin,
    "q149_feed_completeness" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY day),
        |n1 AS (SELECT count(*) AS cnt FROM daily),
        |ks AS (SELECT CAST(floor(0.5 * (cnt - 1)) AS BIGINT) + 1 AS k
        |  FROM n1),
        |srt AS (SELECT n, row_number() OVER (ORDER BY n) AS r
        |  FROM daily),
        |med AS (SELECT n AS m FROM srt, ks WHERE r = k)
        |SELECT day, n, round(CAST(n AS DOUBLE) / m, 6) AS ratio,
        |  CASE WHEN CAST(n AS DOUBLE) < 0.5 * m THEN 1 ELSE 0 END
        |    AS is_low
        |FROM daily, med""".stripMargin,
    "q150_psi_drift" ->
      """WITH r AS (SELECT l_extendedprice AS v FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT o_totalprice AS v FROM orders
        |  WHERE o_totalprice IS NOT NULL),
        |n1 AS (SELECT count(*) AS n FROM r),
        |ks AS (SELECT
        |    CAST(floor(0.25 * (n - 1)) AS BIGINT) + 1 AS k0,
        |    CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 AS k1,
        |    CAST(floor(0.75 * (n - 1)) AS BIGINT) + 1 AS k2 FROM n1),
        |srt AS (SELECT v, row_number() OVER (ORDER BY v) AS rr FROM r),
        |e AS (SELECT
        |    (SELECT v FROM srt, ks WHERE rr = k0) AS e0,
        |    (SELECT v FROM srt, ks WHERE rr = k1) AS e1,
        |    (SELECT v FROM srt, ks WHERE rr = k2) AS e2),
        |rb AS (SELECT CAST(v > e0 AS INT) + CAST(v > e1 AS INT)
        |    + CAST(v > e2 AS INT) AS bucket FROM r, e),
        |cb AS (SELECT CAST(v > e0 AS INT) + CAST(v > e1 AS INT)
        |    + CAST(v > e2 AS INT) AS bucket FROM c, e),
        |rc AS (SELECT bucket, count(*) AS nr FROM rb GROUP BY bucket),
        |cc AS (SELECT bucket, count(*) AS nc FROM cb GROUP BY bucket),
        |tr AS (SELECT sum(nr) AS t FROM rc),
        |tc AS (SELECT sum(nc) AS t FROM cc),
        |g AS (SELECT CAST(unnest(range(4)) AS INT) AS bucket),
        |j AS (SELECT g.bucket,
        |    greatest(round(CAST(coalesce(nr, 0) AS DOUBLE) / tr.t, 6),
        |      1e-6) AS p,
        |    greatest(round(CAST(coalesce(nc, 0) AS DOUBLE) / tc.t, 6),
        |      1e-6) AS q
        |  FROM g LEFT JOIN rc USING (bucket) LEFT JOIN cc USING (bucket),
        |    tr, tc)
        |SELECT bucket, p AS p_ref, q AS q_cur,
        |  round((p - q) * ln(p / q), 6) AS psi_term FROM j""".stripMargin,
    // Pareto: the oracle IS the one-task global window — exactly the
    // plan the engine-side distributed prefix sum avoids.
    "q151_pareto" ->
      """WITH r AS (SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
        |  FROM lineitem GROUP BY l_partkey),
        |t AS (SELECT sum(w) AS tot FROM r),
        |cw AS (SELECT l_partkey, w,
        |    sum(w) OVER (ORDER BY w DESC, l_partkey) AS c FROM r)
        |SELECT l_partkey, CAST(w AS DOUBLE) AS revenue,
        |  round(CAST(w AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
        |  round(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
        |FROM cw, t""".stripMargin,
    "q152_group_trend" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS y
        |  FROM events GROUP BY event_type, day),
        |d2 AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', day)
        |      AS DECIMAL(10,0)) AS x, y
        |  FROM daily),
        |a AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x * x AS DECIMAL(28,0))) AS DOUBLE) AS sxx
        |  FROM d2 GROUP BY event_type)
        |SELECT event_type, n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - round((n * sxy - sx * sy)
        |    / (n * sxx - sx * sx), 6) * sx) / n, 6) AS intercept
        |FROM a""".stripMargin,
    "q153_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS v
        |  FROM events GROUP BY user_id, day),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY user_id),
        |grid AS (SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM span),
        |f AS (SELECT g.user_id, g.day,
        |    CAST(last_value(d.v IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.day) AS DOUBLE) AS filled,
        |    CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_gap
        |  FROM grid g LEFT JOIN daily d
        |    ON g.user_id = d.user_id AND g.day = d.day),
        |m AS (SELECT user_id, day, filled, is_gap,
        |    count(filled) OVER w AS bn,
        |    CAST(sum(CAST(filled AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |      AS sv,
        |    CAST(sum(CAST(CAST(filled AS DECIMAL(18,4)) *
        |        CAST(filled AS DECIMAL(18,4)) AS DECIMAL(38,8)))
        |      OVER w AS DOUBLE) AS sv2
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, day, filled, is_gap,
        |  round(sv / bn, 6) AS base_mean,
        |  round(sqrt(greatest(0.0,
        |    sv2 / bn - (sv / bn) * (sv / bn))), 6) AS base_sigma,
        |  CASE WHEN bn >= 3 AND filled IS NOT NULL
        |      AND abs(filled - round(sv / bn, 6)) >
        |        2.0 * round(sqrt(greatest(0.0,
        |          sv2 / bn - (sv / bn) * (sv / bn))), 6)
        |    THEN 1 ELSE 0 END AS is_anomaly
        |FROM m""".stripMargin,
    "q154_attribution" ->
      """WITH a AS (SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS ch
        |  FROM events)
        |SELECT coalesce(ch, '(direct)') AS channel,
        |  count(*) AS n_conversions,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_value
        |FROM a WHERE event_type = 'purchase' GROUP BY channel"""
        .stripMargin,
    "q155_scd_audit" ->
      """WITH dim AS (
        |  SELECT c_custkey, 1 AS ver, DATE '2020-01-01' AS eff_from,
        |    DATE '2022-01-01' AS eff_to FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 2,
        |    CASE WHEN c_custkey % 3 = 0 THEN DATE '2021-06-01'
        |      WHEN c_custkey % 3 = 1 THEN DATE '2022-06-01'
        |      ELSE DATE '2022-01-01' END,
        |    CASE WHEN c_custkey % 5 = 0 THEN CAST(NULL AS DATE)
        |      ELSE DATE '2024-01-01' END FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 3, DATE '2024-01-01', CAST(NULL AS DATE)
        |  FROM customer),
        |w AS (SELECT c_custkey, ver, eff_from, eff_to,
        |    lead(eff_from) OVER (PARTITION BY c_custkey
        |      ORDER BY eff_from) AS next_from
        |  FROM dim)
        |SELECT c_custkey, ver, eff_from, eff_to, next_from,
        |  CASE WHEN eff_to IS NULL THEN 'open_not_last'
        |    WHEN next_from < eff_to THEN 'overlap'
        |    WHEN next_from > eff_to THEN 'gap' END AS status
        |FROM w WHERE next_from IS NOT NULL
        |  AND (eff_to IS NULL OR next_from <> eff_to)""".stripMargin,
    "q156_token_budget" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, n_chars, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS "offset"
        |  FROM d)
        |SELECT doc_id, n_chars, n_tokens, "offset" FROM o
        |WHERE "offset" < 10000""".stripMargin,
    "q157_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, count(*) AS n_keys FROM p GROUP BY path
        |ORDER BY n_keys DESC, path LIMIT 20""".stripMargin,
    "q158_user_growth" ->
      """WITH fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT day, count(*) AS n_new FROM fd GROUP BY day)
        |SELECT day, n_new,
        |  CAST(sum(n_new) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_users
        |FROM d""".stripMargin,
    "q159_growth_accounting" ->
      """WITH ud AS (SELECT user_id AS k, CAST(ts AS DATE) AS day,
        |    sum(CAST(value AS DECIMAL(18,4))) AS rev
        |  FROM events GROUP BY k, day),
        |fd AS (SELECT k, min(day) AS f FROM ud GROUP BY k),
        |pv AS (SELECT k, day + 1 AS day, rev AS prev_rev FROM ud),
        |j AS (SELECT coalesce(ud.k, pv.k) AS k,
        |    coalesce(ud.day, pv.day) AS day, ud.rev, pv.prev_rev
        |  FROM ud FULL OUTER JOIN pv
        |    ON ud.k = pv.k AND ud.day = pv.day),
        |e AS (SELECT j.*, fd.f FROM j JOIN fd ON j.k = fd.k)
        |SELECT day,
        |  CAST(sum(CASE WHEN prev_rev IS NULL AND day = f
        |    THEN coalesce(rev, 0) ELSE 0 END) AS DOUBLE) AS new_rev,
        |  CAST(sum(CASE WHEN prev_rev IS NULL AND day > f
        |    THEN coalesce(rev, 0) ELSE 0 END) AS DOUBLE)
        |    AS resurrected_rev,
        |  CAST(sum(CASE WHEN rev IS NOT NULL AND prev_rev IS NOT NULL
        |      AND rev > prev_rev THEN rev - prev_rev ELSE 0 END)
        |    AS DOUBLE) AS expansion,
        |  CAST(sum(CASE WHEN rev IS NOT NULL AND prev_rev IS NOT NULL
        |      AND rev < prev_rev THEN rev - prev_rev ELSE 0 END)
        |    AS DOUBLE) AS contraction,
        |  CAST(sum(CASE WHEN rev IS NULL THEN -prev_rev ELSE 0 END)
        |    AS DOUBLE) AS churned_rev
        |FROM e GROUP BY day""".stripMargin,
    "q160_ewma" -> {
      val k = 7
      val lagTerm = (i: Int) => {
        val wt = 1L << (k - 1 - i)
        val lv = if (i == 0) "CAST(filled AS DECIMAL(18,4))"
          else s"lag(CAST(filled AS DECIMAL(18,4)), $i) OVER wk"
        (s"CASE WHEN $lv IS NOT NULL THEN CAST($lv * $wt AS DECIMAL(28,4)) ELSE CAST(0 AS DECIMAL(28,4)) END",
          s"CASE WHEN $lv IS NOT NULL THEN $wt ELSE 0 END")
      }
      val nums = (0 until k).map(i => lagTerm(i)._1).mkString(" + ")
      val dens = (0 until k).map(i => lagTerm(i)._2).mkString(" + ")
      s"""WITH daily AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |    sum(CAST(value AS DECIMAL(18,4))) AS v
         |  FROM events GROUP BY user_id, day),
         |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM daily GROUP BY user_id),
         |grid AS (SELECT user_id,
         |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |      AS day
         |  FROM span),
         |f AS (SELECT g.user_id, g.day,
         |    CAST(last_value(d.v IGNORE NULLS) OVER (
         |      PARTITION BY g.user_id ORDER BY g.day) AS DOUBLE)
         |      AS filled,
         |    CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_gap
         |  FROM grid g LEFT JOIN daily d
         |    ON g.user_id = d.user_id AND g.day = d.day)
         |SELECT user_id, day, filled, is_gap,
         |  round(CAST($nums AS DOUBLE) / CAST($dens AS DOUBLE), 6)
         |    AS ewma
         |FROM f
         |WINDOW wk AS (PARTITION BY user_id ORDER BY day)""".stripMargin
    },
    "q161_rank_suite" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER wt AS rn,
        |  rank() OVER wp AS rnk,
        |  dense_rank() OVER wp AS drnk,
        |  percent_rank() OVER wp AS prnk,
        |  cume_dist() OVER wp AS cdist,
        |  ntile(4) OVER wt AS quartile
        |FROM lineitem
        |WINDOW wt AS (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber),
        |  wp AS (PARTITION BY l_suppkey ORDER BY l_extendedprice)"""
        .stripMargin,
    "q162_dod_change" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n
        |  FROM events GROUP BY event_type, day)
        |SELECT event_type, day, n,
        |  n - lag(n) OVER w AS delta,
        |  (n - lag(n) OVER w) / lag(n) OVER w AS pct_change
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day)"""
        .stripMargin,
    // Sorted neighbors: the oracle's rank is the one-task global
    // window the engine-side distributed rank avoids.
    "q163_sorted_neighbors" ->
      """WITH dirty AS (
        |  SELECT c_custkey + 1000000 AS d_custkey,
        |    CASE WHEN c_custkey % 2 = 0
        |      THEN substring(c_name, 1, 17) ||
        |        translate(substring(c_name, 18, 1),
        |          '0123456789', '1234567890')
        |      ELSE c_name END AS d_name
        |  FROM customer),
        |u AS (SELECT c_custkey AS id, 0 AS side, c_name AS key,
        |    c_name AS cmp FROM customer
        |  UNION ALL
        |  SELECT d_custkey, 1, d_name, d_name FROM dirty),
        |rk AS (SELECT id, side, cmp,
        |    row_number() OVER (ORDER BY key, side, id) AS rnk FROM u),
        |pr AS (SELECT a.id AS ida, a.side AS sa, a.cmp AS ca,
        |    a.rnk + o AS rnk
        |  FROM rk a, (SELECT unnest(range(1, 10)) AS o) offs)
        |SELECT CASE WHEN sa = 0 THEN ida ELSE b.id END AS c_custkey,
        |  CASE WHEN sa = 0 THEN b.id ELSE ida END AS d_custkey,
        |  levenshtein(ca, b.cmp) AS distance
        |FROM pr JOIN rk b ON pr.rnk = b.rnk
        |WHERE sa <> b.side AND levenshtein(ca, b.cmp) <= 2"""
        .stripMargin,
    "q164_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE)
        |    AS day FROM events),
        |b AS (SELECT max(day) AS d1 FROM ud),
        |contrib AS (SELECT DISTINCT k, day + o AS day
        |  FROM ud, (SELECT CAST(unnest(range(7)) AS INT) AS o) offs),
        |wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
        |SELECT w.day, coalesce(dau, 0) AS dau, wau,
        |  coalesce(dau, 0) / wau AS stickiness
        |FROM wau w LEFT JOIN dau USING (day), b
        |WHERE w.day <= d1""".stripMargin,
    "q165_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  GROUPING(o_orderstatus) AS g_status,
        |  GROUPING(o_orderpriority) AS g_priority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
        .stripMargin,
    "q166_argminmax" ->
      """WITH o AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) * 100000000
        |      + o_orderkey AS ord
        |  FROM orders)
        |SELECT o_orderstatus,
        |  arg_max(o_orderkey, ord) AS max_order,
        |  arg_min(o_orderkey, ord) AS min_order,
        |  max(o_totalprice) AS max_price,
        |  min(o_totalprice) AS min_price
        |FROM o GROUP BY o_orderstatus""".stripMargin,
    "q167_quality_scorecard" ->
      """WITH m AS (SELECT source, lang,
        |    len(regexp_split_to_array(trim(lower(text)), '\s+'))
        |      AS n_tokens,
        |    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
        |      AS n_alpha,
        |    length(regexp_replace(text, '[^ \t\n\r]', '', 'g'))
        |      AS n_space,
        |    length(text) AS n_chars
        |  FROM documents),
        |k AS (SELECT source, lang, n_tokens,
        |    CASE WHEN n_tokens >= 5 AND n_tokens <= 100000
        |      AND (n_chars - n_space) <= n_tokens * 15
        |      AND n_alpha * 2 >= n_chars THEN 1 ELSE 0 END AS keep
        |  FROM m)
        |SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(keep) AS BIGINT) AS n_keep,
        |  CAST(sum(keep) AS DOUBLE) / count(*) AS keep_rate,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
        |FROM k GROUP BY source, lang""".stripMargin,
    "q168_correlation" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
        |      AS DOUBLE) AS sy,
        |    CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(18,4))
        |          AS DECIMAL(28,4)) *
        |        CAST(l_extendedprice AS DECIMAL(18,4))
        |      AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(CAST(CAST(l_quantity AS DECIMAL(18,4))
        |          AS DECIMAL(28,4)) *
        |        CAST(l_quantity AS DECIMAL(18,4))
        |      AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
        |          AS DECIMAL(28,4)) *
        |        CAST(l_extendedprice AS DECIMAL(18,4))
        |      AS DECIMAL(38,8))) AS DOUBLE) AS syy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CASE WHEN sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) = 0
        |    THEN NULL
        |    ELSE round((n * sxy - sx * sy)
        |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        |    END AS r
        |FROM a""".stripMargin,
    "q169_knn_classify" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe,
        |    label AS qlabel FROM embeddings
        |  WHERE vec_id % 7 = 0 AND vec_id < 2000),
        |sc AS (SELECT q.qid, q.qlabel, e.vec_id AS cid,
        |    e.label AS clabel,
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> CAST(e.embedding[i] AS DOUBLE)
        |        * CAST(q.qe[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(e.embedding,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(q.qe,
        |       x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        |  FROM embeddings e, q WHERE e.vec_id % 7 <> 0),
        |nn AS (SELECT qid, qlabel, clabel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY raw DESC, cid) AS rn
        |  FROM sc),
        |v AS (SELECT qid, qlabel, clabel, count(*) AS n
        |  FROM nn WHERE rn <= 5 GROUP BY qid, qlabel, clabel),
        |p AS (SELECT qid, qlabel, clabel,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY n DESC, clabel) AS rn
        |  FROM v)
        |SELECT qid AS vec_id, qlabel AS true_label,
        |  clabel AS predicted,
        |  CAST(qlabel = clabel AS INT) AS correct
        |FROM p WHERE rn = 1""".stripMargin,
    "q170_fulfillment_lag" ->
      """WITH lag AS (SELECT o_orderpriority,
        |    date_diff('day', o_orderdate, l_shipdate) AS lag_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority,
        |  round(quantile_cont(lag_days, 0.25), 4) AS p25,
        |  round(quantile_cont(lag_days, 0.5), 4) AS p50,
        |  round(quantile_cont(lag_days, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM lag GROUP BY o_orderpriority""".stripMargin,
    "q171_ontime_rate" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN
        |      date_diff('day', o_orderdate, l_shipdate) <= 30
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime,
        |  CAST(sum(CASE WHEN
        |      date_diff('day', o_orderdate, l_shipdate) <= 30
        |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS ontime_rate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY month""".stripMargin,
    "q172_repurchase_interval" ->
      """WITH g AS (SELECT o_orderpriority,
        |    date_diff('day', lag(o_orderdate) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey), o_orderdate)
        |      AS gap_days
        |  FROM orders)
        |SELECT o_orderpriority,
        |  round(quantile_cont(gap_days, 0.25), 4) AS p25,
        |  round(quantile_cont(gap_days, 0.5), 4) AS p50,
        |  round(quantile_cont(gap_days, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM g WHERE gap_days IS NOT NULL
        |GROUP BY o_orderpriority""".stripMargin,
    "q173_market_share" ->
      """WITH base AS (SELECT year(o_orderdate) AS yr, n_name,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY yr, n_name),
        |t AS (SELECT yr, sum(rev) AS tot FROM base GROUP BY yr)
        |SELECT base.yr, n_name, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM base JOIN t ON base.yr = t.yr""".stripMargin,
    "q174_discount_bands" ->
      """SELECT CAST(floor(l_discount * 100) AS INT) AS disc_pct,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |    AS DOUBLE) / count(*), 6) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY disc_pct""".stripMargin,
    "q175_supplier_hhi" ->
      """WITH sup AS (SELECT year(l_shipdate) AS yr, l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY yr, l_suppkey),
        |a AS (SELECT yr, count(*) AS n_suppliers,
        |    CAST(sum(rev) AS DOUBLE) AS total_rev,
        |    CAST(sum(CAST(CAST(rev AS DECIMAL(28,2)) * rev
        |      AS DECIMAL(38,4))) AS DOUBLE) AS sq
        |  FROM sup GROUP BY yr)
        |SELECT yr, n_suppliers, total_rev,
        |  round(sq / (total_rev * total_rev), 6) AS hhi
        |FROM a""".stripMargin,
    "q176_ltv_deciles" -> {
      val nb = 10
      val edgeDefs = (1 until nb).map { i =>
        val q = i.toDouble / nb
        s"CAST(floor($q * (n - 1)) AS BIGINT) + 1 AS k$i"
      }.mkString(",\n        |    ")
      val edgeSel = (1 until nb).map { i =>
        s"(SELECT v FROM srt, ks WHERE r = k$i) AS e$i"
      }.mkString(",\n        |    ")
      val bucketExpr = (1 until nb)
        .map(i => s"CAST(rev_d > e$i AS INT)").mkString(" + ")
      s"""WITH cr AS (SELECT o_custkey,
         |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         |      AS DOUBLE) AS rev_d
         |  FROM orders GROUP BY o_custkey),
         |n1 AS (SELECT count(rev_d) AS n FROM cr),
         |ks AS (SELECT $edgeDefs FROM n1),
         |srt AS (SELECT rev_d AS v,
         |    row_number() OVER (ORDER BY rev_d) AS r
         |  FROM cr WHERE rev_d IS NOT NULL),
         |e AS (SELECT $edgeSel),
         |b AS (SELECT $bucketExpr AS bucket, rev FROM cr, e),
         |t AS (SELECT CAST(sum(rev) AS DOUBLE) AS tot FROM cr)
         |SELECT bucket, count(*) AS n_customers,
         |  CAST(sum(rev) AS DOUBLE) AS revenue,
         |  CAST(sum(rev) AS DOUBLE) / tot AS rev_share
         |FROM b, t GROUP BY bucket, tot""".stripMargin
    },
    // Spigot tee: the side-written JSON is the query output, so the
    // oracle is the deterministic first-k replay.
    "q177_spigot" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |ORDER BY c_custkey LIMIT 50""".stripMargin,
    // Sampled source: first-N over a sorted stream.
    "q178_sampled_source" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 500""".stripMargin,
    // LSH S-curve: the ppm fold replayed with list_reduce — floor
    // after every multiply, identical chain length on both engines
    // (r copies reduced = r−1 multiplies = Spark's aggregate over
    // r−1 repeats seeded with the base).
    "q179_lsh_tuning" ->
      """WITH th AS (SELECT CAST(i * 50000 AS BIGINT) AS s_ppm
        |  FROM (SELECT unnest(range(1, 20)) AS i)),
        |g AS (SELECT * FROM (VALUES (4,4),(8,4),(16,4),(32,4),
        |    (8,8),(16,8),(8,16),(4,32)) t(bands, rws)),
        |m AS (SELECT s_ppm, bands, rws,
        |    1000000 - list_reduce(
        |      list_transform(range(rws), i -> s_ppm),
        |      (a, x) -> (a * x) // 1000000) AS miss
        |  FROM th, g)
        |SELECT s_ppm, bands, rws,
        |  CAST(1000000 - list_reduce(
        |    list_transform(range(bands), i -> miss),
        |    (a, x) -> (a * x) // 1000000) AS BIGINT) AS p_ppm
        |FROM m""".stripMargin,
    // Cluster-aware split: q67's pair-graph connected components
    // (undoubled corpus) feed the q91 mix64 bucket replay over the
    // component-or-own-id key.
    "q180_cluster_split" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id,
         |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents),
         |s AS MATERIALIZED (SELECT doc_id, CASE
         |  WHEN len(toks) = 1 AND toks[1] = '' THEN CAST([] AS VARCHAR[])
         |  WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
         |  ELSE list_distinct(list_transform(
         |    range(1, len(toks)-1),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         |  END AS sh FROM t),
         |ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM s),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id),
         |p AS MATERIALIZED (SELECT id_a, id_b
         |  FROM cand JOIN s sa ON sa.doc_id = cand.id_a
         |            JOIN s sb ON sb.doc_id = cand.id_b
         |  WHERE len(list_intersect(sa.sh, sb.sh)) * 2 >=
         |        len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION ALL SELECT id_b, id_a FROM p),
         |nd AS (SELECT DISTINCT src AS id FROM e),
         |cc(id, comp) AS (
         |  SELECT id, id FROM nd
         |  UNION
         |  SELECT e.dst, cc.comp FROM cc JOIN e ON cc.id = e.src
         |),
         |cmp AS (SELECT id, min(comp) AS component FROM cc GROUP BY id),
         |k AS (SELECT d.doc_id, cmp.component,
         |    COALESCE(cmp.component, d.doc_id) AS key
         |  FROM documents d LEFT JOIN cmp ON d.doc_id = cmp.id),
         |z0 AS (SELECT doc_id, component,
         |    (CAST(key AS HUGEINT) + ${sqlMixAdd(11)})
         |      % 18446744073709551616 AS z
         |  FROM k),
         |${sqlMixFinal("doc_id, component")}
         |SELECT doc_id, component,
         |  CASE WHEN z % 1024 < 64 THEN 'valid'
         |       WHEN z % 1024 < 128 THEN 'test'
         |       ELSE 'train' END AS split
         |FROM z3""".stripMargin,
    // Leakage audit: q91 split replay + q41-style pair replay, then
    // cross-split pairs aggregated per split combination.
    "q184_split_leakage" ->
      s"""WITH z0 AS (SELECT doc_id,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(11)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id")},
         |sp AS (SELECT doc_id,
         |  CASE WHEN z % 1024 < 64 THEN 'valid'
         |       WHEN z % 1024 < 128 THEN 'test'
         |       ELSE 'train' END AS split
         |  FROM z3),
         |t AS (SELECT doc_id,
         |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
         |  FROM documents),
         |s AS MATERIALIZED (SELECT doc_id, CASE
         |  WHEN len(toks) = 1 AND toks[1] = '' THEN CAST([] AS VARCHAR[])
         |  WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
         |  ELSE list_distinct(list_transform(
         |    range(1, len(toks)-1),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         |  END AS sh FROM t),
         |ex AS MATERIALIZED (SELECT doc_id, unnest(sh) AS g FROM s),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id),
         |p AS (SELECT id_a, id_b
         |  FROM cand JOIN s sa ON sa.doc_id = cand.id_a
         |            JOIN s sb ON sb.doc_id = cand.id_b
         |  WHERE len(list_intersect(sa.sh, sb.sh)) * 2 >=
         |        len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))),
         |cr AS (SELECT least(sa.split, sb.split) AS split_a,
         |    greatest(sa.split, sb.split) AS split_b, p.id_a, p.id_b
         |  FROM p JOIN sp sa ON p.id_a = sa.doc_id
         |         JOIN sp sb ON p.id_b = sb.doc_id
         |  WHERE sa.split <> sb.split),
         |np AS (SELECT split_a, split_b, count(*) AS n_pairs
         |  FROM cr GROUP BY split_a, split_b),
         |d AS (SELECT split_a, split_b, unnest([id_a, id_b]) AS id
         |  FROM cr),
         |nd AS (SELECT split_a, split_b,
         |    count(DISTINCT id) AS n_docs
         |  FROM d GROUP BY split_a, split_b)
         |SELECT np.split_a, np.split_b, n_pairs, n_docs
         |FROM np JOIN nd USING (split_a, split_b)""".stripMargin,
    // Catalog round-trip with a read-side pushdown predicate.
    "q185_catalog_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_acctbal > 0""".stripMargin,
    // Exchange content-neutrality: repartition+coalesce == identity.
    "q186_physical_roundtrip" ->
      """SELECT * FROM part""".stripMargin,
    // Collection select/map/flatMap chain == one grouped CASE agg.
    "q181_collection_ops" ->
      """SELECT CASE WHEN o_totalprice > 250000 THEN 'high'
        |    ELSE 'low' END AS band,
        |  o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders GROUP BY band, o_orderpriority""".stripMargin,
    // RDD round-trip is the identity on (values, schema).
    "q182_rdd_source" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem""".stripMargin,
    // Target-schema reshape: prune + reorder + retype.
    "q183_with_schema" ->
      """SELECT lang, CAST(n_chars AS INT) AS n_chars, doc_id
        |FROM documents""".stripMargin,
    // Shingle-DF census over DISTINCT texts (the kernel caps on
    // contracted reps); shingle formation replays the q67 oracle's
    // tokenizer CASE exactly.
    "q187_shingle_cap_audit" ->
      s"""WITH d AS (SELECT DISTINCT text FROM documents),
        |t AS (SELECT text,
        |  regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        |  FROM d),
        |s AS (SELECT text, CASE
        |  WHEN len(toks) = 1 AND toks[1] = '' THEN CAST([] AS VARCHAR[])
        |  WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
        |  ELSE list_distinct(list_transform(
        |    range(1, len(toks)-1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |  END AS sh FROM t),
        |f AS (SELECT unnest(sh) AS g FROM s),
        |c AS (SELECT g, count(*) AS df FROM f GROUP BY g)
        |SELECT CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(sum(CASE WHEN df > ${Dedup.DefaultMaxShingleFreq.get}
        |      THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_capped,
        |  CAST(coalesce(sum(df * (df - 1) // 2), 0) AS BIGINT)
        |    AS candidate_pairs,
        |  CAST(coalesce(sum(CASE WHEN df > ${Dedup.DefaultMaxShingleFreq.get}
        |      THEN df * (df - 1) // 2 ELSE 0 END), 0) AS BIGINT)
        |    AS capped_pairs
        |FROM c""".stripMargin,
    // T1 batch-policy arithmetic: per-batch counts from the same
    // o_orderkey % 4 split, attempts = injected failures + 1; the
    // empty batch 4 contributes no row on either side.
    "q189_batch_policy" ->
      """SELECT CAST(o_orderkey % 4 AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS num_records,
        |  CAST(o_orderkey % 4 % 3 + 1 AS INT) AS attempts
        |FROM orders GROUP BY o_orderkey % 4""".stripMargin,
    // X3/X4 probes: constant partition-layout facts.
    "q190_partition_probe" ->
      """SELECT CAST(7 AS INT) AS n_repart, CAST(3 AS INT) AS n_coalesce,
        |  CAST(9 AS INT) AS n_widened, true AS noop_identity""".stripMargin,
    // BPE merge learning: every round's argmax row, from the unrolled
    // round CTEs ([[bpeOracleCtes]]).
    "q191_bpe_train" -> {
      val rows = (1 to bpeRounds).map(r =>
        s"""SELECT CAST($r AS INT) AS merge_rank, l AS "left",
           |  r AS "right", l || r AS merged, c AS pair_count
           |FROM b$r""".stripMargin).mkString("\nUNION ALL\n")
      s"WITH ${bpeOracleCtes(bpeRounds)}\n$rows"
    },
    // Batched BPE: every round's KEPT set with cumulative global
    // ranks, from the batched round CTEs ([[bpeBatchedOracleCtes]] —
    // greedy disjoint selection replayed as a recursive CTE).
    "q195_bpe_train_batched" -> {
      val legs = (1 to bpeRounds).map { r =>
        val prior =
          if (r == 1) "0"
          else (1 until r).map(p => s"(SELECT count(*) FROM k$p)")
            .mkString(" + ")
        s"""SELECT CAST(($prior) + row_number() OVER (ORDER BY rk)
           |    AS INT) AS merge_rank,
           |  l AS "left", r AS "right", l || r AS merged,
           |  c AS pair_count
           |FROM k$r""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH RECURSIVE ${bpeBatchedOracleCtes(bpeRounds, bpeBatchSize, bpeRounds)}\n$legs"
    },
    // BPE application: documents rejoin the final round's word
    // segmentations in position order; empty docs keep an empty
    // segmentation.
    "q192_bpe_encode" ->
      s"""WITH ${bpeOracleCtes(bpeRounds)},
         |tok AS (SELECT doc_id,
         |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
         |      AS word,
         |    unnest(range(1, len(regexp_split_to_array(trim(lower(text)),
         |      '\\s+')) + 1)) AS pos
         |  FROM documents),
         |tf AS (SELECT doc_id, word, pos FROM tok WHERE word <> ''),
         |j AS (SELECT t.doc_id, t.pos, w.toks
         |  FROM tf t JOIN w$bpeRounds w USING (word)),
         |enc AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS flat
         |  FROM j GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(array_to_string(e.flat, ' '), '') AS bpe_tokens,
         |  CAST(coalesce(len(e.flat), 0) AS INT) AS n_subwords
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN enc e USING (doc_id)""".stripMargin,
    // DOULION sampled triangles: the q129 edge derivation, every keep
    // decision replayed through the splitmix64 chain, the exact
    // canonical three-way closure on the sample, and the integer
    // 1/p³ scale — engine and oracle share the sampling constants by
    // interpolation.
    "q193_triangles_sampled" ->
      s"""WITH pd AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS sv
         |  FROM lineitem),
         |ok AS (SELECT o FROM pd GROUP BY o
         |  HAVING count(*) <= $MaxBasketSize),
         |ps AS (SELECT o, sv FROM pd WHERE o IN (SELECT o FROM ok)),
         |e AS (SELECT DISTINCT a.sv AS u, b.sv AS v
         |  FROM ps a JOIN ps b ON a.o = b.o AND a.sv < b.sv),
         |${sqlSampledEdges(GraphSampleDenomTri, 1)},
         |tc AS MATERIALIZED (SELECT count(*) AS t
         |  FROM sm e1
         |  JOIN sm e2 ON e2.u = e1.v
         |  JOIN sm e3 ON e3.u = e1.u AND e3.v = e2.v)
         |SELECT CAST((SELECT count(*) FROM sm) AS BIGINT)
         |    AS sampled_edges,
         |  CAST(t AS BIGINT) AS tri_sampled,
         |  CAST(t * ${math.pow(GraphSampleDenomTri.toDouble, 3).toLong}
         |    AS BIGINT) AS est_triangles
         |FROM tc""".stripMargin,
    // Semantic balance: the q53 bucket replay at the DERIVED plane
    // count over the pinned input + the mix64 priority chain (signed
    // conversion as in the q39 sig CTE) + a per-bucket rank capped at
    // the shared constant.
    "q196_semantic_balance" ->
      s"""WITH ${sqlPlaneMatCte(q196Planes)},
         |coded AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_sum(list_transform(range(1, ${q196Planes + 1}), p ->
         |      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
         |          i -> CAST(embedding[i] AS DOUBLE) * __mat.m[p][i])) >= 0
         |        THEN (1 << (p - 1)) ELSE 0 END)) AS bucket
         |  FROM embeddings, __mat WHERE vec_id < $Q188Cardinality),
         |z0 AS (SELECT vec_id, bucket,
         |    (CAST(vec_id AS HUGEINT) + ${sqlMixAdd(Q196SampleSeed)})
         |      % 18446744073709551616 AS z
         |  FROM coded),
         |${sqlMixFinal("vec_id, bucket")},
         |pri AS (SELECT vec_id, bucket,
         |    CASE WHEN z >= 9223372036854775808
         |      THEN CAST(z - 18446744073709551616 AS BIGINT)
         |      ELSE CAST(z AS BIGINT) END AS p
         |  FROM z3),
         |r AS (SELECT vec_id, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY p, vec_id)
         |      AS rn
         |  FROM pri)
         |SELECT vec_id, CAST(bucket AS BIGINT) AS bucket
         |FROM r WHERE rn <= $Q196Cap""".stripMargin,
    // Semantic decontamination: the q53 bucket/normalize replay over
    // the two pinned corpus slices, joined bucket-local, exact cosine
    // rerank at the shared threshold.
    "q199_semantic_decon" ->
      s"""WITH ${sqlPlaneMatCte(q199Planes)},
         |coded AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
         |      sqrt(list_sum(list_transform(embedding,
         |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u,
         |    list_sum(list_transform(range(1, ${q199Planes + 1}), p ->
         |      CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1),
         |          i -> CAST(embedding[i] AS DOUBLE) * __mat.m[p][i])) >= 0
         |        THEN (1 << (p - 1)) ELSE 0 END)) AS bk
         |  FROM embeddings, __mat WHERE vec_id < $Q188Cardinality),
         |sc AS (SELECT t.vec_id AS train_id, e.vec_id AS eval_id,
         |    round(list_sum(list_transform(range(1, len(t.u) + 1),
         |      i -> t.u[i] * e.u[i])), 4) AS score
         |  FROM coded t JOIN coded e ON t.bk = e.bk
         |  WHERE t.vec_id >= $Q199EvalSplit AND e.vec_id < $Q199EvalSplit)
         |SELECT train_id, eval_id, score FROM sc
         |WHERE score >= $Q199MinCosine""".stripMargin,
    // Sparsified k-core: q137's three unrolled peels on the p = 1/2
    // deterministic sample at the scaled threshold.
    "q194_kcore_sampled" ->
      s"""WITH pd AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         |  FROM lineitem),
         |ok AS (SELECT o FROM pd GROUP BY o
         |  HAVING count(*) <= $MaxBasketSize),
         |ps AS (SELECT o, p FROM pd WHERE o IN (SELECT o FROM ok)),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM ps a JOIN ps b ON a.o = b.o AND a.p < b.p),
         |${sqlSampledEdges(GraphSampleDenomCore, 1)},
         |d1 AS MATERIALIZED (SELECT n, count(*) AS c FROM
         |  (SELECT u AS n FROM sm UNION ALL SELECT v FROM sm) GROUP BY n),
         |k1 AS MATERIALIZED (SELECT n FROM d1 WHERE c >= $KcoreSampledK),
         |e1 AS MATERIALIZED (SELECT u, v FROM sm
         |  WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)),
         |d2 AS MATERIALIZED (SELECT n, count(*) AS c FROM
         |  (SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1) GROUP BY n),
         |k2 AS MATERIALIZED (SELECT n FROM d2 WHERE c >= $KcoreSampledK),
         |e2 AS MATERIALIZED (SELECT u, v FROM e1
         |  WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2)),
         |d3 AS MATERIALIZED (SELECT n, count(*) AS c FROM
         |  (SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2) GROUP BY n),
         |k3 AS MATERIALIZED (SELECT n FROM d3 WHERE c >= $KcoreSampledK),
         |e3 AS MATERIALIZED (SELECT u, v FROM e2
         |  WHERE u IN (SELECT n FROM k3) AND v IN (SELECT n FROM k3)),
         |df AS (SELECT n, count(*) AS deg FROM
         |  (SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3) GROUP BY n)
         |SELECT n, deg FROM df WHERE deg >= $KcoreSampledK""".stripMargin,
    // MAD: nearest-rank median replayed twice (value, then absolute
    // deviation), identical IEEE boundary on both engines.
    "q132_mad_outliers" ->
      """WITH n1 AS (SELECT count(l_extendedprice) AS n FROM lineitem),
        |k1 AS (SELECT CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 AS k
        |  FROM n1),
        |s1 AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS r
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |med AS (SELECT v AS m FROM s1, k1 WHERE r = k),
        |d AS (SELECT abs(l_extendedprice - m) AS a
        |  FROM lineitem, med WHERE l_extendedprice IS NOT NULL),
        |n2 AS (SELECT count(*) AS n FROM d),
        |k2 AS (SELECT CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1 AS k
        |  FROM n2),
        |s2 AS (SELECT a, row_number() OVER (ORDER BY a) AS r FROM d),
        |mad AS (SELECT a AS md FROM s2, k2 WHERE r = k)
        |SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  CASE WHEN l_extendedprice IS NOT NULL
        |      AND abs(l_extendedprice - m) > 3.0 * md
        |    THEN 1 ELSE 0 END AS is_outlier
        |FROM lineitem, med, mad""".stripMargin,
    "q133_histogram" ->
      """WITH s AS (SELECT min(l_extendedprice) AS mn,
        |    max(l_extendedprice) AS mx
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (SELECT CASE WHEN mx = mn THEN 0
        |    ELSE CAST(least(floor((l_extendedprice - mn) * 20
        |      / (mx - mn)), 19) AS INT) END AS bucket
        |  FROM lineitem, s WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
        |g AS (SELECT CAST(unnest(range(20)) AS INT) AS bucket, mn, mx
        |  FROM s)
        |SELECT g.bucket, mn + g.bucket * (mx - mn) / 20 AS lo,
        |  mn + (g.bucket + 1) * (mx - mn) / 20 AS hi,
        |  coalesce(n, 0) AS n
        |FROM g LEFT JOIN c USING (bucket)""".stripMargin,
    "q134_transitions" ->
      """WITH seq AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM seq
        |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, sum(n) AS tn FROM c GROUP BY from_type)
        |SELECT c.from_type, c.to_type, n, round(n / tn, 6) AS p
        |FROM c JOIN tot USING (from_type)""".stripMargin,
    // Hopping windows: each event replicated into its 7 overlapping
    // window starts.
    "q135_hopping_agg" ->
      """WITH offs AS (SELECT CAST(unnest(range(7)) AS INT) AS o),
        |w AS (SELECT CAST(date_trunc('day', ts) AS DATE) - o AS wstart,
        |    event_type, CAST(value AS DECIMAL(18,4)) AS v
        |  FROM events, offs)
        |SELECT wstart, event_type, count(*) AS n,
        |  CAST(sum(v) AS DOUBLE) AS total
        |FROM w GROUP BY wstart, event_type""".stripMargin,
    // Outliers: exact decimal sums -> 6dp μ/σ -> identical IEEE
    // boundary comparison on both engines.
    "q117_outliers" ->
      """WITH s AS (SELECT
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
        |      AS DOUBLE) AS sx,
        |    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |          AS DECIMAL(28,6)) *
        |        CAST(l_extendedprice AS DECIMAL(18,6))
        |      AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        |    CAST(count(l_extendedprice) AS DOUBLE) AS n
        |  FROM lineitem),
        |st AS (SELECT round(sx / n, 6) AS mu,
        |    round(sqrt(greatest(0.0,
        |      sxx / n - (sx / n) * (sx / n))), 6) AS sigma
        |  FROM s)
        |SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_extendedprice IS NOT NULL
        |      AND abs(l_extendedprice - mu) > 2.0 * sigma
        |    THEN 1 ELSE 0 END AS is_outlier
        |FROM lineitem, st""".stripMargin,
    // Recall-sized banded bucketing (the r14 DEFAULT — a default call
    // now gets autoBands(0.35, 4) = 20 OR-amplified bands, not the
    // measured-leaky single table): the oracle replays all 20 band
    // bucketings off one inlined 80-plane draw, the cross-band
    // DISTINCT, and the normalized-dot verify.
    "q53_embed_pairs_lsh" -> sqlBandedPairs(q53Bands, 4, 0.35),
    // The auto-sized default at the DERIVED (r, bands) — q188Planes =
    // autoPlanes(Q188Cardinality, 16) planes per band, q188Bands =
    // autoBands(0.35, q188Planes) bands, both computed by the SAME
    // engine calls over the SAME pinned vec_id < 500 input, so the
    // oracle buckets bit-equal with the auto-sized run on every data
    // dir (banded since r14's recall-sized default).
    "q188_auto_lsh_pairs" ->
      sqlBandedPairs(q188Bands, q188Planes, 0.35,
        s" WHERE vec_id < $Q188Cardinality"),
    // SemDeDup: the q53 BANDED replay (the r14 recall-sized default —
    // 20 bands of 4 planes) feeds a recursive transitive closure (the
    // q80 pattern); survivors are unpaired vectors plus each cluster's
    // min id.
    "q86_semdedup" -> sqlSemDedupSurvivors(q53Bands, 4, 0.35),
    // Dataset split: full mix64 kernel replay (seed 11), low 10 bits
    // against the 64/64/896 thresholds.
    "q91_dataset_split" ->
      s"""WITH z0 AS (SELECT doc_id, lang,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(11)})
         |      % 18446744073709551616 AS z
         |  FROM documents),
         |${sqlMixFinal("doc_id, lang")}
         |SELECT doc_id, lang,
         |  CASE WHEN z % 1024 < 64 THEN 'valid'
         |       WHEN z % 1024 < 128 THEN 'test'
         |       ELSE 'train' END AS split
         |FROM z3""".stripMargin,
    // Z-order key: the same shift/mask interleave, generated for both
    // engines from one bit list.
    "q92_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(${sqlZOrder("(l_partkey & 1023)", "(l_suppkey & 1023)", 10)}
         |    AS BIGINT) AS zkey
         |FROM lineitem""".stripMargin,

    // Co-occurrence: per-doc distinct tokens, df band, same-doc pair
    // join, HAVING floor.
    "q94_cooccurrence" ->
      """WITH t AS (SELECT doc_id AS id,
        |    unnest(list_distinct(list_filter(
        |      regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> ''))) AS term
        |  FROM documents),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY term
        |      HAVING count(*) BETWEEN 20 AND 4000),
        |bt AS (SELECT t.id, t.term, d.df FROM t JOIN d USING (term))
        |SELECT a.term AS term_a, b.term AS term_b,
        |  a.df AS df_a, b.df AS df_b, count(*) AS n_ab
        |FROM bt a JOIN bt b ON a.id = b.id AND a.term < b.term
        |GROUP BY 1, 2, 3, 4
        |HAVING count(*) >= 5""".stripMargin,

    // Curation pipeline: token floor, min-id-per-text dedup, mix64
    // split (train = bucket >= 128), prefix-sum offsets over the
    // survivors in id order — the q35/q33/q91/q76 replays chained.
    "q93_curation_pipeline" ->
      s"""WITH tok AS (SELECT doc_id, text,
         |  len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n
         |  FROM documents),
         |q AS (SELECT doc_id, text, n FROM tok WHERE n >= 5),
         |d AS (SELECT doc_id, n FROM q
         |      WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY text)),
         |z0 AS (SELECT doc_id, n,
         |    (CAST(doc_id AS HUGEINT) + ${sqlMixAdd(11)})
         |      % 18446744073709551616 AS z
         |  FROM d),
         |${sqlMixFinal("doc_id, n")},
         |tr AS (SELECT doc_id, n FROM z3 WHERE z % 1024 >= 128),
         |o AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS "offset" FROM tr)
         |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, "offset",
         |  "offset" // 512 AS seq_first,
         |  ("offset" + n_tokens - 1) // 512 AS seq_last FROM o""".stripMargin,

    // URL canonicalization: the same regex family replayed step by
    // step (scheme/host lowercase, userinfo+default-port drop,
    // trailing-slash strip, tracking-param filter, param sort).
    "q89_url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTP://WWW.Example.COM:80'
        |        WHEN doc_id % 3 = 1 THEN 'https://CDN.example.com:443'
        |        ELSE 'https://user@Example.com:8443' END)
        |  || '/Docs/' || CAST(doc_id AS VARCHAR)
        |  || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
        |  || '?utm_source=feed&b=2&a=1&gclid=x#frag' AS url
        |  FROM documents),
        |parts AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
        |  regexp_replace(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS query
        |  FROM u),
        |p2 AS (SELECT doc_id, scheme, path,
        |  lower(regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1)) AS host,
        |  regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        |  array_to_string(list_sort(list_filter(string_split(query, '&'),
        |    p -> p <> '' AND NOT regexp_matches(p,
        |      '^(utm_[^=&]*|gclid|fbclid)(=[^&]*)?$'))), '&') AS kept
        |  FROM parts)
        |SELECT doc_id,
        |  CASE WHEN scheme = '' OR host = '' THEN NULL
        |       ELSE scheme || '://' || host ||
        |         (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |                    OR (scheme = 'https' AND port = '443') THEN ''
        |               ELSE ':' || port END) || path ||
        |         (CASE WHEN kept = '' THEN '' ELSE '?' || kept END)
        |  END AS canon_url
        |FROM p2""".stripMargin,

    // Corpus overlap: both snapshots run the splitmix64 band replay;
    // corpus minima per seed agree exactly or not at all.
    "q90_corpus_overlap" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |snap AS (SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0
         |       THEN 'novel snapshot page ' || CAST(doc_id AS VARCHAR)
         |         || ' fresh content ' || CAST(doc_id * 17 AS VARCHAR)
         |       ELSE text END AS text
         |  FROM documents),
         |${sqlMinhashBands("base", "c")},
         |${sqlMinhashBands("snap", "n")},
         |ca AS (SELECT seed, min(v) AS v FROM csig GROUP BY seed),
         |nb AS (SELECT seed, min(v) AS v FROM nsig GROUP BY seed)
         |SELECT count(*) AS n_seeds,
         |  count(CASE WHEN ca.v = nb.v THEN 1 END) AS n_equal,
         |  CAST(count(CASE WHEN ca.v = nb.v THEN 1 END) AS DOUBLE)
         |    / count(*) AS jaccard_est
         |FROM ca JOIN nb USING (seed)""".stripMargin,

    // Exact quantiles: lower-interpolation rank floor(p*(n-1))+1
    // probed against the full window rank (small table in DuckDB; the
    // engine side computes the same ranks distributed).
    "q87_exact_quantiles" ->
      """WITH s AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem),
        |ps AS (SELECT CAST(unnest([0.01, 0.25, 0.5, 0.75, 0.99]) AS DOUBLE) AS p)
        |SELECT p, v AS l_extendedprice FROM ps
        |JOIN s ON s.rn = CAST(floor(p * (n - 1)) AS BIGINT) + 1""".stripMargin,
    // Inverted index: per-doc distinct whitespace tokens, df census
    // banded to [2, 100], ordered posting lists.
    "q88_inverted_index" ->
      """WITH t AS (SELECT doc_id AS id,
        |    unnest(list_distinct(list_filter(
        |      regexp_split_to_array(trim(lower(text)), '\s+'),
        |      x -> x <> ''))) AS term
        |  FROM documents),
        |d AS (SELECT term, count(*) AS df FROM t GROUP BY term
        |      HAVING count(*) BETWEEN 2 AND 4000)
        |SELECT term, df,
        |  array_to_string(list(id ORDER BY id), ' ') AS postings
        |FROM t JOIN d USING (term) GROUP BY term, df""".stripMargin,
    // Range join: a plain BETWEEN join — DuckDB plans its own IEJoin;
    // the Spark side must produce the identical pair multiset through
    // the bucketized equi-join rewrite.
    "q95_range_join" ->
      """WITH pts AS (SELECT l_partkey * 20 + l_linenumber AS p
        |  FROM lineitem),
        |iv AS (SELECT p_partkey, p_partkey * 20 AS lo,
        |    p_partkey * 20 + 3 + p_partkey % 25 AS hi FROM part)
        |SELECT p_partkey, count(*) AS n_pts,
        |  CAST(sum(p) AS BIGINT) AS sum_p
        |FROM iv JOIN pts ON pts.p BETWEEN iv.lo AND iv.hi
        |GROUP BY p_partkey""".stripMargin,
    // Chunking: stride 48 = 64 - 16; DuckDB list slices are 1-based
    // inclusive; `st // 48` is integer division (bare `/` floats).
    "q96_doc_chunks" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t
        |  WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n,
        |    unnest(generate_series(0, n - 1, 48)) AS st FROM s)
        |SELECT doc_id, CAST(st // 48 AS INT) AS chunk_idx,
        |  CAST(len(toks[st + 1 : least(st + 64, n)]) AS INT) AS n_tokens,
        |  array_to_string(toks[st + 1 : least(st + 64, n)], ' ')
        |    AS chunk_text
        |FROM c WHERE st = 0 OR st + 16 < n""".stripMargin,
    // Funnel: cumulative conditional sums in one aggregation, then one
    // row per stage.
    "q97_filter_funnel" ->
      """WITH a AS (SELECT count(*) AS n0,
        |  CAST(sum(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN n_chars >= 150 AND lang = 'en'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN n_chars >= 150 AND lang = 'en'
        |    AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 30
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM documents)
        |SELECT 1 AS stage_idx, 'min_chars' AS stage, n0 AS rows_in,
        |  n1 AS rows_kept, n0 - n1 AS rows_dropped FROM a
        |UNION ALL SELECT 2, 'lang_en', n1, n2, n1 - n2 FROM a
        |UNION ALL SELECT 3, 'token_floor', n2, n3, n2 - n3 FROM a""".stripMargin,
    // Vocab: same lower+trim+\s+ tokenization as q35; ids are the
    // (count desc, token) rank.
    "q98_vocab" ->
      """WITH t AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    x -> x <> '')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS n FROM t GROUP BY token
        |  HAVING count(*) >= 5)
        |SELECT token, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
        |    AS token_id
        |FROM c""".stripMargin,
    // Snapshot diff: the fingerprint is md5 over the single compared
    // column joined with chr(1) separators and chr(0) null sentinels —
    // the exact portable-fingerprint recipe the Spark side uses.
    "q99_snapshot_diff" ->
      """WITH o AS (SELECT doc_id,
        |    md5(COALESCE(text, chr(0))) AS fp FROM documents),
        |n AS (
        |  SELECT doc_id, md5(COALESCE(
        |      CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END,
        |      chr(0))) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 500000, md5(COALESCE(text, chr(0)))
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp = n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // Top-n per key: the window formulation IS the oracle — the Spark
    // side must reproduce it through the heap aggregate.
    "q100_topn_per_key" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin,
    // Normalization: identical regex chain; DuckDB regexp_replace
    // needs the 'g' flag (Spark replaces all matches by default).
    "q101_normalize" ->
      """SELECT doc_id, trim(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(lower(text),
        |    '[!-/:-@\[-`{-~]', '', 'g'),
        |  '[0-9]', '0', 'g'),
        |  '[\x00-\x1f]', ' ', 'g'),
        |  '[ ]+', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,
    // Encode: the q98 vocab as a CTE, zip-unnest for (token, pos),
    // left join for OOV = -1, order-preserving list rebuild.
    "q102_encode" ->
      """WITH tt AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    x -> x <> '')) AS token FROM documents),
        |vc AS (SELECT token, count(*) AS n FROM tt GROUP BY token
        |  HAVING count(*) >= 5),
        |v AS (SELECT token,
        |    CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
        |      AS token_id FROM vc),
        |d AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    x -> x <> '') AS toks FROM documents),
        |e AS (SELECT doc_id, unnest(toks) AS token,
        |    unnest(range(len(toks))) AS pos FROM d WHERE len(toks) > 0),
        |j AS (SELECT e.doc_id, e.pos, COALESCE(v.token_id, -1) AS tid
        |  FROM e LEFT JOIN v USING (token))
        |SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
        |  CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS INT) AS n_oov,
        |  array_to_string(list(tid ORDER BY pos), ' ') AS token_ids
        |FROM j GROUP BY doc_id""".stripMargin,
    // Compaction: exclusive prefix bytes over (size desc, file) per
    // dir, integer-divided by the 64 MB target.
    "q103_compaction_plan" ->
      """WITH l AS (SELECT p_brand AS dir,
        |    'f' || CAST(p_partkey AS VARCHAR) AS file,
        |    CAST((p_partkey * 2654435761) % 97 * 1048576 AS BIGINT)
        |      AS bytes
        |  FROM part)
        |SELECT dir, file, bytes,
        |  CAST(COALESCE(sum(bytes) OVER (PARTITION BY dir
        |      ORDER BY bytes DESC, file
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    // 67108864 AS INT) AS bin
        |FROM l""".stripMargin,
    // Chained chunk→encode→pack: q96's chunking feeds q102's encode
    // under q98's vocab, then q76's prefix-sum packing — all replayed
    // relationally. The pack offset orders by the composite chunk id.
    "q104_chunk_encode_pack" ->
      """WITH d AS (SELECT doc_id, list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM d
        |  WHERE len(toks) > 0),
        |c AS (SELECT doc_id, toks, n,
        |    unnest(generate_series(0, n - 1, 48)) AS st FROM s),
        |ch AS (SELECT doc_id * 100000 + CAST(st // 48 AS INT) AS chunk_id,
        |    array_to_string(toks[st + 1 : least(st + 64, n)], ' ')
        |      AS chunk_text
        |  FROM c WHERE st = 0 OR st + 16 < n),
        |tt AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    x -> x <> '')) AS token FROM documents),
        |vc AS (SELECT token, count(*) AS n FROM tt GROUP BY token
        |  HAVING count(*) >= 5),
        |v AS (SELECT token,
        |    CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
        |      AS token_id FROM vc),
        |dt AS (SELECT chunk_id, list_filter(
        |    regexp_split_to_array(trim(lower(chunk_text)), '\s+'),
        |    x -> x <> '') AS ctoks FROM ch),
        |e AS (SELECT chunk_id, unnest(ctoks) AS token,
        |    unnest(range(len(ctoks))) AS pos FROM dt WHERE len(ctoks) > 0),
        |j AS (SELECT e.chunk_id, e.pos, COALESCE(v.token_id, -1) AS tid
        |  FROM e LEFT JOIN v USING (token)),
        |enc AS (SELECT chunk_id, CAST(count(*) AS INT) AS n_tokens,
        |  CAST(sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS INT) AS n_oov,
        |  array_to_string(list(tid ORDER BY pos), ' ') AS token_ids
        |  FROM j GROUP BY chunk_id),
        |p AS (SELECT chunk_id, n_tokens,
        |  CAST(COALESCE(sum(n_tokens) OVER (ORDER BY chunk_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS "offset" FROM enc)
        |SELECT enc.chunk_id, enc.n_tokens, enc.n_oov, p."offset",
        |  p."offset" // 128 AS seq_first,
        |  (p."offset" + enc.n_tokens - 1) // 128 AS seq_last,
        |  enc.token_ids
        |FROM enc JOIN p USING (chunk_id)""".stripMargin,
    // Governed compaction: content-preserving — the oracle is the
    // union of the three committed slices, i.e. all of nation.
    "q105_governed_compact" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // Lifecycle tiering: content-preserving round-trip through the
    // hidden tier directory.
    "q106_lifecycle_tier" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    // Streaming dedup policy: batch 1 keeps min id per distinct text;
    // batch 2 keeps min id per distinct text NOT already in batch 1.
    "q108_stream_dedup" ->
      """WITH b1 AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 2 = 0),
        |b2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
        |w1 AS (SELECT min(doc_id) AS doc_id, text FROM b1 GROUP BY text),
        |w2 AS (SELECT min(doc_id) AS doc_id, text FROM b2
        |  WHERE text NOT IN (SELECT text FROM b1) GROUP BY text)
        |SELECT doc_id, text FROM w1
        |UNION ALL SELECT doc_id, text FROM w2""".stripMargin,
    // Collection fan-out: the written child table is q18's relational
    // shadow.
    "q107_collection_sink" ->
      """SELECT CAST(p_partkey AS BIGINT) AS id,
        |  CAST(unnest(range(len(arr))) AS INT) AS index,
        |  unnest(arr) AS "words.val"
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS arr FROM part)""".stripMargin,
    "q52_ann_ivf" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sc AS (SELECT e.vec_id,
        |  list_sum(list_transform(range(1, len(e.embedding)+1),
        |    i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) /
        |  (sqrt(list_sum(list_transform(e.embedding,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) *
        |   sqrt(list_sum(list_transform(q.qe,
        |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS raw
        | FROM embeddings e, q WHERE e.vec_id <> 0)
        |SELECT vec_id, round(raw, 4) AS score FROM sc
        |ORDER BY raw DESC, vec_id LIMIT 10""".stripMargin,
    "q54_ddb_unnest" ->
      """SELECT event_id,
        |  regexp_extract(props, '"k": ([0-9]+)', 1) AS k_val,
        |  CAST(event_id AS VARCHAR) AS n_val,
        |  2 AS n_tags
        |FROM events""".stripMargin,
    "q42_multimodal" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  ascii(text) AS first_byte,
        |  CAST(strlen(text) % 640 AS INT) AS width,
        |  CAST(strlen(text) % 480 AS INT) AS height
        |FROM documents""".stripMargin,
  )
}
