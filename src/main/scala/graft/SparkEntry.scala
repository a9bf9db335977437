package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GlueFrame, GType}
import graft.functions.GlueFunctions
import graft.operators.{ChoiceOps, FieldOps, Joins, NestedOps}
import graft.operators.FieldOps.Mapping

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 implemented so far is exposed here
  * as a named query over the driver's TPC-H-ish parquet tables, paired
  * with an ANSI-SQL oracle run by DuckDB on the same tables. Aliases in
  * the Spark plan and the oracle SQL are kept identical (the driver's
  * compare sorts columns by name before hashing).
  *
  * Numeric-stability policy for oracles: double-typed SUM/AVG go
  * through DECIMAL on both sides (float addition order would otherwise
  * differ between engines); double→int casts go through FLOOR (DuckDB
  * rounds, Spark truncates).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

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
    "q01_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("decimal(18,4)").as("sum_disc_price"),
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
      FieldOps.applyMapping(t(s, dir, "orders"), Seq(
        Mapping.cast("o_orderkey", "order_id", "long"),
        Mapping.cast("o_orderstatus", "status", "string"),
        Mapping.cast("o_totalprice", "total", "decimal(12,2)"),
        Mapping.cast("o_orderdate", "odate", "date")))),

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
            .cast("decimal(18,2)").as("total"))),
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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
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
        |  CAST(o_totalprice AS DECIMAL(12,2)) AS total,
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
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
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
  )
}
