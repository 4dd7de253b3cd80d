package graft.operators

import graft.util.Checkpoints.ReliableOps
import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Relational operator coverage (SURVEY.md §2.1 S4/S9, §2.3 A1–A5, §2.4 J1,
  * §2.5 U1–U4, §2.6 O1–O8, §2.7 scalar functions) expressed over the driver
  * test tables, each with a DuckDB oracle.
  *
  * Scale notes are inline per query: every aggregation here is a
  * partial+final hash aggregate (map-side combine for free), joins either
  * broadcast the dimension side or shuffle on the join key, and every
  * aggregate that feeds a sort uses exact-decimal accumulation (see
  * GraftFunctions.dsum) so results are reproducible under any partitioning.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** A1/A2 sum-by-key with map-side combine (cc-pyspark sparkcc.py:208-217,
    * word_count.py:27-30). TPC-H Q1 shape: one shuffle, partial agg first.
    */
  val q1PricingSummary: QueryDef = QueryDef(
    "q1_pricing_summary",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  /** Fact-fact join + filter pushdown + top-N (TPC-H Q3 shape). customer is
    * the small side — Catalyst broadcasts it; orders⋈lineitem shuffles on
    * the order key. Top-N is a TakeOrderedAndProject (no global sort).
    */
  val q3ShippingPriority: QueryDef = QueryDef(
    "q3_shipping_priority",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1996-01-01'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** 6-way star join (TPC-H Q5 shape): all dimension tables broadcast,
    * one shuffle for the fact-fact join, one for the final agg.
    */
  val q5RegionRevenue: QueryDef = QueryDef(
    "q5_region_revenue",
    (s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      r.join(n, col("r_regionkey") === col("n_regionkey"))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT r_name, n_name,
      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
      FROM region JOIN nation ON r_regionkey = n_regionkey
      JOIN customer ON n_nationkey = c_nationkey
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      GROUP BY r_name, n_name"""))

  /** S4/E2: user-SQL over a registered view of a parquet scan — the
    * CCIndexSparkJob entry point (sparkcc.py:489-506). Predicate + column
    * pruning reach the parquet reader via Catalyst.
    */
  val s4SqlPushdown: QueryDef = QueryDef(
    "s4_sql_pushdown",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("ccindex")
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        FROM ccindex
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_orderpriority"""))

  /** A3 list-concat by key (sitemaps_from_robotstxt.py:55-100): sorted for
    * determinism, per SURVEY §7.4. The list is emitted string-joined so the
    * driver's pandas comparator can hash the column (numpy arrays aren't
    * hashable); the collect_list + sort_array semantics are still exercised.
    */
  val a3CollectList: QueryDef = QueryDef(
    "a3_collect_list",
    (s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      n.join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
    },
    Some("""SELECT r_name, array_to_string(list(n_name ORDER BY n_name), ',') AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"""))

  /** A5 count (sparkcc.py:513). */
  val a5Count: QueryDef = QueryDef(
    "a5_count",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("cnt")),
    Some("SELECT COUNT(*) AS cnt FROM lineitem"))

  /** J1 vertex-ID assignment + double equi-join (hostlinks_to_graph.py:
    * 96-150): name→id via dense global ordering, then map both edge
    * endpoints. The unpartitioned window mirrors the reference's explicit
    * 1-partition mode; the scale path is sortBy+zipWithIndex (see
    * graft.jobs.HostGraphBuilder).
    */
  val j1GraphIds: QueryDef = QueryDef(
    "j1_graph_ids",
    (s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val edges = n.join(r, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("s"), col("r_name").as("t"))
      val verts = edges.select(col("s").as("name"))
        .union(edges.select(col("t").as("name"))).distinct()
      val ids = verts.withColumn("id", row_number().over(Window.orderBy(col("name"))))
      edges.join(ids, col("s") === col("name")).select(col("id").as("s_id"), col("t"))
        .join(ids, col("t") === col("name")).select(col("s_id"), col("id").as("t_id"))
        .orderBy(col("s_id"), col("t_id"))
    },
    Some("""WITH edges AS (
        SELECT n_name AS s, r_name AS t FROM nation JOIN region ON n_regionkey = r_regionkey),
      verts AS (SELECT s AS name FROM edges UNION SELECT t AS name FROM edges),
      ids AS (SELECT name, CAST(row_number() OVER (ORDER BY name) AS INT) AS id FROM verts)
      SELECT i1.id AS s_id, i2.id AS t_id
      FROM edges JOIN ids i1 ON edges.s = i1.name JOIN ids i2 ON edges.t = i2.name
      ORDER BY s_id, t_id"""))

  /** U1 schema-aligned union (hostlinks_to_graph.py:131-136). */
  val u1Union: QueryDef = QueryDef(
    "u1_union",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(su).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT nationkey, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
      GROUP BY nationkey"""))

  /** U2 distinct (hostlinks_to_graph.py:82-83). */
  val u2Distinct: QueryDef = QueryDef(
    "u2_distinct",
    (s, dir) => t(s, dir, "customer").select(col("c_mktsegment").as("mktsegment")).distinct(),
    Some("SELECT DISTINCT c_mktsegment AS mktsegment FROM customer"))

  /** U3 dropDuplicates on full projection (wat_extract_links.py:314). */
  val u3DropDuplicates: QueryDef = QueryDef(
    "u3_drop_duplicates",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderstatus")).dropDuplicates(),
    Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders"))

  /** U4 dropna (hostlinks_to_graph.py:89). */
  val u4DropNa: QueryDef = QueryDef(
    "u4_dropna",
    (s, dir) => t(s, dir, "orders")
      .withColumn("status", when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_orderstatus")))
      .na.drop(Seq("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n")),
    Some("""SELECT status, COUNT(*) AS n FROM (
      SELECT nullif(o_orderstatus, 'O') AS status FROM orders)
      WHERE status IS NOT NULL GROUP BY status"""))

  /** O1+O8 global sort + limit → Spark plans TakeOrderedAndProject
    * (no full sort at scale).
    */
  val o1TopN: QueryDef = QueryDef(
    "o1_topn",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10),
    Some("""SELECT c_custkey, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10"""))

  /** Grouped top-k, declared as the row_number-filter idiom on
    * PURPOSE: Spark's InferWindowGroupLimit rewrites it into a
    * WindowGroupLimit pair — a PARTIAL group-limit before the shuffle
    * (each map task keeps only k rows per group it sees, a bounded
    * heap instead of a sort) and a FINAL one after — so the exchange
    * moves O(k·groups·tasks) rows, not the corpus. A hand-built top-k
    * aggregate would re-implement exactly this; the declarative form
    * gets it from Catalyst and WindowGroupLimitSpec pins the rewrite
    * so a conf or version change that silently drops back to the full
    * window sort fails by name.
    */
  val o9GroupedTopK: QueryDef = QueryDef(
    "o9_grouped_topk",
    (s, dir) => ScaleUtils.groupedTopK(
        t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"), col("l_extendedprice"),
            col("l_orderkey"), col("l_linenumber")),
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 5)
      .withColumn("rk", col("rk").cast("long")),
    Some("""SELECT l_returnflag, l_linestatus, l_extendedprice, l_orderkey,
        l_linenumber, rk FROM (
      SELECT l_returnflag, l_linestatus, l_extendedprice, l_orderkey,
             l_linenumber,
             row_number() OVER (PARTITION BY l_returnflag, l_linestatus
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      FROM lineitem) WHERE rk <= 5"""))

  /** O7 self-loop filter (hostlinks_to_graph.py:155-158). */
  val o7SelfLoopFilter: QueryDef = QueryDef(
    "o7_selfloop_filter",
    (s, dir) => t(s, dir, "orders")
      .select((col("o_custkey") % 100).as("s"), (col("o_orderkey") % 100).as("t"))
      .filter(col("s") =!= col("t"))
      .agg(count(lit(1)).as("cnt")),
    Some("""SELECT COUNT(*) AS cnt FROM (
      SELECT o_custkey % 100 AS s, o_orderkey % 100 AS t FROM orders)
      WHERE s <> t"""))

  /** P14 field split (linkmap2parquet.py:15-24). */
  val p14SplitPart: QueryDef = QueryDef(
    "p14_split_part",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_custkey"), element_at(split(col("c_name"), "#"), 2).as("name_num")),
    Some("SELECT c_custkey, split_part(c_name, '#', 2) AS name_num FROM customer"))

  /** §2.7 scalar-function battery: lower/trim/concat_ws/regexp_extract/
    * length — all codegen'd built-ins.
    */
  val fScalarStrings: QueryDef = QueryDef(
    "f_scalar_strings",
    (s, dir) => t(s, dir, "supplier").select(
      col("s_suppkey"),
      lower(col("s_name")).as("lname"),
      concat_ws("|", trim(col("s_name")), col("s_suppkey").cast("string")).as("joined"),
      regexp_extract(col("s_name"), "([0-9]+)", 1).as("num"),
      length(col("s_name")).as("len")),
    Some("""SELECT s_suppkey, lower(s_name) AS lname,
      concat_ws('|', trim(s_name), CAST(s_suppkey AS VARCHAR)) AS joined,
      regexp_extract(s_name, '([0-9]+)', 1) AS num,
      length(s_name) AS len FROM supplier"""))

  /** §2.7 temporal-function battery (the reference keeps WARC dates as
    * strings; these are the typed equivalents): year/quarter/month/day
    * extraction + date bucketing.
    */
  val fDatetime: QueryDef = QueryDef(
    "f_datetime",
    (s, dir) => t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"))
      .agg(count(lit(1)).as("n"),
        countDistinct(month(col("o_orderdate"))).as("n_months"),
        min(dayofmonth(col("o_orderdate"))).as("min_dom"),
        max(col("o_orderdate").cast("date")).as("max_date")),
    Some("""SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
      COUNT(*) AS n,
      COUNT(DISTINCT month(o_orderdate)) AS n_months,
      MIN(day(o_orderdate)) AS min_dom,
      MAX(CAST(o_orderdate AS DATE)) AS max_date
      FROM orders GROUP BY y, q"""))

  /** §2.7 array-function battery over the embeddings vectors: size,
    * element access, bounded slice — all columnar (no UDFs).
    */
  val fArrayFuncs: QueryDef = QueryDef(
    "f_array_funcs",
    (s, dir) => t(s, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first"),
        round(element_at(col("embedding"), -1).cast("double"), 6).as("last"),
        size(slice(col("embedding"), 1, 8)).as("slice_len")),
    Some("""SELECT vec_id, len(embedding) AS dim,
      round(CAST(embedding[1] AS DOUBLE), 6) AS first,
      round(CAST(embedding[-1] AS DOUBLE), 6) AS last,
      len(embedding[1:8]) AS slice_len
      FROM embeddings"""))

  /** Window: ranking (first N per key) over the events stream table.
    * `ts` orders identically whatever its physical encoding (int64 nanos
    * or µs timestamp — see Tables.tsMicros), so no normalization needed
    * where only ORDER semantics are consumed.
    */
  val w1RowNumber: QueryDef = QueryDef(
    "w1_row_number",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    },
    Some("""SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
      FROM events) WHERE rn <= 3"""))

  /** Window: running sum per key (exact decimal accumulation → double). */
  val w2RunningSum: QueryDef = QueryDef(
    "w2_running_sum",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), drunning(col("value"), w).as("running"))
    },
    Some("""SELECT user_id, event_id,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
      FROM events"""))

  /** Time-bucketed aggregation over the stream table (batch view of the
    * Structured Streaming windowed agg in graft.streaming).
    */
  val w3DailyRollup: QueryDef = QueryDef(
    "w3_daily_rollup",
    (s, dir) => {
      val ev = t(s, dir, "events")
      ev.select(to_date(graft.util.Tables.tsTimestamp(ev)).as("day"),
        col("event_type"), col("value"))
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
    },
    Some("""SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
      FROM events GROUP BY CAST(ts AS DATE), event_type"""))

  /** JSON field extraction (WAT-payload analogue, json_importer.py:6-12):
    * get_json_object is codegen'd Jackson under the hood.
    */
  val eJsonExtract: QueryDef = QueryDef(
    "e_json_extract",
    (s, dir) => t(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("kmod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("ktotal")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS kmod,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS ktotal
      FROM events GROUP BY kmod"""))

  /** O2: scalable contiguous-ID assignment via sortBy+zipWithIndex
    * (hostlinks_to_graph.py:101-111 — the multi-partition vertex-ID mode).
    * Oracle: row_number()-1 over the same ordering.
    */
  val o2ZipWithIndex: QueryDef = QueryDef(
    "o2_zipwithindex",
    (s, dir) => {
      import s.implicits._
      val names = t(s, dir, "customer").select(col("c_name")).distinct().as[String]
      val rdd = names.rdd.sortBy(identity, ascending = true, numPartitions = 4)
        .zipWithIndex()
      s.createDataFrame(rdd).toDF("name", "id")
    },
    Some("""SELECT c_name AS name, CAST(row_number() OVER (ORDER BY c_name) - 1 AS BIGINT) AS id
      FROM (SELECT DISTINCT c_name FROM customer)"""))

  /** Exact percentiles (extension beyond the reference, which has no
    * median/quantiles — SURVEY §2.3). Spark `percentile` and DuckDB
    * `quantile_cont` both use linear interpolation on the sorted values;
    * rounded to 4 decimals for cross-engine float stability.
    */
  val a8Percentiles: QueryDef = QueryDef(
    "a8_percentiles",
    (s, dir) => t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99")),
    Some("""SELECT o_orderpriority,
      round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      FROM orders GROUP BY o_orderpriority"""))

  /** Salted two-phase aggregation (ScaleUtils) — oracle-checked: the
    * salt must be algebraically invisible, so DuckDB's direct SUM is the
    * ground truth for the salted plan.
    */
  val a9SaltedSum: QueryDef = QueryDef(
    "a9_salted_sum",
    (s, dir) => ScaleUtils.saltedSum(
      t(s, dir, "lineitem"), Seq("l_returnflag"), "l_orderkey", salts = 16),
    Some("""SELECT l_returnflag, CAST(SUM(l_orderkey) AS BIGINT) AS sum_l_orderkey
      FROM lineitem GROUP BY l_returnflag"""))

  /** Semi join (EXISTS): segments of customers having an order in 1996. */
  val j3SemiJoin: QueryDef = QueryDef(
    "j3_semi_join",
    (s, dir) => {
      val o96 = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      t(s, dir, "customer")
        .join(o96, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n FROM customer
      WHERE c_custkey IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
      GROUP BY c_mktsegment"""))

  /** Anti join (NOT EXISTS): customers with no orders at all. */
  val j4AntiJoin: QueryDef = QueryDef(
    "j4_anti_join",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_customers_no_orders")),
    Some("""SELECT COUNT(*) AS n_customers_no_orders FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"""))

  /** ROLLUP hierarchy totals (grouping-sets family; Catalyst Expand). */
  val a7Rollup: QueryDef = QueryDef(
    "a7_rollup",
    (s, dir) => t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  /** U5 set intersection: customer keys that placed an order. INTERSECT
    * is a shuffle on the full row as key — both sides dedupe map-side.
    */
  val u5Intersect: QueryDef = QueryDef(
    "u5_intersect",
    (s, dir) => t(s, dir, "customer").select(col("c_custkey").as("k"))
      .intersect(t(s, dir, "orders").select(col("o_custkey").as("k")))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("ktotal")),
    Some("""SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS ktotal FROM (
      SELECT c_custkey AS k FROM customer
      INTERSECT
      SELECT o_custkey AS k FROM orders)"""))

  /** U6 set difference: customer keys with no orders (EXCEPT — the set-op
    * sibling of j4's anti join; same answer, different plan shape).
    */
  val u6Except: QueryDef = QueryDef(
    "u6_except",
    (s, dir) => t(s, dir, "customer").select(col("c_custkey").as("k"))
      .except(t(s, dir, "orders").select(col("o_custkey").as("k")))
      .agg(count(lit(1)).as("n")),
    Some("""SELECT COUNT(*) AS n FROM (
      SELECT c_custkey AS k FROM customer
      EXCEPT
      SELECT o_custkey AS k FROM orders)"""))

  /** J5 full outer join: per-custkey order counts vs high-balance
    * customers; the summary agg classifies matched/left-only/right-only
    * so null semantics on both engines are exercised and compared.
    */
  val j5FullOuter: QueryDef = QueryDef(
    "j5_full_outer",
    (s, dir) => {
      val oc = t(s, dir, "orders").groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"))
      val hc = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k2"))
      oc.join(hc, col("k") === col("k2"), "full_outer")
        .agg(
          sum(when(col("k").isNotNull && col("k2").isNotNull, 1).otherwise(0)).as("matched"),
          sum(when(col("k2").isNull, 1).otherwise(0)).as("orders_only"),
          sum(when(col("k").isNull, 1).otherwise(0)).as("high_bal_only"))
    },
    Some("""SELECT
      CAST(SUM(CASE WHEN k IS NOT NULL AND k2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
      CAST(SUM(CASE WHEN k2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_only,
      CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS high_bal_only
      FROM (SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) oc
      FULL OUTER JOIN (SELECT c_custkey AS k2 FROM customer WHERE c_acctbal > 5000) hc
      ON k = k2"""))

  /** A10 pivot-style conditional aggregation: order-priority counts as
    * columns per year — the `pivot` shape with a static column list
    * (CASE/FILTER aggregates; one pass, one shuffle).
    */
  val a10Pivot: QueryDef = QueryDef(
    "a10_pivot",
    (s, dir) => t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"))
      .agg(
        sum(when(col("o_orderpriority").startsWith("1"), 1).otherwise(0)).as("urgent"),
        sum(when(col("o_orderpriority").startsWith("2"), 1).otherwise(0)).as("high"),
        sum(when(!col("o_orderpriority").startsWith("1") &&
          !col("o_orderpriority").startsWith("2"), 1).otherwise(0)).as("other")),
    Some("""SELECT year(o_orderdate) AS y,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
      CAST(SUM(CASE WHEN o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS BIGINT) AS high,
      CAST(SUM(CASE WHEN o_orderpriority NOT LIKE '1%' AND o_orderpriority NOT LIKE '2%'
        THEN 1 ELSE 0 END) AS BIGINT) AS other
      FROM orders GROUP BY year(o_orderdate)"""))

  /** §2.7 math-function battery: abs/ceil/floor/sqrt/ln/pmod — codegen'd
    * built-ins, rounded to pin cross-engine float formatting.
    */
  val fMathFuncs: QueryDef = QueryDef(
    "f_math_funcs",
    (s, dir) => t(s, dir, "supplier").select(
      col("s_suppkey"),
      abs(col("s_acctbal")).as("abal"),
      ceil(col("s_acctbal")).as("cbal"),
      floor(col("s_acctbal")).as("fbal"),
      round(sqrt(abs(col("s_acctbal"))), 6).as("sq"),
      round(log(abs(col("s_acctbal")) + 1.0), 6).as("ln1p"),
      pmod(col("s_suppkey"), lit(7)).as("m7")),
    Some("""SELECT s_suppkey, abs(s_acctbal) AS abal,
      CAST(ceil(s_acctbal) AS BIGINT) AS cbal,
      CAST(floor(s_acctbal) AS BIGINT) AS fbal,
      round(sqrt(abs(s_acctbal)), 6) AS sq,
      round(ln(abs(s_acctbal) + 1.0), 6) AS ln1p,
      s_suppkey % 7 AS m7 FROM supplier"""))

  /** §2.7 conditional/null-handling battery: coalesce/nullif/greatest/
    * least/CASE — null semantics compared cross-engine.
    */
  val fCondNull: QueryDef = QueryDef(
    "f_cond_null",
    (s, dir) => t(s, dir, "orders").select(
      col("o_orderkey"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("none")).as("status_nz"),
      greatest(col("o_totalprice"), lit(100000.0)).as("hi"),
      least(col("o_totalprice"), lit(100000.0)).as("lo"),
      when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("urgent")),
    Some("""SELECT o_orderkey,
      coalesce(nullif(o_orderstatus, 'O'), 'none') AS status_nz,
      greatest(o_totalprice, 100000.0) AS hi,
      least(o_totalprice, 100000.0) AS lo,
      CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS INT) AS urgent
      FROM orders"""))

  /** AS-OF join (point-in-time lookup): every click event picks up the
    * value of the same user's most recent purchase at-or-before it —
    * the operator behind feature backfills ("state of X when Y
    * happened") that Spark has no native join type for.
    *
    * Spark-first shape: NO join at all. Both event streams union, one
    * shuffle partitions by user, and a backward-fill window
    * (`last(value, ignoreNulls)` over ts order) carries each purchase
    * forward to the clicks after it — O(n log n) in the partition sort,
    * versus the O(clicks × purchases) per-user blowup of the naive
    * inequality join. Skew = events per user, bounded by construction.
    * Ordering is total (ts, kind, event_id with purchases first at
    * equal ts), so ties resolve identically on both engines; the oracle
    * mirrors the window formulation (DuckDB's native ASOF JOIN leaves
    * equal-timestamp winners unspecified).
    */
  val j6AsofJoin: QueryDef = QueryDef(
    "j6_asof_join",
    (s, dir) => {
      // µs normal form whatever the physical encoding (nanos-as-long or
      // micros timestamp — Tables.tsMicros branches): DuckDB's TIMESTAMP
      // is µs, so ordering and output must use µs on both engines or
      // sub-µs digits diverge
      val raw = t(s, dir, "events")
      val ev = raw
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"),
          graft.util.Tables.tsMicros(raw).as("ts_us"),
          when(col("event_type") === "purchase", 0).otherwise(1).as("kind"),
          when(col("event_type") === "purchase", col("value")).as("pv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Long.MinValue, 0)
      ev.withColumn("av", last(col("pv"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round(coalesce(col("av"), lit(-1.0)), 6).as("asof_value"))
    },
    Some("""WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
          CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events WHERE event_type IN ('click', 'purchase')),
      f AS (SELECT event_id, user_id, ts_us, kind,
          last_value(pv IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av
        FROM u)
      SELECT event_id, user_id, ts_us,
        round(COALESCE(av, -1.0), 6) AS asof_value
      FROM f WHERE kind = 1"""))

  /** Range join (interval × point) without a nested-loop join: events
    * against 50 synthesized time intervals (deterministic arithmetic
    * over the corpus min/max, overlapping by construction). Spark plans
    * a raw `BETWEEN` join as BroadcastNestedLoopJoin — fine for 50
    * intervals, quadratic death at 100 TB with a real interval table —
    * so both sides bucketize: intervals explode into the fixed-width
    * buckets they overlap, events compute their single bucket
    * arithmetically, and the join is a plain hash equi-join on the
    * bucket with the exact BETWEEN as a post-filter. An event lands in
    * exactly one bucket, so no dedup pass is needed. Value mass sums
    * 6dp-rounded decimals — order-independent, bit-equal on both
    * engines.
    */
  val j7RangeJoin: QueryDef = QueryDef(
    "j7_range_join",
    (s, dir) => {
      // µs like j6 (adaptive via Tables.tsMicros); all bucket arithmetic
      // is INTEGER division (`div`): `/` on longs widens to double,
      // whose 53-bit mantissa misplaces µs-scale boundaries — and both
      // engines' integer semantics must coincide
      val raw = t(s, dir, "events")
      val e = raw
        .select(col("event_id"), graft.util.Tables.tsMicros(raw).as("ts_us"), col("value"))
      // the 1-row stats aggregate rides a broadcast NLJ onto each side
      // (bounded by construction — PlanAuditSpec allow-lists it like the
      // other 1-row-stats queries); the interval×event join below is the
      // keyed equi-join doing the real work
      val stats = e.agg(min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx"))
        .select(col("mn"), greatest(expr("(mx - mn) div 50"), lit(1L)).as("step"))
      val iv = s.range(50).toDF("iv_id").crossJoin(broadcast(stats))
        .select(col("iv_id"), col("mn"), col("step"),
          (col("mn") + col("iv_id") * col("step")).as("lo"),
          (col("mn") + col("iv_id") * col("step")
            + expr("(iv_id % 3 + 1) * step div 2")).as("hi"))
      val ivb = iv.select(col("iv_id"), col("lo"), col("hi"),
        explode(sequence(expr("(lo - mn) div step"),
          expr("(hi - mn) div step"))).as("bucket"))
      val eb = e.crossJoin(broadcast(stats))
        .select(col("event_id"), col("ts_us"), col("value"),
          expr("(ts_us - mn) div step").as("bucket"))
      eb.join(ivb, "bucket")
        .filter(col("ts_us").between(col("lo"), col("hi")))
        .groupBy(col("iv_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value"), 6).cast(
            org.apache.spark.sql.types.DecimalType(38, 12))).cast("double").as("value_mass"))
    },
    Some("""WITH st AS (SELECT min(epoch_us(ts)) AS mn,
          greatest((max(epoch_us(ts)) - min(epoch_us(ts))) // 50, 1) AS step
        FROM events),
      iv AS (SELECT i AS iv_id, mn + i * step AS lo,
          mn + i * step + (i % 3 + 1) * step // 2 AS hi
        FROM st, unnest(generate_series(0, 49)) AS g(i))
      SELECT iv_id,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(round(value, 6) AS DECIMAL(38,12))) AS DOUBLE) AS value_mass
      FROM events e JOIN iv
        ON epoch_us(e.ts) BETWEEN iv.lo AND iv.hi
      GROUP BY iv_id"""))

  /** Ordered funnel over the event stream (view → click → purchase,
    * each step strictly after the user's first qualifying previous
    * step) — the classic product-analytics sequence query. Three keyed
    * join+aggs, all shuffles on user_id; step tables only ever shrink,
    * so the plan's working set is bounded by the step-1 user count at
    * any event volume.
    */
  val eventsFunnel: QueryDef = QueryDef(
    "events_funnel",
    (s, dir) => {
      val ev0 = t(s, dir, "events")
      val ev = ev0.select(col("user_id"), col("event_type"),
        graft.util.Tables.tsTimestamp(ev0).as("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("np"))
      v.agg(count(lit(1)).as("n_users")).withColumn("step", lit("1_view"))
        .unionByName(c.agg(count(lit(1)).as("n_users")).withColumn("step", lit("2_click")))
        .unionByName(p.agg(count(lit(1)).as("n_users")).withColumn("step", lit("3_purchase")))
        .select(col("step"), col("n_users"))
    },
    Some("""WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      p AS (SELECT e.user_id FROM events e
        JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
      SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
      UNION ALL SELECT '2_click', COUNT(*) FROM c
      UNION ALL SELECT '3_purchase', COUNT(*) FROM p"""))

  /** Cohort retention: users grouped by first-seen day, activity counted
    * per day offset — the other canonical event-analytics matrix. Two
    * shuffles keyed on user_id (first-touch agg + join back), final agg
    * keyed on (cohort_day, offset) whose cardinality is days², not
    * events. countDistinct is Spark's exact two-level expand aggregate.
    */
  val eventsCohort: QueryDef = QueryDef(
    "events_cohort_retention",
    (s, dir) => {
      val ev0 = t(s, dir, "events")
      val d = ev0.select(col("user_id"),
        to_date(graft.util.Tables.tsTimestamp(ev0)).as("day"))
      val first = d.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      d.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
      SELECT cohort_day, CAST(d.day - f.cohort_day AS INT) AS day_offset,
        COUNT(DISTINCT d.user_id) AS n_users
      FROM d JOIN f ON d.user_id = f.user_id
      GROUP BY cohort_day, day_offset"""))

  /** RFM segmentation — recency / frequency / monetary per user with
    * quartile scores, the classic user-value matrix. One keyed agg on
    * user_id produces the per-user table; quartile CUTOFFS (not
    * per-user ranks) come from [[ScaleUtils.cumCountDesc]]'s two-level
    * distributed ranking — the only global window runs over the
    * bounded bucket-subtotal table (days / bit-lengths / log₂ bands),
    * never user-cardinality data. Ties share a score by construction
    * (cutoff thresholds compare VALUES): ntile is avoided because its
    * remainder-distribution semantics differ across engines. Cutoff
    * index ceil(n·s/4) is the integer (n·s+3) div 4 on both engines.
    */
  val eventsRfm: QueryDef = QueryDef(
    "events_rfm",
    (s, dir) => {
      val ev0 = t(s, dir, "events")
      val perUser = ev0
        .select(col("user_id"), graft.util.Tables.tsMicros(ev0).as("us"),
          col("value"))
        .groupBy(col("user_id"))
        .agg(max(col("us")).as("last_us"), count(lit(1)).as("freq"),
          dsum(col("value")).as("monetary"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nUsers = broadcast(perUser.agg(count(lit(1)).as("n")))
      // ONE ranking pass for all three metrics: melt to (metric, value)
      // — values are exact in double (µs < 2^53, counts, 6dp-decimal
      // sums) — and let cumCountDesc partition by the metric, which
      // also makes its bucket-prefix window a keyed (non-global) one.
      val melted = perUser.select(explode(array(
        struct(lit("r").as("m"), col("last_us").cast("double").as("v")),
        struct(lit("f").as("m"), col("freq").cast("double").as("v")),
        struct(lit("m").as("m"), col("monetary").as("v")))).as("x"))
        .select(col("x.m").as("m"), col("x.v").as("v"))
      val bucketOf: Column => Column = v => when(col("m") === "r",
          floor(v / lit(86400000000.0)))
        .when(col("m") === "f", length(bin(v.cast("long"))).cast("long"))
        .otherwise(floor(log(2.0, greatest(v, lit(0.0)) + lit(1.0))))
      val cum = ScaleUtils.cumCountDesc(melted, "v", bucketOf, Seq("m"))
      def cutAt(s: Int) =
        max(when(col("cum") >= expr(s"(n * $s + 3) div 4"), col("v")))
      val cuts = broadcast(cum.crossJoin(nUsers).groupBy(col("m"))
        .agg(cutAt(1).as("c1"), cutAt(2).as("c2"), cutAt(3).as("c3"))
        .groupBy()
        .agg(
          max(when(col("m") === "r", col("c1"))).as("rc1"),
          max(when(col("m") === "r", col("c2"))).as("rc2"),
          max(when(col("m") === "r", col("c3"))).as("rc3"),
          max(when(col("m") === "f", col("c1"))).as("fc1"),
          max(when(col("m") === "f", col("c2"))).as("fc2"),
          max(when(col("m") === "f", col("c3"))).as("fc3"),
          max(when(col("m") === "m", col("c1"))).as("mc1"),
          max(when(col("m") === "m", col("c2"))).as("mc2"),
          max(when(col("m") === "m", col("c3"))).as("mc3")))
      def scoreOf(v: Column, pfx: String) =
        when(v >= col(s"${pfx}1"), 1).when(v >= col(s"${pfx}2"), 2)
          .when(v >= col(s"${pfx}3"), 3).otherwise(4)
      val out = perUser
        .crossJoin(cuts)
        .select(col("monetary"),
          scoreOf(col("last_us").cast("double"), "rc").as("r_score"),
          scoreOf(col("freq").cast("double"), "fc").as("f_score"),
          scoreOf(col("monetary"), "mc").as("m_score"))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          dsum(col("monetary")).as("segment_value"))
      perUser.unpersist(blocking = false)
      out
    },
    // the oracle needs no buckets — its cumulative window is the plain
    // one-partition form cumCountDesc decomposes
    Some("""WITH per_user AS (
        SELECT user_id, MAX(epoch_us(ts)) AS last_us, COUNT(*) AS freq,
               CAST(SUM(CAST(round(value, 6) AS DECIMAL(25,6))) AS DOUBLE) AS monetary
        FROM events GROUP BY user_id),
      tot AS (SELECT COUNT(*) AS n FROM per_user),
      rcum AS (SELECT v, SUM(c) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT last_us AS v, COUNT(*) AS c FROM per_user GROUP BY 1)),
      fcum AS (SELECT v, SUM(c) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT freq AS v, COUNT(*) AS c FROM per_user GROUP BY 1)),
      mcum AS (SELECT v, SUM(c) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT monetary AS v, COUNT(*) AS c FROM per_user GROUP BY 1)),
      rcut AS (SELECT MAX(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) AS rc1,
                      MAX(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) AS rc2,
                      MAX(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) AS rc3
               FROM rcum, tot),
      fcut AS (SELECT MAX(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) AS fc1,
                      MAX(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) AS fc2,
                      MAX(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) AS fc3
               FROM fcum, tot),
      mcut AS (SELECT MAX(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) AS mc1,
                      MAX(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) AS mc2,
                      MAX(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) AS mc3
               FROM mcum, tot),
      scored AS (
        SELECT monetary,
          CASE WHEN last_us >= rc1 THEN 1 WHEN last_us >= rc2 THEN 2
               WHEN last_us >= rc3 THEN 3 ELSE 4 END AS r_score,
          CASE WHEN freq >= fc1 THEN 1 WHEN freq >= fc2 THEN 2
               WHEN freq >= fc3 THEN 3 ELSE 4 END AS f_score,
          CASE WHEN monetary >= mc1 THEN 1 WHEN monetary >= mc2 THEN 2
               WHEN monetary >= mc3 THEN 3 ELSE 4 END AS m_score
        FROM per_user, rcut, fcut, mcut)
      SELECT r_score, f_score, m_score, COUNT(*) AS n_users,
             CAST(SUM(CAST(round(monetary, 6) AS DECIMAL(25,6))) AS DOUBLE) AS segment_value
      FROM scored GROUP BY r_score, f_score, m_score"""))

  /** Hopping (sliding) window aggregation — window('10 minutes',
    * slide '5 minutes'): each event expands into ceil(size/slide)=2
    * window instances via Spark's Expand, then one keyed agg. The
    * other time-window shape beside w3's tumbling daily rollup and the
    * streaming 5-minute windows; the oracle replays the expansion with
    * two aligned time_buckets.
    */
  val w4HoppingWindow: QueryDef = QueryDef(
    "w4_hopping_window",
    (s, dir) => {
      val ev0 = t(s, dir, "events")
      ev0.select(graft.util.Tables.tsTimestamp(ev0).as("ts"), col("event_type"))
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("win_epoch"),
          col("event_type"), col("n"))
    },
    Some("""SELECT CAST(epoch(win_start) AS BIGINT) AS win_epoch, event_type,
        COUNT(*) AS n
      FROM (
        SELECT event_type,
          unnest([time_bucket(INTERVAL '5 minutes', ts),
                  time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
            AS win_start,
          ts
        FROM events)
      WHERE ts >= win_start AND ts < win_start + INTERVAL '10 minutes'
      GROUP BY win_epoch, event_type"""))

  /** Approximate-distinct audit — at 100 TB, exact countDistinct over a
    * high-cardinality key pays a full two-phase expand shuffle; the
    * scale path is HyperLogLog++ (`approx_count_distinct`, one pass,
    * merge-order-independent so deterministic at any parallelism). This
    * query runs BOTH and emits the exact count plus a 5%-bound check on
    * the sketch — the oracle asserts the bound holds (DuckDB computes
    * exact and expects `true`), so a broken sketch path goes red rather
    * than unnoticed. Sketch rsd is 1% against a 5% assertion — a 5σ
    * margin, because rsd is a STANDARD DEVIATION, not a bound: at
    * sf0.1's 1500-user cardinality the default 5%-rsd sketch exceeded
    * its own σ on every group (dense-mode bias), which is exactly the
    * lesson this audit encodes.
    */
  val approxDistinctAudit: QueryDef = QueryDef(
    "approx_distinct_audit",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("within_5pct")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      true AS within_5pct
      FROM events GROUP BY event_type"""))

  /** HLL sketch MERGEABILITY — the pattern behind incremental
    * distinct-count tables at 100 TB: per-slice (here per-day) HLL
    * sketches are small binary aggregates computed once in the
    * slice's ingest pass, and every rollup after that (global,
    * rolling-window, per-month) is a sketch UNION over the tiny
    * sketch table — no rescan of the raw corpus, unlike
    * COUNT(DISTINCT) which cannot be composed from per-slice exacts.
    * The audit merges the daily sketches and checks the estimate
    * against the true global distinct within 5% (lgK=12 HLL++ σ is
    * ~1.6%, so this is a >3σ bound); DataSketches HLL is
    * deterministic for a given input multiset, so the flag is a
    * stable value, not a flaky assertion. The exact side rides a
    * constant-key 1×1 broadcast hash join (not a cartesian).
    */
  val sketchMergeAudit: QueryDef = QueryDef(
    "sketch_merge_audit",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val daily = ev.select(to_date(graft.util.Tables.tsTimestamp(ev)).as("day"),
          col("user_id"))
        .groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.agg(count(lit(1)).as("n_days"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .withColumn("k", lit(1))
      val exact = ev.agg(countDistinct(col("user_id")).as("exact_users"))
        .withColumn("k", lit(1))
      merged.join(exact, "k")
        .select(col("n_days"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("merged_within_5pct"))
    },
    Some("""SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
      COUNT(DISTINCT user_id) AS exact_users, true AS merged_within_5pct
      FROM events"""))

  /** One summary build per (session, sf dir) — the "one corpus pass"
    * the rewrite amortizes; repeated invocations (bench runs 3×, the
    * audit suites walk the registry) reuse the first build.
    */
  private val mvSummaries = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Session scoping for the MV rewrite: the summary declaration and the
    * optimizer-rule registration live in a DEDICATED child session
    * (`newSession()` — shared SparkContext/catalog-less state, isolated
    * SQLConf + experimental methods), so the navigation rule can only
    * ever fire on the mv_* queries' own plans. Declaring on the caller's
    * session would persist for its lifetime and silently redirect ANY
    * later eligible lineitem aggregate to the summary — value-exact, but
    * plan-changing for unrelated queries and stale-data-prone if the
    * fixture dir were regenerated in place (ADVICE r9).
    */
  private val mvSessions =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()
  private def mvScopedSession(s: SparkSession): SparkSession =
    graft.util.Caches.fill(mvSessions, s.sparkContext.applicationId)(s.newSession())

  /** Materialized-summary aggregate navigation, oracle-checked end to
    * end: the query declares a (l_returnflag, l_linestatus) summary of
    * lineitem via spark.graft.summary.* and runs a dims-filtered
    * grouped aggregate; graft.plans.SummaryAggRewrite redirects it to
    * the summary table at optimization time, and the DuckDB oracle —
    * which always reads the raw fact — proves the rewritten plan is
    * value-exact (decimal sums re-aggregate associatively; counts and
    * min/max compose). MvRewriteSpec additionally asserts the executed
    * plan scans the summary, not the fact, and that ineligible shapes
    * decline. At 100 TB this turns every dashboard-shaped aggregate
    * over the fact into a scan of a few-thousand-row table.
    */
  val mvRewriteAgg: QueryDef = QueryDef(
    "mv_rewrite_agg",
    (s0, dir) => {
      import graft.plans.SummaryAggRewrite
      val sumPath = graft.util.Caches.fill(mvSummaries, s0.sparkContext.applicationId + ":" + dir,
        (d: String) => graft.util.FileTrees.rmTree(d)) {
          val p = java.nio.file.Files.createTempDirectory("graft_mv").toString
          SummaryAggRewrite.writeSummary(t(s0, dir, "lineitem"),
            Seq("l_returnflag", "l_linestatus"),
            Seq("l_quantity", "l_extendedprice"), p)
          p
        }
      // declaration + rule registration on the mv-scoped child session
      // ONLY — the caller's session stays untouched (see mvScopedSession)
      val s = mvScopedSession(s0)
      // an extensions-built session already injected the rule; adding
      // it to extraOptimizations too would run it twice per plan
      val viaExtensions = s.conf.getOption("spark.sql.extensions")
        .exists(_.contains("GraftExtensions"))
      if (!viaExtensions &&
          !s.experimental.extraOptimizations.contains(SummaryAggRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ SummaryAggRewrite
      SummaryAggRewrite.declare(s, s"$dir/lineitem.parquet", sumPath,
        Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice"))
      t(s, dir, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
      FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag"""))

  /** Rollup composition through the SAME summary: grouping by a
    * strict subset of the summary dims forces the rewrite to
    * re-aggregate across the collapsed dim (SUM of per-(flag,status)
    * counts and decimal sums over status) — the property that makes
    * one summary serve the whole rollup lattice, not just its exact
    * grain. Shares mv_rewrite_agg's summary build and declaration.
    */
  val mvRollupAgg: QueryDef = QueryDef(
    "mv_rollup_agg",
    (s0, dir) => {
      mvRewriteAgg.fn(s0, dir) // ensures summary exists + declaration set
      t(mvScopedSession(s0), dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
    },
    Some("""SELECT l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
      MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_linestatus"""))

  /** AVG composition through the same summary: avg(CAST(m AS
    * DECIMAL(25,6))) decomposes into SUM(sum_m)/SUM(cnt) evaluated by
    * Average's own division (SummaryAggRewrite) — the most common
    * rollup aggregate served from the MV. The oracle replays Spark's
    * decimal semantics with exact integer arithmetic: sums in 1e-6
    * units (HUGEINT), the scale-10 HALF_UP quotient as
    * (u·10⁴·2 + n) // (2n), one correctly-rounded double conversion,
    * round 6 — engine-stable where naive decimal division scale rules
    * are not.
    */
  val mvRewriteAvg: QueryDef = QueryDef(
    "mv_rewrite_avg",
    (s0, dir) => {
      mvRewriteAgg.fn(s0, dir) // ensures summary exists + declaration set
      val dec = org.apache.spark.sql.types.DecimalType(25, 6)
      t(mvScopedSession(s0), dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("l_quantity").cast(dec)).cast("double"), 6).as("avg_qty"),
          round(avg(col("l_extendedprice").cast(dec)).cast("double"), 6).as("avg_price"))
    },
    Some("""WITH g AS (SELECT l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) * 1000000 AS HUGEINT) AS uq,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) * 1000000 AS HUGEINT) AS up
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_linestatus)
      SELECT l_linestatus, n,
        round(CAST((uq * 10000 * 2 + n) // (2 * n) AS DOUBLE) / 10000000000.0, 6) AS avg_qty,
        round(CAST((up * 10000 * 2 + n) // (2 * n) AS DOUBLE) / 10000000000.0, 6) AS avg_price
      FROM g"""))

  /** Join-key skew diagnostics — the report you run BEFORE deciding to
    * salt (a9_salted_sum) or lean on AQE's skew-join split: per-key
    * frequency histogram over decimal-digit buckets (integer-exact on
    * both engines where floor(log) is not), plus each bucket's heaviest
    * key. Two keyed aggs; the histogram cardinality is digits(max
    * count) ≈ 10 rows at any scale. Tie on max_key broken by the packed
    * (cnt, -key)-max so both engines pick the same key.
    */
  val skewReport: QueryDef = QueryDef(
    "skew_report",
    (s, dir) => {
      val keyCounts = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      keyCounts
        .groupBy(length(col("c").cast("string")).as("bucket_digits"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_in_bucket"),
          // argmax by (count, lowest key): pack into one orderable
          // struct so the tie-break is explicit on both engines
          max(struct(col("c"), (-col("l_orderkey")).as("nk")))("nk").as("neg_max_key"))
        .select(col("bucket_digits"), col("n_keys"), col("n_rows"),
          col("max_in_bucket"), (-col("neg_max_key")).as("heaviest_key"))
    },
    // oracle replays the argmax with an explicit window (same
    // (c DESC, key ASC) pick the packed struct-max makes in Spark)
    Some("""WITH kc AS (
        SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey),
      b AS (SELECT l_orderkey, c,
              CAST(length(CAST(c AS VARCHAR)) AS INT) AS bucket_digits
            FROM kc),
      agg AS (SELECT bucket_digits, COUNT(*) AS n_keys,
                CAST(SUM(c) AS BIGINT) AS n_rows, MAX(c) AS max_in_bucket
              FROM b GROUP BY bucket_digits),
      h AS (SELECT bucket_digits, l_orderkey AS heaviest_key FROM (
              SELECT bucket_digits, l_orderkey,
                row_number() OVER (PARTITION BY bucket_digits
                  ORDER BY c DESC, l_orderkey) AS rn
              FROM b) WHERE rn = 1)
      SELECT agg.bucket_digits, n_keys, n_rows, max_in_bucket, heaviest_key
      FROM agg JOIN h ON agg.bucket_digits = h.bucket_digits"""))

  /** Quantile-sketch audit — the percentile companion to
    * approx_distinct_audit: percentile_approx (GK sketch, rank error
    * ≤ n/accuracy, the scale path for percentiles over event volume)
    * checked against EXACT rank bounds from the same two-level
    * cumCountDesc ranking events_rfm uses. The oracle computes the
    * exact bound values and asserts containment, so both the bound
    * VALUES and the sketch's contract are hash-checked.
    */
  val approxQuantileAudit: QueryDef = QueryDef(
    "approx_quantile_audit",
    (s, dir) => {
      val acc = 1000
      val ev = t(s, dir, "events").select(col("event_type"), col("value").as("v"))
      // ONE aggregation computes both the exact count and the sketch —
      // they group by the same key, and splitting them re-scanned the
      // events table; the tiny per-type frame is checkpointed because
      // it feeds both the bounds join and the final projection
      val n = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          percentile_approx(col("v"), lit(0.5), lit(acc)).as("p50_approx"))
        .stableCheckpoint()
      val cum = ScaleUtils.cumCountDesc(ev, "v",
        v => floor(v / lit(8.0)), Seq("event_type"))
      // from-top median rank k = (n+1) div 2; tolerance t = 2·n/acc + 2:
      // the GK guarantee is ±n/acc of SOME median-rank convention, and
      // Spark's target rank differs from ours by up to one — double the
      // guarantee plus the off-by-ones keeps the audit meaningful (a
      // ~6-of-2000 rank window) without false alarms
      val bounds = cum.join(n.select(col("event_type"), col("n")), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("cum") >= expr(s"(n + 1) div 2 + (2 * (n div $acc) + 2)"),
            col("v"))).as("p50_lo"),
          max(when(col("cum") >= expr(s"greatest((n + 1) div 2 - (2 * (n div $acc) + 2), 1)"),
            col("v"))).as("p50_hi"))
      n.join(bounds, Seq("event_type"))
        .select(col("event_type"), col("n").as("n_events"),
          col("p50_lo"), col("p50_hi"),
          col("p50_approx").between(col("p50_lo"), col("p50_hi"))
            .as("approx_within_bounds"))
    },
    Some("""WITH v6 AS (SELECT event_type, value AS v FROM events),
      n AS (SELECT event_type, COUNT(*) AS n FROM v6 GROUP BY event_type),
      cum AS (SELECT event_type, v,
          SUM(c) OVER (PARTITION BY event_type ORDER BY v DESC
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM (SELECT event_type, v, COUNT(*) AS c FROM v6 GROUP BY 1, 2)),
      b AS (SELECT cum.event_type,
          MAX(CASE WHEN cum >= (n + 1) // 2 + (2 * (n // 1000) + 2) THEN v END) AS p50_lo,
          MAX(CASE WHEN cum >= greatest((n + 1) // 2 - (2 * (n // 1000) + 2), 1) THEN v END) AS p50_hi
        FROM cum JOIN n ON cum.event_type = n.event_type
        GROUP BY cum.event_type)
      SELECT n.event_type, n.n AS n_events, p50_lo, p50_hi,
        true AS approx_within_bounds
      FROM n JOIN b ON n.event_type = b.event_type"""))

  /** TPC-H Q7 shape — bidirectional nation-pair trade volume: the
    * classic multi-dimension fact join with a disjunctive pair
    * predicate. Both nation joins broadcast; the one big shuffle is
    * orders⋈lineitem on the order key; yearly volumes partial-agg
    * before the final (n1, n2, year) group.
    */
  val q7NationVolume: QueryDef = QueryDef(
    "q7_nation_volume",
    (s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("supp_nk"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("cust_nk"),
        col("n_name").as("cust_nation"))
      t(s, dir, "supplier").join(t(s, dir, "lineitem"),
          col("s_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("supp_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("cust_nk"))
        // NATION_12/13 trade in both directions at every generated SF
        // (down to sf0.001) — a pair with one-way-only trade would zero
        // out a branch of the disjunction on the small fixtures.
        .filter((col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_13") ||
          (col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_12"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INT) AS l_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_13')
         OR (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_12')
      GROUP BY n1.n_name, n2.n_name, year(l_shipdate)"""))

  /** TPC-H Q10 shape — returned-item revenue top-20: fact-fact join
    * with a selective flag filter pushed to the lineitem scan, customer
    * dimension broadcast, TakeOrderedAndProject top-N (no global sort).
    */
  val q10ReturnedItems: QueryDef = QueryDef(
    "q10_returned_items",
    (s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** CUBE grouping sets — the one grouping-set operator a7's ROLLUP
    * doesn't cover: all 2^k aggregation granularities in ONE Expand +
    * hash agg (k× row expansion before the partial agg, never a
    * second scan). grouping_id disambiguates NULL-as-total from
    * NULL-as-value on both engines.
    */
  val a11Cube: QueryDef = QueryDef(
    "a11_cube",
    (s, dir) => t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"),
        grouping_id().as("gid")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS qty,
        CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Correlated scalar subquery — orders above their customer's own
    * average order value. Catalyst DECORRELATES this into a keyed
    * aggregate + join (RewriteCorrelatedScalarSubquery), so the
    * executed plan is two shuffles on o_custkey, not a per-row
    * subquery — the optimizer transformation this query exists to
    * exercise (and PlanAudit to guard).
    */
  val j8CorrelatedSubquery: QueryDef = QueryDef(
    "j8_correlated_subquery",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n_above,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_above
        FROM orders_v o
        WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders_v o2
                              WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_above,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_above
      FROM orders o
      WHERE o_totalprice > (SELECT AVG(o2.o_totalprice) FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
      GROUP BY o_orderpriority"""))

  /** Offset window functions over the events table — lead/lag/ntile/
    * percent_rank, the window surface w1/w2 (row_number, running sum)
    * don't cover. One shuffle on user_id, then every window computes in
    * the same sort pass (shared Window frame, same partition + order).
    * event_id is the tiebreak: (tsm, event_id) is a total order, so
    * offset results are deterministic under any partitioning. The
    * user_id filter pushes below the window to the scan (partition-wise
    * windows are independent), so the plan only sorts the five users.
    */
  val w5LeadLag: QueryDef = QueryDef(
    "w5_lead_lag",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_id"), col("event_type"),
          graft.util.Tables.tsMicros(ev).as("tsm"))
        .filter(col("user_id") < 5)
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsm"), col("event_id"))
      base.select(
        col("user_id"), col("event_id"), col("event_type"),
        round(((col("tsm") - lag(col("tsm"), 1).over(w)).cast(DoubleType)) / lit(1e6), 6)
          .as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"))
    },
    Some("""SELECT user_id, event_id, event_type,
        ROUND(CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS DOUBLE) / 1e6, 6) AS gap_s,
        LEAD(event_type) OVER w AS next_type,
        NTILE(4) OVER w AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS prank
      FROM events WHERE user_id < 5
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"""))

  /** TPC-H Q18 shape — large-order customers: an IN subquery over an
    * aggregate HAVING filter. Catalyst rewrites the IN into a left-semi
    * join on l_orderkey (RewritePredicateSubquery), so the executed plan
    * is the HAVING aggregate (partial+final on the lineitem scan) semi-
    * joined into the fact chain — no per-row subquery, and the semi join
    * key is the same o_orderkey the orders⋈lineitem shuffle already
    * uses. Threshold 250 keeps the match set non-empty at every SF
    * (25 orders at sf0.001, 2 285 at sf0.1).
    */
  val q18LargeOrders: QueryDef = QueryDef(
    "q18_large_orders",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q18_customer_v")
      t(s, dir, "orders").createOrReplaceTempView("q18_orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("q18_lineitem_v")
      s.sql("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
          CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
        FROM q18_customer_v JOIN q18_orders_v ON c_custkey = o_custkey
        JOIN q18_lineitem_v ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM q18_lineitem_v
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  /** TPC-H Q14 shape — promo revenue share per month: conditional
    * aggregation over a fact⋈dimension join. part projects to two
    * columns and broadcasts (dimension-sized — never a shuffle);
    * lineitem aggregates partial-then-final on the month key. The
    * promo/total split is one pass (two conditional accumulators),
    * not two scans; both sums accumulate exact decimal so the ratio
    * is reproducible under any partitioning.
    */
  val q14PromoRevenue: QueryDef = QueryDef(
    "q14_promo_revenue",
    (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("int").as("ym"))
        .agg(
          dsum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0))).as("promo_rev"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_rev"))
        .select(col("ym"),
          round(lit(100.0) * col("promo_rev") / col("total_rev"), 6).as("promo_pct"),
          col("promo_rev"), col("total_rev"))
    },
    Some("""SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS ym,
        ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE), 6) AS promo_pct,
        CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE) AS promo_rev,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY year(l_shipdate) * 100 + month(l_shipdate)"""))

  /** TPC-H Q4 shape — correlated EXISTS with a non-equi tail predicate
    * (late-shipping orders). Catalyst decorrelates to a left-semi join
    * on l_orderkey with the date comparison as the join's extra
    * condition; the selective o_orderdate range is pushed to the
    * orders scan, so the semi join's build side is one quarter, not
    * the table. Completes the subquery surface next to q18 (IN) and
    * j8 (correlated scalar).
    */
  val q4OrderPriority: QueryDef = QueryDef(
    "q4_order_priority",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("q4_orders_v")
      t(s, dir, "lineitem").createOrReplaceTempView("q4_lineitem_v")
      s.sql("""SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM q4_orders_v o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM q4_lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority"""))

  /** U7 multiset difference (EXCEPT ALL) — each customer key keeps
    * max(0, n_orders − 1) occurrences, so the result is only correct
    * under bag semantics (u6's set EXCEPT would return the empty
    * difference side). One shuffle on the key with per-key counts —
    * Spark plans a count-propagating aggregate, never a row-by-row
    * anti pass.
    */
  val u7ExceptAll: QueryDef = QueryDef(
    "u7_except_all",
    (s, dir) => t(s, dir, "orders").select(col("o_custkey").as("k"))
      .exceptAll(t(s, dir, "customer").select(col("c_custkey").as("k")))
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_keys")),
    Some("""SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS n_keys FROM (
      SELECT o_custkey AS k FROM orders
      EXCEPT ALL
      SELECT c_custkey AS k FROM customer)"""))

  /** U8 multiset intersection (INTERSECT ALL) — per supplier,
    * min(1996 shipments, 1997 shipments) occurrences survive; the
    * total is a bag-semantics answer set INTERSECT cannot produce.
    */
  val u8IntersectAll: QueryDef = QueryDef(
    "u8_intersect_all",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(year(col("l_shipdate")) === 1996).select(col("l_suppkey").as("k"))
        .intersectAll(
          li.filter(year(col("l_shipdate")) === 1997).select(col("l_suppkey").as("k")))
        .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("n_keys"))
    },
    Some("""SELECT COUNT(*) AS n, COUNT(DISTINCT k) AS n_keys FROM (
      SELECT l_suppkey AS k FROM lineitem WHERE year(l_shipdate) = 1996
      INTERSECT ALL
      SELECT l_suppkey AS k FROM lineitem WHERE year(l_shipdate) = 1997)"""))

  /** Value-based (RANGE) window frame — trailing 24h sum per user.
    * w2/w5 cover only ROWS frames; a RANGE frame's content is defined
    * by the ORDER BY value, so the result is tie-order independent by
    * construction. Same single user_id shuffle + one sort pass; both
    * engines accumulate over the identical ascending-ts frame, and the
    * 6dp round absorbs segment-tree vs running-sum ulp differences.
    */
  val w6RangeFrame: QueryDef = QueryDef(
    "w6_range_frame",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val base = ev.select(col("user_id"), col("event_id"), col("value"),
          graft.util.Tables.tsMicros(ev).as("tsm"))
        .filter(col("user_id") < 5)
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsm"))
        .rangeBetween(-86400000000L, Window.currentRow)
      base.select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 6).as("trail_24h"))
    },
    Some("""SELECT user_id, event_id,
        ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW), 6) AS trail_24h
      FROM events WHERE user_id < 5"""))

  /** UNPIVOT/melt — the inverse of a10's PIVOT: the wide per-flag
    * aggregate lands as (flag, metric, val) long-form rows. Spark
    * plans an Expand (3× row fan-out of the TINY aggregate output,
    * never the input), the same operator CUBE uses.
    */
  val a12Unpivot: QueryDef = QueryDef(
    "a12_unpivot",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount")).as("avg_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "val"),
    Some("""WITH agg AS (SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, metric, val FROM agg
      UNPIVOT (val FOR metric IN (sum_qty, sum_price, avg_disc))"""))

  /** TPC-H Q8 shape — national market share: the 6-table star join
    * (lineitem at the center; orders⋈customer on one arm, supplier on
    * the other, nation/region closing both). Share = conditional sum /
    * total sum in ONE aggregation pass; all dimension joins broadcast,
    * the two fact shuffles are on l_orderkey and nothing else.
    */
  val q8MarketShare: QueryDef = QueryDef(
    "q8_market_share",
    (s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("c_nk"),
        col("n_regionkey"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      val vol = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .filter(col("r_name") === "EUROPE")
        .select(year(col("o_orderdate")).cast("int").as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
          col("supp_nation"))
      vol.groupBy(col("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_3", col("volume"))
            .otherwise(lit(0.0))).as("nation_vol"),
          dsum(col("volume")).as("total_vol"))
        .select(col("o_year"),
          round(col("nation_vol") / col("total_vol"), 6).as("mkt_share"),
          col("nation_vol"), col("total_vol"))
    },
    Some("""WITH vol AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1.0 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE')
      SELECT o_year,
        ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
              THEN volume ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
          / CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS DOUBLE), 6) AS mkt_share,
        CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
              THEN volume ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE) AS nation_vol,
        CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS DOUBLE) AS total_vol
      FROM vol GROUP BY o_year"""))

  /** TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    * join so zero-order customers keep a 0 count (an inner join would
    * silently drop them), then a second aggregation over the FIRST
    * aggregate's output — the histogram-of-histogram pattern. Both
    * aggs are partial+final; the second one's input is customer-sized.
    */
  val q13Custdist: QueryDef = QueryDef(
    "q13_custdist",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist")),
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      GROUP BY c_count"""))

  /** TPC-H Q15 shape — top supplier by quarterly revenue: an
    * uncorrelated scalar MAX subquery over a common aggregate (the
    * reference's CREATE VIEW). Spark executes the subquery once as a
    * broadcast scalar, so the filter is a literal compare, not a join.
    * Revenue equality across engines is safe because both sides sum
    * exact decimal before the double cast.
    */
  val q15TopSupplier: QueryDef = QueryDef(
    "q15_top_supplier",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("q15_supplier_v")
      t(s, dir, "lineitem").createOrReplaceTempView("q15_lineitem_v")
      s.sql("""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
              AS total_revenue
          FROM q15_lineitem_v
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM q15_supplier_v JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""")
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
            AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)"""))

  /** TPC-H Q17 shape — small-quantity revenue: a correlated scalar AVG
    * over a DIFFERENT table keyed by the join column (j8's correlated
    * scalar stays within one table). Decorrelates to a per-partkey
    * aggregate joined back to the brand-filtered fact rows. The
    * threshold compare is deterministic across engines: quantities are
    * small integers, so their sum (hence avg) is exact in doubles
    * regardless of accumulation order.
    */
  val q17SmallQty: QueryDef = QueryDef(
    "q17_small_qty_revenue",
    (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("q17_part_v")
      t(s, dir, "lineitem").createOrReplaceTempView("q17_lineitem_v")
      s.sql("""SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0, 6)
            AS avg_yearly
        FROM q17_lineitem_v JOIN q17_part_v ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM q17_lineitem_v l2
                            WHERE l2.l_partkey = p_partkey)""")
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0, 6)
          AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p_partkey)"""))

  /** TPC-H Q19 shape — disjunctive multi-attribute predicate (the
    * OR-of-ANDs that exercises predicate normalization): Catalyst
    * extracts the per-side common disjuncts, so the part scan prunes
    * on (brand OR brand) and the lineitem scan on the union quantity
    * range BEFORE the broadcast join evaluates the full condition.
    */
  val q19Disjunctive: QueryDef = QueryDef(
    "q19_disjunctive_preds",
    (s, dir) => t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 25) &&
          col("l_quantity").between(1, 30)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 40) &&
          col("l_quantity").between(10, 45)))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue")),
    Some("""SELECT COUNT(*) AS n_items,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
          AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 1 AND 30)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 40
             AND l_quantity BETWEEN 10 AND 45)"""))

  /** TPC-H Q22 shape — dormant high-balance customers: an uncorrelated
    * scalar AVG threshold plus a NOT EXISTS anti join (with its own
    * date predicate) in one query. The threshold averages exact
    * decimal before the double cast, so the > compare cannot flip on
    * summation order. (The reference query's phone-prefix filter has
    * no column here; the date-bounded NOT EXISTS keeps the anti side
    * non-empty at every SF.)
    */
  val q22DormantCustomers: QueryDef = QueryDef(
    "q22_dormant_customers",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q22_customer_v")
      t(s, dir, "orders").createOrReplaceTempView("q22_orders_v")
      s.sql("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
        FROM q22_customer_v c
        WHERE c_acctbal > (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                           FROM q22_customer_v WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM q22_orders_v o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total_bal
      FROM customer c
      WHERE c_acctbal > (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                         FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment"""))

  /** First-order Markov transition matrix over per-user event
    * sequences — the journey-analysis primitive (what follows a click?
    * where do sessions die?). One user_id shuffle for the lag window
    * (total order via the event_id tiebreak), then two tiny aggregates
    * over the |types|² transition space. At 100 TB the window state is
    * bounded per user, the aggregates by the type vocabulary.
    */
  val eventsMarkov: QueryDef = QueryDef(
    "events_markov",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsm"), col("event_id"))
      val trans = ev.select(col("user_id"), col("event_type"), col("event_id"),
          graft.util.Tables.tsMicros(ev).as("tsm"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        // |types|² rows, consumed by the row-total aggregate AND the
        // join — un-checkpointed, the user_id lag window ran twice
        .stableCheckpoint()
      val tot = trans.groupBy(col("prev_type")).agg(sum(col("n")).as("row_total"))
      trans.join(tot, "prev_type")
        .select(col("prev_type"), col("event_type"), col("n"),
          round(col("n") / col("row_total"), 6).as("p"))
    },
    Some("""WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events),
      trans AS (SELECT prev_type, event_type, COUNT(*) AS n
                FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
              FROM trans GROUP BY 1)
      SELECT trans.prev_type, event_type, n,
             ROUND(n / row_total, 6) AS p
      FROM trans JOIN tot USING (prev_type)"""))

  /** Per-type z-score outlier accounting — the numeric anomaly gate of
    * an event pipeline. Mean and variance come from EXACT decimal sums
    * (Σv, Σv² — order-independent), so the 3σ threshold compare cannot
    * flip across engines or partitionings; the per-type stats broadcast
    * back over the scan, one shuffle total.
    */
  val eventsOutliers: QueryDef = QueryDef(
    "events_outliers",
    (s, dir) => {
      val evv = t(s, dir, "events").select(col("event_type"), col("value"))
      val st = evv.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("s"),
          dsum(col("value") * col("value")).as("s2"))
        .select(col("event_type"), col("n"),
          (col("s") / col("n")).as("mu"),
          sqrt((col("s2") - col("s") * col("s") / col("n")) / (col("n") - 1))
            .as("sigma"))
      evv.join(broadcast(st), "event_type")
        .filter(abs((col("value") - col("mu")) / col("sigma")) > 3)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"),
          round(min(col("value")), 6).as("min_val"),
          round(max(col("value")), 6).as("max_val"))
    },
    Some("""WITH st AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE) AS s2
        FROM events GROUP BY event_type),
      st2 AS (SELECT event_type, s / n AS mu,
                     sqrt((s2 - s * s / n) / (n - 1)) AS sigma
              FROM st)
      SELECT e.event_type, COUNT(*) AS n_outliers,
             ROUND(MIN(value), 6) AS min_val, ROUND(MAX(value), 6) AS max_val
      FROM events e JOIN st2 ON e.event_type = st2.event_type
      WHERE ABS((value - mu) / sigma) > 3
      GROUP BY e.event_type"""))

  /** GROUPING SETS that is neither a rollup nor a cube — the two
    * single-column granularities WITHOUT the pair or the grand total,
    * the shape a7 (ROLLUP) and a11 (CUBE) can't express. Same physical
    * story as cube: one Expand (2× row fan-out) feeding one
    * partial+final hash aggregate — never a second scan per granularity,
    * which is what a rewrite into UNION ALL of two GROUP BYs would cost
    * at 100 TB. grouping_id disambiguates which set each row came from.
    */
  val a13GroupingSets: QueryDef = QueryDef(
    "a13_grouping_sets",
    (s, dir) => t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("revenue"),
        grouping_id().as("gid")),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
        CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""))

  /** The rank-family windows w5 doesn't cover — rank, dense_rank,
    * cume_dist — over per-user value totals within each event type.
    * The window input is the PRE-AGGREGATED user table (one shuffle
    * partial+final agg collapses events → users before any sort), so
    * the per-partition sort is bounded by user cardinality, not event
    * volume; the unbounded-cardinality variant of this ranking is
    * events_rfm's two-level cumCountDesc. All three ranks are
    * tie-stable: they depend only on the ORDER BY value (an exact
    * decimal total), never on arbitrary tie order, so both engines
    * agree bit-for-bit.
    */
  val w7RankFamily: QueryDef = QueryDef(
    "w7_rank_family",
    (s, dir) => {
      val byUser = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(dsum(col("value")).as("total_value"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("total_value").desc)
      byUser.select(col("event_type"), col("user_id"),
        round(col("total_value"), 6).as("total_value"),
        rank().over(w).cast(LongType).as("rnk"),
        dense_rank().over(w).cast(LongType).as("drnk"),
        round(cume_dist().over(w), 6).as("cdist"))
    },
    Some("""WITH u AS (SELECT event_type, user_id,
          CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type, user_id)
      SELECT event_type, user_id, ROUND(total_value, 6) AS total_value,
        RANK() OVER w AS rnk,
        DENSE_RANK() OVER w AS drnk,
        ROUND(CUME_DIST() OVER w, 6) AS cdist
      FROM u WINDOW w AS (PARTITION BY event_type ORDER BY total_value DESC)"""))

  /** TPC-H Q6 shape — the pure scan-filter-aggregate: every predicate
    * is pushable (two range filters on l_shipdate reach the parquet
    * row-group stats, the discount/quantity bounds prune pages), the
    * aggregate is a single partial+final sum with no grouping key, so
    * the whole query is one codegen'd scan stage + a 1-row exchange.
    * At 100 TB this is the query shape where data layout does all the
    * work: ship-date-partitioned files reduce it to a month's scan.
    */
  val q6ForecastRevenue: QueryDef = QueryDef(
    "q6_forecast_revenue",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines")),
    Some("""SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** The distribution-family windows w7 doesn't cover — ntile,
    * percent_rank, nth_value — over the same pre-aggregated user
    * table. Unlike w7's rank family these are NOT tie-stable (ntile
    * splits ties across buckets by position, nth_value reads a
    * positional row), so the ORDER BY appends user_id to make the
    * total order data-determined — the same determinism rule
    * o2_zipwithindex pins for positional IDs.
    */
  val w8NtileFamily: QueryDef = QueryDef(
    "w8_ntile_family",
    (s, dir) => {
      val byUser = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(dsum(col("value")).as("total_value"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("total_value").desc, col("user_id"))
      byUser.select(col("event_type"), col("user_id"),
        round(col("total_value"), 6).as("total_value"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        round(percent_rank().over(w), 6).as("prank"),
        nth_value(col("user_id"), 2).over(w).as("runner_up"))
    },
    Some("""WITH u AS (SELECT event_type, user_id,
          CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY event_type, user_id)
      SELECT event_type, user_id, ROUND(total_value, 6) AS total_value,
        NTILE(4) OVER w AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS prank,
        NTH_VALUE(user_id, 2) OVER w AS runner_up
      FROM u WINDOW w AS (PARTITION BY event_type ORDER BY total_value DESC, user_id)"""))

  /** TPC-H Q21 shape (suppliers who kept orders waiting) adapted to
    * the fixture columns: late = shipped more than 60 days after the
    * order date (the fixtures carry no commit/receipt dates). A
    * supplier is "solely to blame" for an order when it shipped late,
    * at least one OTHER supplier shipped in the same order (EXISTS),
    * and no other supplier shipped late in it (NOT EXISTS). The two
    * correlated subqueries are the point of the shape: Catalyst
    * rewrites them to a left-semi and a left-anti join on l_orderkey
    * with the suppkey inequality as residual — keyed joins on the
    * fact's natural key, no nested loop, and the supplier dimension
    * broadcasts. The NOT EXISTS correlates on BOTH l1.l_orderkey and
    * o.o_orderdate (the outer join's date), exercising multi-column
    * correlation.
    */
  val q21SoleLateSupplier: QueryDef = QueryDef(
    "q21_sole_late_supplier",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("q21_lineitem_v")
      t(s, dir, "orders").createOrReplaceTempView("q21_orders_v")
      t(s, dir, "supplier").createOrReplaceTempView("q21_supplier_v")
      s.sql("""SELECT s_name, COUNT(*) AS numwait
        FROM q21_lineitem_v l1
        JOIN q21_orders_v o ON o.o_orderkey = l1.l_orderkey
        JOIN q21_supplier_v s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM q21_lineitem_v l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q21_lineitem_v l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
    },
    Some("""SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** SCD2 (slowly-changing dimension, type 2) build: the purchase
    * stream becomes a versioned dimension — one row per state change
    * with [valid_from, valid_to) validity, open row NULL-terminated.
    * One window pass per user (lead over ts); purchases sharing
    * (user, ts) collapse to the max-event_id winner FIRST so every
    * surviving interval is non-empty — exactly the equal-ts rule the
    * as-of family pins. At scale this is the standard warehouse move
    * that turns repeated point-in-time lookups into a plain interval
    * join against a table |state changes| big, not |events| big.
    */
  /** SCD2 dimension from a raw events frame — shared by the registered
    * query and the `scd2_build` CLI arm. `src_event_id` is the winning
    * change-event's id: lineage for auditing, and the tiebreak that
    * lets [[scd2Merge]] fold later deltas in with EXACT
    * rebuild-equality (an equal-(user, ts) collision between old and
    * new points resolves identically to a from-scratch build).
    */
  def scd2(raw: DataFrame): DataFrame =
    scd2FromPoints(raw.filter(col("event_type") === "purchase")
      .select(col("user_id"), graft.util.Tables.tsMicros(raw).as("ts_us"),
        col("value"), col("event_id")))

  /** Interval assembly from change points (user_id, ts_us, value,
    * event_id): equal-ts losers collapse to the max event_id, then one
    * lead() window per user.
    */
  private def scd2FromPoints(points: DataFrame): DataFrame = {
    val dedupW = Window.partitionBy(col("user_id"), col("ts_us"))
      .orderBy(col("event_id").desc)
    val leadW = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    points.withColumn("rn", row_number().over(dedupW)).filter(col("rn") === 1)
      .select(col("user_id"), round(col("value"), 6).as("value"),
        col("ts_us").as("valid_from_us"),
        lead(col("ts_us"), 1).over(leadW).as("valid_to_us"),
        col("event_id").as("src_event_id"))
  }

  /** Incremental SCD2 maintenance, copy-on-write by user: fold a delta
    * events frame into an existing dimension WITHOUT touching
    * unaffected users' rows. Affected users (those with delta
    * purchases) rebuild from their existing change points — the
    * dimension's own rows, whose (valid_from_us, value, src_event_id)
    * ARE the state-change log — unioned with the delta points;
    * everyone else passes through untouched (a left-anti join, no
    * window). Because src_event_id carries the original tiebreak,
    * merge-then-read is EXACTLY a full rebuild (oracle-checked):
    * late-arriving and equal-timestamp deltas land where a
    * from-scratch build would put them. At scale the rewrite cost
    * follows the delta's user set, not the dimension.
    */
  def scd2Merge(dim: DataFrame, deltaRaw: DataFrame): DataFrame = {
    val deltaPoints = deltaRaw.filter(col("event_type") === "purchase")
      .select(col("user_id"), graft.util.Tables.tsMicros(deltaRaw).as("ts_us"),
        col("value"), col("event_id"))
    val affected = deltaPoints.select(col("user_id")).distinct()
    val untouched = dim.join(affected, Seq("user_id"), "left_anti")
    val existingPoints = dim.join(affected, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("valid_from_us").as("ts_us"),
        col("value"), col("src_event_id").as("event_id"))
    untouched.unionByName(
      scd2FromPoints(existingPoints.unionByName(deltaPoints)))
  }

  val scd2Build: QueryDef = QueryDef(
    "scd2_build",
    (s, dir) => scd2(t(s, dir, "events")),
    Some(Scd2OracleSql))

  // a def, not a val: scd2Build above initializes before a val here
  // would (object init order) and would capture null
  private[graft] def Scd2OracleSql: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, value, event_id,
          ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
      SELECT user_id, round(value, 6) AS value, ts_us AS valid_from_us,
        LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS valid_to_us,
        event_id AS src_event_id
      FROM p WHERE rn = 1"""

  /** Registered incremental-maintenance check: dimension built from the
    * event_id % 5 != 0 events, the rest folded in by [[scd2Merge]] —
    * graded against the FULL-rebuild oracle, so the fold must land
    * every late and equal-timestamp point exactly where a from-scratch
    * build would.
    */
  val scd2MergeQuery: QueryDef = QueryDef(
    "scd2_merge",
    (s, dir) => {
      val raw = t(s, dir, "events")
      // the built dimension is consumed twice inside scd2Merge (the
      // untouched anti-join and the affected-rows semi-join) — the
      // checkpoint materializes the SCD2 window pipeline once
      // (dimension-sized rows, far below the event volume)
      scd2Merge(scd2(raw.filter(col("event_id") % 5 =!= 0)).stableCheckpoint(),
        raw.filter(col("event_id") % 5 === 0))
    },
    Some(Scd2OracleSql))

  /** Point-in-time lookup route #4: clicks against the SCD2 interval
    * table — an equi-join on user_id with the validity range as
    * residual (hash/SMJ keyed join, never an inequality-only join).
    * Same oracle as j6/j6_custom/stream_asof: window route, custom
    * merge operator, streaming state machine, and interval table must
    * all agree digit for digit. The interval form is the one that wins
    * operationally when MANY fact tables need the same dimension
    * state: build once, join everywhere.
    */
  val scd2PitJoin: QueryDef = QueryDef(
    "scd2_pit_join",
    (s, dir) => {
      val raw = t(s, dir, "events")
      val clicks = raw.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          graft.util.Tables.tsMicros(raw).as("ts_us"))
      val dim = scd2Build.fn(s, dir)
        .select(col("user_id").as("d_user"), col("value"),
          col("valid_from_us"), col("valid_to_us"))
      clicks.join(dim,
          col("user_id") === col("d_user") &&
            col("ts_us") >= col("valid_from_us") &&
            (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")),
          "left")
        .select(col("event_id"), col("user_id"), col("ts_us"),
          coalesce(col("value"), lit(-1.0)).as("asof_value"))
    },
    Some("""WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
          CASE WHEN event_type = 'purchase' THEN value END AS pv
        FROM events WHERE event_type IN ('click', 'purchase')),
      f AS (SELECT event_id, user_id, ts_us, kind,
          last_value(pv IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av
        FROM u)
      SELECT event_id, user_id, ts_us,
        round(COALESCE(av, -1.0), 6) AS asof_value
      FROM f WHERE kind = 1"""))

  /** Last-touch revenue attribution: every purchase's value credits the
    * channel of the user's most recent click at-or-before it (channel
    * = the click's props.k mod 5; 'direct' bucket -1 when no click
    * precedes). The same backward-fill union-window shape as j6 — one
    * shuffle on user_id — then a channel rollup whose cardinality is
    * the channel count, so the second aggregation is a broadcast-sized
    * reduction. The pattern behind marketing-attribution and
    * conversion-credit pipelines.
    */
  val eventsAttribution: QueryDef = QueryDef(
    "events_attribution",
    (s, dir) => {
      val raw = t(s, dir, "events")
      val ev = raw.filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("user_id"),
          graft.util.Tables.tsMicros(raw).as("ts_us"),
          when(col("event_type") === "click", 0).otherwise(1).as("kind"),
          when(col("event_type") === "click",
            get_json_object(col("props"), "$.k").cast("long") % 5).as("ck"),
          col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Long.MinValue, 0)
      ev.withColumn("channel", last(col("ck"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .groupBy(coalesce(col("channel"), lit(-1L)).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("attributed_value"))
    },
    Some("""WITH u AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
          CASE WHEN event_type = 'click'
               THEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 END AS ck,
          value
        FROM events WHERE event_type IN ('click', 'purchase')),
      f AS (SELECT user_id, ts_us, kind, value,
          last_value(ck IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS channel
        FROM u)
      SELECT COALESCE(channel, -1) AS channel, COUNT(*) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS attributed_value
      FROM f WHERE kind = 1 GROUP BY 1"""))

  /** Multi-touch (linear) attribution — the companion of
    * [[eventsAttribution]]'s last-touch rule: every purchase's value
    * splits EQUALLY among the user's clicks in the 7-day lookback
    * window at-or-before it (purchases with no such click fall into
    * the direct bucket -1). Shape: one keyed join on user_id with the
    * lookback range as residual — fan-out is clicks-per-user-per-week,
    * a product constant, never corpus-squared — then a per-purchase
    * count and a channel rollup. Credits are exact decimals divided
    * per purchase, so the per-channel totals sum back to attributed
    * revenue without float drift.
    */
  val eventsAttributionLinear: QueryDef = QueryDef(
    "events_attribution_linear",
    (s, dir) => {
      val raw = t(s, dir, "events")
      val lookbackUs = 7L * 24 * 3600 * 1000000L
      val clicks = raw.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"),
          graft.util.Tables.tsMicros(raw).as("c_ts"),
          (get_json_object(col("props"), "$.k").cast("long") % 5).as("channel"))
      val purchases = raw.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          graft.util.Tables.tsMicros(raw).as("p_ts"), col("value"))
      val joined = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") > col("p_ts") - lookbackUs,
        "left")
      val perPurchase = Window.partitionBy(col("p_id"))
      // credit: IEEE double division then round-6 (bit-identical across
      // engines), summed as exact decimal (order-independent) — the
      // decimal-DIVISION route differs between engines' scale rules
      joined
        .withColumn("n_touch", count(col("channel")).over(perPurchase))
        .select(
          coalesce(col("channel"), lit(-1L)).as("channel"),
          when(col("n_touch") === 0, round(col("value"), 6))
            .otherwise(round(col("value") / col("n_touch"), 6))
            .cast("decimal(18,6)").as("credit"))
        .groupBy(col("channel"))
        .agg(round(sum(col("credit")).cast("double"), 4).as("attributed_value"),
          count(lit(1)).as("n_touches"))
    },
    Some("""WITH c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_ts,
          CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS channel
        FROM events WHERE event_type = 'click'),
      p AS (SELECT event_id AS p_id, user_id AS p_user, epoch_us(ts) AS p_ts, value
        FROM events WHERE event_type = 'purchase'),
      j AS (SELECT p.p_id, p.value, c.channel
        FROM p LEFT JOIN c ON p.p_user = c.c_user
          AND c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - 604800000000
      ),
      n AS (SELECT p_id, value, channel,
          COUNT(channel) OVER (PARTITION BY p_id) AS n_touch FROM j)
      SELECT COALESCE(channel, -1) AS channel,
        ROUND(CAST(SUM(CAST(CASE WHEN n_touch = 0 THEN ROUND(value, 6)
          ELSE ROUND(value / n_touch, 6)
          END AS DECIMAL(18,6))) AS DOUBLE), 4) AS attributed_value,
        COUNT(*) AS n_touches
      FROM n GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, q3ShippingPriority, q5RegionRevenue, s4SqlPushdown,
    a3CollectList, a5Count, j1GraphIds, j3SemiJoin, j4AntiJoin, a7Rollup,
    a8Percentiles, a9SaltedSum, o2ZipWithIndex, u1Union, u2Distinct,
    u3DropDuplicates, u4DropNa, u5Intersect, u6Except, o1TopN,
    o9GroupedTopK, o7SelfLoopFilter, j5FullOuter, a10Pivot, p14SplitPart,
    fScalarStrings, fDatetime, fArrayFuncs, fMathFuncs, fCondNull,
    w1RowNumber, w2RunningSum, w3DailyRollup, eJsonExtract,
    j6AsofJoin, j7RangeJoin, eventsFunnel, eventsCohort, eventsRfm,
    w4HoppingWindow, approxDistinctAudit, skewReport, approxQuantileAudit,
    q7NationVolume, q10ReturnedItems, a11Cube, j8CorrelatedSubquery,
    w5LeadLag, q18LargeOrders, q14PromoRevenue,
    q4OrderPriority, u7ExceptAll, u8IntersectAll,
    w6RangeFrame, a12Unpivot,
    q8MarketShare, q13Custdist, q15TopSupplier, q17SmallQty,
    q19Disjunctive, q22DormantCustomers,
    eventsMarkov, eventsOutliers, a13GroupingSets, w7RankFamily,
    q6ForecastRevenue, w8NtileFamily, sketchMergeAudit, mvRewriteAgg,
    mvRollupAgg, mvRewriteAvg, q21SoleLateSupplier, scd2Build, scd2PitJoin,
    scd2MergeQuery, eventsAttribution, eventsAttributionLinear)
}
