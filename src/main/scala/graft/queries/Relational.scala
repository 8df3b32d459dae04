package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Core relational operator parity set (SURVEY.md §2.2).
 *
 * The reference delegates this whole surface to DuckDB
 * (/root/reference/querier/queryClient.go:855-856, :767-815); here each
 * category is expressed Spark-first with the DataFrame API (or Spark SQL
 * where the construct is SQL-native, e.g. GROUPING SETS / CTEs), letting
 * Catalyst pick physical strategies. Every query is deterministically
 * ordered and column-aliased to match its DuckDB oracle.
 *
 * Scale notes (100 TB design intent, tested at sf0.1):
 *  - dimension joins (region/nation/supplier) are broadcast explicitly;
 *  - fact-fact joins (lineitem⋈orders) rely on sort-merge + AQE;
 *  - aggregations are partial/final hash aggregates (Catalyst default);
 *  - top-k = orderBy+limit → TakeOrderedAndProject (no global sort).
 */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  private def sql(q: String): Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  /** Order-invariant money sum: 2-decimal lake prices quantize
    * losslessly into exact CENTS longs (`floor(x·100 + 0.5)` — the
    * suite's fixedPoint convention), whose sum is exact integer
    * arithmetic in any partition/merge order; the final round of the
    * one double division is then a pure function of the exact sum
    * (round-14 float contract — a float Σ over a large group carries
    * reorder error within an order of magnitude of the half-cent
    * boundary). Long cents over DECIMAL(12,2) deliberately: same
    * exactness, but the whole aggregate stays inside whole-stage
    * codegen (measured ~2× on q04; decimal sums box per row). Long
    * range bounds the contract at ~9e16 dollars per group. */
  private def moneySum(c: Column): Column =
    round(sum(floor(c * 100 + lit(0.5))).cast("double") / 100, 2)

  /** [[moneySum]] for TPC-H revenue terms: cents × (100 − discount
    * percent) as exact long products (discounts are 2-decimal too),
    * summed exactly in 1e-4-dollar units, divided and rounded once. */
  private def revenueSum(p: Column, d: Column): Column =
    round(sum(floor(p * 100 + lit(0.5)) *
      (lit(100L) - floor(d * 100 + lit(0.5)))).cast("double") / 10000, 2)

  val queries: Map[String, Q] = Map(
    // ---- projection / filter / scalar expressions ----------------------
    "q01_projection" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q02_filter" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q03_scalar" -> ((s, dir) => {
      val t = T(s, dir) _
      t("part")
        .select(
          col("p_partkey"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          upper(col("p_name")).as("uname"),
          (col("p_retailprice") * 1.1 + col("p_size")).as("adj_price"),
          when(col("p_size") > 25, "big").when(col("p_size") > 10, "mid")
            .otherwise("small").as("size_class"))
        .orderBy(col("p_partkey"))
    }),

    // ---- aggregation ---------------------------------------------------
    // Money sums go through EXACT cents longs (see moneySum above —
    // the round-14 float contract): prices in the lake are 2-decimal,
    // and a float Σ over a large group reorders by partition merge
    // with error within an order of magnitude of the half-cent round
    // boundary. avg(l_quantity) needs no treatment: quantities are
    // integer-valued, and integer-valued double sums below 2^53 are
    // exact in any order.
    "q04_agg" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount"))
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q05_having" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 1000)
        .orderBy(col("l_suppkey"))
    }),

    "q06_agg_global" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders").agg(
        count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("total"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))
    }),

    "q07_distinct" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem").select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q08_count_distinct" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // approx HLL sketch — implementation-specific values, rows-only check
    "q09_approx_distinct" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .orderBy(col("l_returnflag"))
    }),

    "q10_rollup" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q11_cube" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q12_grouping_sets" -> sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS INT) AS g_status,
             SUM(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
      ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """),

    // ---- joins ---------------------------------------------------------
    "q13_join_inner" -> ((s, dir) => {
      val t = T(s, dir) _
      val li = t("lineitem"); val o = t("orders"); val c = t("customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("c_mktsegment"))
    }),

    "q14_join_left" -> ((s, dir) => {
      val t = T(s, dir) _
      val c = t("customer"); val o = t("orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    "q15_join_right" -> ((s, dir) => {
      val t = T(s, dir) _
      val o = t("orders"); val c = t("customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    "q16_join_full" -> ((s, dir) => {
      val t = T(s, dir) _
      val sn = t("supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      val cn = t("customer").groupBy(col("c_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_cust"))
      sn.join(cn, col("nk") === col("nk2"), "full")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy(col("nationkey"))
    }),

    "q17_join_semi" -> ((s, dir) => {
      val t = T(s, dir) _
      val o = t("orders")
      val big = t("lineitem").filter(col("l_quantity") >= 49).select(col("l_orderkey"))
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "q18_join_anti" -> ((s, dir) => {
      val t = T(s, dir) _
      val c = t("customer")
      val o = t("orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q19_join_theta" -> ((s, dir) => {
      val t = T(s, dir) _
      val sup = t("supplier"); val c = t("customer"); val n = t("nation")
      sup.join(c, sup("s_nationkey") === c("c_nationkey") &&
          sup("s_acctbal") > c("c_acctbal"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_name"))
    }),

    "q20_join_cross" -> ((s, dir) => {
      val t = T(s, dir) _
      t("region").crossJoin(t("nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q5-shaped 5-way join: local-supplier revenue per nation in
    // one region/year — exercises join reordering + two broadcast dims
    "q13b_join_5way" -> ((s, dir) => {
      val t = T(s, dir) _
      val li = t("lineitem"); val o = t("orders"); val c = t("customer")
      val sup = t("supplier"); val n = t("nation"); val r = t("region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "AMERICA" &&
          o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // ---- window functions ----------------------------------------------
    "q21_window_rank" -> ((s, dir) => {
      val t = T(s, dir) _
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t("orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"), col("rk"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "q22_window_frames" -> ((s, dir) => {
      val t = T(s, dir) _
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t("orders")
        .withColumn("running_total",
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("running_total"), col("prev_price"), col("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q23_window_range" -> ((s, dir) => {
      val t = T(s, dir) _
      // RANGE frame: all peers within 2 of current l_quantity — tie-safe.
      // (quantities are integral; order on a long key so the frame offsets
      // are exact in both engines)
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity").cast("long"))
        .rangeBetween(-2, Window.currentRow)
      t("lineitem")
        .filter(col("l_suppkey") <= 5)
        .withColumn("qty_window_sum", sum(col("l_quantity")).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("qty_window_sum"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- sort / limit / top-k ------------------------------------------
    "q24_sort_topk" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(25)
    }),

    // ---- set operations ------------------------------------------------
    "q25_union" -> ((s, dir) => {
      val t = T(s, dir) _
      val a = t("customer").select(col("c_nationkey").as("nationkey"))
        .withColumn("side", lit("cust"))
      val b = t("supplier").select(col("s_nationkey").as("nationkey"))
        .withColumn("side", lit("supp"))
      a.unionByName(b).groupBy(col("nationkey"), col("side"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"), col("side"))
    }),

    "q26_intersect" -> ((s, dir) => {
      val t = T(s, dir) _
      t("customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t("supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),

    "q27_except" -> ((s, dir) => {
      val t = T(s, dir) _
      t("customer").select(col("c_nationkey").as("nationkey"))
        .except(t("supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),

    // ---- subqueries / CTEs ---------------------------------------------
    "q28_subquery_scalar" -> sql("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
      ORDER BY o_orderkey
    """),

    "q29_subquery_exists" -> sql("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey
    """),

    "q30_cte" -> sql("""
      WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey
      )
      SELECT c.c_mktsegment, COUNT(*) AS n_cust,
             ROUND(SUM(co.total), 2) AS segment_total
      FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment
    """),

    // ---- scalar function families --------------------------------------
    "q31_string_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("part").filter(col("p_name").like("%old%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          length(col("p_name")).as("len"),
          substring(col("p_name"), 1, 5).as("pref"),
          ltrim(rtrim(col("p_name"))).as("trimmed"),
          regexp_replace(col("p_name"), "o", "0").as("leeted"),
          lpad(col("p_brand"), 12, "_").as("padded"))
        .orderBy(col("p_partkey"))
    }),

    "q32_math_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders").filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          abs(col("o_totalprice") - 200000).as("abs_diff"),
          ceil(col("o_totalprice")).as("ceil_p"),
          floor(col("o_totalprice")).as("floor_p"),
          round(sqrt(col("o_totalprice")), 6).as("sqrt_p"),
          round(log(col("o_totalprice")), 6).as("ln_p"),
          pmod(col("o_orderkey"), lit(7)).as("mod7"))
        .orderBy(col("o_orderkey"))
    }),

    "q33_date_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders").filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"),
          date_add(col("o_orderdate"), 30).cast("string").as("due_date"))
        .orderBy(col("o_orderkey"))
    }),

    "q34_conditional" -> ((s, dir) => {
      val t = T(s, dir) _
      t("customer")
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "normal")
            .otherwise("premium").as("balance_class"))
        .orderBy(col("c_custkey"))
    }),

    "q35_pivot" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .orderBy(col("l_linestatus"))
    }),

    "q36_array_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("embeddings").filter(col("vec_id") < 50)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_elem"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 6).as("sum_elems"),
          round(array_max(col("embedding")).cast("double"), 6).as("max_elem"))
        .orderBy(col("vec_id"))
    }),

    "q37_json_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("events").filter(col("event_id") < 500)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .orderBy(col("event_id"))
    }),

    // Exact median/p90 WITHOUT the per-group full-multiset
    // ObjectHashAggregate buffer (a few-giant-buffers OOM pattern at
    // 100 TB): distributed selection — bucket-histogram pass, driver
    // rank→bucket mapping, then a selection pass that sorts only the
    // target buckets. See operators.Quantiles.
    "q38_median_percentile" -> ((s, dir) => {
      val t = T(s, dir) _
      graft.operators.Quantiles
        .exactQuantiles(t("lineitem"), "l_returnflag", "l_extendedprice",
          Seq(0.5 -> "med_raw", 0.9 -> "p90_raw"))
        .select(col("l_returnflag"),
          round(col("med_raw"), 4).as("med_price"),
          round(col("p90_raw"), 4).as("p90_price"))
        .orderBy(col("l_returnflag"))
    }),

    "q39_stats" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qe"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_projection" -> """
      SELECT l_orderkey, l_linenumber, l_partkey,
             l_extendedprice * (1.0 - l_discount) AS net_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q02_filter" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_quantity > 45 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""",
    "q03_scalar" -> """
      SELECT p_partkey,
             concat_ws('-', p_brand, p_type) AS brand_type,
             upper(p_name) AS uname,
             p_retailprice * 1.1 + p_size AS adj_price,
             CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid'
                  ELSE 'small' END AS size_class
      FROM part ORDER BY p_partkey""",
    "q04_agg" -> """
      SELECT l_returnflag, l_linestatus,
             SUM(l_quantity) AS sum_qty,
             ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_base_price,
             ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000, 2) AS sum_disc_price,
             ROUND(AVG(l_quantity), 6) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q05_having" -> """
      SELECT l_suppkey, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 1000
      ORDER BY l_suppkey""",
    "q06_agg_global" -> """
      SELECT COUNT(*) AS n, ROUND(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS total,
             MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
             MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
      FROM orders""",
    "q07_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus
      FROM lineitem ORDER BY l_returnflag, l_linestatus""",
    "q08_count_distinct" -> """
      SELECT l_returnflag,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT l_partkey) AS n_part,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q10_rollup" -> """
      SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q11_cube" -> """
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100, 2) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q12_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS INT) AS g_status,
             SUM(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
      ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q13_join_inner" -> """
      SELECT c_mktsegment,
             ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000, 2) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q13b_join_5way" -> """
      SELECT n_name,
             ROUND(CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000, 2) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY n_name""",
    "q14_join_left" -> """
      SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
             ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q15_join_right" -> """
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q16_join_full" -> """
      SELECT COALESCE(nk, nk2) AS nationkey,
             COALESCE(n_supp, 0) AS n_supp, COALESCE(n_cust, 0) AS n_cust
      FROM (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
            FROM supplier GROUP BY s_nationkey) s
      FULL OUTER JOIN
           (SELECT c_nationkey AS nk2, CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM customer GROUP BY c_nationkey) c
      ON nk = nk2
      ORDER BY nationkey""",
    "q17_join_semi" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
      ORDER BY o_orderkey""",
    "q18_join_anti" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey""",
    "q19_join_theta" -> """
      SELECT n_name, COUNT(*) AS n_pairs
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "q20_join_cross" -> """
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""",
    "q21_window_rank" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q22_window_frames" -> """
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
             LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
             LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders ORDER BY o_custkey, o_orderkey""",
    "q23_window_range" -> """
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             SUM(l_quantity) OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)
               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS qty_window_sum
      FROM lineitem WHERE l_suppkey <= 5
      ORDER BY l_orderkey, l_linenumber""",
    "q24_sort_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",
    "q25_union" -> """
      SELECT nationkey, side, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey, 'cust' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supp' AS side FROM supplier) u
      GROUP BY nationkey, side ORDER BY nationkey, side""",
    "q26_intersect" -> """
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",
    "q27_except" -> """
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",
    "q28_subquery_scalar" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
      ORDER BY o_orderkey""",
    "q29_subquery_exists" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey""",
    "q30_cte" -> """
      WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_custkey
      )
      SELECT c.c_mktsegment, COUNT(*) AS n_cust,
             ROUND(SUM(co.total), 2) AS segment_total
      FROM customer c JOIN cust_orders co ON c.c_custkey = co.o_custkey
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment""",
    "q31_string_funcs" -> """
      SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
             length(p_name) AS len, substring(p_name, 1, 5) AS pref,
             ltrim(rtrim(p_name)) AS trimmed,
             regexp_replace(p_name, 'o', '0', 'g') AS leeted,
             lpad(p_brand, 12, '_') AS padded
      FROM part WHERE p_name LIKE '%old%' ORDER BY p_partkey""",
    "q32_math_funcs" -> """
      SELECT o_orderkey, abs(o_totalprice - 200000) AS abs_diff,
             CAST(ceil(o_totalprice) AS BIGINT) AS ceil_p,
             CAST(floor(o_totalprice) AS BIGINT) AS floor_p,
             round(sqrt(o_totalprice), 6) AS sqrt_p,
             round(ln(o_totalprice), 6) AS ln_p,
             o_orderkey % 7 AS mod7
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "q33_date_funcs" -> """
      SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(day(o_orderdate) AS INT) AS d,
             CAST(date_trunc('month', o_orderdate) AS VARCHAR) AS month_start,
             CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date
      FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "q34_conditional" -> """
      SELECT c_custkey,
             COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
             CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                  WHEN c_acctbal < 5000 THEN 'normal'
                  ELSE 'premium' END AS balance_class
      FROM customer ORDER BY c_custkey""",
    "q35_pivot" -> """
      SELECT l_linestatus,
             SUM(l_quantity) FILTER (WHERE l_returnflag = 'A') AS "A",
             SUM(l_quantity) FILTER (WHERE l_returnflag = 'N') AS "N",
             SUM(l_quantity) FILTER (WHERE l_returnflag = 'R') AS "R"
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q36_array_funcs" -> """
      SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
             embedding[1] AS first_elem,
             round(list_sum(CAST(embedding AS DOUBLE[])), 6) AS sum_elems,
             round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem
      FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""",
    "q37_json_funcs" -> """
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      FROM events WHERE event_id < 500 ORDER BY event_id""",
    "q38_median_percentile" -> """
      SELECT l_returnflag,
             round(median(l_extendedprice), 4) AS med_price,
             round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q39_stats" -> """
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 6) AS sd_qty,
             round(var_samp(l_quantity), 6) AS var_qty,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qe
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  ).map { case (k, v) => k -> v.stripMargin.trim.replaceAll("\\s+", " ") }
}
