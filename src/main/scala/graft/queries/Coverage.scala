package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Long-tail SQL surface coverage (SURVEY.md §2.2 rows not already
 * exercised by Relational): multiset set-ops, lateral correlated
 * subqueries, ordered string aggregation, generators, cast semantics,
 * regexp extraction, calendar truncation variants, bitwise ops.
 */
object Coverage {
  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  private def sql(q: String): Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  val queries: Map[String, Q] = Map(
    "q63_intersect_all" -> ((s, dir) => {
      val t = T(s, dir) _
      t("customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(t("supplier").select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey")).agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("nationkey"))
    }),

    "q64_except_all" -> ((s, dir) => {
      val t = T(s, dir) _
      t("customer").select(col("c_nationkey").as("nationkey"))
        .exceptAll(t("supplier").select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey")).agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("nationkey"))
    }),

    // correlated LATERAL subquery
    "q65_lateral" -> sql("""
      SELECT c.c_custkey, t.maxp
      FROM customer c,
      LATERAL (SELECT MAX(o_totalprice) AS maxp FROM orders
               WHERE o_custkey = c.c_custkey) t
      WHERE c.c_custkey <= 300
      ORDER BY c.c_custkey
    """),

    // ordered string aggregation
    "q66_string_agg" -> ((s, dir) => {
      val t = T(s, dir) _
      t("nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
        .orderBy(col("n_regionkey"))
    }),

    // generator / table function: per-row sequence explode
    "q67_generator" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem").filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), col("l_linenumber"))).as("n"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("n"))
    }),

    // cast semantics across types (floor first: double→int rounding
    // differs between engines, truncation made explicit)
    "q68_casts" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          col("o_orderkey").cast("string").as("key_str"),
          floor(col("o_totalprice")).cast("long").as("price_long"),
          col("o_orderdate").cast("date").cast("string").as("order_date"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          concat(col("o_orderkey").cast("string"), lit("-"), col("o_orderstatus"))
            .as("tagged"))
        .orderBy(col("o_orderkey"))
    }),

    "q69_regexp" -> ((s, dir) => {
      val t = T(s, dir) _
      t("part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("first_type_word"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).as("n_vowels"))
        .orderBy(col("p_partkey"))
    }),

    "q70_date_trunc_variants" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          date_trunc("week", col("o_orderdate")).cast("date").cast("string").as("week_start"),
          date_trunc("quarter", col("o_orderdate")).cast("date").cast("string").as("quarter_start"),
          date_trunc("year", col("o_orderdate")).cast("date").cast("string").as("year_start"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy(col("o_orderkey"))
    }),

    // struct construction + field access (scalar-flattened output)
    "q77_struct" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders").filter(col("o_orderkey") <= 500)
        .withColumn("pair",
          struct(col("o_orderkey").as("k"), col("o_totalprice").as("p")))
        .select(col("o_orderkey"),
          col("pair.p").as("price_via_struct"),
          (col("pair.k") * 2).as("key_doubled"))
        .orderBy(col("o_orderkey"))
    }),

    "q74_offset" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .offset(10).limit(10)
    }),

    "q75_try_cast" -> ((s, dir) => {
      val t = T(s, dir) _
      t("part")
        .select(
          col("p_partkey"),
          expr("try_cast(p_type AS INT)").as("bad_cast"),
          expr("try_cast(cast(p_size AS STRING) AS INT)").as("good_cast"),
          expr("try_cast(substring(p_brand, 1, 2) AS INT)").as("brand_prefix"))
        .orderBy(col("p_partkey"))
    }),

    // second string-function family (split_part/repeat/reverse/left/right)
    "q80_string_funcs2" -> ((s, dir) => {
      val t = T(s, dir) _
      t("part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          expr("split_part(p_name, ' ', 2)").as("word2"),
          reverse(col("p_brand")).as("rev_brand"),
          expr("repeat(p_brand, 2)").as("double_brand"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 3)").as("r3"),
          expr("contains(p_name, 'old')").as("has_old"),
          col("p_type").startsWith("ty").as("ty_prefix"))
        .orderBy(col("p_partkey"))
    }),

    // referential-integrity audit across the star schema (orphan
    // detection via anti joins — the standard pre-training data-quality
    // sweep)
    "q96_ref_integrity" -> sql("""
      SELECT 'lineitem_without_order' AS check_name,
             CAST(COUNT(*) AS BIGINT) AS n_violations
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      UNION ALL
      SELECT 'order_without_customer',
             CAST(COUNT(*) AS BIGINT)
      FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      UNION ALL
      SELECT 'customer_with_bad_nation',
             CAST(COUNT(*) AS BIGINT)
      FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
      UNION ALL
      SELECT 'lineitem_with_bad_part',
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
      ORDER BY check_name
    """),

    // exact decimal aggregation: DECIMAL sums are order-independent, so
    // no round() is needed — the final DOUBLE cast of a 2-decimal value
    // is bit-identical across engines
    "q93_decimal_exact" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            .as("exact_sum"),
          sum((col("l_extendedprice").cast("decimal(12,2)")) *
            (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("exact_disc_sum"))
        .orderBy(col("l_returnflag"))
    }),

    // null-safe equality (<=> / IS NOT DISTINCT FROM)
    "q94_null_safe_eq" -> sql("""
      SELECT a.c_custkey, b.c_custkey AS other
      FROM (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer WHERE c_custkey <= 50) a
      JOIN (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer WHERE c_custkey <= 50) b
        ON a.seg IS NOT DISTINCT FROM b.seg AND a.c_custkey < b.c_custkey
      ORDER BY a.c_custkey, other
    """),

    // value-bucketed histogram (plain integer arithmetic → oracle-able)
    "q86_histogram" -> ((s, dir) => {
      val t = T(s, dir) _
      t("orders")
        .groupBy(floor((col("o_totalprice") - 1000) / 50000).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy(col("bucket"))
    }),

    // approx-percentile sketch family (implementation-specific → rows-only)
    "q87_approx_percentile" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"),
          expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("p90"),
          expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("p99"),
          expr("approx_count_distinct(l_orderkey)").as("approx_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // seeded deterministic sampling (engine-specific RNG → rows-only)
    "q88_sample" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem").sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .agg(count(lit(1)).as("n_sampled"),
          round(avg(col("l_quantity")), 6).as("avg_qty"))
    }),

    // map-type construction and access (oracle: DuckDB MAP literal,
    // scalar-flattened output on both sides)
    "q85_map_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("nation")
        .withColumn("m", map(lit("name"), col("n_name"),
          lit("region"), col("n_regionkey").cast("string")))
        .select(col("n_nationkey"),
          element_at(col("m"), "name").as("name_via_map"),
          size(col("m")).as("map_size"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys"))
        .orderBy(col("n_nationkey"))
    }),

    // recursive CTE (day spine + left join = recursion-based gap fill)
    "q83_recursive_cte" -> sql("""
      WITH RECURSIVE spine(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM spine WHERE n < 31
      )
      SELECT n, COUNT(o_orderkey) AS n_orders
      FROM spine LEFT JOIN orders
        ON day(o_orderdate) = n AND year(o_orderdate) = 1995 AND month(o_orderdate) = 1
      GROUP BY n ORDER BY n
    """),

    // inline VALUES relation joined to a table
    "q84_values_join" -> sql("""
      SELECT v.tag, COUNT(*) AS n
      FROM orders JOIN (VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending'))
        AS v(status, tag) ON o_orderstatus = v.status
      GROUP BY v.tag ORDER BY v.tag
    """),

    // SQL higher-order lambda functions over arrays
    "q82_lambda_funcs" -> ((s, dir) => {
      val t = T(s, dir) _
      t("embeddings").filter(col("vec_id") < 100)
        .select(
          col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_positive"),
          round(aggregate(col("embedding"), lit(0.0d),
            (acc, x) => acc + abs(x.cast("double"))), 6).as("l1_norm"),
          exists(col("embedding"), x => x > lit(0.3f)).as("has_large"),
          round(element_at(transform(col("embedding"),
            x => x.cast("double") * 2), 1), 6).as("first_doubled"))
        .orderBy(col("vec_id"))
    }),

    // implicit type coercion across a union (int ∪ double → double)
    "q81_union_coercion" -> sql("""
      SELECT val, src FROM (
        SELECT CAST(p_size AS INT) AS val, 'int_side' AS src FROM part WHERE p_partkey <= 100
        UNION ALL
        SELECT p_retailprice AS val, 'dbl_side' AS src FROM part WHERE p_partkey <= 100) u
      ORDER BY src, val
    """),

    // distribution window functions
    "q78_window_dist" -> ((s, dir) => {
      val t = T(s, dir) _
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t("orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 8).as("pct_rank"),
          round(cume_dist().over(w), 8).as("cume"),
          nth_value(col("o_orderkey"), 2).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)).as("second_key"))
        .orderBy(col("o_orderkey"))
    }),

    // GROUP BY ALL (identical dialect extension in both engines)
    "q79_group_by_all" -> sql("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sq
      FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus
    """),

    // boolean aggregates + FILTER clause (identical SQL both engines)
    "q76_bool_agg" -> sql("""
      SELECT l_returnflag,
             bool_and(l_quantity >= 1) AS all_qty_ge1,
             bool_or(l_discount > 0.09) AS any_big_disc,
             COUNT(*) FILTER (WHERE l_tax > 0.05) AS n_high_tax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """),

    "q71_bitwise" -> ((s, dir) => {
      val t = T(s, dir) _
      t("lineitem").filter(col("l_orderkey") <= 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(255).as("and255"),
          col("l_orderkey").bitwiseOR(col("l_linenumber")).as("or_ln"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("xor_pk"),
          shiftleft(col("l_linenumber"), 3).as("shl3"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Spark 4 SQL PIPE syntax (|> operators) — the same Catalyst plan
    // as the nested form, so the oracle is the plain-SQL equivalent
    "qBD_pipe_syntax" -> sql("""
      FROM lineitem
      |> WHERE l_quantity > 10
      |> AGGREGATE sum(l_quantity) AS sum_qty, count(*) AS n
         GROUP BY l_returnflag, l_linestatus
      |> WHERE n > 100
      |> SELECT l_returnflag, l_linestatus, sum_qty, n
      |> ORDER BY l_returnflag, l_linestatus
    """),

    // Spark 4 VARIANT type: parse_json -> typed variant_get
    // extraction. JSON round-trips doubles exactly (shortest-repr
    // print, nearest-double parse), so the oracle is a plain typed
    // projection
    "qBE_variant" -> sql("""
      SELECT o_orderkey,
             variant_get(v, '$.p', 'double') AS price,
             variant_get(v, '$.k', 'bigint') AS custkey
      FROM (SELECT o_orderkey,
                   parse_json(to_json(named_struct(
                     'p', o_totalprice, 'k', o_custkey))) AS v
            FROM orders WHERE o_orderkey <= 200)
      ORDER BY o_orderkey
    """),

    // Spark 4 declarative SQL UDF (CREATE FUNCTION ... RETURN expr):
    // the body inlines into the plan, so pushdown/codegen see through
    // it — the oracle is the inlined expression
    "qBF_sql_udf" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      // the UDF returns an EXACT decimal so the Σ above it is
      // order-invariant (round-14 float contract — a DOUBLE-returning
      // body would put a reorderable float sum under the round-2 hash)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(
               p DOUBLE, d DOUBLE) RETURNS DECIMAL(16,4)
               RETURN CAST(p AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(d AS DECIMAL(3,2)))""")
      s.sql("""
        SELECT l_returnflag,
               round(CAST(sum(graft_disc_price(l_extendedprice, l_discount))
                     AS DOUBLE), 2) AS revenue
        FROM lineitem WHERE l_quantity > 5
        GROUP BY l_returnflag ORDER BY l_returnflag
      """)
    }),

    // Spark 4 string collations: UTF8_LCASE equality semantics via
    // count(DISTINCT) over a deliberately case-mixed value — the
    // case-insensitive count collapses what the binary count keeps
    // apart; the oracle lowers explicitly
    "qBG_collation" -> sql("""
      SELECT count(DISTINCT mixed COLLATE UTF8_LCASE) AS n_ci,
             count(DISTINCT mixed) AS n_cs
      FROM (SELECT CASE WHEN l_orderkey % 2 = 0
                        THEN lower(l_returnflag) ELSE l_returnflag END AS mixed
            FROM lineitem WHERE l_quantity > 45)
    """),

    // named-parameter binding (spark.sql(text, args)) feeding an
    // EXECUTE IMMEDIATE with positional USING binds — the
    // prepared-statement surface a query server exposes
    "qBH_param_sql" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val inner = s.sql(
        "SELECT count(*) AS n_all FROM lineitem WHERE l_quantity > :q",
        Map("q" -> 45)).head().getLong(0)
      s.sql(s"""
        EXECUTE IMMEDIATE
          'SELECT l_returnflag, count(*) AS n, ? AS n_global
           FROM lineitem WHERE l_quantity > ?
           GROUP BY l_returnflag ORDER BY l_returnflag'
        USING $inner, 45
      """)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q63_intersect_all" -> """
      SELECT nationkey, COUNT(*) AS multiplicity FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier) t
      GROUP BY nationkey ORDER BY nationkey""",
    "q64_except_all" -> """
      SELECT nationkey, COUNT(*) AS multiplicity FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier) t
      GROUP BY nationkey ORDER BY nationkey""",
    "q65_lateral" -> """
      SELECT c.c_custkey, t.maxp
      FROM customer c,
      LATERAL (SELECT MAX(o_totalprice) AS maxp FROM orders
               WHERE o_custkey = c.c_custkey) t
      WHERE c.c_custkey <= 300
      ORDER BY c.c_custkey""",
    "q66_string_agg" -> """
      SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q67_generator" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(unnest(range(1, l_linenumber + 1)) AS INT) AS n
      FROM lineitem WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber, n""",
    "q68_casts" -> """
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) AS key_str,
             CAST(floor(o_totalprice) AS BIGINT) AS price_long,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
             CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
             concat(CAST(o_orderkey AS VARCHAR), '-', o_orderstatus) AS tagged
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
    "q69_regexp" -> """
      SELECT p_partkey,
             regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
             regexp_extract(p_type, '^(\w+)', 1) AS first_type_word,
             CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels
      FROM part ORDER BY p_partkey""",
    "q70_date_trunc_variants" -> """
      SELECT o_orderkey,
             CAST(date_trunc('week', o_orderdate) AS VARCHAR) AS week_start,
             CAST(date_trunc('quarter', o_orderdate) AS VARCHAR) AS quarter_start,
             CAST(date_trunc('year', o_orderdate) AS VARCHAR) AS year_start,
             CAST(quarter(o_orderdate) AS INT) AS q
      FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""",
    "q71_bitwise" -> """
      SELECT l_orderkey, l_linenumber,
             l_orderkey & 255 AS and255,
             l_orderkey | l_linenumber AS or_ln,
             xor(l_orderkey, l_partkey) AS xor_pk,
             CAST(l_linenumber AS INT) << 3 AS shl3
      FROM lineitem WHERE l_orderkey <= 200
      ORDER BY l_orderkey, l_linenumber""",
    "q77_struct" -> """
      SELECT o_orderkey,
             (struct_pack(k := o_orderkey, p := o_totalprice)).p AS price_via_struct,
             (struct_pack(k := o_orderkey, p := o_totalprice)).k * 2 AS key_doubled
      FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""",
    "q74_offset" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""",
    "q75_try_cast" -> """
      SELECT p_partkey,
             TRY_CAST(p_type AS INT) AS bad_cast,
             TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_cast,
             TRY_CAST(substring(p_brand, 1, 2) AS INT) AS brand_prefix
      FROM part ORDER BY p_partkey""",
    "q80_string_funcs2" -> """
      SELECT p_partkey,
             split_part(p_name, ' ', 2) AS word2,
             reverse(p_brand) AS rev_brand,
             repeat(p_brand, 2) AS double_brand,
             left(p_name, 4) AS l4,
             right(p_name, 3) AS r3,
             contains(p_name, 'old') AS has_old,
             starts_with(p_type, 'ty') AS ty_prefix
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""",
    "q96_ref_integrity" -> """
      SELECT 'lineitem_without_order' AS check_name,
             CAST(COUNT(*) AS BIGINT) AS n_violations
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      UNION ALL
      SELECT 'order_without_customer', CAST(COUNT(*) AS BIGINT)
      FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      UNION ALL
      SELECT 'customer_with_bad_nation', CAST(COUNT(*) AS BIGINT)
      FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
      UNION ALL
      SELECT 'lineitem_with_bad_part', CAST(COUNT(*) AS BIGINT)
      FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
      ORDER BY check_name""",
    "q93_decimal_exact" -> """
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS exact_sum,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
               AS exact_disc_sum
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q94_null_safe_eq" -> """
      SELECT a.c_custkey, b.c_custkey AS other
      FROM (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer WHERE c_custkey <= 50) a
      JOIN (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg FROM customer WHERE c_custkey <= 50) b
        ON a.seg IS NOT DISTINCT FROM b.seg AND a.c_custkey < b.c_custkey
      ORDER BY a.c_custkey, other""",
    "q85_map_funcs" -> """
      WITH m AS (SELECT n_nationkey,
        MAP {'name': n_name, 'region': CAST(n_regionkey AS VARCHAR)} AS mp FROM nation)
      SELECT n_nationkey, mp['name'][1] AS name_via_map,
             CAST(cardinality(mp) AS INT) AS map_size,
             array_to_string(list_sort(map_keys(mp)), ',') AS keys
      FROM m ORDER BY n_nationkey""",
    "q86_histogram" -> """
      SELECT CAST(floor((o_totalprice - 1000) / 50000) AS INT) AS bucket,
             COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
      FROM orders GROUP BY 1 ORDER BY 1""",
    "q83_recursive_cte" -> """
      WITH RECURSIVE spine(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM spine WHERE n < 31
      )
      SELECT n, COUNT(o_orderkey) AS n_orders
      FROM spine LEFT JOIN orders
        ON day(o_orderdate) = n AND year(o_orderdate) = 1995 AND month(o_orderdate) = 1
      GROUP BY n ORDER BY n""",
    "q84_values_join" -> """
      SELECT v.tag, COUNT(*) AS n
      FROM orders JOIN (VALUES ('O', 'open'), ('F', 'filled'), ('P', 'pending'))
        AS v(status, tag) ON o_orderstatus = v.status
      GROUP BY v.tag ORDER BY v.tag""",
    "q82_lambda_funcs" -> """
      SELECT vec_id,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
             round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 6) AS l1_norm,
             len(list_filter(embedding, x -> x > CAST(0.3 AS FLOAT))) > 0 AS has_large,
             round(list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)[1], 6) AS first_doubled
      FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""",
    "q81_union_coercion" -> """
      SELECT val, src FROM (
        SELECT CAST(p_size AS INT) AS val, 'int_side' AS src FROM part WHERE p_partkey <= 100
        UNION ALL
        SELECT p_retailprice AS val, 'dbl_side' AS src FROM part WHERE p_partkey <= 100) u
      ORDER BY src, val""",
    "q78_window_dist" -> """
      SELECT o_orderkey, o_orderstatus,
             NTILE(4) OVER w AS quartile,
             ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
             ROUND(CUME_DIST() OVER w, 8) AS cume,
             NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
      FROM orders WHERE o_orderkey <= 2000
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey""",
    "q79_group_by_all" -> """
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sq
      FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""",
    "q76_bool_agg" -> """
      SELECT l_returnflag,
             bool_and(l_quantity >= 1) AS all_qty_ge1,
             bool_or(l_discount > 0.09) AS any_big_disc,
             COUNT(*) FILTER (WHERE l_tax > 0.05) AS n_high_tax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "qBD_pipe_syntax" -> """
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty, count(*) AS n
      FROM lineitem WHERE l_quantity > 10
      GROUP BY l_returnflag, l_linestatus
      HAVING count(*) > 100
      ORDER BY l_returnflag, l_linestatus""",
    "qBE_variant" -> """
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS price,
             o_custkey AS custkey
      FROM orders WHERE o_orderkey <= 200
      ORDER BY o_orderkey""",
    "qBF_sql_udf" -> """
      SELECT l_returnflag,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                   (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                   AS DOUBLE), 2) AS revenue
      FROM lineitem WHERE l_quantity > 5
      GROUP BY l_returnflag ORDER BY l_returnflag""",
    "qBG_collation" -> """
      SELECT count(DISTINCT lower(mixed)) AS n_ci,
             count(DISTINCT mixed) AS n_cs
      FROM (SELECT CASE WHEN l_orderkey % 2 = 0
                        THEN lower(l_returnflag) ELSE l_returnflag END AS mixed
            FROM lineitem WHERE l_quantity > 45)""",
    "qBH_param_sql" -> """
      SELECT l_returnflag, count(*) AS n,
             (SELECT count(*) FROM lineitem WHERE l_quantity > 45) AS n_global
      FROM lineitem WHERE l_quantity > 45
      GROUP BY l_returnflag ORDER BY l_returnflag""",
  ).map { case (k, v) => k -> v.trim.replaceAll("\\s+", " ") }
}
