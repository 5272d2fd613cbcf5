package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query suite over the TPC-H-ish fixture tables: scans,
  * selective filters (parquet pushdown), equi/broadcast joins, hash
  * aggregation, rollup, windows (ranking + running frames), sorts,
  * top-k, set ops, semi/anti joins, string/date/regexp functions.
  * Every query here is oracle-checked against DuckDB.
  *
  * Scale notes are per query; common themes: small dimensions
  * (region/nation/supplier/part/customer) are broadcast so the fact
  * table (lineitem) never shuffles for a join; aggregates run
  * partial+final; filters and projections reach the parquet scan
  * (verified via `.explain` — PushedFilters / narrow ReadSchema).
  */
object Relational {

  // exact money arithmetic — single shared definition point, see Exact
  import Exact.{dec, dec2, frac, money}

  def all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q32, q33, q34, q35, q36, q37, q55, q56, q58, q59, q60, q61, q62)

  /** TPC-H Q1 shape: full-scan hash aggregate on low-cardinality keys.
    * Scale: partial aggregation collapses 100 TB to ~6 groups map-side;
    * the exchange moves KBs.
    */
  val q01: QueryDef = QueryDef.sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(col("l_quantity")).as("sum_qty"),
        money(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * frac(lit(1.0) - col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * frac(lit(1.0) - col("l_discount"))
          * frac(lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
        (money(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6 shape: highly selective scan -> single global aggregate.
    * Scale: all three predicates push to parquet row-group pruning;
    * ReadSchema is 4 columns of 11.
    */
  val q02: QueryDef = QueryDef.sql(
    "q02_selective_filter",
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24.0""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
      .filter(col("l_quantity") < 24.0)
      .agg(
        sum(dec2(col("l_extendedprice")) * frac(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** Revenue per nation: fact table joined through two broadcast dims.
    * Scale: customer->nation are broadcast; lineitem->orders is the one
    * real (co-partitionable) shuffle join — on a cluster, bucket both
    * by orderkey to eliminate it.
    */
  val q03: QueryDef = QueryDef.sql(
    "q03_revenue_by_nation",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * frac(lit(1.0) - col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Broadcast-join fact to part dimension, aggregate by brand. */
  val q04: QueryDef = QueryDef.sql(
    "q04_brand_agg",
    """SELECT p_brand,
      |  count(*) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        money(col("l_quantity")).as("sum_qty"),
        money(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q5 shape: 6-table join chain pruned by region.
    * Scale: region/nation/supplier/customer all broadcast; the join
    * order lets Catalyst push the r_name filter through the dim chain
    * before it ever touches the fact table.
    */
  val q05: QueryDef = QueryDef.sql(
    "q05_region_revenue",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * frac(lit(1.0) - col("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Ranking window: top-3 orders per customer.
    * Scale: one hash exchange on custkey, then an in-partition sort;
    * no global sort until the final (small) result ORDER BY.
    */
  val q06: QueryDef = QueryDef.sql(
    "q06_topk_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders)
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Running-total window frame per supplier over ship time (frames +
    * multi-key deterministic ordering). Money stays decimal inside the
    * running sum so every prefix is exact.
    */
  val q07: QueryDef = QueryDef.sql(
    "q07_running_total",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM lineitem
      |WHERE l_suppkey <= 5
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_extendedprice"))).over(w).cast("double").as("running_spend"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Distinct aggregation (expand-based distinct-agg rewrite). */
  val q08: QueryDef = QueryDef.sql(
    "q08_distinct_agg",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))
  }

  /** ROLLUP grouping sets; null grouping markers coalesced to a sentinel
    * so cross-engine null ordering/hashing never matters.
    */
  val q09: QueryDef = QueryDef.sql(
    "q09_rollup",
    """SELECT coalesce(l_returnflag, '(all)') AS rflag,
      |  coalesce(l_linestatus, '(all)') AS lstatus,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), money(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("rflag"), col("lstatus"))
  }

  /** Global top-k: TakeOrderedAndProject, not a full sort.
    * Scale: per-partition top-10 heaps merged on the driver — no global
    * sort of 100 TB ever happens.
    */
  val q10: QueryDef = QueryDef.sql(
    "q10_global_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Set operation: nations with customers but no well-capitalized
    * supplier (EXCEPT = distinct set difference in both engines).
    */
  val q11: QueryDef = QueryDef.sql(
    "q11_set_except",
    """SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |WHERE s_acctbal > 8000.0
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
      .except(Tables.supplier(s, dir).filter(col("s_acctbal") > 8000.0)
        .select(col("s_nationkey").as("nationkey")).distinct())
      .orderBy(col("nationkey"))
  }

  /** Semi join (EXISTS): customers with at least one urgent large order. */
  val q12: QueryDef = QueryDef.sql(
    "q12_exists_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT'
      |                AND o_totalprice > 100000.0)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 100000.0)
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Anti join (NOT EXISTS): parts that never shipped with a discount. */
  val q13: QueryDef = QueryDef.sql(
    "q13_not_exists_anti",
    """SELECT p_partkey, p_brand FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_discount >= 0.09)
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir).filter(col("l_discount") >= 0.09)
    Tables.part(s, dir)
      .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** String function surface: upper/substring/length/concat/regexp. */
  val q14: QueryDef = QueryDef.sql(
    "q14_string_funcs",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  substring(p_name, 1, 12) AS name_prefix,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  concat(p_brand, '/', p_type) AS brand_type,
      |  regexp_extract(p_type, '([A-Z]+)', 1) AS first_word
      |FROM part
      |WHERE p_size >= 30
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_size") >= 30)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name_prefix"),
        length(col("p_name")).cast("bigint").as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"))
      .orderBy(col("p_partkey"))
  }

  /** Semi-structured extraction from the events.props JSON-ish payload
    * via regexp (identical regexp dialect both engines).
    */
  val q15: QueryDef = QueryDef.sql(
    "q15_events_props",
    """SELECT event_type,
      |  count(*) AS n,
      |  CAST(sum(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit(""))
          .cast("bigint")).as("sum_k"),
        money(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Time bucketing on the event stream table (batch view): hourly
    * per-type counts — the batch twin of the streaming windowed agg in
    * graft.streaming.EventStreams.
    */
  val q16: QueryDef = QueryDef.sql(
    "q16_events_hourly",
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour_bucket, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE event_type IN ('purchase', 'error')
      |GROUP BY hour_bucket, event_type
      |ORDER BY hour_bucket, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd HH").as("hour_bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), money(col("value")).as("sum_value"))
      .orderBy(col("hour_bucket"), col("event_type"))
  }

  /** Conditional aggregation (manual pivot) by order priority. */
  val q17: QueryDef = QueryDef.sql(
    "q17_case_pivot",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
        (money(col("o_totalprice")) / count(lit(1))).as("avg_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Date bucketing: per-month order volume. */
  val q18: QueryDef = QueryDef.sql(
    "q18_monthly_orders",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY month
      |ORDER BY month""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), money(col("o_totalprice")).as("revenue"))
      .orderBy(col("month"))
  }

  /** Per-group argmax via ranking window: richest customer per nation. */
  val q19: QueryDef = QueryDef.sql(
    "q19_argmax_per_group",
    """SELECT n_name, c_custkey, c_acctbal FROM (
      |  SELECT n_name, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY n_name
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |WHERE rnk = 1
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rnk"))
      .filter(col("rnk") === 1)
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("n_name"))
  }

  /** Ordered array aggregation serialized to a string (engine-neutral
    * representation of collect_list + sort).
    */
  val q20: QueryDef = QueryDef.sql(
    "q20_order_lines",
    """SELECT l_orderkey,
      |  count(*) AS n_lines,
      |  array_to_string(array_agg(l_linenumber ORDER BY l_linenumber), ',') AS line_numbers,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |WHERE l_orderkey <= 500
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 500)
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        concat_ws(",", array_sort(collect_list(col("l_linenumber")))).as("line_numbers"),
        money(col("l_quantity")).as("total_qty"))
      .orderBy(col("l_orderkey"))
  }

  /** Analytic lag: per-user event value deltas (ordered, tie-broken). */
  val q32: QueryDef = QueryDef.sql(
    "q32_lag_delta",
    """SELECT user_id, event_id, value,
      |  value - lag(value) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS delta
      |FROM events
      |WHERE user_id <= 10
      |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
    // nulls-last: match DuckDB's default null placement on junk rows
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    Tables.events(s, dir)
      .filter(col("user_id") <= 10)
      .select(col("user_id"), col("event_id"), col("value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** CUBE grouping sets (all four combinations). */
  val q33: QueryDef = QueryDef.sql(
    "q33_cube",
    """SELECT coalesce(l_returnflag, '(all)') AS rflag,
      |  coalesce(l_linestatus, '(all)') AS lstatus,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rflag, lstatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), money(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
        col("n"), col("sum_price"))
      .orderBy(col("rflag"), col("lstatus"))
  }

  /** Analytic window mix: partition-wide min + lead with sentinel for
    * the partition tail (avoids cross-engine null-typing drift).
    */
  val q34: QueryDef = QueryDef.sql(
    "q34_first_next",
    """SELECT o_custkey, o_orderkey,
      |  strftime(min(o_orderdate) OVER (PARTITION BY o_custkey), '%Y-%m-%d') AS first_order_day,
      |  coalesce(lead(o_orderkey) OVER (PARTITION BY o_custkey
      |                                  ORDER BY o_orderdate, o_orderkey), -1) AS next_orderkey
      |FROM orders
      |WHERE o_custkey <= 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val part = Window.partitionBy(col("o_custkey"))
    val seq = part.orderBy(col("o_orderdate").asc_nulls_last,
      col("o_orderkey").asc_nulls_last)
    Tables.orders(s, dir)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(min(col("o_orderdate")).over(part), "yyyy-MM-dd")
          .as("first_order_day"),
        coalesce(lead(col("o_orderkey"), 1).over(seq), lit(-1L))
          .as("next_orderkey"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Set-op composition: UNION (distinct) then INTERSECT. */
  val q35: QueryDef = QueryDef.sql(
    "q35_union_intersect",
    """SELECT nationkey FROM (
      |  SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
      |  UNION
      |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000.0)
      |INTERSECT
      |SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey <= 2
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).filter(col("c_acctbal") > 9000.0)
      .select(col("c_nationkey").as("nationkey"))
    val su = Tables.supplier(s, dir).filter(col("s_acctbal") > 9000.0)
      .select(col("s_nationkey").as("nationkey"))
    val n = Tables.nation(s, dir).filter(col("n_regionkey") <= 2)
      .select(col("n_nationkey").as("nationkey"))
    c.union(su).distinct().intersect(n).orderBy(col("nationkey"))
  }

  /** Range join: equi key + time-band predicate (lineitems shipped
    * within 90 days of their order). Catalyst keeps the equi key as the
    * join key and evaluates the band as a join-side filter — a
    * sort-merge/shuffled-hash join, never a nested loop.
    */
  val q36: QueryDef = QueryDef.sql(
    "q36_range_join",
    """SELECT o_orderkey, count(*) AS n_fast,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_fast
      |FROM orders JOIN lineitem
      |  ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      |WHERE o_custkey < 50
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir).filter(col("o_custkey") < 50)
    Tables.lineitem(s, dir)
      .join(o,
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_fast"), money(col("l_quantity")).as("qty_fast"))
      .orderBy(col("o_orderkey"))
  }

  /** Backward as-of join (graft.ops.AsOfJoin union+window formulation)
    * vs DuckDB's native ASOF JOIN: each event picks up the user's most
    * recent order at-or-before the event time. Right side pre-deduped
    * per (key, time) so tie-winners are engine-independent.
    */
  val q37: QueryDef = QueryDef.sql(
    "q37_asof_join",
    """WITH r AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      |           FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
      |     l AS (SELECT event_id, user_id, ts FROM events WHERE user_id < 100)
      |SELECT l.event_id, l.user_id,
      |  coalesce(r.o_orderkey, -1) AS last_orderkey,
      |  coalesce(strftime(r.o_orderdate, '%Y-%m-%d'), '') AS last_orderday
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.o_custkey AND l.ts >= r.o_orderdate
      |ORDER BY l.event_id""".stripMargin) { (s, dir) =>
    val r = Tables.orders(s, dir).filter(col("o_custkey") < 100)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val l = Tables.events(s, dir).filter(col("user_id") < 100)
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.asofBackward(l, r, "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_orderkey", "o_orderdate"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("o_orderkey"), lit(-1L)).as("last_orderkey"),
        coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit(""))
          .as("last_orderday"))
      .orderBy(col("event_id"))
  }

  /** Full outer join: per-nation customer and supplier counts, keeping
    * nations that only have one side. Keys coalesced to a total value
    * so null ordering/hashing never differs across engines.
    */
  val q55: QueryDef = QueryDef.sql(
    "q55_full_outer",
    """SELECT coalesce(c.nk, s.nk) AS nationkey,
      |  coalesce(c.n_cust, 0) AS n_cust,
      |  coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
      |      FROM customer WHERE c_acctbal > 9000.0 GROUP BY nk) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nk, count(*) AS n_supp
      |      FROM supplier WHERE s_acctbal > 8000.0 GROUP BY nk) s
      |  ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).filter(col("c_acctbal") > 9000.0)
      .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, dir).filter(col("s_acctbal") > 8000.0)
      .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
    c.join(su, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Date arithmetic + null-grouping semantics: ship latency in days,
    * grouped with an injected null bucket (both engines group nulls
    * together; the sentinel keeps hashing engine-neutral).
    */
  val q56: QueryDef = QueryDef.sql(
    "q56_date_math",
    """SELECT coalesce(CAST(nullif(l_discount, 0.0) AS VARCHAR), '(zero)') AS disc_bucket,
      |  count(*) AS n,
      |  CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_latency_days,
      |  CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_latency,
      |  CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_latency
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey < 200
      |GROUP BY disc_bucket
      |ORDER BY disc_bucket""".stripMargin) { (s, dir) =>
    val latency = datediff(col("l_shipdate"), col("o_orderdate")).cast("bigint")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_custkey") < 200),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(coalesce(nullif(col("l_discount"), lit(0.0)).cast("string"),
        lit("(zero)")).as("disc_bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(latency).as("total_latency_days"),
        min(latency).as("min_latency"),
        max(latency).as("max_latency"))
      .orderBy(col("disc_bucket"))
  }

  /** Dispersion/correlation statistics from EXACT decimal sums (the
    * textbook one-pass formulas over Σx, Σx², Σxy), so both engines
    * derive identical doubles — the built-in stddev/corr aggregates
    * accumulate in floating point with engine-specific order and
    * cannot hash-match.
    */
  val q58: QueryDef = QueryDef.sql(
    "q58_exact_stats",
    """SELECT l_returnflag, n,
      |  round(sqrt((sx2 - sx * sx / n) / (n - 1)), 9) AS stddev_qty,
      |  round((sxy - sx * sy / n)
      |    / (sqrt(sx2 - sx * sx / n) * sqrt(sy2 - sy * sy / n)), 9) AS corr_qty_price
      |FROM (
      |  SELECT l_returnflag,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy2,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val qd = dec(col("l_quantity"))
    val pd = dec(col("l_extendedprice"))
    val base = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(qd).cast("double").as("sx"),
        sum(qd * qd).cast("double").as("sx2"),
        sum(pd).cast("double").as("sy"),
        sum(pd * pd).cast("double").as("sy2"),
        sum(qd * pd).cast("double").as("sxy"))
    // round(9): the inputs are exact, but C++ (DuckDB) may contract
    // multiply-adds where the JVM cannot — derived stats can differ in
    // the last ulp; 9 decimals absorbs that without real precision loss
    base.select(
      col("l_returnflag"), col("n"),
      round(sqrt((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 9)
        .as("stddev_qty"),
      round((col("sxy") - col("sx") * col("sy") / col("n"))
        / (sqrt(col("sx2") - col("sx") * col("sx") / col("n"))
          * sqrt(col("sy2") - col("sy") * col("sy") / col("n"))), 9)
        .as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact median as an order statistic (row_number against the group
    * count) — engine-neutral, unlike interpolating percentile
    * aggregates. Median order value per customer segment-ish bucket.
    */
  val q59: QueryDef = QueryDef.sql(
    "q59_median_orderstat",
    """SELECT o_orderpriority, n, median_price FROM (
      |  SELECT o_orderpriority, o_totalprice AS median_price, rn, n
      |  FROM (
      |    SELECT o_orderpriority, o_totalprice,
      |      row_number() OVER (PARTITION BY o_orderpriority
      |                         ORDER BY o_totalprice, o_orderkey) AS rn,
      |      count(*) OVER (PARTITION BY o_orderpriority) AS n
      |    FROM orders))
      |WHERE rn = CAST(floor((n + 1) / 2) AS BIGINT)
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val wOrd = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_orderpriority"))
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_totalprice").as("median_price"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .filter(col("rn") === floor((col("n") + 1) / 2).cast("bigint"))
      .select(col("o_orderpriority"), col("n"), col("median_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Correlated scalar subquery through the engine's SQL entry path
    * (temp views + spark.sql) — Catalyst decorrelates it to an outer
    * join + aggregate; DuckDB runs the same text modulo quoting.
    */
  val q60: QueryDef = QueryDef.sql(
    "q60_correlated_subquery",
    """SELECT c_custkey, c_name,
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey
      |     AND o.o_totalprice > 300000.0) AS n_big_orders
      |FROM customer c
      |WHERE c_custkey < 100
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    // scoped names: never register views named after base tables in the
    // shared long-lived session (they would shadow future SQL lookups)
    Tables.customer(s, dir).createOrReplaceTempView("graft_q60_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_q60_orders")
    s.sql(
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM graft_q60_orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_totalprice > 300000.0) AS n_big_orders
        |FROM graft_q60_customer c
        |WHERE c_custkey < 100
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Session windows over the event stream table via the built-in
    * session_window (batch mode) vs the classic gaps-and-islands SQL.
    * Spark's session end = last event + gap, so only start/count are
    * compared; the SQL breaks on gap >= 30min to match session_window's
    * half-open [start, last+gap) merge semantics at the exact boundary.
    */
  val q61: QueryDef = QueryDef.sql(
    "q61_session_windows",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE user_id < 20),
      |sess AS (
      |  SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("user_id") < 20)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Explicit GROUPING SETS (disjoint per-column totals + grand total)
    * with grouping() markers — the generalization rollup/cube are
    * sugar for, through the SQL entry path.
    */
  val q62: QueryDef = QueryDef.sql(
    "q62_grouping_sets",
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      |  coalesce(l_linestatus, '(all)') AS ls,
      |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      |  count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q62_lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
        |  coalesce(l_linestatus, '(all)') AS ls,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM graft_q62_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin)
  }
}
