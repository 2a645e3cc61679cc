package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/**
 * The batch relational layer over the star-schema tables: joins,
 * aggregations, windows, rollup/cube, set ops, distinct, scalar functions
 * (SURVEY §2.8). All queries are declarative DataFrame plans — Catalyst
 * handles pushdown/pruning; small dimension sides are broadcast explicitly.
 * Every query orders its output deterministically (ties broken by keys).
 */
object Relational {

  // ---------------------------------------------------------------- q01
  // TPC-H Q1-shaped pricing summary: filter + hash aggregate (partial/final
  // map-side combine — one shuffle of 4 grouped rows regardless of scale).
  private val q01 = QueryDef(
    "q01_pricing_summary",
    (s, dir) => {
      val li = rd(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          sum(chargeTerm(col("l_extendedprice"), col("l_discount"), col("l_tax"))).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${dsumSql("l_quantity")} AS sum_qty,
      ${dsumSql("l_extendedprice")} AS sum_base_price,
      CAST(SUM(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(${chargeTermSql("l_extendedprice", "l_discount", "l_tax")}) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  // Fact-to-dimension equi-joins: lineitem ⋈ orders ⋈ customer. customer is
  // broadcast (dimension ≪ fact); orders⋈lineitem shuffles on the join key
  // only. Revenue per market segment.
  private val q02 = QueryDef(
    "q02_revenue_by_segment",
    (s, dir) => {
      val li = rd(s, dir, "lineitem")
      val o = rd(s, dir, "orders")
      val c = rd(s, dir, "customer")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        // size-gated hint: customer grows with SF (the d09 hazard class)
        .join(bcastIfSmall(c, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"),
          sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""SELECT c_mktsegment,
      COUNT(DISTINCT o_orderkey) AS n_orders, COUNT(*) AS n_items,
      CAST(SUM(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- q03
  // Snowflake join chain (customer ⋈ nation ⋈ region, all dims broadcast)
  // + ROLLUP for hierarchical subtotals.
  private val q03 = QueryDef(
    "q03_region_rollup",
    (s, dir) => {
      val c = rd(s, dir, "customer")
      val n = rd(s, dir, "nation")
      val r = rd(s, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    Some(s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
      ${dsumSql("c_acctbal")} AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  // ---------------------------------------------------------------- q04
  // Ranking window: top-5 line items per return flag. l_returnflag has ~3
  // distinct values, so a single window would funnel the whole table into
  // ≤3 tasks — a skew scale-killer at 100 TB. Two-phase instead: local
  // top-5 within (flag, salt) buckets (64× the parallelism; the global
  // top-5 is necessarily a subset of the bucket winners), then the real
  // window over ≤ flags × 64 × 5 surviving rows.
  private val q04 = QueryDef(
    "q04_top_lineitems_per_flag",
    (s, dir) => {
      val order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val w1 = Window.partitionBy(col("l_returnflag"), col("salt")).orderBy(order: _*)
      val w = Window.partitionBy(col("l_returnflag")).orderBy(order: _*)
      rd(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("salt", pmod(col("l_orderkey"), lit(64)))
        .withColumn("r1", row_number().over(w1))
        .filter(col("r1") <= 5)
        .drop("salt", "r1")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .orderBy(col("l_returnflag"), col("rnk"))
    },
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rnk FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        ROW_NUMBER() OVER (PARTITION BY l_returnflag
          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
      FROM lineitem) WHERE rnk <= 5 ORDER BY l_returnflag, rnk"""))

  // ---------------------------------------------------------------- q05
  // Analytic running total per customer over order history (frame window).
  private val q05 = QueryDef(
    "q05_running_order_total",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rd(s, dir, "orders")
        .filter(col("o_custkey") % 50 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders WHERE o_custkey % 50 = 0 ORDER BY o_custkey, o_orderkey"""))

  // ---------------------------------------------------------------- q06
  // Left-semi join (EXISTS): segments of customers that have orders.
  private val q06 = QueryDef(
    "q06_segments_with_orders",
    (s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  // ---------------------------------------------------------------- q07
  // Left-anti join (NOT EXISTS): customers with no orders.
  private val q07 = QueryDef(
    "q07_customers_without_orders",
    (s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey"""))

  // ---------------------------------------------------------------- q08
  // Set operations: INTERSECT / EXCEPT / UNION (all distinct-semantics).
  private val q08 = QueryDef(
    "q08_set_ops",
    (s, dir) => {
      val c = rd(s, dir, "customer")
      val o = rd(s, dir, "orders")
      val withOrders = o.select(col("o_custkey").as("k"))
      val richCust = c.filter(col("c_acctbal") > 1000).select(col("c_custkey").as("k"))
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      withOrders.intersect(richCust)
        .union(building.except(withOrders))
        .distinct()
        .orderBy(col("k"))
    },
    Some("""SELECT k FROM (
      (SELECT o_custkey AS k FROM orders
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_acctbal > 1000)
      UNION
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
       EXCEPT
       SELECT o_custkey FROM orders)) ORDER BY k"""))

  // ---------------------------------------------------------------- q09
  // Exact distinct counts (expand-based multi-distinct aggregate).
  private val q09 = QueryDef(
    "q09_distinct_counts",
    (s, dir) =>
      rd(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows")),
    Some("""SELECT COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps,
      COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_rows
    FROM lineitem"""))

  // ---------------------------------------------------------------- q10
  // Date-function aggregation: order volume by year × status.
  private val q10 = QueryDef(
    "q10_orders_by_year",
    (s, dir) =>
      rd(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("yr"), col("o_orderstatus")),
    Some(s"""SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, o_orderstatus,
      COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
    FROM orders GROUP BY 1, 2 ORDER BY yr, o_orderstatus"""))

  // ---------------------------------------------------------------- q11
  // Conditional aggregation (CASE inside SUM).
  private val q11 = QueryDef(
    "q11_conditional_agg",
    (s, dir) =>
      rd(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_discounted"),
          sum(when(col("l_tax") > 0.04, 1L).otherwise(0L)).as("n_taxed"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
      CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
      COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---------------------------------------------------------------- q12
  // String scalar functions: SUBSTR (the reference's partition-derive
  // function, X1), UPPER, LENGTH.
  private val q12 = QueryDef(
    "q12_name_prefix_stats",
    (s, dir) =>
      rd(s, dir, "customer")
        .groupBy(
          upper(substring(col("c_name"), 1, 9)).as("prefix"),
          length(col("c_name")).as("name_len"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prefix"), col("name_len")),
    Some("""SELECT UPPER(SUBSTR(c_name, 1, 9)) AS prefix,
      CAST(LENGTH(c_name) AS INTEGER) AS name_len, COUNT(*) AS n
    FROM customer GROUP BY 1, 2 ORDER BY prefix, name_len"""))

  // ---------------------------------------------------------------- q13
  // Array/string split: first token of p_type, joined against lineitem
  // revenue (broadcast dimension join on the fact table).
  private val q13 = QueryDef(
    "q13_revenue_by_part_class",
    (s, dir) => {
      val li = rd(s, dir, "lineitem")
      val p = rd(s, dir, "part")
        .select(col("p_partkey"), split(col("p_type"), " ").getItem(0).as("p_class"))
      // size-gated hint: part grows with SF (the d09 hazard class)
      li.join(bcastIfSmall(p, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_class"))
        .agg(count(lit(1)).as("n"), sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("p_class"))
    },
    Some(s"""SELECT string_split(p_type, ' ')[1] AS p_class, COUNT(*) AS n,
      CAST(SUM(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1 ORDER BY p_class"""))

  // ---------------------------------------------------------------- q14
  // CUBE over order status × priority.
  private val q14 = QueryDef(
    "q14_cube_status_priority",
    (s, dir) =>
      rd(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      ${dsumSql("o_totalprice")} AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  // --------------------------------------------------------------- q106
  // TYPED Dataset path: case-class Encoders + `groupByKey` + a custom
  // `Aggregator[IN, BUF, OUT]` applied via `.agg(toColumn)` — the
  // compile-time-safe API surface (field typos fail at compile, not at
  // analysis). The Aggregator is PARTIAL-MERGE capable (reduce into a
  // (count, cents) buffer per partition, merge buffers at the exchange),
  // so the plan keeps map-side combine exactly like the untyped q01 —
  // the shuffle carries |groups| buffers, not rows. Costs to know at
  // 100 TB, stated in the plan: `groupByKey` inserts AppendColumns (a
  // per-row deserialization to extract the key) and the aggregate runs
  // as ObjectHashAggregate outside whole-stage codegen — the typed path
  // buys safety on warm paths; hot paths stay in untyped `Column`s.
  // Quantities are summed as exact integer CENTS inside the buffer, so
  // the typed fold is order-independent and hash-matches DuckDB.
  private val q106 = QueryDef(
    "q106_typed_dataset",
    (s, dir) => {
      import s.implicits._
      val ds = rd(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("double"))
        .as[TypedLine]
      ds.groupByKey(_.l_returnflag)
        .agg(TypedLineStats.toColumn.name("stats"))
        .select(col("key").as("l_returnflag"),
          col("stats.n").as("n"),
          col("stats.sum_qty").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
      CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val defs: Seq[QueryDef] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14,
      q106)
}

/** Typed row for q106: only the consumed fields — the `.as[TypedLine]`
  * projection prunes the parquet scan to these two columns. */
final case class TypedLine(l_returnflag: String, l_quantity: Double)

/** q106's typed statistics: count + exact integer-cent quantity sum. */
final case class TypedLineOut(n: Long, sum_qty: Double)

object TypedLineStats
    extends org.apache.spark.sql.expressions.Aggregator[TypedLine, (Long, Long), TypedLineOut] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: TypedLine): (Long, Long) =
    (b._1 + 1L, b._2 + math.round(a.l_quantity * 100))
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Long, Long)): TypedLineOut =
    TypedLineOut(b._1, b._2.toDouble / 100.0)
  override def bufferEncoder: org.apache.spark.sql.Encoder[(Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
  override def outputEncoder: org.apache.spark.sql.Encoder[TypedLineOut] =
    org.apache.spark.sql.Encoders.product[TypedLineOut]
}
