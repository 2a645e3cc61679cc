package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Tables._

/**
 * Subquery / lateral / map-typed / grouping-metadata SQL surfaces
 * (round-6 widening of SURVEY §2.8): correlated scalar subqueries,
 * LATERAL joins with correlated ORDER BY + LIMIT, MapType construction
 * + map higher-order functions, GROUPING() labels over ROLLUP
 * subtotals, and ANSI-safe try_divide arithmetic.
 *
 * Scale notes (100 TB): q59's correlated scalar subquery is
 * decorrelated by Catalyst (RewriteCorrelatedScalarSubquery) into one
 * aggregate over orders + one join on o_custkey — a single shuffle on a
 * high-cardinality key, NOT a per-row subquery execution; the re-read
 * of orders for the aggregate is the same scan Spark can reuse. q60's
 * correlated LIMIT is decorrelated into a row_number window partitioned
 * by the correlation key (nationkey) — 25 groups here, but the key is
 * the customer side's partition column so the window shuffles customer
 * once; no nested-loop per outer row. q61 builds per-group maps whose
 * size is bounded by the status domain (3), so map state stays
 * constant-size per group through the partial/final aggregate.
 */
object Subquery {

  private def withViews[T](s: SparkSession, dir: String, names: String*)(body: => T): T = {
    names.foreach(n => rd(s, dir, n).createOrReplaceTempView(s"sq_$n"))
    try body finally names.foreach(n => s.catalog.dropTempView(s"sq_$n"))
  }

  // ---------------------------------------------------------------- q59
  // Correlated scalar subquery: orders that alone account for more than
  // half of their customer's lifetime spend ("dominant orders"), rolled
  // up by market segment. Exact DECIMAL arithmetic on both engines.
  private def dominantSql(orders: String, customer: String) = s"""
    SELECT c_mktsegment,
           COUNT(*) AS n_dominant,
           ${dsumSql("o_totalprice")} AS sum_dominant
    FROM $orders o JOIN $customer c ON c.c_custkey = o.o_custkey
    WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * 2 >
          (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,2)))
           FROM $orders o2 WHERE o2.o_custkey = o.o_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  private val q59 = QueryDef(
    "q59_scalar_subquery",
    (s, dir) => withViews(s, dir, "orders", "customer") {
      s.sql(dominantSql("sq_orders", "sq_customer"))
    },
    Some(dominantSql("orders", "customer")))

  // ---------------------------------------------------------------- q60
  // LATERAL join with correlated ORDER BY + LIMIT: top-2 customers by
  // account balance per nation. Catalyst decorrelates the limit into a
  // partitioned row_number; DuckDB executes the same lateral shape.
  // No arithmetic — projection only, so DOUBLE c_acctbal is safe.
  private def lateralSql(nation: String, customer: String) = s"""
    SELECT n_name, t.c_name, t.c_acctbal
    FROM $nation n CROSS JOIN LATERAL (
      SELECT c_name, c_acctbal
      FROM $customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2) t
    ORDER BY n_name, t.c_acctbal DESC, t.c_name"""

  private val q60 = QueryDef(
    "q60_lateral_topk",
    (s, dir) => withViews(s, dir, "nation", "customer") {
      s.sql(lateralSql("sq_nation", "sq_customer"))
    },
    Some(lateralSql("nation", "customer")))

  // ---------------------------------------------------------------- q61
  // MapType surface: per priority, aggregate a status -> count map
  // (map_from_entries over a deterministically sorted entry list), then
  // answer everything from the MAP — keyed lookups (element_at),
  // map_filter for the busy-status count, and a fold over map_values for
  // the total. The oracle computes the same numbers relationally.
  private val q61 = QueryDef(
    "q61_map_metrics",
    (s, dir) =>
      rd(s, dir, "orders")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderpriority"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("o_orderstatus"), col("cnt"))))).as("m"))
        .select(
          col("o_orderpriority"),
          size(map_keys(col("m"))).cast("long").as("n_statuses"),
          coalesce(element_at(col("m"), lit("F")), lit(0L)).as("n_f"),
          coalesce(element_at(col("m"), lit("O")), lit(0L)).as("n_o"),
          coalesce(element_at(col("m"), lit("P")), lit(0L)).as("n_p"),
          expr("size(map_filter(m, (k, v) -> v >= 1000))").cast("long").as("n_busy"),
          expr("aggregate(map_values(m), 0L, (a, v) -> a + v)").as("n_total"))
        .orderBy(col("o_orderpriority")),
    Some("""WITH pc AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
                FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_statuses,
      CAST(COALESCE(SUM(cnt) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS n_f,
      CAST(COALESCE(SUM(cnt) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS n_o,
      CAST(COALESCE(SUM(cnt) FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS n_p,
      CAST(COUNT(*) FILTER (WHERE cnt >= 1000) AS BIGINT) AS n_busy,
      CAST(SUM(cnt) AS BIGINT) AS n_total
    FROM pc GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q64
  // GROUPING metadata in a ROLLUP: grouping(col) distinguishes "NULL
  // because subtotal row" from "NULL because the data was NULL" — the
  // correctness primitive for report layers over rollups (q03 produces
  // the rows; this labels them machine-readably). The composite level id
  // is built portably as 2·grouping(a) + grouping(b).
  private val q64 = QueryDef(
    "q64_grouping_metadata",
    (s, dir) =>
      rd(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          (grouping(col("o_orderstatus")).cast("long") * 2 +
            grouping(col("o_orderpriority")).cast("long")).as("level_id"),
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("level_id"), col("o_orderstatus"), col("o_orderpriority")),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS level_id,
      COUNT(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY level_id, o_orderstatus, o_orderpriority"""))

  // ---------------------------------------------------------------- q65
  // Fault-tolerant arithmetic under ANSI mode: try_divide turns the
  // zero-denominator case into NULL instead of an error (Spark 4 runs
  // ANSI-on by default — the ingest layer's try_cast discipline applied
  // to query-level math). Groups with no 'P' orders yield NULL ratios
  // that coalesce into the report default.
  private val q65 = QueryDef(
    "q65_try_arithmetic",
    (s, dir) =>
      rd(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_pending"),
          dsum(col("o_totalprice")).as("sum_price"))
        .select(
          col("o_orderpriority"), col("n"), col("n_pending"),
          coalesce(
            expr("try_divide(CAST(sum_price AS DOUBLE), CAST(n_pending AS DOUBLE))"),
            lit(-1.0)).as("price_per_pending"))
        .orderBy(col("o_orderpriority")),
    Some(s"""WITH g AS (
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        ${dsumSql("o_totalprice")} AS sum_price
      FROM orders GROUP BY 1)
    SELECT o_orderpriority, n, n_pending,
      COALESCE(CASE WHEN n_pending = 0 THEN NULL
        ELSE sum_price / n_pending END, -1.0) AS price_per_pending
    FROM g ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q66
  // Ordered-set aggregates: LISTAGG ... WITHIN GROUP (the SQL:2023 /
  // Spark 4 ordered string concat) + MEDIAN, over a keyed slice of
  // orders. The ordering key (the primary key) makes the concatenation
  // fully deterministic. Scale note: LISTAGG state is O(group
  // output) — unbounded on raw facts — so production use is exactly this
  // shape: aggregate a bounded, pre-filtered slice (manifests, sampled
  // audits), never the full fact table; median is one distributed
  // percentile pass. The modulo slice keeps list state ~30 entries/group
  // at any SF while still exercising the full agg path.
  private val q66 = QueryDef(
    "q66_ordered_set_aggs",
    (s, dir) =>
      rd(s, dir, "orders")
        .filter(col("o_orderkey") % 101 === 0)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          // median in exact integer CENTS: even-count interpolation then
          // yields x or x.5 — both exactly representable — and one final
          // IEEE division replaces the round(median(double), 2) whose
          // half-way behavior diverged between engines at sf0.1
          (median(expr("CAST(round(o_totalprice * 100) AS BIGINT)")) / 100.0)
            .as("median_price"),
          expr("listagg(CAST(o_orderkey AS STRING), ',') WITHIN GROUP (ORDER BY o_orderkey)")
            .as("key_list"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      median(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS median_price,
      string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS key_list
    FROM orders WHERE o_orderkey % 101 = 0
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---------------------------------------------------------------- q93
  // Map ALGEBRA (q61 builds maps; this computes WITH them): two per-type
  // hour→count maps (day 1 vs day 2 of the timeline) combined key-wise
  // with map_zip_with (null-safe: an hour active on only one day still
  // yields an entry), then exploded back to rows. This is the
  // state-as-map pattern of feature stores and per-entity counters —
  // the delta computation never re-touches the events, only the two
  // |hours|-sized maps. The oracle computes the same deltas from plain
  // conditional aggregation: map algebra must agree with first
  // principles.
  private val q93 = QueryDef(
    "q93_map_algebra",
    (s, dir) => {
      val hourly = events(s, dir)
        .withColumn("day", expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')"))
        .filter(col("day").isin(0, 1))
        .groupBy(col("event_type"), col("day"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      // one hour→count map per (type, day); keys are unique by
      // construction (the aggregate above), which map_from_entries
      // requires
      val maps = hourly.groupBy(col("event_type"), col("day"))
        .agg(expr("map_from_entries(sort_array(collect_list(struct(h, n))))")
          .as("m"))
      val m0 = maps.filter(col("day") === 0)
        .select(col("event_type"), col("m").as("m0"))
      val m1 = maps.filter(col("day") === 1)
        .select(col("event_type").as("et1"), col("m").as("m1"))
      m0.join(m1, col("event_type") === col("et1"), "full_outer")
        .select(coalesce(col("event_type"), col("et1")).as("event_type"),
          expr("""map_zip_with(coalesce(m0, map()), coalesce(m1, map()),
                    (k, a, b) -> coalesce(b, 0L) - coalesce(a, 0L))""").as("delta"))
        .select(col("event_type"), explode(col("delta")).as(Seq("h", "d")))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""WITH ev AS (
      SELECT event_type,
        datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
        hour(ts) AS h
      FROM events
      WHERE datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) IN (0, 1))
    SELECT event_type, CAST(h AS INT) AS h,
      CAST(SUM(CASE WHEN day = 1 THEN 1 ELSE 0 END)
           - SUM(CASE WHEN day = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM ev GROUP BY 1, 2 ORDER BY event_type, h"""))

  // --------------------------------------------------------------- q179
  // VARIANT SHREDDING — Spark 4's semi-structured VARIANT type (new API
  // surface): `props` is parsed ONCE to a variant value, then shredded
  // with typed `variant_get` paths — the open-schema ingestion pattern
  // that replaces per-query `from_json` with a parse-once binary
  // encoding (at 100 TB the variant column is written at ingest and
  // every query shreds the binary, never re-parsing text; this query is
  // that read path). A probe of an ABSENT path pins the missing→NULL
  // contract alongside the typed extraction. The DuckDB oracle shreds
  // the same JSON with its native JSON accessors — the gate checks the
  // shredded VALUES, which is exactly what must agree across engines.
  private val q179 = QueryDef(
    "q179_variant_shredding",
    (s, dir) => {
      events(s, dir).createOrReplaceTempView("graft_q179_events")
      s.sql(s"""WITH v AS (
        SELECT event_id, parse_json(props) AS pv FROM graft_q179_events),
      shred AS (
        SELECT event_id,
          variant_get(pv, '$$.k', 'bigint') AS k,
          variant_get(pv, '$$.absent', 'bigint') AS miss
        FROM v)
      SELECT k % 10 AS k_band, COUNT(*) AS n,
        CAST(SUM(k) AS BIGINT) AS k_sum,
        CAST(SUM(event_id % $HashMod) % $HashMod AS BIGINT) AS id_checksum,
        CAST(SUM(CASE WHEN miss IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_absent_nonnull
      FROM shred GROUP BY k % 10 ORDER BY k_band""")
    },
    Some(s"""WITH shred AS (
      SELECT event_id,
        CAST(json_extract(props, '$$.k') AS BIGINT) AS k,
        CAST(json_extract(props, '$$.absent') AS BIGINT) AS miss
      FROM events)
    SELECT k % 10 AS k_band, COUNT(*) AS n,
      CAST(SUM(k) AS BIGINT) AS k_sum,
      CAST(SUM(event_id % $HashMod) % $HashMod AS BIGINT) AS id_checksum,
      CAST(SUM(CASE WHEN miss IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_absent_nonnull
    FROM shred GROUP BY k % 10 ORDER BY k_band"""))

  // --------------------------------------------------------------- q190
  // SQL PIPE SYNTAX (Spark 4 `|>` operators) — the third Spark-4 SQL
  // surface after q178's recursive CTE and q179's VARIANT: the q01
  // pricing-summary shape written as a linear operator chain (FROM |>
  // WHERE |> EXTEND |> AGGREGATE … GROUP BY |> SELECT |> ORDER BY).
  // Parity, not novelty, is the point: the pipe chain must plan to the
  // same aggregate as the classic form, so the oracle IS the classic
  // SQL — any divergence in the pipe parser's semantics (aliasing,
  // grouping-column order, EXTEND scoping) fails the hash gate. Money
  // arithmetic uses the house exact-decimal forms on both sides.
  private val q190 = QueryDef(
    "q190_pipe_syntax",
    (s, dir) => {
      rd(s, dir, "lineitem").createOrReplaceTempView("graft_q190_lineitem")
      s.sql(s"""
        FROM graft_q190_lineitem
        |> WHERE l_quantity <= 45
        |> EXTEND ${discPriceSql("l_extendedprice", "l_discount")} AS disc_price
        |> AGGREGATE COUNT(*) AS n,
             ${dsumSql("l_quantity")} AS sum_qty,
             CAST(SUM(disc_price) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, sum_qty, revenue
        |> ORDER BY l_returnflag, l_linestatus""")
    },
    Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      ${dsumSql("l_quantity")} AS sum_qty,
      CAST(SUM(${discPriceSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
    FROM lineitem WHERE l_quantity <= 45
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  val defs: Seq[QueryDef] = Seq(q59, q60, q61, q64, q65, q66, q93, q179, q190)
}
