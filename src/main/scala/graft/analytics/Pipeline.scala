package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/**
 * Warehouse-pipeline operators (round-4 widening): runtime bloom-filter
 * join pruning, batch sessionization, and SCD2-style merge/upsert
 * classification — the three patterns every large ingest-and-publish
 * pipeline runs that weren't yet first-class in the catalog.
 *
 * Scale notes (100 TB): q51 is the runtime-filter pattern — when the dim
 * side is too large to broadcast-JOIN but its key *bloom* fits in a few MB,
 * shipping the bloom to the fact scan prunes most of the shuffle before it
 * happens (Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled`
 * injects exactly this shape under AQE; the explicit form here also covers
 * non-equi pipelines). False positives only cost shuffled rows — the exact
 * join behind the bloom keeps the result exact. q52 sessionizes with one
 * window partitioned on `user_id` (high cardinality — no skew funnel) and
 * all arithmetic on epoch-microsecond BIGINTs. q53 is the full-outer-join
 * merge: both sides hash-partition on the business key, so at scale it's
 * one co-partitioned shuffle; with the dim bucketed by key the merge runs
 * shuffle-free.
 */
object Pipeline {

  // ---------------------------------------------------------------- q51
  // Bloom-filter pre-filtered join: build a bloom over the BUILDING-segment
  // customer keys, ship it to the orders scan as a per-row predicate, then
  // run the exact semi-join on the survivors. The bloom eliminates ~80% of
  // the fact rows before the shuffle; the semi-join removes the bloom's
  // false positives, so the result is exactly the unfiltered semi-join.
  private val q51 = QueryDef(
    "q51_bloom_join",
    (s, dir) => {
      graft.functions.BloomFunctions.register(s)
      val dim = rd(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      // 2^20 expected items covers every SF here — the "dim too big to
      // broadcast-join, bloom still cheap" regime in miniature. NATIVE
      // BloomFilterAggregate/BloomFilterMightContain (the expressions
      // Spark's runtime-filter rule injects), not a UDF: the probe stays
      // inside whole-stage codegen. The built filter is DRIVER-BOUNDED
      // by construction (a bloom is a few hundred KB of bits) and must
      // be foldable for might_contain's input check, so the one-row
      // collect into a binary literal is the intended shape.
      val bloomBytes = dim
        .agg(call_function("bloom_filter_agg", col("c_custkey"), lit(1L << 20)).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      rd(s, dir, "orders")
        .filter(call_function("might_contain", lit(bloomBytes), col("o_custkey")))
        .join(dim, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
      ${dsumSql("o_totalprice")} AS sum_price
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')
    GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q52
  // Batch sessionization: per-user event stream cut into sessions at
  // >30-minute silence gaps (lag + running sum of boundary flags — the
  // classic gaps-and-islands plan), rolled up to a session-size histogram
  // with exact integer durations. The batch twin of q20's streaming
  // session windows.
  private val q52 = QueryDef(
    "q52_sessionize",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sessions = events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"), (max(col("us")) - min(col("us"))).as("dur_us"))
      sessions.groupBy(col("n_events"))
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("dur_us")).as("sum_dur_us"),
          max(col("dur_us")).as("max_dur_us"))
        .orderBy(col("n_events"))
    },
    Some("""WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    marked AS (
      SELECT user_id, us, event_id,
        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    numbered AS (
      SELECT user_id, us,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM marked),
    sessions AS (
      SELECT user_id, sess, COUNT(*) AS n_events, MAX(us) - MIN(us) AS dur_us
      FROM numbered GROUP BY 1, 2)
    SELECT n_events, COUNT(*) AS n_sessions,
      CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us,
      MAX(dur_us) AS max_dur_us
    FROM sessions GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q53
  // SCD2-style merge classification: a deterministic change feed (every
  // 7th customer's balance moves by +100.00; every 101st key arrives as a
  // brand-new row) merged against the current dimension with one full
  // outer join on the business key, every row classified
  // insert/update/unchanged and the post-merge balance totalled per
  // action. All money arithmetic in DECIMAL(18,2) — the change detection
  // compares exact values, never floats.
  private val q53 = QueryDef(
    "q53_scd2_merge",
    (s, dir) => {
      val cur = rd(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          expr("CAST(c_acctbal AS DECIMAL(18,2))").as("bal"))
      val upd = rd(s, dir, "customer")
        .filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("u_key"),
          expr("CAST(c_acctbal AS DECIMAL(18,2)) + CAST(100.00 AS DECIMAL(18,2))").as("u_bal"))
        .unionAll(
          rd(s, dir, "customer")
            .filter(col("c_custkey") % 101 === 0)
            .select((col("c_custkey") + 10000000L).as("u_key"),
              expr("CAST(50.00 AS DECIMAL(18,2))").as("u_bal")))
      cur.join(upd, col("key") === col("u_key"), "full_outer")
        .select(
          when(col("key").isNull, "insert")
            .when(col("u_key").isNull, "unchanged")
            .when(col("u_bal") =!= col("bal"), "update")
            .otherwise("unchanged").as("action"),
          coalesce(col("u_bal"), col("bal")).as("merged_bal"))
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("merged_bal")).cast("double").as("sum_bal"))
        .orderBy(col("action"))
    },
    Some("""WITH cur AS (
      SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer),
    upd AS (
      SELECT c_custkey AS u_key,
        CAST(c_acctbal AS DECIMAL(18,2)) + CAST(100.00 AS DECIMAL(18,2)) AS u_bal
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 10000000 AS u_key, CAST(50.00 AS DECIMAL(18,2)) AS u_bal
      FROM customer WHERE c_custkey % 101 = 0),
    merged AS (
      SELECT
        CASE WHEN key IS NULL THEN 'insert'
             WHEN u_key IS NULL THEN 'unchanged'
             WHEN u_bal <> bal THEN 'update'
             ELSE 'unchanged' END AS action,
        COALESCE(u_bal, bal) AS merged_bal
      FROM cur FULL OUTER JOIN upd ON key = u_key)
    SELECT action, COUNT(*) AS n_rows,
      CAST(SUM(merged_bal) AS DOUBLE) AS sum_bal
    FROM merged GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q67
  // Observed metrics (Dataset.observe / CollectMetrics): pipeline
  // monitoring aggregates collected as a SIDE EFFECT of a pass the job
  // runs anyway — here a count over the Dataset's OWN QueryExecution
  // stands in for the real sink. The action must run that exact QE:
  // `write`, `foreach`, and `rdd` all plan a fresh QueryExecution whose
  // metrics are only visible to a QueryExecutionListener (the production
  // wiring, asynchronous and so not oracle-checkable here).
  // At 100 TB this is the difference between free telemetry and a second
  // full scan: CollectMetrics folds the accumulators into the existing
  // task pass, and the driver reads one tiny row off
  // queryExecution.observedMetrics after the action. The returned
  // DataFrame IS that metrics row, so the oracle can replay it as plain
  // aggregates.
  private val q67 = QueryDef(
    "q67_observed_metrics",
    (s, dir) => {
      val observed = rd(s, dir, "lineitem")
        .observe("li_metrics",
          count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
          sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("n_null_discount"))
      observed.queryExecution.toRdd.count()
      val m = observed.queryExecution.observedMetrics("li_metrics")
      import s.implicits._
      Seq((m.getAs[Long]("n_rows"), m.getAs[Double]("sum_qty"),
        m.getAs[Long]("n_returned"), m.getAs[Long]("n_null_discount")))
        .toDF("n_rows", "sum_qty", "n_returned", "n_null_discount")
    },
    Some(s"""SELECT COUNT(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty,
      CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_discount
    FROM lineitem"""))

  // ---------------------------------------------------------------- q86
  // Incremental aggregate maintenance (materialized-view refresh): the
  // standing per-priority aggregate over the OLD data is merged with the
  // aggregate of the DELTA batch via one full-outer join + additive
  // combine — the refresh touches |groups| rows, never the history. The
  // invariant that makes this safe, f(all) = merge(f(old), f(delta)),
  // only holds for decomposable aggregates: sums/counts/max merge
  // directly, and avg must be re-derived from merged sums (averaging
  // averages would be wrong the moment group sizes differ). The oracle
  // recomputes from scratch over everything — merged must equal
  // recomputed exactly, which the DECIMAL money sums guarantee.
  private val q86 = QueryDef(
    "q86_incremental_agg",
    (s, dir) => {
      val split = "1997-01-01"
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("sum_price"),
          max(expr("CAST(o_totalprice AS DECIMAL(18,2))")).as("max_price"))
      val o = rd(s, dir, "orders")
      val base = agg(o.filter(col("o_orderdate") < split))
        .withColumnsRenamed(Map("o_orderpriority" -> "bk", "n" -> "b_n",
          "sum_price" -> "b_sum", "max_price" -> "b_max"))
      val delta = agg(o.filter(col("o_orderdate") >= split))
        .withColumnsRenamed(Map("o_orderpriority" -> "dk", "n" -> "d_n",
          "sum_price" -> "d_sum", "max_price" -> "d_max"))
      base.join(delta, col("bk") === col("dk"), "full_outer")
        .select(
          coalesce(col("bk"), col("dk")).as("o_orderpriority"),
          (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
          (coalesce(col("b_sum"), expr("CAST(0 AS DECIMAL(18,2))"))
            + coalesce(col("d_sum"), expr("CAST(0 AS DECIMAL(18,2))")))
            .cast("double").as("sum_price"),
          greatest(coalesce(col("b_max"), col("d_max")),
            coalesce(col("d_max"), col("b_max"))).cast("double").as("max_price"))
        .withColumn("avg_price",
          expr("CAST(sum_price AS DOUBLE) / CAST(n AS DOUBLE)"))
        .orderBy(col("o_orderpriority"))
    },
    // full recompute — the invariant the merge must reproduce
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q116
  // FUNNEL with a STAGE-LATENCY MANIFEST — q48's greedy earliest-
  // continuation rule (each stage takes the MIN event time strictly
  // after the previous stage's match, so ties can't fork the trajectory)
  // extended where q48 stops: a 4-stage signup-anchored chain, per-stage
  // rows instead of one count row, and the exact summed signup→stage
  // latency (integer micros — avg = sum/n downstream) that a conversion
  // dashboard actually plots. This is also the batch twin q118's
  // streaming state machine must drain to — same oracle, verbatim, and
  // the SAME algorithm: one user_id-keyed aggregate collects the
  // per-stage event-time sets, then array expressions resolve the greedy
  // DP per row. One scan, one shuffle on the high-cardinality user key;
  // per-user state is that user's funnel events, exactly the streaming
  // state bound. (The Explain sweep killed the first draft's K-stage
  // join cascade: each stage's lineage re-derived its predecessors, so
  // the fact table was scanned O(K²)=10 times.)
  /** The greedy-funnel oracle — shared with q118, whose streaming state
    * machine must drain to exactly this batch result. */
  private[analytics] val funnelOracle: String = """WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    s1 AS (SELECT user_id, MIN(us) AS s_ts FROM ev
           WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.us) AS v_ts FROM ev e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'view' AND e.us > s1.s_ts GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.us) AS c_ts FROM ev e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'click' AND e.us > s2.v_ts GROUP BY e.user_id),
    s4 AS (SELECT e.user_id, MIN(e.us) AS p_ts FROM ev e JOIN s3 ON e.user_id = s3.user_id
           WHERE e.event_type = 'purchase' AND e.us > s3.c_ts GROUP BY e.user_id),
    f AS (SELECT s1.user_id, s_ts, v_ts, c_ts, p_ts FROM s1
          LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
          LEFT JOIN s4 USING (user_id)),
    a AS (SELECT COUNT(s_ts) AS n1, COUNT(v_ts) AS n2, COUNT(c_ts) AS n3,
          COUNT(p_ts) AS n4,
          CAST(SUM(v_ts - s_ts) AS BIGINT) AS g2,
          CAST(SUM(c_ts - s_ts) AS BIGINT) AS g3,
          CAST(SUM(p_ts - s_ts) AS BIGINT) AS g4 FROM f)
    SELECT '1_signup' AS stage, n1 AS n_users, CAST(0 AS BIGINT) AS sum_gap_us FROM a
    UNION ALL SELECT '2_view', n2, g2 FROM a
    UNION ALL SELECT '3_click', n3, g3 FROM a
    UNION ALL SELECT '4_purchase', n4, g4 FROM a
    ORDER BY stage"""

  private val q116 = QueryDef(
    "q116_funnel_conversion",
    (s, dir) => {
      // ONE scan, ONE user_id shuffle: collect each user's per-stage
      // event-time sets (the q118 state, batch-side), then resolve the
      // greedy DP with array expressions — no join cascade, so events is
      // never re-read per stage (the naive K-stage self-join form scans
      // the fact table O(K²) times once each stage's lineage re-derives
      // its predecessors). x > NULL is NULL, so an unreached stage
      // propagates as an empty filter → array_min = NULL without guards.
      events(s, dir)
        .filter(col("event_type").isin("signup", "view", "click", "purchase"))
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        .groupBy(col("user_id"))
        .agg(
          collect_list(when(col("event_type") === "signup", col("us"))).as("sa"),
          collect_list(when(col("event_type") === "view", col("us"))).as("va"),
          collect_list(when(col("event_type") === "click", col("us"))).as("ca"),
          collect_list(when(col("event_type") === "purchase", col("us"))).as("pa"))
        .withColumn("s_ts", expr("array_min(sa)"))
        .withColumn("v_ts", expr("array_min(filter(va, x -> x > s_ts))"))
        .withColumn("c_ts", expr("array_min(filter(ca, x -> x > v_ts))"))
        .withColumn("p_ts", expr("array_min(filter(pa, x -> x > c_ts))"))
        .filter(col("s_ts").isNotNull)
        .agg(
          count(col("s_ts")).as("n1"), count(col("v_ts")).as("n2"),
          count(col("c_ts")).as("n3"), count(col("p_ts")).as("n4"),
          sum(col("v_ts") - col("s_ts")).as("g2"),
          sum(col("c_ts") - col("s_ts")).as("g3"),
          sum(col("p_ts") - col("s_ts")).as("g4"))
        .selectExpr("""stack(4,
          '1_signup', n1, CAST(0 AS BIGINT),
          '2_view', n2, g2,
          '3_click', n3, g3,
          '4_purchase', n4, g4) AS (stage, n_users, sum_gap_us)""")
        .orderBy(col("stage"))
    },
    Some(funnelOracle))

  // ---------------------------------------------------------------- q120
  // GRID-CELL SPATIAL DISTANCE SELF-JOIN — the bin-based spatial join
  // every geo pipeline runs (point-radius matching, store/POI conflation,
  // geofence audit). Points get a deterministic 2-D position derived from
  // the customer key (QUADRATIC mixes mod a 10k×10k grid — exact int64
  // arithmetic on both engines; a purely multiplicative mix lays keys on
  // a lattice whose minimum inter-point distance exceeds any useful
  // radius, so the quadratic term is what makes near-pairs exist at
  // all), the plane is cut into cells of
  // width == the match radius, and candidate pairs come from ONE equi-join
  // on cell coordinates: each point probes its 3×3 cell neighborhood, the
  // build side keeps its single home cell, so a qualifying pair (Chebyshev
  // bound: distance ≤ R ⇒ cell indices differ by ≤1) is generated EXACTLY
  // once — by the lower-id point probing the higher-id point's home cell —
  // with no post-hoc distinct. The exact Euclidean d² ≤ R² filter then
  // removes corner candidates. At 100 TB: candidates are O(N × density),
  // never N² (the oracle below IS the N² brute force — on the small
  // correctness SF only); the join is a plain two-key hash join that
  // partitions by cell, the 9× probe replication is map-side, and a hot
  // cell (urban skew) is bounded by cell occupancy — shrink the cell (two
  //-level grids) or salt the cell key exactly like q83 for pathological
  // densities. Output: per-segment pair count, exact Σd², and a modular
  // pair checksum so the oracle must find the SAME pairs.
  private val GeoCell = 100L // cell width == radius: 3×3 neighborhood suffices
  private val GeoR2 = 10000L // radius 100, squared
  private val GeoXSql = "(c_custkey*c_custkey*3271 + c_custkey*1007 + 12345) % 10000"
  private val GeoYSql = "(c_custkey*c_custkey*7919 + c_custkey*6151 + 54321) % 10000"
  private val q120 = QueryDef(
    "q120_geo_cell_join",
    (s, dir) => {
      val pts = rd(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
        expr(GeoXSql).as("x"), expr(GeoYSql).as("y"))
      val cells = pts
        .withColumn("cx", expr(s"x DIV $GeoCell"))
        .withColumn("cy", expr(s"y DIV $GeoCell"))
      val probes = cells
        .select(col("id").as("id1"), col("seg"), col("x").as("x1"),
          col("y").as("y1"), col("cx"), col("cy"))
        .withColumn("ox", explode(expr("array(-1, 0, 1)")))
        .withColumn("oy", explode(expr("array(-1, 0, 1)")))
        .select(col("id1"), col("seg"), col("x1"), col("y1"),
          (col("cx") + col("ox")).as("pcx"), (col("cy") + col("oy")).as("pcy"))
      val build = cells.select(col("id").as("id2"), col("x").as("x2"),
        col("y").as("y2"), col("cx").as("cx2"), col("cy").as("cy2"))
      val d2 = (col("x1") - col("x2")) * (col("x1") - col("x2")) +
        (col("y1") - col("y2")) * (col("y1") - col("y2"))
      probes
        .join(build, col("pcx") === col("cx2") && col("pcy") === col("cy2") &&
          col("id1") < col("id2"))
        .filter(d2 <= GeoR2)
        .groupBy(col("seg"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(d2).as("sum_d2"),
          (sum((col("id1") * lit(100003L) + col("id2")) % lit(HashMod))
            % lit(HashMod)).as("pair_checksum"))
        .orderBy(col("seg"))
    },
    Some(s"""WITH p AS (SELECT c_custkey AS id, c_mktsegment AS seg,
        $GeoXSql AS x, $GeoYSql AS y
      FROM customer)
    SELECT a.seg, COUNT(*) AS n_pairs,
      CAST(SUM((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)) AS BIGINT) AS sum_d2,
      CAST(SUM((a.id * 100003 + b.id) % $HashMod) % $HashMod AS BIGINT)
        AS pair_checksum
    FROM p a JOIN p b ON a.id < b.id
      AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= $GeoR2
    GROUP BY a.seg ORDER BY a.seg"""))

  // ---------------------------------------------------------------- q121
  // MULTI-TOUCH ATTRIBUTION — the marketing-analytics staple that funnel
  // (q48/q116) and as-of (q27) don't cover: every click/view TOUCH is
  // credited against the user's NEXT purchase within a 7-day lookahead,
  // and each purchase's value is split across its touches with an
  // INTEGER-EXACT even-split rule: every touch gets value_cents DIV n and
  // the LAST touch (latest (ts, event_id)) also gets the MOD remainder —
  // so per-purchase credit sums to the purchase value EXACTLY, division
  // drift can't leak across engines, and total credit + direct =
  // total purchase cents (pinned by spec). Purchases with no attributed
  // touch are reported as the 'direct' channel. Shape: ONE events scan
  // feeds a per-user ordered window (first-following-purchase via
  // first(ignoreNulls) over ROWS 1 FOLLOWING..UNBOUNDED — no touch×purchase
  // per-user join, so a power user costs O(events), not O(touches ×
  // purchases)), then one purchase-keyed window sizes the credit split.
  // The sized touch set is localCheckpoint'd (≤ |touches| rows) because
  // both the channel rollup and the direct-channel anti-join consume it —
  // at scale that's the materialize-the-attribution-table step every
  // warehouse does before fan-out. All arithmetic on epoch-micros and
  // cents BIGINTs; value→cents via the per-factor DECIMAL(18,2) cast.
  private val q121 = QueryDef(
    "q121_attribution",
    (s, dir) => {
      val winUs = 7L * 24 * 3600 * 1000000L
      val ev = events(s, dir)
        .filter(col("event_type").isin("click", "view", "purchase"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("IF(event_type = 'purchase', " +
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), " +
            "CAST(NULL AS BIGINT))").as("cents"))
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val pId = when(col("event_type") === "purchase", col("event_id"))
      val pUs = when(col("event_type") === "purchase", col("us"))
      val touches = ev
        .withColumn("p_id", first(pId, ignoreNulls = true).over(wNext))
        .withColumn("p_us", first(pUs, ignoreNulls = true).over(wNext))
        .withColumn("p_cents", first(col("cents"), ignoreNulls = true).over(wNext))
        .filter(col("event_type").isin("click", "view") &&
          col("p_id").isNotNull && col("p_us") - col("us") <= winUs)
      val wSize = Window.partitionBy(col("p_id"))
      val sized = touches
        .withColumn("n", count(lit(1)).over(wSize))
        .withColumn("rn", row_number().over(
          wSize.orderBy(col("us").desc, col("event_id").desc)))
        .withColumn("credit",
          expr("p_cents DIV n + IF(rn = 1, p_cents % n, CAST(0 AS BIGINT))"))
        .select(col("event_type").as("channel"), col("p_id"), col("credit"))
        .localCheckpoint()
      val chan = sized.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_events"), sum(col("credit")).as("credit_cents"))
      val attributed = sized.select(col("p_id")).distinct()
      val direct = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("cents"))
        .join(attributed, col("event_id") === col("p_id"), "left_anti")
        .agg(count(lit(1)).as("n_events"),
          coalesce(sum(col("cents")), lit(0L)).as("credit_cents"))
        .select(lit("direct").as("channel"), col("n_events"), col("credit_cents"))
      chan.unionByName(direct).orderBy(col("channel"))
    },
    Some("""WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        CASE WHEN event_type = 'purchase'
             THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END AS cents
      FROM events WHERE event_type IN ('click', 'view', 'purchase')),
    nxt AS (
      SELECT *,
        first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
          OVER w AS p_id,
        first_value(CASE WHEN event_type = 'purchase' THEN us END IGNORE NULLS)
          OVER w AS p_us,
        first_value(cents IGNORE NULLS) OVER w AS p_cents
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
    touch AS (
      SELECT event_type, event_id, us, p_id, p_cents FROM nxt
      WHERE event_type IN ('click', 'view') AND p_id IS NOT NULL
        AND p_us - us <= 604800000000),
    sized AS (
      SELECT event_type, p_id, p_cents,
        COUNT(*) OVER (PARTITION BY p_id) AS n,
        ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY us DESC, event_id DESC) AS rn
      FROM touch),
    chan AS (
      SELECT event_type AS channel, COUNT(*) AS n_events,
        CAST(SUM(p_cents // n + CASE WHEN rn = 1 THEN p_cents % n ELSE 0 END)
          AS BIGINT) AS credit_cents
      FROM sized GROUP BY 1),
    direct AS (
      SELECT 'direct' AS channel, COUNT(*) AS n_events,
        COALESCE(CAST(SUM(cents) AS BIGINT), 0) AS credit_cents
      FROM ev WHERE event_type = 'purchase'
        AND event_id NOT IN (SELECT DISTINCT p_id FROM touch))
    SELECT * FROM (SELECT * FROM chan UNION ALL SELECT * FROM direct)
    ORDER BY channel"""))

  // ---------------------------------------------------------------- q122
  // PEAK CONCURRENCY — the capacity-planning staple (max simultaneous
  // sessions, per day, with the instant the peak is first reached) that
  // sessionize (q52) and windowed counts (q19/q24) don't answer: a
  // tumbling-window count tells you sessions *touching* a window, not how
  // many are *simultaneously open*. Classic sweep-line: each session
  // [start, end+60s) emits (+1 at start, −1 at padded end); concurrency is
  // the running sum over the globally time-ordered points (−1 sorts before
  // +1 at equal timestamps, so half-open interval semantics are exact).
  //
  // Scale shape: a single global running sum would be ONE sorted partition
  // — the textbook serial bottleneck. Instead the prefix sum is two-level:
  // (a) per-day delta totals (a |days|-sized aggregate) cumulated into an
  // exclusive per-day offset (a window over the tiny day table), and
  // (b) a within-day running sum partitioned by day, shifted by the
  // broadcast offset. Every wide op is keyed on `day` — full parallelism
  // across the timeline, and sessions spanning midnight are handled
  // naturally because their +1 and −1 fall in different days. At 100 TB
  // the same trick nests (hour-level inner windows under the day offsets).
  private val q122 = QueryDef(
    "q122_peak_concurrency",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000L
      val padUs = 60L * 1000000L
      val dayUs = 86400L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sessions = events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("us")).as("s_us"), (max(col("us")) + padUs).as("e_us"))
      // materialize the point list ONCE before fanning out: it feeds both
      // prefix-sum levels, and each union branch would otherwise re-run
      // the full sessionize pipeline (the plan showed 4 events scans +
      // 4 session windows before this cache — the d05/m05 discipline)
      val pts = sessions.select(col("s_us").as("us"), lit(1L).as("delta"))
        .unionAll(sessions.select(col("e_us").as("us"), lit(-1L).as("delta")))
        .withColumn("day", expr(s"us DIV $dayUs"))
        .cache()
      // level 1: exclusive per-day offsets — |days| rows, bounded control
      // input, so the unpartitioned window is fine (and broadcast back)
      val dayOff = pts.groupBy(col("day")).agg(sum(col("delta")).as("day_delta"))
        .withColumn("off",
          coalesce(sum(col("day_delta")).over(
            Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("day").as("od"), col("off"))
      // level 2: within-day running sum, shifted by the day offset
      val wd = Window.partitionBy(col("day")).orderBy(col("us"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val conc = pts.join(broadcast(dayOff), col("day") === col("od"))
        .withColumn("conc", col("off") + sum(col("delta")).over(wd))
      val wp = Window.partitionBy(col("day"))
      conc
        .withColumn("peak", max(col("conc")).over(wp))
        .groupBy(col("day"))
        .agg(
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
          max(col("peak")).as("peak"),
          min(when(col("conc") === col("peak"), col("us"))).as("peak_first_us"))
        .orderBy(col("day"))
    },
    Some("""WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    marked AS (
      SELECT user_id, us, event_id,
        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    numbered AS (
      SELECT user_id, us,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM marked),
    sessions AS (
      SELECT user_id, sess, MIN(us) AS s_us, MAX(us) + 60000000 AS e_us
      FROM numbered GROUP BY 1, 2),
    pts AS (
      SELECT s_us AS us, 1 AS delta FROM sessions
      UNION ALL SELECT e_us AS us, -1 AS delta FROM sessions),
    run AS (
      SELECT us, delta, us // 86400000000 AS day,
        SUM(delta) OVER (ORDER BY us, delta
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM pts),
    agg AS (
      SELECT day, COUNT(*) FILTER (delta = 1) AS n_starts,
        CAST(MAX(conc) AS BIGINT) AS peak
      FROM run GROUP BY day)
    SELECT a.day, a.n_starts, a.peak, MIN(r.us) AS peak_first_us
    FROM agg a JOIN run r ON r.day = a.day AND r.conc = a.peak
    GROUP BY 1, 2, 3 ORDER BY a.day"""))

  // ---------------------------------------------------------------- q123
  // SYSTEMATIC PPS SAMPLING — probability-proportional-to-size sampling
  // with a fixed sample budget per stratum, the survey-sampling /
  // training-data-mixture primitive the uniform samplers (q39 stratified,
  // q50 consistent-hash) don't cover: heavy rows must be drawn with
  // probability ∝ weight, the draw must be deterministic (re-runs pick the
  // same rows), and the estimator must be auditable. Systematic PPS: order
  // the stratum by key, take the cumulative weight line [0, T), and select
  // every row whose cumulative interval contains one of the n equally
  // spaced points off + k·step (step = T DIV n, off = step DIV 2). A row
  // heavier than `step` is drawn with multiplicity > 1 — exactly the PPS
  // semantics. Everything is integer (cents, BIGINT): the multiplicity of
  // row (cum−w, cum] is g(cum) − g(cum−w) with g(x) = (x+step−off) DIV
  // step — truncating division on non-negative operands, identical on both
  // engines; Σ multiplicity = n by telescoping (pinned by spec).
  //
  // Scale shape: the cumulative sum is the q122 two-level prefix — bucket
  // totals (one aggregate keyed (stratum, key DIV B)) cumulated into
  // exclusive bucket offsets (a window over the tiny bucket table), plus a
  // within-bucket running sum. No global sort, no single-partition window:
  // every wide op is keyed on (stratum, bucket). The per-row Horvitz-
  // Thompson count estimate m·(step·10⁶ DIV w) is a pure map; its stratum
  // sum estimates the population count from 10 draws (spec pins accuracy).
  private val q123 = QueryDef(
    "q123_systematic_sample",
    (s, dir) => {
      val n = 10L
      val bucketW = 512L
      val cents = expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      val base = rd(s, dir, "orders")
        .select(col("o_orderpriority").as("stratum"), col("o_orderkey").as("key"),
          cents.as("w"))
        .withColumn("bucket", expr(s"key DIV $bucketW"))
      // level 1: exclusive per-bucket offsets inside each stratum — the
      // bucket table is |strata|×|key range / B| rows, a bounded control
      // input for the per-stratum window
      val off = base.groupBy(col("stratum"), col("bucket"))
        .agg(sum(col("w")).as("bw"))
        .withColumn("boff",
          coalesce(sum(col("bw")).over(
            Window.partitionBy(col("stratum")).orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("stratum").as("os"), col("bucket").as("ob"), col("boff"))
      // level 2: within-bucket running sum, shifted by the bucket offset
      val wb = Window.partitionBy(col("stratum"), col("bucket")).orderBy(col("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = base
        .join(broadcast(off), col("stratum") === col("os") && col("bucket") === col("ob"))
        .withColumn("cum", col("boff") + sum(col("w")).over(wb))
      // stratum totals need only (w) — aggregate the pruned base scan, not
      // the cumsum pipeline (which would re-run the offset join)
      val tot = base.groupBy(col("stratum"))
        .agg(sum(col("w")).as("t"), count(lit(1)).as("n_pop"))
        .withColumn("step", greatest(expr(s"t DIV $n"), lit(1L)))
        .withColumn("soff", expr("step DIV 2"))
      cum.join(broadcast(tot.select(col("stratum").as("ts"), col("t"), col("n_pop"),
          col("step"), col("soff"))), col("stratum") === col("ts"))
        .withColumn("m",
          expr("(cum + step - soff) DIV step - (cum - w + step - soff) DIV step"))
        .filter(col("m") > 0)
        .groupBy(col("stratum"))
        .agg(
          max(col("n_pop")).as("n_pop"),
          max(col("t")).as("total_cents"),
          sum(col("m")).as("n_samples"),
          sum(col("m") * expr("(step * 1000000) DIV w")).as("est_count_ppm"),
          (sum((col("key") * col("m")) % lit(HashMod)) % lit(HashMod)).as("key_checksum"))
        .orderBy(col("stratum"))
    },
    Some(s"""WITH base AS (
      SELECT o_orderpriority AS stratum, o_orderkey AS key,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM orders),
    cum AS (
      SELECT stratum, key, w,
        SUM(w) OVER (PARTITION BY stratum ORDER BY key
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM base),
    tot AS (
      SELECT stratum, CAST(SUM(w) AS BIGINT) AS t, COUNT(*) AS n_pop,
        GREATEST(CAST(SUM(w) AS BIGINT) // 10, 1) AS step,
        GREATEST(CAST(SUM(w) AS BIGINT) // 10, 1) // 2 AS soff
      FROM base GROUP BY stratum),
    sel AS (
      SELECT c.stratum, c.key, c.w, t.n_pop, t.t, t.step,
        (c.cum + t.step - t.soff) // t.step
          - (c.cum - c.w + t.step - t.soff) // t.step AS m
      FROM cum c JOIN tot t ON c.stratum = t.stratum)
    SELECT stratum, MAX(n_pop) AS n_pop, MAX(t) AS total_cents,
      CAST(SUM(m) AS BIGINT) AS n_samples,
      CAST(SUM(m * ((step * 1000000) // w)) AS BIGINT) AS est_count_ppm,
      CAST(SUM((key * m) % $HashMod) % $HashMod AS BIGINT) AS key_checksum
    FROM sel WHERE m > 0
    GROUP BY stratum ORDER BY stratum"""))

  // ---------------------------------------------------------------- q125
  // INTERVAL OVERLAP JOIN — which session pairs were concurrently active,
  // and for how long: the interval×interval join that as-of (q27: point
  // vs point), range join (q28: point vs interval), and the stream-stream
  // interval joins (time-bounded equi-keys) don't express. The naive form
  // is an all-pairs inequality join; the scale shape is the 1-D temporal
  // analogue of q120's grid cells: each session is replicated to every
  // day-bucket it touches (spans are session-length-bounded, so the
  // fan-out is ~1–2 buckets), candidates meet ONLY inside a shared
  // bucket (equi-join on the bucket key — a hash join, never
  // CartesianProduct), and a pair is counted EXACTLY ONCE, in the bucket
  // containing the later start (any overlapping pair shares that bucket:
  // max(s1,s2) ≤ min(e1,e2)). Bucket width tunes replication vs
  // selectivity — at 100 TB pick it near the median interval span and
  // split pathological long intervals hierarchically. Pair order is
  // (user, sess) lexicographic so each unordered pair appears once; the
  // DuckDB oracle is the direct inequality self-join (its IEJoin), an
  // independent formulation of the same semantics.
  private val q125 = QueryDef(
    "q125_interval_overlap_join",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000L
      val dayUs = 86400L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val sessions = events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        .cache()
      val bucketed = sessions
        .withColumn("g", explode(expr(s"sequence(s_us DIV $dayUs, e_us DIV $dayUs)")))
      val l = bucketed.select(col("g"), col("user_id").as("u1"), col("sess").as("se1"),
        col("s_us").as("s1"), col("e_us").as("e1"))
      val r = bucketed.select(col("g").as("g2"), col("user_id").as("u2"),
        col("sess").as("se2"), col("s_us").as("s2"), col("e_us").as("e2"))
      l.join(r,
          col("g") === col("g2") &&
            (col("u1") < col("u2") ||
              (col("u1") === col("u2") && col("se1") < col("se2"))) &&
            col("s1") <= col("e2") && col("s2") <= col("e1"))
        .filter(expr(s"greatest(s1, s2) DIV $dayUs") === col("g"))
        .select(col("g").as("day"),
          (least(col("e1"), col("e2")) - greatest(col("s1"), col("s2"))).as("ov"),
          col("u1"), col("u2"))
        .groupBy(col("day"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("ov")).as("sum_overlap_us"),
          (sum((col("u1") * lit(1000003L) + col("u2")) % lit(HashMod))
            % lit(HashMod)).as("pair_checksum"))
        .orderBy(col("day"))
    },
    Some(s"""WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
    marked AS (
      SELECT user_id, us, event_id,
        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    numbered AS (
      SELECT user_id, us,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM marked),
    sessions AS (
      SELECT user_id, sess, MIN(us) AS s_us, MAX(us) AS e_us
      FROM numbered GROUP BY 1, 2),
    pairs AS (
      SELECT a.user_id AS u1, b.user_id AS u2,
        GREATEST(a.s_us, b.s_us) AS os, LEAST(a.e_us, b.e_us) AS oe
      FROM sessions a JOIN sessions b
        ON (a.user_id < b.user_id
            OR (a.user_id = b.user_id AND a.sess < b.sess))
        AND a.s_us <= b.e_us AND b.s_us <= a.e_us)
    SELECT os // 86400000000 AS day, COUNT(*) AS n_pairs,
      CAST(SUM(oe - os) AS BIGINT) AS sum_overlap_us,
      CAST(SUM((u1 * 1000003 + u2) % $HashMod) % $HashMod AS BIGINT)
        AS pair_checksum
    FROM pairs GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q126
  // MARKET-BASKET ASSOCIATION RULES — support / confidence / lift over
  // per-order brand baskets: the co-occurrence mining primitive behind
  // recommendation and curriculum-mixing decisions. The naive form
  // self-joins the item table on the basket key (a second shuffle of the
  // fact); the scale shape here aggregates each basket ONCE into a
  // bounded sorted set (baskets are small by domain — ≤13 items in this
  // data, bounded by order size at any SF) and explodes the i<j pairs
  // from the array, so the only fact-sized shuffle is the one
  // groupBy(basket). Brand supports are a |brands|-row table and the
  // basket count is a scalar — both broadcast; all downstream joins are
  // BroadcastHashJoins on pair rows, never on the fact. Confidence and
  // lift are integer-exact ppm (cross-engine identical floor division).
  private val q126 = QueryDef(
    "q126_assoc_rules",
    (s, dir) => {
      val baskets = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
        // size-gated hint: part is SF-proportional (the d09 hazard class)
        .join(bcastIfSmall(rd(s, dir, "part")
          .select(col("p_partkey"), col("p_brand").as("b")), dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("ok"))
        .agg(sort_array(collect_set(col("b"))).as("bs"))
        .cache()
      val nBaskets = baskets.agg(count(lit(1)).as("n"))
      val supp = baskets
        .select(explode(col("bs")).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n_b"))
      // single-brand baskets generate no pairs; without the size guard
      // sequence(1, 0) evaluates descending and element_at(bs, 0) throws
      val pairs = baskets
        .filter(size(col("bs")) >= 2)
        .select(explode(expr(
          """flatten(transform(sequence(1, size(bs) - 1),
             i -> transform(sequence(i + 1, size(bs)),
             j -> struct(element_at(bs, i) AS b1, element_at(bs, j) AS b2))))"""))
          .as("p"))
        .groupBy(col("p.b1"), col("p.b2")).agg(count(lit(1)).as("n_ab"))
      val directed = pairs
        .select(col("b1").as("ante"), col("b2").as("cons"), col("n_ab"))
        .union(pairs.select(col("b2").as("ante"), col("b1").as("cons"), col("n_ab")))
      val out = directed
        .join(broadcast(supp.select(col("b").as("ante"), col("n_b").as("n_a"))),
          Seq("ante"))
        .join(broadcast(supp.select(col("b").as("cons"), col("n_b").as("n_c"))),
          Seq("cons"))
        .crossJoin(broadcast(nBaskets))
        .filter(col("n_ab") >= 20)
        // lift's numerator n_ab·n·10⁶ passes int64 around ~3M baskets
        // (sf≈2): Spark would wrap silently, DuckDB would error — so both
        // sides route the products through 128-bit (DECIMAL(38,0) here,
        // HUGEINT in the oracle); DIV lands back in int64 exactly.
        .select(col("ante"), col("cons"), col("n_ab"),
          expr("CAST(n_ab AS DECIMAL(38,0)) * 1000000 DIV n_a").as("conf_ppm"),
          expr("CAST(n_ab AS DECIMAL(38,0)) * n * 1000000 DIV " +
            "(CAST(n_a AS DECIMAL(38,0)) * n_c)").as("lift_ppm"))
        .orderBy(col("ante"), col("cons"))
        .localCheckpoint()
      baskets.unpersist()
      out
    },
    Some(s"""WITH bi AS (
      SELECT DISTINCT l_orderkey AS ok, p_brand AS b
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    nb AS (SELECT COUNT(DISTINCT ok) AS n FROM bi),
    supp AS (SELECT b, COUNT(*) AS n_b FROM bi GROUP BY b),
    pr AS (SELECT a.b AS b1, c.b AS b2, COUNT(*) AS n_ab
           FROM bi a JOIN bi c ON a.ok = c.ok AND a.b < c.b GROUP BY 1, 2),
    dr AS (SELECT b1 AS ante, b2 AS cons, n_ab FROM pr
           UNION ALL SELECT b2, b1, n_ab FROM pr)
    SELECT ante, cons, n_ab,
      CAST(CAST(n_ab AS HUGEINT) * 1000000 // sa.n_b AS BIGINT) AS conf_ppm,
      CAST(CAST(n_ab AS HUGEINT) * nb.n * 1000000
           // (CAST(sa.n_b AS HUGEINT) * sc.n_b) AS BIGINT) AS lift_ppm
    FROM dr JOIN supp sa ON sa.b = dr.ante
            JOIN supp sc ON sc.b = dr.cons, nb
    WHERE n_ab >= 20 ORDER BY ante, cons"""))

  // ---------------------------------------------------------------- q131
  // INTERVAL COALESCE (merge overlapping intervals) — the third member
  // of the interval family: q125 joins interval PAIRS, q122 counts
  // CONCURRENCY, this computes the UNION — per user, the merged
  // coverage islands and total covered time across their per-event-type
  // activity sessions (the "total engaged time" metric double-counting
  // naive sums get wrong whenever channels overlap). The merge is the
  // gaps-and-islands sweep per user: order intervals by start, carry a
  // running max of ends over PRECEDING rows, an island starts exactly
  // where a start strictly exceeds everything seen (touching intervals
  // merge), islands are a running sum of those breaks — one
  // user-partitioned window pass, no self-join. The oracle is the
  // INDEPENDENT sweep-line formulation (q122's trick): ±1 boundary
  // points, starts before ends at equal timestamps, covered time =
  // segments with positive concurrency, islands = 0→1 transitions — so
  // the window rewrite is proven equivalent, not mirrored.
  private val q131 = QueryDef(
    "q131_interval_coalesce",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000L
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("us"), col("event_id"))
      val intervals = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sess",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("event_type"), col("sess"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
      val mw = Window.partitionBy(col("user_id")).orderBy(col("s_us"), col("e_us"))
      intervals
        .withColumn("max_e_prev",
          max(col("e_us")).over(mw.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk",
          when(col("max_e_prev").isNull || col("s_us") > col("max_e_prev"), 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("brk")).over(mw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s_us")).as("is_us"), max(col("e_us")).as("ie_us"),
          count(lit(1)).as("n_iv"))
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_islands"),
          sum(col("ie_us") - col("is_us")).as("covered_us"),
          sum(col("n_iv")).as("n_intervals"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
    marked AS (
      SELECT user_id, event_type, us, event_id,
        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM ev WINDOW w AS (PARTITION BY user_id, event_type ORDER BY us, event_id)),
    numbered AS (
      SELECT user_id, event_type, us,
        SUM(is_new) OVER (PARTITION BY user_id, event_type ORDER BY us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM marked),
    iv AS (SELECT user_id, event_type, sess,
             MIN(us) AS s_us, MAX(us) AS e_us
           FROM numbered GROUP BY 1, 2, 3),
    pts AS (SELECT user_id, s_us AS us, 1 AS delta FROM iv
            UNION ALL SELECT user_id, e_us, -1 FROM iv),
    swept AS (
      SELECT user_id, us, delta,
        SUM(delta) OVER (PARTITION BY user_id ORDER BY us, delta DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
        lead(us) OVER (PARTITION BY user_id ORDER BY us, delta DESC) AS next_us
      FROM pts)
    SELECT user_id,
      CAST(SUM(CASE WHEN delta = 1 AND run = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_islands,
      CAST(SUM(CASE WHEN run > 0 THEN COALESCE(next_us - us, 0) ELSE 0 END)
        AS BIGINT) AS covered_us,
      CAST((SELECT COUNT(*) FROM iv i WHERE i.user_id = swept.user_id) AS BIGINT)
        AS n_intervals
    FROM swept GROUP BY user_id ORDER BY user_id"""))

  // ---------------------------------------------------------------- q144
  // TEMPERATURE MIXTURE SAMPLING — the α-sampling rule multilingual LM
  // training uses to rebalance domains (α = 0.5: sample ∝ √mass, lifting
  // low-resource languages without drowning high-resource ones). Distinct
  // from t16 (fixed per-source manifest rates) and q39/q50 (given
  // fractions): here the rates are COMPUTED from the corpus's own mass
  // distribution — the operator is the weight derivation, with the
  // hash-threshold keep rule shared downstream machinery. Domain
  // mass is Σ n_chars per lang; weights are exact-integer √mass (floor
  // sqrt via a double SQRT with a ±1 correction clause — correctly-
  // rounded IEEE sqrt lands within one of the floor, the CASE pins it,
  // so both engines agree bit-for-bit). A 40%-of-corpus budget splits
  // across domains ∝ weight, then selection is hash-THRESHOLD sampling,
  // not rank-based: doc selected iff (doc_id·2654435761) mod p mod 10⁶
  // falls under the domain's per-doc ppm quota. That rule is one scan +
  // one 5-row broadcast join — a per-domain top-k rank would funnel each
  // domain through one reducer (the skew trap for a 5-domain corpus at
  // 100 TB), while the threshold form never sorts and still lands within
  // sampling noise of the exact target. n_selected reports the realized
  // count; the checksum pins the selected SET, not just its size.
  private val q144 = QueryDef(
    "q144_mixture_sample",
    (s, dir) => {
      val stats = docsNarrow(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("mass"))
        .withColumn("s0", expr("CAST(FLOOR(SQRT(CAST(mass AS DOUBLE))) AS BIGINT)"))
        .withColumn("isq", expr(
          """CASE WHEN s0 * s0 > mass THEN s0 - 1
                  WHEN (s0 + 1) * (s0 + 1) <= mass THEN s0 + 1
                  ELSE s0 END"""))
      val ctl = stats
        .crossJoin(broadcast(
          stats.agg(sum(col("isq")).as("sw"), sum(col("n_docs")).as("nt"))))
        .withColumn("weight_ppm", expr("isq * 1000000 DIV sw"))
        .withColumn("n_target", expr("(nt * 2 DIV 5) * isq DIV sw"))
        .withColumn("sel_ppm",
          least(expr("n_target * 1000000 DIV n_docs"), lit(1000000L)))
        .select(col("lang"), col("n_docs"), col("mass"), col("weight_ppm"),
          col("n_target"), col("sel_ppm"))
      val sel = docsNarrow(s, dir).select(col("lang"), col("doc_id"))
        // bounded build side: one control row per language (domain
        // vocabulary, not corpus-growing)
        .join(broadcast(ctl.select(col("lang"), col("sel_ppm"))), "lang")
        .filter(expr("doc_id * 2654435761 % 1000000007 % 1000000 < sel_ppm"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_selected"),
          (sum(col("doc_id") % HashMod) % HashMod).as("sel_checksum"))
      ctl.join(sel, Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("mass"), col("weight_ppm"),
          col("n_target"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("sel_checksum"), lit(0L)).as("sel_checksum"))
        .orderBy(col("lang"))
    },
    Some(s"""WITH st AS (
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS mass
      FROM documents GROUP BY 1),
    sq AS (SELECT *, CAST(FLOOR(SQRT(CAST(mass AS DOUBLE))) AS BIGINT) AS s0
           FROM st),
    iq AS (SELECT lang, n_docs, mass,
             CASE WHEN s0 * s0 > mass THEN s0 - 1
                  WHEN (s0 + 1) * (s0 + 1) <= mass THEN s0 + 1
                  ELSE s0 END AS isq
           FROM sq),
    tot AS (SELECT CAST(SUM(isq) AS BIGINT) AS sw,
                   CAST(SUM(n_docs) AS BIGINT) AS nt FROM iq),
    ctl AS (SELECT lang, n_docs, mass,
              isq * 1000000 // sw AS weight_ppm,
              (nt * 2 // 5) * isq // sw AS n_target,
              LEAST((nt * 2 // 5) * isq // sw * 1000000 // n_docs, 1000000)
                AS sel_ppm
            FROM iq, tot),
    sel AS (SELECT d.lang, COUNT(*) AS n_selected,
              CAST(SUM(d.doc_id % $HashMod) % $HashMod AS BIGINT) AS sel_checksum
            FROM documents d JOIN ctl ON ctl.lang = d.lang
            WHERE d.doc_id * 2654435761 % 1000000007 % 1000000 < ctl.sel_ppm
            GROUP BY 1)
    SELECT ctl.lang, ctl.n_docs, ctl.mass, ctl.weight_ppm, ctl.n_target,
      COALESCE(sel.n_selected, 0) AS n_selected,
      COALESCE(sel.sel_checksum, 0) AS sel_checksum
    FROM ctl LEFT JOIN sel ON ctl.lang = sel.lang
    ORDER BY ctl.lang"""))

  // --------------------------------------------------------------- q145
  // BITEMPORAL AS-OF — the two-axis temporal lookup (SQL:2011
  // system-versioned + application-time tables): "as of TRANSACTION time
  // T, what did we believe the value was at VALID time V". q53's SCD2
  // merge tracks ONE time axis; audit/finance ledgers need both, because
  // corrections arrive late and retroactively. The ledger is a
  // deterministic retroactive-amendment stream derived from orders: each
  // order carries 1–3 revisions, revision r recorded at odate + r days,
  // declaring its value effective from odate + 7r days ONWARD (open
  // validity — later revisions shadow earlier ones where they overlap).
  // The probe answers with the visible (recorded ≤ T) revision whose
  // valid_from is the latest ≤ V — an argmax, computed as max_by over
  // the strictly-increasing (per key) valid_from, NOT a rank window: the
  // aggregate is map-side combined and shuffles one row per (probe, key),
  // where a row_number window would shuffle every revision. All time
  // arithmetic is integer epoch-µs (unix_micros / epoch_us — the one
  // cross-engine-identical date representation; interval functions are
  // not parity-safe), values are exact int64. Scale: the explode is a
  // narrow generate, the only wide op is the (probe, key) aggregate —
  // probes are a 3-row bounded broadcast, keys are high-cardinality so
  // no skew funnel; at 100 TB the same plan runs with the ledger
  // partitioned on key.
  private val q145 = QueryDef(
    "q145_bitemporal_asof",
    (s, dir) => {
      val dayUs = 86400000000L
      // probes pin (T, V) in epoch-µs: mid-history/mid-history, early
      // belief about later validity, full knowledge about early validity
      val probes = Seq(
        (1L, usOf(1997, 1, 1), usOf(1997, 1, 1)),
        (2L, usOf(1996, 1, 1), usOf(1999, 6, 30)),
        (3L, usOf(2002, 1, 1), usOf(1996, 6, 30)))
      val probeDf = s.sql(
        "SELECT * FROM VALUES " +
          probes.map { case (i, t, v) => s"(${i}L, ${t}L, ${v}L)" }.mkString(", ") +
          " AS p(probe_id, t_us, v_us)")
      val led = rd(s, dir, "orders")
        .select(col("o_orderkey").as("okey"),
          // o_orderdate ships NTZ; the UTC session makes the cast
          // instant-preserving, matching the oracle's epoch_us
          unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
          floor(col("o_totalprice")).cast("long").as("base"),
          explode(sequence(lit(0L), col("o_orderkey") % 3)).as("r"))
        .select(col("okey"),
          (col("od_us") + col("r") * (7L * dayUs)).as("vf_us"),
          (col("od_us") + col("r") * dayUs).as("rec_us"),
          (col("base") * (lit(100L) + col("r"))).as("val_c"))
      led.crossJoin(broadcast(probeDf)) // bounded: 3 probe rows
        .filter(col("rec_us") <= col("t_us") && col("vf_us") <= col("v_us"))
        .groupBy(col("probe_id"), col("okey"))
        .agg(max_by(col("val_c"), col("vf_us")).as("val_c"))
        .groupBy(col("probe_id"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("val_c")).as("sum_value"),
          (sum(col("val_c") % HashMod) % HashMod).as("val_checksum"))
        .orderBy(col("probe_id"))
    },
    Some {
      val dayUs = 86400000000L
      val probesSql = Seq(
        (1L, usOf(1997, 1, 1), usOf(1997, 1, 1)),
        (2L, usOf(1996, 1, 1), usOf(1999, 6, 30)),
        (3L, usOf(2002, 1, 1), usOf(1996, 6, 30)))
        .map { case (i, t, v) => s"($i, $t, $v)" }.mkString(", ")
      s"""WITH led AS (
      SELECT o_orderkey AS okey,
        epoch_us(o_orderdate) + r * ${7L * dayUs} AS vf_us,
        epoch_us(o_orderdate) + r * $dayUs AS rec_us,
        CAST(floor(o_totalprice) AS BIGINT) * (100 + r) AS val_c
      FROM orders, unnest(range(0, o_orderkey % 3 + 1)) AS u(r)),
    p AS (SELECT * FROM (VALUES $probesSql) AS v(probe_id, t_us, v_us)),
    sel AS (SELECT p.probe_id, l.okey, arg_max(l.val_c, l.vf_us) AS val_c
            FROM led l CROSS JOIN p
            WHERE l.rec_us <= p.t_us AND l.vf_us <= p.v_us
            GROUP BY 1, 2)
    SELECT CAST(probe_id AS BIGINT) AS probe_id, COUNT(*) AS n_keys,
      CAST(SUM(val_c) AS BIGINT) AS sum_value,
      CAST(SUM(val_c % $HashMod) % $HashMod AS BIGINT) AS val_checksum
    FROM sel GROUP BY 1 ORDER BY 1"""
    })

  /** Epoch-µs of a UTC midnight — shared by q145's Spark and oracle sides
    * so the probe constants are one source of truth. */
  private def usOf(y: Int, m: Int, d: Int): Long =
    java.time.LocalDate.of(y, m, d).toEpochDay * 86400000000L

  // ---------------------------------------------------------------- q152
  // WEIGHTED RESERVOIR SAMPLE (A-ES) — Efraimidis–Spirakis weighted
  // sampling WITHOUT replacement: each row draws priority u^(1/w)
  // (equivalently ln(u)/w, maximized), and the sample is the top-n by
  // priority per stratum. This is the third sampler mode next to q39
  // (uniform stratified), q50 (consistent-hash) and q123 (PPS with
  // multiplicity): distinct rows, inclusion probability ∝ weight, and —
  // the property reservoirs exist for — MERGEABLE: the top-n of a union
  // is the top-n of the per-shard top-n's, so shards/streams combine
  // without re-drawing. Determinism: u is the exact rational
  // (2·polyhash(key)%1e6 + 1)/2e6 ∈ (0,1) (never 0, so ln is finite) and
  // ln goes through the house lnQ quantization (1e-4 units) before the
  // exact-int-by-int double division — both engines rank identical
  // doubles, ties break on key. Scale shape: the priority is a pure
  // per-row expression (no shuffle to draw), and the top-n runs
  // two-level — local top-n per (stratum, key-shard) window, then the
  // per-stratum refine over the ≤ 32·n survivors — so a 5-stratum
  // 100 TB table never funnels a stratum into one partition.
  private val ResN = 8
  private val q152 = QueryDef(
    "q152_weighted_reservoir",
    (s, dir) => {
      graft.functions.PolyHash.register(s)
      val base = rd(s, dir, "orders")
        .select(col("o_orderpriority").as("stratum"), col("o_orderkey").as("key"),
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("w"))
        .withColumn("h", expr(s"${strHashExpr("CAST(key AS STRING)")} % 1000000"))
        .withColumn("prio",
          expr(lnQ("(2 * h + 1) / 2000000.0D")).cast("double") / col("w"))
      val local = Window.partitionBy(col("stratum"), expr("key % 32"))
        .orderBy(col("prio").desc, col("key"))
      val global = Window.partitionBy(col("stratum"))
        .orderBy(col("prio").desc, col("key"))
      base.withColumn("lr", row_number().over(local)).filter(col("lr") <= ResN)
        .withColumn("rnk", row_number().over(global).cast("long"))
        .filter(col("rnk") <= ResN)
        .select(col("stratum"), col("rnk"), col("key"), col("w").as("w_cents"),
          round(col("prio"), 6).as("prio"))
        .orderBy(col("stratum"), col("rnk"))
    },
    Some(s"""WITH base AS (
      SELECT o_orderpriority AS stratum, o_orderkey AS key,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w,
        ${strHashSql("CAST(o_orderkey AS VARCHAR)")} % 1000000 AS h
      FROM orders),
    pr AS (SELECT stratum, key, w,
        CAST(${lnQ("(2 * h + 1) / 2000000.0")} AS DOUBLE) / w AS prio
      FROM base)
    SELECT stratum, rnk, key, w AS w_cents, round(prio, 6) AS prio FROM (
      SELECT stratum, key, w, prio,
        ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY prio DESC, key) AS rnk
      FROM pr)
    WHERE rnk <= $ResN ORDER BY stratum, rnk"""))

  // ---------------------------------------------------------------- q155
  // INCREMENTAL JOIN-VIEW MAINTENANCE — q86 maintains an AGGREGATE from
  // deltas; this maintains a JOIN view when BOTH inputs change, via the
  // bilinear delta rule (the differential-dataflow / DBSP identity):
  //   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB.
  // A = orders (late-date rows are the fact delta), B = customer (a
  // deterministic custkey slice stands in for newly onboarded
  // customers). The maintained view is revenue per market segment: the
  // base state aggregates A_old ⋈ B_old, the three delta joins aggregate
  // into one delta table, and the publish is q86's full-outer merge.
  // The oracle is the FULL recompute over A ⋈ B — the invariant every
  // incremental maintenance plan must reproduce exactly. At 100 TB this
  // is the whole point: the recompute touches |A|×|B| join work every
  // refresh, the delta plan touches work bounded by the deltas — ΔB
  // broadcasts (bcastIfSmall: customer-file-bounded), B_old broadcasts
  // against the fact delta, and only ΔA's bounded slice of the fact
  // table is ever rescanned. Money stays DECIMAL until the final cast
  // (the discPrice discipline).
  private val q155 = QueryDef(
    "q155_incremental_join_view",
    (s, dir) => {
      val factSplit = "1997-06-01"
      val o = rd(s, dir, "orders").select(col("o_custkey"), col("o_orderdate"),
        expr("CAST(o_totalprice AS DECIMAL(18,2))").as("price"))
      val c = rd(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val aOld = o.filter(col("o_orderdate") < factSplit)
      val dA = o.filter(col("o_orderdate") >= factSplit)
      val bOld = c.filter(col("c_custkey") % 20 =!= 0)
      val dB = c.filter(col("c_custkey") % 20 === 0)
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("price")).as("rev"))
      // base state: the view as of the last refresh
      val base = agg(aOld.join(bcastIfSmall(bOld, dir, "customer"),
          col("o_custkey") === col("c_custkey")))
        .withColumnsRenamed(Map("c_mktsegment" -> "bk", "n" -> "b_n", "rev" -> "b_rev"))
      // the three bilinear delta terms, aggregated together (unionAll is
      // cheap: each term is already delta-bounded)
      val deltaRows =
        dA.join(bcastIfSmall(bOld, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .unionAll(aOld.join(bcastIfSmall(dB, dir, "customer"),
            col("o_custkey") === col("c_custkey")))
          .unionAll(dA.join(bcastIfSmall(dB, dir, "customer"),
            col("o_custkey") === col("c_custkey")))
      val delta = agg(deltaRows)
        .withColumnsRenamed(Map("c_mktsegment" -> "dk", "n" -> "d_n", "rev" -> "d_rev"))
      base.join(delta, col("bk") === col("dk"), "full_outer")
        .select(
          coalesce(col("bk"), col("dk")).as("segment"),
          (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n_orders"),
          (coalesce(col("b_rev"), expr("CAST(0 AS DECIMAL(28,2))"))
            + coalesce(col("d_rev"), expr("CAST(0 AS DECIMAL(28,2))")))
            .cast("double").as("revenue"))
        .orderBy(col("segment"))
    },
    // full recompute — the invariant the delta rule must reproduce
    Some("""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------------------- q156
  // SCORE CALIBRATION / LIFT DIAGRAM — the model-eval readout behind
  // every learned curation filter (t32's class): bucket a per-row score
  // into fixed bins (the reliability-diagram convention) and report per
  // bin the observed positive rate against the corpus base rate, as a
  // lift. Here the score is an English-stopword density in exact ppm
  // and the proxy ground truth is lang = 'en' — a genuinely predictive
  // pairing, so the diagram shows a real gradient instead of a flat
  // harness demo. Everything is one narrow scan (per-row HOF count, no
  // explode), one map-side-combined bin aggregate, and a 1-row base-rate
  // cross join; integer ppm/percent end-to-end. Fixed-width score bins
  // (not NTILE) are deliberate: the binning is a pure per-row
  // expression, so there is no global sort/window anywhere — the
  // scale-correct form of the chart.
  private val CalSw = Seq("the", "of", "and", "to", "a")
  private val q156 = QueryDef(
    "q156_score_calibration",
    (s, dir) => {
      val inList = CalSw.map("'" + _ + "'").mkString(", ")
      val scored = docsNarrow(s, dir)
        .select(col("lang"), split(col("text"), " ").as("w"))
        .withColumn("n_words", size(col("w")).cast("long"))
        .filter(col("n_words") > 0)
        .withColumn("n_sw",
          expr(s"CAST(size(filter(w, t -> t IN ($inList))) AS BIGINT)"))
        .withColumn("score_ppm", expr("(n_sw * 1000000) DIV n_words"))
        .withColumn("pos", (col("lang") === "en").cast("long"))
        .withColumn("bin", expr("least(CAST(9 AS BIGINT), (score_ppm * 10) DIV 1000000)"))
      val base = scored.agg(sum(col("pos")).as("tp"), count(lit(1)).as("tn"))
      scored.groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"))
        .crossJoin(broadcast(base))
        .withColumn("pos_ppm", expr("(n_pos * 1000000) DIV n_docs"))
        .withColumn("base_ppm", expr("(tp * 1000000) DIV tn"))
        .select(col("bin"), col("n_docs"), col("n_pos"), col("pos_ppm"),
          col("base_ppm"),
          expr("(pos_ppm * 100) DIV base_ppm").as("lift_pct"))
        .orderBy(col("bin"))
    },
    Some {
      val inList = CalSw.map("'" + _ + "'").mkString(", ")
      s"""WITH sc AS (
      SELECT lang, len(string_split(text, ' ')) AS n_words,
        len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS n_sw
      FROM documents),
    b AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
            LEAST(9, (CAST(n_sw AS BIGINT) * 1000000 // n_words) * 10 // 1000000) AS bin,
            (CAST(n_sw AS BIGINT) * 1000000 // n_words) AS score_ppm
          FROM sc WHERE n_words > 0),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS tp, COUNT(*) AS tn FROM b)
    SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_docs,
      CAST(SUM(pos) AS BIGINT) AS n_pos,
      CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_ppm,
      CAST(tp * 1000000 // tn AS BIGINT) AS base_ppm,
      CAST((SUM(pos) * 1000000 // COUNT(*)) * 100 // (tp * 1000000 // tn) AS BIGINT) AS lift_pct
    FROM b CROSS JOIN tot GROUP BY bin, tp, tn ORDER BY bin"""
    })

  // --------------------------------------------------------------- q185
  // POSITIONAL DELETION VECTORS (merge-on-read) — the modern lakehouse
  // delete path (Iceberg v2 / Delta DVs) that q115's KEYED tombstones
  // don't express: a delete operation writes (file_id, position) entries
  // instead of rewriting data files, and every read anti-joins the DV
  // set — the base files stay immutable until a compaction rewrites the
  // ones whose deleted fraction crosses the rewrite bar. Three delete
  // ops land here (a predicate delete, a subject purge, a full-file
  // recall), and the three DV semantics that matter are all checked
  // in-query: (1) IDEMPOTENT APPLY — overlapping ops write the same
  // position twice (n_dv_writes > n_deleted) but the read dedups on
  // (file, pos), (2) MOR ≡ EAGER — the anti-join read is proven
  // row-identical to the eager predicate rewrite per file via count +
  // key checksum (the mor_equals_eager column), (3) the COMPACTION
  // PLANNER — del_ppm per file with the ≥20% rewrite verdict (file 3's
  // full recall trips it; the uniform ~11% predicate mass does not).
  // Scale: the `pos` window is write-side bookkeeping a real writer
  // records for free at write time — the PRODUCTION read plan is scan +
  // anti-join against a delete-op-bounded DV side (tiny vs the base;
  // AQE broadcasts it from real stats, no hint needed since DV size is
  // delete-bounded, not table-bounded) and the reports are map-side-
  // combined aggregates over file-count-sized frames.
  private val DvFiles = 32L
  private val DvRewritePpm = 200000L
  /** q203 sizes its simulated file count from the corpus —
    * ⌈N/DvTargetRows⌉ files (min 8 so the planted full-file-recall id 3
    * always exists) — so the positional-window partitions stay ≤~50 k rows
    * at ANY scale factor (VERDICT r19 item 3: a fixed 32 meant partition
    * size grew linearly with N — ~2 M rows on one task at 100×). All
    * synthetic id offsets (gen-2 files, DV sidecars, compaction temps) are
    * multiples of the derived count, so the id spaces stay disjoint at any
    * N. The oracle derives the same count in its own params CTE. */
  private val DvTargetRows = 50000L

  private val q185 = QueryDef(
    "q185_deletion_vectors",
    (s, dir) => {
      val base = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_quantity").as("qty"))
        .withColumn("file_id", col("ok") % DvFiles)
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("file_id")).orderBy(col("ok"), col("ln"))))
        .cache()
      // three delete operations, each emitting positional entries
      val ops = Seq(
        base.filter(col("qty") > 45),                  // predicate delete
        base.filter(expr("(ok * 7 + ln) % 97 = 0")),   // subject purge
        base.filter(col("file_id") === 3L))            // full-file recall
        .map(_.select(col("file_id"), col("pos")))
        .reduce(_ unionAll _)
      val dv = ops.groupBy(col("file_id"), col("pos"))
        .agg(count(lit(1)).as("n_writes"))
        .localCheckpoint() // delete-op-bounded; read twice (anti-join + stats)
      // merge-on-read: positions only — the read knows nothing of predicates
      val mor = base.join(dv.select(col("file_id"), col("pos")),
        Seq("file_id", "pos"), "left_anti")
      // eager rewrite: the ground truth the DV read must reproduce
      val eager = base.filter(
        !(col("qty") > 45 || expr("(ok * 7 + ln) % 97 = 0") || col("file_id") === 3L))
      def liveStats(df: org.apache.spark.sql.DataFrame, n: String, ck: String) =
        df.groupBy(col("file_id")).agg(count(lit(1)).as(n),
          (sum(expr(s"(ok * 7 + ln) % $HashMod")) % HashMod).as(ck))
      val perFile = base.groupBy(col("file_id")).agg(count(lit(1)).as("n_rows"))
        .join(dv.groupBy(col("file_id"))
          .agg(sum(col("n_writes")).as("n_dv_writes"), count(lit(1)).as("n_deleted")),
          Seq("file_id"), "left")
        .join(liveStats(mor, "live_n_m", "ck_m"), Seq("file_id"), "left")
        .join(liveStats(eager, "live_n_e", "ck_e"), Seq("file_id"), "left")
      def shape(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("n_dv_writes", coalesce(col("n_dv_writes"), lit(0L)))
        .withColumn("n_deleted", coalesce(col("n_deleted"), lit(0L)))
        .withColumn("live_n", coalesce(col("live_n_m"), lit(0L)))
        .withColumn("live_checksum", coalesce(col("ck_m"), lit(0L)))
        .withColumn("del_ppm", expr("n_deleted * 1000000 DIV n_rows"))
        .withColumn("rewrite", col("del_ppm") >= DvRewritePpm)
        .withColumn("mor_equals_eager",
          coalesce(col("live_n_m"), lit(0L)) === coalesce(col("live_n_e"), lit(0L)) &&
            coalesce(col("ck_m"), lit(0L)) === coalesce(col("ck_e"), lit(0L)))
        .select(col("file_id"), col("n_rows"), col("n_dv_writes"), col("n_deleted"),
          col("del_ppm"), col("rewrite"), col("live_n"), col("live_checksum"),
          col("mor_equals_eager"))
      val total = base.agg(count(lit(1)).as("n_rows"))
        .crossJoin(dv.agg(sum(col("n_writes")).as("n_dv_writes"),
          count(lit(1)).as("n_deleted")))
        .crossJoin(mor.agg(count(lit(1)).as("live_n_m"),
          (sum(expr(s"(ok * 7 + ln) % $HashMod")) % HashMod).as("ck_m")))
        .crossJoin(eager.agg(count(lit(1)).as("live_n_e"),
          (sum(expr(s"(ok * 7 + ln) % $HashMod")) % HashMod).as("ck_e")))
        .withColumn("file_id", lit(-1L))
      shape(perFile).unionByName(shape(total)).orderBy(col("file_id"))
    },
    Some(s"""WITH base AS (
      SELECT l_orderkey AS ok, l_linenumber AS ln, l_quantity AS qty,
        l_orderkey % $DvFiles AS file_id,
        ROW_NUMBER() OVER (PARTITION BY l_orderkey % $DvFiles
                           ORDER BY l_orderkey, l_linenumber) AS pos
      FROM lineitem),
    ops AS (
      SELECT file_id, pos FROM base WHERE qty > 45
      UNION ALL SELECT file_id, pos FROM base WHERE (ok * 7 + ln) % 97 = 0
      UNION ALL SELECT file_id, pos FROM base WHERE file_id = 3),
    dv AS (SELECT file_id, pos, COUNT(*) AS n_writes FROM ops GROUP BY 1, 2),
    mor AS (SELECT b.* FROM base b
            WHERE NOT EXISTS (SELECT 1 FROM dv d
                              WHERE d.file_id = b.file_id AND d.pos = b.pos)),
    eager AS (SELECT * FROM base
              WHERE NOT (qty > 45 OR (ok * 7 + ln) % 97 = 0 OR file_id = 3)),
    pf AS (
      SELECT b.file_id, COUNT(*) AS n_rows FROM base b GROUP BY 1),
    dvf AS (
      SELECT file_id, SUM(n_writes) AS n_dv_writes, COUNT(*) AS n_deleted
      FROM dv GROUP BY 1),
    morf AS (
      SELECT file_id, COUNT(*) AS live_n_m,
        SUM((ok * 7 + ln) % $HashMod) % $HashMod AS ck_m FROM mor GROUP BY 1),
    eagf AS (
      SELECT file_id, COUNT(*) AS live_n_e,
        SUM((ok * 7 + ln) % $HashMod) % $HashMod AS ck_e FROM eager GROUP BY 1),
    rows_pf AS (
      SELECT pf.file_id, n_rows,
        COALESCE(n_dv_writes, 0) AS n_dv_writes, COALESCE(n_deleted, 0) AS n_deleted,
        COALESCE(live_n_m, 0) AS live_n_m, COALESCE(ck_m, 0) AS ck_m,
        COALESCE(live_n_e, 0) AS live_n_e, COALESCE(ck_e, 0) AS ck_e
      FROM pf LEFT JOIN dvf USING (file_id) LEFT JOIN morf ON pf.file_id = morf.file_id
        LEFT JOIN eagf ON pf.file_id = eagf.file_id),
    rows_tot AS (
      SELECT CAST(-1 AS BIGINT) AS file_id,
        (SELECT COUNT(*) FROM base) AS n_rows,
        (SELECT SUM(n_writes) FROM dv) AS n_dv_writes,
        (SELECT COUNT(*) FROM dv) AS n_deleted,
        (SELECT COUNT(*) FROM mor) AS live_n_m,
        (SELECT SUM((ok * 7 + ln) % $HashMod) % $HashMod FROM mor) AS ck_m,
        (SELECT COUNT(*) FROM eager) AS live_n_e,
        (SELECT SUM((ok * 7 + ln) % $HashMod) % $HashMod FROM eager) AS ck_e),
    unioned AS (SELECT * FROM rows_pf UNION ALL SELECT * FROM rows_tot)
    SELECT CAST(file_id AS BIGINT) AS file_id, CAST(n_rows AS BIGINT) AS n_rows,
      CAST(n_dv_writes AS BIGINT) AS n_dv_writes, CAST(n_deleted AS BIGINT) AS n_deleted,
      CAST(n_deleted * 1000000 // n_rows AS BIGINT) AS del_ppm,
      n_deleted * 1000000 // n_rows >= $DvRewritePpm AS rewrite,
      CAST(live_n_m AS BIGINT) AS live_n,
      CAST(ck_m AS BIGINT) AS live_checksum,
      live_n_m = live_n_e AND ck_m = ck_e AS mor_equals_eager
    FROM unioned ORDER BY file_id"""))

  // --------------------------------------------------------------- q186
  // TIME-TRAVEL READS over a commit log — the third leg of the
  // lakehouse triad (q185 positional deletes, q171/q176 snapshot diff,
  // this: versioned reads): a base snapshot plus an append-only op log
  // (absolute-value upserts and deletes stamped with their commit
  // version), and `read AS OF v` = base FULL-OUTER the LATEST op per
  // key at version ≤ v — one window over the OP-BOUNDED log and one
  // key join, never a base rewrite. Three deterministic commits land
  // (update, insert+delete, overlapping update — the k%41∧k%53 overlap
  // exercises absolute-upsert last-writer-wins), and the read is
  // audited two ways: per-version digests (count / cents / key
  // checksum) that the oracle recomputes, and a REPLAY row — the v3
  // state derived by applying commits one at a time — whose digest
  // must equal the AS-OF-3 read (`matches_asof`), pinning that the
  // latest-op shortcut and sequential replay agree. Scale: the log is
  // op-volume; each version's read costs one log window + one join;
  // the base scans once per materialized version (a real lakehouse
  // caches the newest; old versions are audit reads).
  private val q186 = QueryDef(
    "q186_time_travel",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = rd(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .cache()
      base.count()
      // the commit log: absolute-value upserts ('U') and deletes ('D')
      val ops = base.filter(col("k") % 41 === 0)
          .select(lit(1L).as("ver"), lit("U").as("op"), col("k"),
            (col("cents") + 1L).as("new_cents"))
        .unionByName(base.filter(col("k") % 43 === 0)
          .select(lit(2L).as("ver"), lit("U").as("op"),
            (col("k") + 2000000L).as("k"), (col("cents") + 5L).as("new_cents")))
        .unionByName(base.filter(col("k") % 47 === 0)
          .select(lit(2L).as("ver"), lit("D").as("op"), col("k"),
            lit(null).cast("long").as("new_cents")))
        .unionByName(base.filter(col("k") % 53 === 0)
          .select(lit(3L).as("ver"), lit("U").as("op"), col("k"),
            (col("cents") + 2L).as("new_cents")))
        .localCheckpoint(eager = false) // op-bounded; read once per version below (lazy, r22)
      // read AS OF v: latest op per key at ver <= v, full-outer the base
      def asOf(v: Long): org.apache.spark.sql.DataFrame = {
        val latest = ops.filter(col("ver") <= v)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(col("ver").desc)))
          .filter(col("rn") === 1)
          .select(col("k"), col("op"), col("new_cents"))
        base.join(latest, Seq("k"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("k"),
            when(col("op") === "U", col("new_cents")).otherwise(col("cents")).as("cents"))
      }
      // sequential replay: apply commits one version at a time
      def applyOne(cur: org.apache.spark.sql.DataFrame, v: Long) = {
        val delta = ops.filter(col("ver") === v)
          .select(col("k"), col("op"), col("new_cents"))
        cur.join(delta, Seq("k"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("k"),
            when(col("op") === "U", col("new_cents")).otherwise(col("cents")).as("cents"))
      }
      val replay3 = applyOne(applyOne(applyOne(base, 1L), 2L), 3L)
      def digest(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents_sum"),
            (sum(col("k") % HashMod) % HashMod).as("key_checksum"))
          .select(lit(tag).as("version"), col("n_rows"), col("cents_sum"),
            col("key_checksum"))
      val rows = digest(base, "v0")
        .unionByName(digest(asOf(1), "v1"))
        .unionByName(digest(asOf(2), "v2"))
        .unionByName(digest(asOf(3), "v3"))
        .unionByName(digest(replay3, "v3_replay"))
      // the replay row must reproduce the AS-OF-3 digest exactly
      val v3 = rows.filter(col("version") === "v3")
        .select(col("n_rows").as("n3"), col("cents_sum").as("c3"),
          col("key_checksum").as("k3"))
      rows.crossJoin(broadcast(v3))
        .select(col("version"), col("n_rows"), col("cents_sum"), col("key_checksum"),
          when(col("version").isin("v3", "v3_replay"),
            col("n_rows") === col("n3") && col("cents_sum") === col("c3") &&
              col("key_checksum") === col("k3")).as("matches_asof"))
        .orderBy(col("version"))
    },
    Some(s"""WITH base AS (
      SELECT o_orderkey AS k,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    ops AS (
      SELECT 1 AS ver, 'U' AS op, k, cents + 1 AS new_cents FROM base WHERE k % 41 = 0
      UNION ALL
      SELECT 2, 'U', k + 2000000, cents + 5 FROM base WHERE k % 43 = 0
      UNION ALL
      SELECT 2, 'D', k, NULL FROM base WHERE k % 47 = 0
      UNION ALL
      SELECT 3, 'U', k, cents + 2 FROM base WHERE k % 53 = 0),
    ${Seq(1, 2, 3).map { v =>
        s"""l$v AS (SELECT k, op, new_cents FROM (
          SELECT k, op, new_cents,
            ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
          FROM ops WHERE ver <= $v) WHERE rn = 1),
    r$v AS (SELECT COALESCE(b.k, l.k) AS k,
              CASE WHEN l.op = 'U' THEN l.new_cents ELSE b.cents END AS cents
            FROM base b FULL OUTER JOIN l$v l ON b.k = l.k
            WHERE l.op IS NULL OR l.op <> 'D')"""
      }.mkString(",\n    ")},
    ${Seq(1, 2, 3).map { v =>
        val prev = if (v == 1) "base" else s"p${v - 1}"
        s"""p$v AS (SELECT COALESCE(c.k, d.k) AS k,
              CASE WHEN d.op = 'U' THEN d.new_cents ELSE c.cents END AS cents
            FROM $prev c FULL OUTER JOIN
              (SELECT k, op, new_cents FROM ops WHERE ver = $v) d ON c.k = d.k
            WHERE d.op IS NULL OR d.op <> 'D')"""
      }.mkString(",\n    ")},
    digests AS (
      SELECT 'v0' AS version, COUNT(*) AS n_rows, SUM(cents) AS cents_sum,
        SUM(k % $HashMod) % $HashMod AS key_checksum FROM base
      UNION ALL SELECT 'v1', COUNT(*), SUM(cents), SUM(k % $HashMod) % $HashMod FROM r1
      UNION ALL SELECT 'v2', COUNT(*), SUM(cents), SUM(k % $HashMod) % $HashMod FROM r2
      UNION ALL SELECT 'v3', COUNT(*), SUM(cents), SUM(k % $HashMod) % $HashMod FROM r3
      UNION ALL SELECT 'v3_replay', COUNT(*), SUM(cents), SUM(k % $HashMod) % $HashMod FROM p3),
    v3d AS (SELECT n_rows AS n3, cents_sum AS c3, key_checksum AS k3
            FROM digests WHERE version = 'v3')
    SELECT version, CAST(n_rows AS BIGINT) AS n_rows,
      CAST(cents_sum AS BIGINT) AS cents_sum,
      CAST(key_checksum AS BIGINT) AS key_checksum,
      CASE WHEN version IN ('v3', 'v3_replay')
           THEN n_rows = n3 AND cents_sum = c3 AND key_checksum = k3
           ELSE NULL END AS matches_asof
    FROM digests CROSS JOIN v3d ORDER BY version"""))

  // --------------------------------------------------------------- q189
  // OPTIMISTIC-CONCURRENCY CONFLICT AUDIT — the fourth lakehouse leg
  // (q185 deletes, q186 time travel, q171 diff, this: concurrent
  // writers): two transactions branch from the SAME base snapshot and
  // try to commit; serializable OCC admits both iff their key sets are
  // DISJOINT — and then the merged table must be order-independent
  // (apply A∘B ≡ B∘A, proven by digest), while overlapping write sets
  // force the second committer to retry against the winner's snapshot.
  // Both scenarios run side by side: txnA (keys %41) vs txnB
  // (keys %43∧¬41) write distinct absolute values to disjoint key sets,
  // and both orders' digests must agree; txnC (keys %82 — a strict
  // subset of A's set)
  // collides with A and the audit reports the overlap cardinality and
  // the conflict verdict the commit protocol acts on. Scale: write
  // sets are op-bounded; the intersection is one equi-join of key
  // sets; the merged-table digests are one scan each — the audit never
  // rewrites the base.
  private val q189 = QueryDef(
    "q189_occ_conflicts",
    (s, dir) => {
      val base = rd(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .cache()
      val wsA = base.filter(col("k") % 41 === 0).select(col("k"), lit(1L).as("dc"))
      val wsB = base.filter(col("k") % 43 === 0 && col("k") % 41 =!= 0)
        .select(col("k"), lit(2L).as("dc"))
      val wsC = base.filter(col("k") % 82 === 0).select(col("k"), lit(3L).as("dc"))
      // last-writer-wins ABSOLUTE upserts: on overlapping keys the apply
      // order changes the result, so the disjoint pair's order-equal
      // digest is a real serializability fact, not additive triviality
      def applyTo(cur: org.apache.spark.sql.DataFrame,
          ws: org.apache.spark.sql.DataFrame) =
        cur.join(ws, Seq("k"), "left")
          .select(col("k"),
            when(col("dc").isNotNull, col("dc") * 1000000L).otherwise(col("cents"))
              .as("cents"))
      def digest(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"), sum(col("cents")).as("c"),
          (sum((col("k") * 1000003L + col("cents")) % HashMod) % HashMod).as("ck"))
      def overlap(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
        x.select(col("k")).join(y.select(col("k")), "k").agg(count(lit(1)).as("n_overlap"))
      val ab = digest(applyTo(applyTo(base, wsA), wsB))
        .select(col("n").as("n1"), col("c").as("c1"), col("ck").as("ck1"))
      val ba = digest(applyTo(applyTo(base, wsB), wsA))
        .select(col("n").as("n2"), col("c").as("c2"), col("ck").as("ck2"))
      def scenario(tag: String, ov: org.apache.spark.sql.DataFrame,
          orderProof: Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]) = {
        val basecols = ov
          .withColumn("scenario", lit(tag))
          .withColumn("conflict", col("n_overlap") > 0)
        orderProof match {
          case Some((x, y)) =>
            basecols.crossJoin(broadcast(x)).crossJoin(broadcast(y))
              .select(col("scenario"), col("n_overlap"), col("conflict"),
                (col("n1") === col("n2") && col("c1") === col("c2") &&
                  col("ck1") === col("ck2")).as("order_independent"))
          case None =>
            basecols.select(col("scenario"), col("n_overlap"), col("conflict"),
              lit(null).cast("boolean").as("order_independent"))
        }
      }
      scenario("a_vs_b_disjoint", overlap(wsA, wsB), Some((ab, ba)))
        .unionByName(scenario("a_vs_c_overlap", overlap(wsA, wsC), None))
        .orderBy(col("scenario"))
    },
    Some(s"""WITH base AS (
      SELECT o_orderkey AS k,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    wsa AS (SELECT k, 1 AS dc FROM base WHERE k % 41 = 0),
    wsb AS (SELECT k, 2 AS dc FROM base WHERE k % 43 = 0 AND k % 41 <> 0),
    wsc AS (SELECT k, 3 AS dc FROM base WHERE k % 82 = 0),
    ab AS (SELECT b.k, CASE WHEN bb.dc IS NOT NULL THEN bb.dc * 1000000
                            WHEN a.dc IS NOT NULL THEN a.dc * 1000000
                            ELSE b.cents END AS cents
           FROM base b LEFT JOIN wsa a ON b.k = a.k LEFT JOIN wsb bb ON b.k = bb.k),
    ba AS (SELECT b.k, CASE WHEN a.dc IS NOT NULL THEN a.dc * 1000000
                            WHEN bb.dc IS NOT NULL THEN bb.dc * 1000000
                            ELSE b.cents END AS cents
           FROM base b LEFT JOIN wsb bb ON b.k = bb.k LEFT JOIN wsa a ON b.k = a.k),
    dab AS (SELECT COUNT(*) AS n1, SUM(cents) AS c1,
              SUM((k * 1000003 + cents) % $HashMod) % $HashMod AS ck1 FROM ab),
    dba AS (SELECT COUNT(*) AS n2, SUM(cents) AS c2,
              SUM((k * 1000003 + cents) % $HashMod) % $HashMod AS ck2 FROM ba),
    ovab AS (SELECT COUNT(*) AS n_overlap FROM wsa JOIN wsb ON wsa.k = wsb.k),
    ovac AS (SELECT COUNT(*) AS n_overlap FROM wsa JOIN wsc ON wsa.k = wsc.k)
    SELECT * FROM (
      SELECT 'a_vs_b_disjoint' AS scenario, CAST(n_overlap AS BIGINT) AS n_overlap,
        n_overlap > 0 AS conflict,
        n1 = n2 AND c1 = c2 AND ck1 = ck2 AS order_independent
      FROM ovab CROSS JOIN dab CROSS JOIN dba
      UNION ALL
      SELECT 'a_vs_c_overlap', CAST(n_overlap AS BIGINT), n_overlap > 0,
        CAST(NULL AS BOOLEAN)
      FROM ovac
    ) ORDER BY scenario"""))

  // --------------------------------------------------------------- q194
  // COMMIT-LOG CHECKPOINTING — what keeps q186's time-travel reads from
  // degrading as the log grows: materialize a new base at a checkpoint
  // version C (here C = 2), truncate the log to the suffix (ver > C),
  // and prove the compacted pair serves every still-supported read
  // identically — AS OF C is exactly the new base, AS OF latest from
  // (new base + suffix) digests equal to the old full-log read, and
  // the suffix row-count column shows what the read path now pays
  // (1 version of ops instead of 3). Reuses q186's op fixture and
  // latest-op-per-key read verbatim so the two queries cannot drift;
  // scale: the checkpoint write is one merge-on-read materialization,
  // after which every read joins an O(|suffix|) log.
  private val q194 = QueryDef(
    "q194_log_checkpoint",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = rd(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        .cache()
      base.count()
      val ops = base.filter(col("k") % 41 === 0)
          .select(lit(1L).as("ver"), lit("U").as("op"), col("k"),
            (col("cents") + 1L).as("new_cents"))
        .unionByName(base.filter(col("k") % 43 === 0)
          .select(lit(2L).as("ver"), lit("U").as("op"),
            (col("k") + 2000000L).as("k"), (col("cents") + 5L).as("new_cents")))
        .unionByName(base.filter(col("k") % 47 === 0)
          .select(lit(2L).as("ver"), lit("D").as("op"), col("k"),
            lit(null).cast("long").as("new_cents")))
        .unionByName(base.filter(col("k") % 53 === 0)
          .select(lit(3L).as("ver"), lit("U").as("op"), col("k"),
            (col("cents") + 2L).as("new_cents")))
        .localCheckpoint()
      def readFrom(b: org.apache.spark.sql.DataFrame,
          log: org.apache.spark.sql.DataFrame, v: Long) = {
        val latest = log.filter(col("ver") <= v)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(col("ver").desc)))
          .filter(col("rn") === 1)
          .select(col("k"), col("op"), col("new_cents"))
        b.join(latest, Seq("k"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("k"),
            when(col("op") === "U", col("new_cents")).otherwise(col("cents")).as("cents"))
      }
      // checkpoint at C = 2: materialize, truncate the log to the suffix
      val ckptBase = readFrom(base, ops, 2L).localCheckpoint()
      val suffix = ops.filter(col("ver") > 2L)
      def digest(df: org.apache.spark.sql.DataFrame, tag: String) =
        df.agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents_sum"),
            (sum(col("k") % HashMod) % HashMod).as("key_checksum"))
          .select(lit(tag).as("readout"), col("n_rows"), col("cents_sum"),
            col("key_checksum"))
      val rows = digest(ckptBase, "a_ckpt_base")
        .unionByName(digest(readFrom(base, ops, 3L), "b_full_log_v3"))
        .unionByName(digest(readFrom(ckptBase, suffix, 3L), "c_compacted_v3"))
      val ref = rows.filter(col("readout") === "b_full_log_v3")
        .select(col("n_rows").as("rn"), col("cents_sum").as("rc"),
          col("key_checksum").as("rk"))
      rows.crossJoin(broadcast(ref))
        .select(col("readout"), col("n_rows"), col("cents_sum"), col("key_checksum"),
          when(col("readout") =!= "a_ckpt_base",
            col("n_rows") === col("rn") && col("cents_sum") === col("rc") &&
              col("key_checksum") === col("rk")).as("matches_full_log"),
          when(col("readout") === "c_compacted_v3",
            lit(1L)).as("suffix_versions"))
        .orderBy(col("readout"))
    },
    Some(s"""WITH base AS (
      SELECT o_orderkey AS k,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    ops AS (
      SELECT 1 AS ver, 'U' AS op, k, cents + 1 AS new_cents FROM base WHERE k % 41 = 0
      UNION ALL SELECT 2, 'U', k + 2000000, cents + 5 FROM base WHERE k % 43 = 0
      UNION ALL SELECT 2, 'D', k, NULL FROM base WHERE k % 47 = 0
      UNION ALL SELECT 3, 'U', k, cents + 2 FROM base WHERE k % 53 = 0),
    l2 AS (SELECT k, op, new_cents FROM (
        SELECT k, op, new_cents,
          ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        FROM ops WHERE ver <= 2) WHERE rn = 1),
    ckpt AS (SELECT COALESCE(b.k, l.k) AS k,
        CASE WHEN l.op = 'U' THEN l.new_cents ELSE b.cents END AS cents
      FROM base b FULL OUTER JOIN l2 l ON b.k = l.k
      WHERE l.op IS NULL OR l.op <> 'D'),
    l3 AS (SELECT k, op, new_cents FROM (
        SELECT k, op, new_cents,
          ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        FROM ops WHERE ver <= 3) WHERE rn = 1),
    full3 AS (SELECT COALESCE(b.k, l.k) AS k,
        CASE WHEN l.op = 'U' THEN l.new_cents ELSE b.cents END AS cents
      FROM base b FULL OUTER JOIN l3 l ON b.k = l.k
      WHERE l.op IS NULL OR l.op <> 'D'),
    sfx AS (SELECT k, op, new_cents FROM (
        SELECT k, op, new_cents,
          ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        FROM ops WHERE ver > 2 AND ver <= 3) WHERE rn = 1),
    comp3 AS (SELECT COALESCE(c.k, l.k) AS k,
        CASE WHEN l.op = 'U' THEN l.new_cents ELSE c.cents END AS cents
      FROM ckpt c FULL OUTER JOIN sfx l ON c.k = l.k
      WHERE l.op IS NULL OR l.op <> 'D'),
    digests AS (
      SELECT 'a_ckpt_base' AS readout, COUNT(*) AS n_rows, SUM(cents) AS cents_sum,
        SUM(k % $HashMod) % $HashMod AS key_checksum FROM ckpt
      UNION ALL SELECT 'b_full_log_v3', COUNT(*), SUM(cents),
        SUM(k % $HashMod) % $HashMod FROM full3
      UNION ALL SELECT 'c_compacted_v3', COUNT(*), SUM(cents),
        SUM(k % $HashMod) % $HashMod FROM comp3),
    ref AS (SELECT n_rows AS rn, cents_sum AS rc, key_checksum AS rk
            FROM digests WHERE readout = 'b_full_log_v3')
    SELECT readout, CAST(n_rows AS BIGINT) AS n_rows,
      CAST(cents_sum AS BIGINT) AS cents_sum,
      CAST(key_checksum AS BIGINT) AS key_checksum,
      CASE WHEN readout <> 'a_ckpt_base'
           THEN n_rows = rn AND cents_sum = rc AND key_checksum = rk END
        AS matches_full_log,
      CASE WHEN readout = 'c_compacted_v3' THEN CAST(1 AS BIGINT) END
        AS suffix_versions
    FROM digests CROSS JOIN ref ORDER BY readout"""))

  // --------------------------------------------------------------- q196
  // SNAPSHOT-EXPIRY PLANNER — the GC leg of the lakehouse arc (q186
  // time travel reads versions, q194 checkpoints the log, this: decides
  // which data files the expired versions were the LAST holder of). A
  // deterministic add/remove commit log over a bounded file manifest
  // (derived from orders so the fixture is data-driven, not constants),
  // a keep-last-3 retention policy, and the planner's verdict per file:
  // a file is deletable iff NO retained snapshot's live set (latest
  // action ≤ v is an add) contains it. The fixture plants the three
  // interesting lifecycles: removed-then-re-added (%10=5 after %5=0 —
  // latest-action-wins must resurrect it), removed only in the newest
  // snapshot (%11=2 — dead at HEAD yet retained by v4/v5, so NOT
  // deletable), and removed before the horizon (%5=0, %7=3 — the only
  // deletable class). `safe` pins the invariant a GC must never break —
  // deletable ∧ live-at-HEAD is impossible — and the -1 total row
  // prices the sweep (freed_bytes). Scale: everything is manifest-sized
  // (file counts, not row counts); the per-snapshot live sets are one
  // window over the op log per retained version — a real table keeps
  // O(snapshots·files) manifest rows, never data rows.
  private val q196 = QueryDef(
    "q196_snapshot_expiry",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val files = rd(s, dir, "orders")
        .select((col("o_orderkey") % 97).as("file_id")).distinct()
        .withColumn("size_bytes", col("file_id") * 1009L % 5000L + 100L)
        .localCheckpoint() // manifest-sized (≤97 rows at any SF)
      def act(v: Long, a: String, pred: org.apache.spark.sql.Column) =
        files.filter(pred).select(lit(v).as("ver"), lit(a).as("act"), col("file_id"))
      val ops = act(1L, "A", col("file_id") % 2 === 0)
        .unionByName(act(2L, "A", col("file_id") % 2 === 1))
        .unionByName(act(3L, "R", col("file_id") % 5 === 0))
        .unionByName(act(4L, "R", col("file_id") % 7 === 3))
        .unionByName(act(5L, "A", col("file_id") % 10 === 5))
        .unionByName(act(6L, "R", col("file_id") % 11 === 2))
        .localCheckpoint()
      // live set of each RETAINED snapshot: latest action ≤ v is an add
      val liveAt = Seq(4L, 5L, 6L).map { v =>
        ops.filter(col("ver") <= v)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("file_id")).orderBy(col("ver").desc)))
          .filter(col("rn") === 1 && col("act") === "A")
          .select(col("file_id"), lit(v).as("snap"))
      }.reduce(_ unionByName _).localCheckpoint()
      val liveRetained = liveAt.select("file_id").distinct()
        .withColumn("in_retained", lit(true))
      val liveLatest = liveAt.filter(col("snap") === 6L).select("file_id")
        .withColumn("at_head", lit(true))
      val refCounts = ops.groupBy(col("file_id")).agg(
        sum(when(col("act") === "A", 1L).otherwise(0L)).as("n_adds"),
        sum(when(col("act") === "R", 1L).otherwise(0L)).as("n_removes"))
      val perFile = files.join(refCounts, Seq("file_id"))
        .join(liveRetained, Seq("file_id"), "left")
        .join(liveLatest, Seq("file_id"), "left")
        .select(col("file_id"), col("size_bytes"), col("n_adds"), col("n_removes"),
          coalesce(col("at_head"), lit(false)).as("live_latest"),
          coalesce(col("in_retained"), lit(false)).as("live_in_retained"))
        .withColumn("deletable", !col("live_in_retained"))
        .withColumn("freed_bytes",
          when(col("deletable"), col("size_bytes")).otherwise(0L))
        .withColumn("safe", !(col("deletable") && col("live_latest")))
      val total = perFile.agg(
        sum(col("size_bytes")).as("size_bytes"),
        sum(col("n_adds")).as("n_adds"),
        sum(col("n_removes")).as("n_removes"),
        sum(col("freed_bytes")).as("freed_bytes"),
        bool_and(col("safe")).as("safe"))
        .select(lit(-1L).as("file_id"), col("size_bytes"), col("n_adds"),
          col("n_removes"), lit(null).cast("boolean").as("live_latest"),
          lit(null).cast("boolean").as("live_in_retained"),
          lit(null).cast("boolean").as("deletable"), col("freed_bytes"), col("safe"))
      perFile.unionByName(total).orderBy(col("file_id"))
    },
    Some(s"""WITH files AS (
      SELECT DISTINCT o_orderkey % 97 AS file_id FROM orders),
    f AS (SELECT file_id, file_id * 1009 % 5000 + 100 AS size_bytes FROM files),
    ops AS (
      SELECT 1 AS ver, 'A' AS act, file_id FROM f WHERE file_id % 2 = 0
      UNION ALL SELECT 2, 'A', file_id FROM f WHERE file_id % 2 = 1
      UNION ALL SELECT 3, 'R', file_id FROM f WHERE file_id % 5 = 0
      UNION ALL SELECT 4, 'R', file_id FROM f WHERE file_id % 7 = 3
      UNION ALL SELECT 5, 'A', file_id FROM f WHERE file_id % 10 = 5
      UNION ALL SELECT 6, 'R', file_id FROM f WHERE file_id % 11 = 2),
    live AS (
      SELECT file_id, snap FROM (
        SELECT o.file_id, v.snap, o.act,
          ROW_NUMBER() OVER (PARTITION BY o.file_id, v.snap ORDER BY o.ver DESC) AS rn
        FROM ops o JOIN (VALUES (4), (5), (6)) AS v(snap) ON o.ver <= v.snap)
      WHERE rn = 1 AND act = 'A'),
    refc AS (SELECT file_id,
        SUM(CASE WHEN act = 'A' THEN 1 ELSE 0 END) AS n_adds,
        SUM(CASE WHEN act = 'R' THEN 1 ELSE 0 END) AS n_removes
      FROM ops GROUP BY 1),
    pf AS (
      SELECT f.file_id, f.size_bytes, refc.n_adds, refc.n_removes,
        EXISTS(SELECT 1 FROM live l WHERE l.file_id = f.file_id AND l.snap = 6)
          AS live_latest,
        EXISTS(SELECT 1 FROM live l WHERE l.file_id = f.file_id)
          AS live_in_retained
      FROM f JOIN refc USING (file_id)),
    pf2 AS (
      SELECT *, NOT live_in_retained AS deletable,
        CASE WHEN NOT live_in_retained THEN size_bytes ELSE 0 END AS freed_bytes,
        NOT (NOT live_in_retained AND live_latest) AS safe
      FROM pf)
    SELECT CAST(file_id AS BIGINT) AS file_id,
      CAST(size_bytes AS BIGINT) AS size_bytes,
      CAST(n_adds AS BIGINT) AS n_adds, CAST(n_removes AS BIGINT) AS n_removes,
      live_latest, live_in_retained, deletable,
      CAST(freed_bytes AS BIGINT) AS freed_bytes, safe
    FROM pf2
    UNION ALL
    SELECT -1, CAST(SUM(size_bytes) AS BIGINT), CAST(SUM(n_adds) AS BIGINT),
      CAST(SUM(n_removes) AS BIGINT), NULL, NULL, NULL,
      CAST(SUM(freed_bytes) AS BIGINT), BOOL_AND(safe)
    FROM pf2
    ORDER BY file_id"""))

  // --------------------------------------------------------------- q197
  // ORPHAN-FILE VACUUM — the disk-side twin of q196's log-side GC: a
  // physical listing (every file the commit log has EVER referenced,
  // plus planted write-temp orphans with staggered mtimes) swept
  // against the log with a grace period, the way Delta's VACUUM and
  // Iceberg's remove-orphan-files work. Referenced files are kept
  // unconditionally (snapshot expiry owns those — q196); unreferenced
  // files inside the grace window are kept (an in-flight writer may
  // still be about to commit them — deleting early is the classic
  // vacuum data-loss bug); only aged orphans are vacuumed. The readout
  // is verdict-class totals (scale-independent row count) and
  // `group_unreferenced` — BOOL_AND(NOT referenced) per class — pins
  // in-result that nothing the log references lands in the vacuum
  // class. Scale: one listing scan + one manifest anti-join; the
  // verdict is a row-local CASE, no pairs, no windows.
  private val q197 = QueryDef(
    "q197_orphan_vacuum",
    (s, dir) => {
      val base = rd(s, dir, "orders").select(col("o_orderkey").as("k"))
      val referenced = base.select((col("k") % 97).as("file_id")).distinct()
        .select(concat(lit("data/f"), col("file_id")).as("path"),
          lit(true).as("referenced"), lit(100L).as("mtime"),
          (col("file_id") * 1009L % 5000L + 100L).as("size_bytes"))
      val orphans = base.filter(col("k") % 61 === 0)
        .select(concat(lit("tmp/o"), col("k")).as("path"),
          lit(false).as("referenced"),
          (lit(100L) + (col("k") % 7) * 20L).as("mtime"),
          (col("k") * 31L % 4000L + 50L).as("size_bytes"))
      // now = 240, grace = 60 → vacuum unreferenced files with mtime ≤ 180
      val verdicts = referenced.unionByName(orphans)
        .withColumn("verdict",
          when(col("referenced"), lit("a_kept_referenced"))
            .when(col("mtime") > 240L - 60L, lit("b_kept_in_grace"))
            .otherwise(lit("c_vacuum")))
      val perClass = verdicts.groupBy(col("verdict")).agg(
        count(lit(1)).as("n_files"),
        sum(col("size_bytes")).as("total_bytes"),
        min(col("mtime")).as("oldest_mtime"),
        bool_and(!col("referenced")).as("group_unreferenced"))
      val total = verdicts.agg(
        count(lit(1)).as("n_files"), sum(col("size_bytes")).as("total_bytes"),
        min(col("mtime")).as("oldest_mtime"))
        .select(lit("z_total").as("verdict"), col("n_files"), col("total_bytes"),
          col("oldest_mtime"), lit(null).cast("boolean").as("group_unreferenced"))
      perClass.unionByName(total).orderBy(col("verdict"))
    },
    Some(s"""WITH refd AS (
      SELECT 'data/f' || CAST(file_id AS VARCHAR) AS path, TRUE AS referenced,
        100 AS mtime, file_id * 1009 % 5000 + 100 AS size_bytes
      FROM (SELECT DISTINCT o_orderkey % 97 AS file_id FROM orders)),
    orph AS (
      SELECT 'tmp/o' || CAST(o_orderkey AS VARCHAR) AS path, FALSE AS referenced,
        100 + (o_orderkey % 7) * 20 AS mtime,
        o_orderkey * 31 % 4000 + 50 AS size_bytes
      FROM orders WHERE o_orderkey % 61 = 0),
    listing AS (SELECT * FROM refd UNION ALL SELECT * FROM orph),
    v AS (SELECT *,
        CASE WHEN referenced THEN 'a_kept_referenced'
             WHEN mtime > 240 - 60 THEN 'b_kept_in_grace'
             ELSE 'c_vacuum' END AS verdict
      FROM listing)
    SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_files,
      CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
      CAST(MIN(mtime) AS BIGINT) AS oldest_mtime,
      BOOL_AND(NOT referenced) AS group_unreferenced
    FROM v GROUP BY verdict
    UNION ALL
    SELECT 'z_total', CAST(COUNT(*) AS BIGINT), CAST(SUM(size_bytes) AS BIGINT),
      CAST(MIN(mtime) AS BIGINT), NULL FROM v
    ORDER BY verdict"""))

  // --------------------------------------------------------------- q198
  // CAPACITY PLANNER — the sizing arithmetic this whole engine's scale
  // notes keep doing by hand, as a query: per table, estimate bytes
  // from row count × a pinned avg-row-width, derive the shuffle
  // partition count that lands each partition at the 128 MB target
  // (`spark.sql.files.maxPartitionBytes`' default), and the
  // broadcastability verdict against the 32 MB cap that
  // `Tables.bcastIfSmall` enforces at runtime — so the plan the
  // optimizer would pick is now itself a queryable artifact. The
  // z_cluster row rolls partitions up into an executor ask at 4
  // concurrent tasks per executor. Integer ceil-division keeps both
  // engines exact (no float boundary drift). Scale: five COUNT(*)
  // scans (column-pruned to zero columns by parquet row-group
  // metadata); at 100 TB the same query runs off table statistics.
  private val q198 = QueryDef(
    "q198_capacity_planner",
    (s, dir) => {
      val widths = Seq(("customer", 150L), ("documents", 900L), ("events", 80L),
        ("lineitem", 120L), ("orders", 100L))
      val per = widths.map { case (t, w) =>
        rd(s, dir, t).agg(count(lit(1)).as("n_rows"))
          .select(lit(t).as("table_name"), col("n_rows"),
            (col("n_rows") * w).as("est_bytes"))
      }.reduce(_ unionByName _)
        .withColumn("target_partitions",
          greatest(lit(1L), expr("(est_bytes + 134217727) DIV 134217728")))
        .withColumn("broadcastable", col("est_bytes") < (32L << 20))
        .withColumn("executors", lit(null).cast("long"))
      val cluster = per.agg(
        sum(col("n_rows")).as("n_rows"), sum(col("est_bytes")).as("est_bytes"),
        sum(col("target_partitions")).as("target_partitions"))
        .select(lit("z_cluster").as("table_name"), col("n_rows"), col("est_bytes"),
          col("target_partitions"), lit(null).cast("boolean").as("broadcastable"),
          expr("(target_partitions + 3) DIV 4").as("executors"))
      per.unionByName(cluster).orderBy(col("table_name"))
    },
    Some(s"""WITH per AS (
      SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
        COUNT(*) * 150 AS est_bytes FROM customer
      UNION ALL SELECT 'documents', COUNT(*), COUNT(*) * 900 FROM documents
      UNION ALL SELECT 'events', COUNT(*), COUNT(*) * 80 FROM events
      UNION ALL SELECT 'lineitem', COUNT(*), COUNT(*) * 120 FROM lineitem
      UNION ALL SELECT 'orders', COUNT(*), COUNT(*) * 100 FROM orders),
    p2 AS (
      SELECT table_name, n_rows, est_bytes,
        GREATEST(1, (est_bytes + 134217727) // 134217728) AS target_partitions,
        est_bytes < 33554432 AS broadcastable
      FROM per)
    SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
      CAST(est_bytes AS BIGINT) AS est_bytes,
      CAST(target_partitions AS BIGINT) AS target_partitions,
      broadcastable, CAST(NULL AS BIGINT) AS executors
    FROM p2
    UNION ALL
    SELECT 'z_cluster', CAST(SUM(n_rows) AS BIGINT), CAST(SUM(est_bytes) AS BIGINT),
      CAST(SUM(target_partitions) AS BIGINT),
      NULL, CAST((SUM(target_partitions) + 3) // 4 AS BIGINT)
    FROM p2
    ORDER BY table_name"""))

  // --------------------------------------------------------------- q201
  // SHAPLEY-VALUE ATTRIBUTION — the game-theoretic upgrade of q121's
  // rule-based attribution (last-touch / linear): with 3 touch channels
  // (click / view / signup) the 2³ coalition lattice is exact and
  // bounded, so each channel's credit is the true Shapley value over
  // the coalition-level conversion rates v(S) = conversions(touch set
  // EXACTLY S) / users(S), the data-driven attribution model ad
  // platforms ship. Weights ×6 keep everything integer ((|S|−1)!(3−|S|)!
  // /3! ∈ {2,1,2}/6), and the z_total row pins Shapley's EFFICIENCY
  // identity in-result: Σφ = v(all) − v(∅), exact in ×6 ppm units —
  // the property that distinguishes Shapley from every heuristic rule.
  // Touches are SPARSIFIED by deterministic event-id filters (every
  // user in this dense fixture would otherwise touch every channel and
  // the lattice would collapse to one coalition); unobserved coalitions
  // contribute v = 0 (documented convention). Negative marginals occur
  // on this fixture — the ÷6 readout truncates toward zero in BOTH
  // engines (Spark DIV vs a sign-folded DuckDB //).
  // Scale: one per-user aggregate (map-side combined), an 8-row
  // coalition table, and a 12-row literal marginal join — the lattice
  // never touches row volume.
  private val q201 = QueryDef(
    "q201_shapley_attribution",
    (s, dir) => {
      val perUser = events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "click" && col("event_id") % 11 === 0, 1L)
            .otherwise(0L)).as("c"),
          max(when(col("event_type") === "view" && col("event_id") % 13 === 0, 1L)
            .otherwise(0L)).as("v"),
          max(when(col("event_type") === "signup" && col("event_id") % 17 === 0, 1L)
            .otherwise(0L)).as("g"),
          max(when(col("event_type") === "purchase" && col("event_id") % 7 === 0, 1L)
            .otherwise(0L)).as("conv"))
        .withColumn("coal", expr("c * 4 + v * 2 + g"))
      val vS = perUser.groupBy(col("coal"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
        .withColumn("v_ppm", expr("n_conv * 1000000 DIV n_users"))
        .localCheckpoint()
      // all 8 coalitions; unobserved ones carry v = 0
      val lattice = s.range(0, 8).select(col("id").as("coal"))
        .join(vS.select(col("coal"), col("v_ppm")), Seq("coal"), "left")
        .select(col("coal"), coalesce(col("v_ppm"), lit(0L)).as("v_ppm"))
      // marginal table: (channel, S-with, S-without, 6·weight)
      val marg = Seq(
        ("click", 4), ("view", 2), ("signup", 1)).flatMap { case (ch, bit) =>
        (0 until 8).filter(sc => (sc & bit) != 0).map { sc =>
          val sz = java.lang.Long.bitCount(sc.toLong)
          val w6 = if (sz == 1 || sz == 3) 2L else 1L
          (ch, sc.toLong, (sc ^ bit).toLong, w6)
        }
      }
      import s.implicits._
      val margDf = marg.toDF("channel", "s_with", "s_without", "w6")
      val phi = broadcast(margDf)
        .join(lattice.select(col("coal").as("s_with"), col("v_ppm").as("vw")),
          Seq("s_with"))
        .join(lattice.select(col("coal").as("s_without"), col("v_ppm").as("vo")),
          Seq("s_without"))
        .groupBy(col("channel"))
        .agg(sum((col("vw") - col("vo")) * col("w6")).as("phi_x6_ppm"))
      val touched = perUser.agg(
        sum(col("c")).as("click"), sum(col("v")).as("view"), sum(col("g")).as("signup"))
        .select(explode(expr(
          """array(named_struct('channel', 'click', 'n', click),
                   named_struct('channel', 'view', 'n', view),
                   named_struct('channel', 'signup', 'n', signup))""")).as("t"))
        .select(col("t.channel").as("channel"), col("t.n").as("n_touched_users"))
      val chanRows = phi.join(touched, Seq("channel"))
        .select(col("channel"), col("n_touched_users"), col("phi_x6_ppm"),
          expr("phi_x6_ppm DIV 6").as("shapley_ppm"),
          lit(null).cast("boolean").as("efficient"))
      val ends = lattice.agg(
        sum(when(col("coal") === 7L, col("v_ppm")).otherwise(0L)).as("v_all"),
        sum(when(col("coal") === 0L, col("v_ppm")).otherwise(0L)).as("v_none"))
      val total = phi.agg(sum(col("phi_x6_ppm")).as("sum_phi"))
        .crossJoin(broadcast(ends))
        .select(lit("z_total").as("channel"),
          lit(null).cast("long").as("n_touched_users"),
          col("sum_phi").as("phi_x6_ppm"),
          expr("(v_all - v_none)").as("shapley_ppm"),
          (col("sum_phi") === (col("v_all") - col("v_none")) * 6L).as("efficient"))
      chanRows.unionByName(total).orderBy(col("channel"))
    },
    Some(s"""WITH pu AS (
      SELECT user_id,
        MAX(CASE WHEN event_type = 'click' AND event_id % 11 = 0 THEN 1 ELSE 0 END) AS c,
        MAX(CASE WHEN event_type = 'view' AND event_id % 13 = 0 THEN 1 ELSE 0 END) AS v,
        MAX(CASE WHEN event_type = 'signup' AND event_id % 17 = 0 THEN 1 ELSE 0 END) AS g,
        MAX(CASE WHEN event_type = 'purchase' AND event_id % 7 = 0 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1),
    pu2 AS (SELECT *, c * 4 + v * 2 + g AS coal FROM pu),
    vs AS (SELECT coal, COUNT(*) AS n_users, SUM(conv) AS n_conv,
             SUM(conv) * 1000000 // COUNT(*) AS v_ppm
           FROM pu2 GROUP BY 1),
    lat AS (SELECT g.coal, COALESCE(vs.v_ppm, 0) AS v_ppm
            FROM (SELECT unnest(generate_series(0, 7)) AS coal) g
            LEFT JOIN vs ON g.coal = vs.coal),
    marg AS (
      SELECT * FROM (VALUES
        ${Seq(("click", 4), ("view", 2), ("signup", 1)).flatMap { case (ch, bit) =>
          (0 until 8).filter(sc => (sc & bit) != 0).map { sc =>
            val sz = java.lang.Long.bitCount(sc.toLong)
            val w6 = if (sz == 1 || sz == 3) 2 else 1
            s"('$ch', $sc, ${sc ^ bit}, $w6)"
          }
        }.mkString(", ")}) t(channel, s_with, s_without, w6)),
    phi AS (SELECT channel, SUM((lw.v_ppm - lo.v_ppm) * w6) AS phi_x6_ppm
            FROM marg JOIN lat lw ON lw.coal = marg.s_with
            JOIN lat lo ON lo.coal = marg.s_without
            GROUP BY 1),
    tch AS (
      SELECT 'click' AS channel, SUM(c) AS n_touched_users FROM pu2
      UNION ALL SELECT 'view', SUM(v) FROM pu2
      UNION ALL SELECT 'signup', SUM(g) FROM pu2),
    ends AS (SELECT
        SUM(CASE WHEN coal = 7 THEN v_ppm ELSE 0 END) AS v_all,
        SUM(CASE WHEN coal = 0 THEN v_ppm ELSE 0 END) AS v_none
      FROM lat)
    SELECT phi.channel, CAST(n_touched_users AS BIGINT) AS n_touched_users,
      CAST(phi_x6_ppm AS BIGINT) AS phi_x6_ppm,
      -- truncate-toward-zero to match Spark's DIV on possibly-negative φ
      -- (DuckDB's // floors, which diverges on negatives)
      CAST(CASE WHEN phi_x6_ppm >= 0 THEN phi_x6_ppm // 6
                ELSE -((-phi_x6_ppm) // 6) END AS BIGINT) AS shapley_ppm,
      CAST(NULL AS BOOLEAN) AS efficient
    FROM phi JOIN tch ON phi.channel = tch.channel
    UNION ALL
    SELECT 'z_total', NULL, CAST(SUM(phi_x6_ppm) AS BIGINT),
      CAST(MAX(v_all) - MAX(v_none) AS BIGINT),
      SUM(phi_x6_ppm) = (MAX(v_all) - MAX(v_none)) * 6
    FROM phi CROSS JOIN ends
    ORDER BY channel"""))

  // --------------------------------------------------------------- q203
  // TABLE-MAINTENANCE SESSION CAPSTONE — the VERDICT-r18 composition:
  // one simulated table runs the full lakehouse maintenance arc in a
  // single query, each phase consuming the previous phase's artifacts
  // (not re-fixturing): (a) positional DV deletes with the MOR≡eager
  // proof (q185's semantics), (b) compaction of the files whose deleted
  // fraction crosses the 20% bar — live rows move to gen-2 files, their
  // DVs are dropped, and the live CONTENT is proven digest-identical
  // across the rewrite (the invariant real compactions get wrong when
  // they race deletes), (c) snapshot expiry over the session's own
  // commit log (v1 base adds, v2 DV sidecar adds, v3 the compaction
  // commit) — expiring v1/v2 makes exactly the compacted originals and
  // their sidecars reclaimable, with the planted hazard that a FULLY
  // deleted file (the file_id=3 recall) produces NO gen-2 add, (d) orphan
  // vacuum of the compaction's temp files against the full referenced
  // set with a grace window (q197's early-delete hazard: the younger
  // temp per file stays), (e) an OCC writer that branched BEFORE the
  // compaction commit and must retry iff its write set touches a
  // rewritten file (file-level conflict, q189's protocol), and (z) the
  // end-to-end fact: the post-maintenance table with the writer's
  // absolute updates applied is digest-equal to the eager ground truth
  // (base minus deletes, updates applied) — maintenance changed LAYOUT,
  // never content. Per-phase `ok` is that phase's invariant; the
  // readout is 6 rows at any SF. Scale: one windowed pos assignment and
  // one DV anti-join on the corpus; everything else is file-count-sized
  // or op-bounded — the digests are single scans with map-side combine.
  // The file count itself is DERIVED (⌈N/DvTargetRows⌉, min 8), so the
  // positional window's per-partition size stays ≤~50 k rows at any N
  // and every synthetic id offset scales with it (see DvTargetRows).
  private val q203 = QueryDef(
    "q203_maintenance_session",
    (s, dir) => {
      // file count derived from the corpus (⌈N/target⌉, min 8): bounded
      // window partitions at any SF; one metadata-cheap count
      val nf = math.max(8L,
        (rd(s, dir, "lineitem").count() + DvTargetRows - 1L) / DvTargetRows)
      val base = rd(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_quantity").cast("long").as("qty"))
        .withColumn("file_id", col("ok") % nf)
        // (ok, ln) is NOT unique in this synthetic lineitem — qty joins
        // the ordering so position assignment is engine-consistent; rows
        // still tied after qty are full duplicates, swap-invariant in
        // every downstream column (file_id, k, qty)
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("file_id")).orderBy(col("ok"), col("ln"), col("qty"))))
        .withColumn("k", expr("ok * 7 + ln"))
        .cache()
      base.count()
      // phase A: two delete ops (predicate + full-file recall) land as DVs
      val dv = base.filter(col("qty") > 45 || col("file_id") === 3L)
        .select(col("file_id"), col("pos")).distinct().localCheckpoint()
      val pf = base.groupBy(col("file_id")).agg(count(lit(1)).as("n_rows"))
        .join(dv.groupBy(col("file_id")).agg(count(lit(1)).as("n_del")),
          Seq("file_id"), "left")
        .withColumn("n_del", coalesce(col("n_del"), lit(0L)))
        .withColumn("rewrite",
          expr("n_del * 1000000 DIV n_rows") >= DvRewritePpm)
        .localCheckpoint() // file-count-sized
      val mor = base.join(dv, Seq("file_id", "pos"), "left_anti").localCheckpoint()
      val eager = base.filter(!(col("qty") > 45 || col("file_id") === 3L))
      def dig(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n"),
          (coalesce(sum((col("k") * 1000003L + col("qty")) % HashMod), lit(0L))
            % HashMod).as("ck"))
      // lazy (r22): 1-row digest read twice in the one final action —
      // an EAGER checkpoint here was a dedicated serialized job whose
      // whole job was one scan of the already-materialized mor
      val digMor = dig(mor).select(col("n").as("n_m"), col("ck").as("ck_m"))
        .localCheckpoint(false)
      val digEager = dig(eager).select(col("n").as("n_e"), col("ck").as("ck_e"))
      val rowA = dv.agg(count(lit(1)).as("n_a"))
        .crossJoin(broadcast(pf.agg(
          sum(when(col("n_del") > 0, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("rewrite"), 1L).otherwise(0L)).as("n_c"))))
        .crossJoin(broadcast(digMor)).crossJoin(broadcast(digEager))
        .select(lit("a_dv_delete").as("phase"), col("n_a"), col("n_b"),
          col("n_c"), col("ck_m").as("ck"),
          (col("n_m") === col("n_e") && col("ck_m") === col("ck_e")).as("ok"))
      // phase B: compact the over-bar files; content must survive exactly
      val rewriteFiles = pf.filter(col("rewrite")).select(col("file_id"))
      val gen2 = mor.join(rewriteFiles, Seq("file_id"), "left_semi")
        .withColumn("file_id", col("file_id") + nf)
      val post = mor.join(rewriteFiles, Seq("file_id"), "left_anti")
        .unionByName(gen2).localCheckpoint()
      val digPost = dig(post).select(col("n").as("n_p"), col("ck").as("ck_p"))
      val rowB = rewriteFiles.agg(count(lit(1)).as("n_a"))
        .crossJoin(broadcast(gen2.agg(count(lit(1)).as("n_b"))))
        .crossJoin(broadcast(dv.join(rewriteFiles, Seq("file_id"), "left_semi")
          .agg(count(lit(1)).as("n_c"))))
        .crossJoin(broadcast(digPost)).crossJoin(broadcast(digMor))
        .select(lit("b_compaction").as("phase"), col("n_a"), col("n_b"),
          col("n_c"), col("ck_p").as("ck"),
          (col("n_p") === col("n_m") && col("ck_p") === col("ck_m")).as("ok"))
      // phase C: commit log v1/v2/v3; expire v1+v2, head = v3 only.
      // A fully-deleted rewritten file adds NO gen-2 file (the hazard).
      val gen2Files = gen2.select(col("file_id")).distinct()
      val ops = pf.select(lit(1L).as("ver"), lit("A").as("act"), col("file_id"))
        .unionByName(pf.filter(col("n_del") > 0)
          .select(lit(2L).as("ver"), lit("A").as("act"),
            (col("file_id") + 2L * nf).as("file_id")))
        .unionByName(rewriteFiles
          .select(lit(3L).as("ver"), lit("R").as("act"), col("file_id")))
        .unionByName(rewriteFiles
          .select(lit(3L).as("ver"), lit("R").as("act"),
            (col("file_id") + 2L * nf).as("file_id")))
        .unionByName(gen2Files
          .select(lit(3L).as("ver"), lit("A").as("act"), col("file_id")))
        .localCheckpoint(false) // op-bounded (≤ 4 ops per file); lazy (r22)
      val liveHead = ops.withColumn("rn", row_number().over(
          Window.partitionBy(col("file_id")).orderBy(col("ver").desc)))
        .filter(col("rn") === 1 && col("act") === "A")
        .select(col("file_id"))
      val refd = ops.select(col("file_id")).distinct().localCheckpoint(false)
      val deletable = refd.join(liveHead, Seq("file_id"), "left_anti")
        .withColumn("size_bytes", expr("file_id * 907 % 4000 + 100"))
        .localCheckpoint(false)
      val rowC = deletable.agg(count(lit(1)).as("n_b"),
          coalesce(sum(col("size_bytes")), lit(0L)).as("n_c"),
          (coalesce(sum(col("file_id") % HashMod), lit(0L)) % HashMod).as("ck"))
        .crossJoin(broadcast(rewriteFiles
          .join(deletable.select(col("file_id")), Seq("file_id"), "left_anti")
          .agg(count(lit(1)).as("n_missing"))))
        .select(lit("c_expiry").as("phase"), lit(2L).as("n_a"), col("n_b"),
          col("n_c"), col("ck"), (col("n_missing") === 0L).as("ok"))
      // phase D: vacuum the compaction temps; grace keeps the young one
      val listing = refd
        .select(col("file_id"), lit(true).as("referenced"), lit(100L).as("mtime"))
        .unionByName(rewriteFiles.select((col("file_id") + 3L * nf).as("file_id"),
          lit(false).as("referenced"), lit(150L).as("mtime")))
        .unionByName(rewriteFiles.select((col("file_id") + 4L * nf).as("file_id"),
          lit(false).as("referenced"), lit(200L).as("mtime")))
        .withColumn("size_bytes", expr("file_id * 907 % 4000 + 100"))
        .withColumn("verdict",
          when(col("referenced"), lit("kept_ref"))
            .when(col("mtime") > 240L - 60L, lit("kept_grace"))
            .otherwise(lit("vacuum")))
      val rowD = listing.agg(
          sum(when(col("verdict") === "kept_ref", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("verdict") === "kept_grace", 1L).otherwise(0L)).as("n_b"),
          sum(when(col("verdict") === "vacuum", 1L).otherwise(0L)).as("n_c"),
          (sum(when(col("verdict") === "vacuum", col("size_bytes"))
            .otherwise(0L)) % HashMod).as("ck"),
          bool_and(!(col("verdict") === "vacuum" && col("referenced"))).as("ok"))
        .select(lit("d_vacuum").as("phase"), col("n_a"), col("n_b"), col("n_c"),
          col("ck"), col("ok"))
      // phase E: the concurrent writer (branched at v2) vs the compaction
      val wset = base.filter(col("ok") % 59 === 0)
      val rowE = wset.agg(count(lit(1)).as("n_a"),
          (coalesce(sum(col("k") % HashMod), lit(0L)) % HashMod).as("ck"))
        .crossJoin(broadcast(wset.select(col("file_id")).distinct()
          .join(rewriteFiles, Seq("file_id"), "left_semi")
          .agg(count(lit(1)).as("n_b"))))
        .select(lit("e_occ").as("phase"), col("n_a"), col("n_b"),
          lit(0L).as("n_c"), col("ck"), (col("n_b") > 0L).as("ok"))
      // z: retried writer applied to the maintained table ≡ eager truth
      def applyW(df: org.apache.spark.sql.DataFrame) = df.withColumn("qty",
        when(col("ok") % 59 === 0, col("k") % 89L).otherwise(col("qty")))
      val digFinal = dig(applyW(post)).select(col("n").as("n_f"), col("ck").as("ck_f"))
      val digTruth = dig(applyW(eager)).select(col("n").as("n_t"), col("ck").as("ck_t"))
      val rowZ = digFinal.crossJoin(broadcast(digTruth))
        .crossJoin(broadcast(post.filter(col("ok") % 59 === 0)
          .agg(count(lit(1)).as("n_b"))))
        .crossJoin(broadcast(wset.join(dv, Seq("file_id", "pos"), "left_semi")
          .agg(count(lit(1)).as("n_c"))))
        .select(lit("z_session").as("phase"), col("n_f").as("n_a"), col("n_b"),
          col("n_c"), col("ck_f").as("ck"),
          (col("n_f") === col("n_t") && col("ck_f") === col("ck_t")).as("ok"))
      val out = rowA.unionByName(rowB).unionByName(rowC).unionByName(rowD)
        .unionByName(rowE).unionByName(rowZ).orderBy(col("phase"))
        .localCheckpoint()
      base.unpersist()
      out
    },
    Some(s"""WITH prm AS (
      SELECT GREATEST(8, (COUNT(*) + ${DvTargetRows - 1L}) // $DvTargetRows) AS nf
      FROM lineitem),
    base AS (
      SELECT l_orderkey AS ok, l_linenumber AS ln,
        CAST(l_quantity AS BIGINT) AS qty,
        l_orderkey % nf AS file_id,
        ROW_NUMBER() OVER (PARTITION BY l_orderkey % nf
                           ORDER BY l_orderkey, l_linenumber,
                             CAST(l_quantity AS BIGINT)) AS pos,
        l_orderkey * 7 + l_linenumber AS k
      FROM lineitem CROSS JOIN prm),
    dv AS (SELECT DISTINCT file_id, pos FROM base WHERE qty > 45 OR file_id = 3),
    pf AS (SELECT f.file_id, f.n_rows, COALESCE(d.n_del, 0) AS n_del,
             COALESCE(d.n_del, 0) * 1000000 // f.n_rows >= $DvRewritePpm AS rewrite
           FROM (SELECT file_id, COUNT(*) AS n_rows FROM base GROUP BY 1) f
           LEFT JOIN (SELECT file_id, COUNT(*) AS n_del FROM dv GROUP BY 1) d
             USING (file_id)),
    mor AS (SELECT b.* FROM base b WHERE NOT EXISTS
              (SELECT 1 FROM dv WHERE dv.file_id = b.file_id AND dv.pos = b.pos)),
    eager AS (SELECT * FROM base WHERE NOT (qty > 45 OR file_id = 3)),
    rw AS (SELECT file_id FROM pf WHERE rewrite),
    gen2 AS (SELECT m.ok, m.ln, m.qty, m.file_id + p.nf AS file_id, m.pos, m.k
             FROM mor m JOIN rw ON m.file_id = rw.file_id CROSS JOIN prm p),
    post AS (
      SELECT b.* FROM mor b
      WHERE NOT EXISTS (SELECT 1 FROM rw WHERE rw.file_id = b.file_id)
      UNION ALL SELECT ok, ln, qty, file_id, pos, k FROM gen2),
    dm AS (SELECT COUNT(*) AS n_m,
             COALESCE(SUM((k * 1000003 + qty) % $HashMod), 0) % $HashMod AS ck_m
           FROM mor),
    de AS (SELECT COUNT(*) AS n_e,
             COALESCE(SUM((k * 1000003 + qty) % $HashMod), 0) % $HashMod AS ck_e
           FROM eager),
    dp AS (SELECT COUNT(*) AS n_p,
             COALESCE(SUM((k * 1000003 + qty) % $HashMod), 0) % $HashMod AS ck_p
           FROM post),
    ops AS (
      SELECT 1 AS ver, 'A' AS act, file_id FROM pf
      UNION ALL SELECT 2, 'A', file_id + 2 * p.nf FROM pf CROSS JOIN prm p
        WHERE n_del > 0
      UNION ALL SELECT 3, 'R', file_id FROM rw
      UNION ALL SELECT 3, 'R', file_id + 2 * p.nf FROM rw CROSS JOIN prm p
      UNION ALL SELECT 3, 'A', file_id FROM (SELECT DISTINCT file_id FROM gen2)),
    liveh AS (SELECT file_id FROM (
        SELECT file_id, act,
          ROW_NUMBER() OVER (PARTITION BY file_id ORDER BY ver DESC) AS rn
        FROM ops) x WHERE rn = 1 AND act = 'A'),
    refd AS (SELECT DISTINCT file_id FROM ops),
    delet AS (SELECT r.file_id, r.file_id * 907 % 4000 + 100 AS size_bytes
              FROM refd r WHERE NOT EXISTS
                (SELECT 1 FROM liveh WHERE liveh.file_id = r.file_id)),
    lv AS (SELECT *, file_id * 907 % 4000 + 100 AS size_bytes,
             CASE WHEN referenced THEN 'kept_ref'
                  WHEN mtime > 240 - 60 THEN 'kept_grace'
                  ELSE 'vacuum' END AS verdict
           FROM (
             SELECT file_id, TRUE AS referenced, 100 AS mtime FROM refd
             UNION ALL SELECT file_id + 3 * p.nf, FALSE, 150
               FROM rw CROSS JOIN prm p
             UNION ALL SELECT file_id + 4 * p.nf, FALSE, 200
               FROM rw CROSS JOIN prm p)),
    wset AS (SELECT * FROM base WHERE ok % 59 = 0),
    fin AS (SELECT k, CASE WHEN ok % 59 = 0 THEN k % 89 ELSE qty END AS qty
            FROM post),
    tru AS (SELECT k, CASE WHEN ok % 59 = 0 THEN k % 89 ELSE qty END AS qty
            FROM eager),
    df_ AS (SELECT COUNT(*) AS n_f,
              COALESCE(SUM((k * 1000003 + qty) % $HashMod), 0) % $HashMod AS ck_f
            FROM fin),
    dt_ AS (SELECT COUNT(*) AS n_t,
              COALESCE(SUM((k * 1000003 + qty) % $HashMod), 0) % $HashMod AS ck_t
            FROM tru)
    SELECT * FROM (
      SELECT 'a_dv_delete' AS phase,
        CAST((SELECT COUNT(*) FROM dv) AS BIGINT) AS n_a,
        CAST((SELECT COUNT(*) FROM pf WHERE n_del > 0) AS BIGINT) AS n_b,
        CAST((SELECT COUNT(*) FROM rw) AS BIGINT) AS n_c,
        CAST((SELECT ck_m FROM dm) AS BIGINT) AS ck,
        (SELECT n_m FROM dm) = (SELECT n_e FROM de)
          AND (SELECT ck_m FROM dm) = (SELECT ck_e FROM de) AS ok
      UNION ALL
      SELECT 'b_compaction',
        CAST((SELECT COUNT(*) FROM rw) AS BIGINT),
        CAST((SELECT COUNT(*) FROM gen2) AS BIGINT),
        CAST((SELECT COUNT(*) FROM dv JOIN rw USING (file_id)) AS BIGINT),
        CAST((SELECT ck_p FROM dp) AS BIGINT),
        (SELECT n_p FROM dp) = (SELECT n_m FROM dm)
          AND (SELECT ck_p FROM dp) = (SELECT ck_m FROM dm)
      UNION ALL
      SELECT 'c_expiry', CAST(2 AS BIGINT),
        CAST((SELECT COUNT(*) FROM delet) AS BIGINT),
        CAST((SELECT COALESCE(SUM(size_bytes), 0) FROM delet) AS BIGINT),
        CAST((SELECT COALESCE(SUM(file_id % $HashMod), 0) % $HashMod
              FROM delet) AS BIGINT),
        (SELECT COUNT(*) FROM rw WHERE NOT EXISTS
           (SELECT 1 FROM delet WHERE delet.file_id = rw.file_id)) = 0
      UNION ALL
      SELECT 'd_vacuum',
        CAST((SELECT COUNT(*) FROM lv WHERE verdict = 'kept_ref') AS BIGINT),
        CAST((SELECT COUNT(*) FROM lv WHERE verdict = 'kept_grace') AS BIGINT),
        CAST((SELECT COUNT(*) FROM lv WHERE verdict = 'vacuum') AS BIGINT),
        CAST((SELECT COALESCE(SUM(CASE WHEN verdict = 'vacuum'
              THEN size_bytes ELSE 0 END), 0) % $HashMod FROM lv) AS BIGINT),
        (SELECT BOOL_AND(NOT (verdict = 'vacuum' AND referenced)) FROM lv)
      UNION ALL
      SELECT 'e_occ',
        CAST((SELECT COUNT(*) FROM wset) AS BIGINT),
        CAST((SELECT COUNT(*) FROM (SELECT DISTINCT file_id FROM wset) w
              JOIN rw ON w.file_id = rw.file_id) AS BIGINT),
        CAST(0 AS BIGINT),
        CAST((SELECT COALESCE(SUM(k % $HashMod), 0) % $HashMod FROM wset) AS BIGINT),
        (SELECT COUNT(*) FROM (SELECT DISTINCT file_id FROM wset) w
         JOIN rw ON w.file_id = rw.file_id) > 0
      UNION ALL
      SELECT 'z_session',
        CAST((SELECT n_f FROM df_) AS BIGINT),
        CAST((SELECT COUNT(*) FROM post WHERE ok % 59 = 0) AS BIGINT),
        CAST((SELECT COUNT(*) FROM wset w WHERE EXISTS
          (SELECT 1 FROM dv WHERE dv.file_id = w.file_id AND dv.pos = w.pos))
          AS BIGINT),
        CAST((SELECT ck_f FROM df_) AS BIGINT),
        (SELECT n_f FROM df_) = (SELECT n_t FROM dt_)
          AND (SELECT ck_f FROM df_) = (SELECT ck_t FROM dt_)
    ) ORDER BY phase"""))

  // --------------------------------------------------------------- q204
  // EPOCH SHUFFLE — the training-order construction every LLM data
  // pipeline runs between curation and the trainer, WITHOUT the global
  // sort a naive "ORDER BY rand()" costs: each doc routes to batch
  // (hash(doc_id) · A_epoch + B_epoch) mod M mod B — one narrow map, no
  // ordering op anywhere. The epoch seed enters as an AFFINE scramble
  // of the id hash, NOT a seed-prefix concat: poly-hashing 'e2|id'
  // differs from 'e1|id' by a constant per id-length group, so mod B
  // whole groups move (or stay) together — measured on this corpus as
  // moved_ppm = 10⁶ exactly, a shift pretending to be a shuffle. The
  // multiplicative scramble decorrelates per doc (the s39 constant).
  // The audit proves the routing is a real shuffle: (1)
  // per-batch fill and token mass are balanced, (2) each batch's SOURCE
  // MIX matches the corpus mix — the total-variation distance between
  // the batch's source distribution and the corpus's, in ppm, computed
  // over the completed (batch × source) grid so absent sources count
  // (the classic silent hole in mix audits), and (3) a second epoch
  // seed reassigns ~(B−1)/B of docs (moved_ppm) — epochs decorrelate
  // without any state carried between them. Scale: two aggregates over
  // one narrow scan; the TV grid is (B × |sources|)-sized. The TV terms
  // are per-source SHARE differences in ppm (each ≤ 10⁶ before the sum
  // over the source grid), never a cross product of raw counts — the
  // naive |n_bs·N − n_b·n_s| form overflows i64 near 10⁹ docs, two
  // orders below this library's stated envelope.
  private val ShuffleBatches = 16L

  private val q204 = QueryDef(
    "q204_epoch_shuffle",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("h", expr(strHashExpr("CAST(doc_id AS STRING)")))
        .withColumn("b1", expr(
          s"(h * 2654435761 % $HashMod) % $ShuffleBatches"))
        .withColumn("b2", expr(
          s"((h * 998244353 + 777767777) % $HashMod) % $ShuffleBatches"))
        .cache()
      val nTotal = d.count() // bounded: one scalar
      val pb = d.groupBy(col("b1").as("batch"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_mass"),
          countDistinct(col("source")).as("n_sources"),
          sum(when(col("b2") =!= col("b1"), 1L).otherwise(0L)).as("moved"))
        .localCheckpoint(eager = false) // B rows (lazy, r22 — consumers live in one action)
      val bs = d.groupBy(col("b1").as("batch"), col("source"))
        .agg(count(lit(1)).as("n_bs"))
      val srcTot = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        .localCheckpoint(eager = false) // |sources| rows
      val grid = pb.select(col("batch"), col("n_docs"))
        .crossJoin(broadcast(srcTot))
        .join(bs, Seq("batch", "source"), "left")
        .withColumn("n_bs", coalesce(col("n_bs"), lit(0L)))
        .withColumn("dev_ppm", abs(expr("n_bs * 1000000 DIV n_docs") -
          expr(s"n_s * 1000000 DIV $nTotal")))
      val stats = pb.join(
          grid.groupBy(col("batch")).agg(sum(col("dev_ppm")).as("devsum_ppm")),
          Seq("batch"))
        .withColumn("tv_ppm", expr("devsum_ppm DIV 2"))
        .localCheckpoint(eager = false) // B rows
      val perBatch = stats.select(col("batch"), col("n_docs"), col("tok_mass"),
        col("n_sources"), col("tv_ppm"),
        expr("moved * 1000000 DIV n_docs").as("moved_ppm"))
      val total = stats.agg(sum(col("n_docs")).as("n_docs"),
          sum(col("tok_mass")).as("tok_mass"), max(col("tv_ppm")).as("tv_ppm"),
          sum(col("moved")).as("movedsum"))
        .crossJoin(broadcast(srcTot.agg(count(lit(1)).as("n_sources"))))
        .select(lit(-1L).as("batch"), col("n_docs"), col("tok_mass"),
          col("n_sources"), col("tv_ppm"),
          expr("movedsum * 1000000 DIV n_docs").as("moved_ppm"))
      val out = perBatch.unionByName(total).orderBy(col("batch")).localCheckpoint()
      d.unpersist()
      out
    },
    Some(s"""WITH d0 AS (
      SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        ${strHashSql("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents),
    d AS (
      SELECT doc_id, source, n_tok,
        (h * 2654435761 % $HashMod) % $ShuffleBatches AS b1,
        ((h * 998244353 + 777767777) % $HashMod) % $ShuffleBatches AS b2
      FROM d0),
    n AS (SELECT COUNT(*) AS n_total FROM d),
    pb AS (SELECT b1 AS batch, COUNT(*) AS n_docs, SUM(n_tok) AS tok_mass,
             COUNT(DISTINCT source) AS n_sources,
             SUM(CASE WHEN b2 <> b1 THEN 1 ELSE 0 END) AS moved
           FROM d GROUP BY 1),
    bs AS (SELECT b1 AS batch, source, COUNT(*) AS n_bs FROM d GROUP BY 1, 2),
    st AS (SELECT source, COUNT(*) AS n_s FROM d GROUP BY 1),
    grid AS (SELECT p.batch, p.n_docs, s.source, s.n_s, COALESCE(b.n_bs, 0) AS n_bs
             FROM pb p CROSS JOIN st s
             LEFT JOIN bs b ON b.batch = p.batch AND b.source = s.source),
    tv AS (SELECT batch,
             SUM(ABS(n_bs * 1000000 // n_docs
                     - n_s * 1000000 // (SELECT n_total FROM n))) AS devsum_ppm
           FROM grid GROUP BY 1),
    stats AS (SELECT p.*, t.devsum_ppm, t.devsum_ppm // 2 AS tv_ppm
              FROM pb p JOIN tv t USING (batch))
    SELECT CAST(batch AS BIGINT) AS batch, CAST(n_docs AS BIGINT) AS n_docs,
      CAST(tok_mass AS BIGINT) AS tok_mass,
      CAST(n_sources AS BIGINT) AS n_sources,
      CAST(tv_ppm AS BIGINT) AS tv_ppm,
      CAST(moved * 1000000 // n_docs AS BIGINT) AS moved_ppm
    FROM stats
    UNION ALL
    SELECT -1, CAST(SUM(n_docs) AS BIGINT), CAST(SUM(tok_mass) AS BIGINT),
      CAST((SELECT COUNT(*) FROM st) AS BIGINT), CAST(MAX(tv_ppm) AS BIGINT),
      CAST(SUM(moved) * 1000000 // SUM(n_docs) AS BIGINT)
    FROM stats
    ORDER BY batch"""))

  // --------------------------------------------------------------- q206
  // STORAGE-TIER PLACEMENT PLANNER — the hot/warm/cold decision a
  // lakehouse ops team runs over its file manifest (q196's GC planner
  // decides what to DELETE; this decides where the survivors LIVE):
  // per file, access count and last-access time fold from the event
  // log in ONE map-side-combined aggregate, then TWO competing
  // policies tier the manifest — recency terciles (rank by last
  // access) vs frequency terciles (rank by access count), both
  // rank-based with file_id tie-breaks so the split is deterministic
  // and equal-sized by construction in both engines. The readout per
  // recency tier: files, bytes, access mass, how many files the
  // frequency policy AGREES on, and the bytes that would MOVE if the
  // deployment switched policy — the migration cost column that
  // decides whether the "better" policy is worth the rewrite. Files
  // the log never touched land in cold under both (the planted
  // agreement floor). Scale: the event fold is corpus-sized with
  // map-side combine; everything after is manifest-sized (the q199
  // argument — file metadata, not data), so the global rank windows
  // order |files| rows, never rows of data.
  private val q206 = QueryDef(
    "q206_tier_planner",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val files = rd(s, dir, "orders")
        .select((col("o_orderkey") % 97).as("file_id")).distinct()
        .withColumn("size_bytes", col("file_id") * 1009L % 5000L + 100L)
      val acc = events(s, dir)
        .select((col("event_id") % 97).as("file_id"), unix_micros(col("ts")).as("us"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_acc"), max(col("us")).as("last_us"))
      val base = files.join(acc, Seq("file_id"), "left")
        .withColumn("n_acc", coalesce(col("n_acc"), lit(0L)))
        .withColumn("last_us", coalesce(col("last_us"), lit(0L)))
        .localCheckpoint() // manifest-sized
      val n = base.count()
      val tiered = base
        .withColumn("rr", row_number().over(
          Window.orderBy(col("last_us").desc, col("file_id"))))
        .withColumn("rf", row_number().over(
          Window.orderBy(col("n_acc").desc, col("file_id"))))
        .withColumn("t_rec", expr(s"(rr - 1) * 3 DIV ${n}L"))
        .withColumn("t_frq", expr(s"(rf - 1) * 3 DIV ${n}L"))
      val named = tiered.withColumn("tier",
        expr("""CASE t_rec WHEN 0 THEN '0_hot' WHEN 1 THEN '1_warm'
                ELSE '2_cold' END"""))
      val perTier = named.groupBy(col("tier"))
        .agg(count(lit(1)).as("n_files"), sum(col("size_bytes")).as("bytes"),
          sum(col("n_acc")).as("n_accesses"),
          sum(when(col("t_rec") === col("t_frq"), 1L).otherwise(0L)).as("n_agree"),
          sum(when(col("t_rec") =!= col("t_frq"), col("size_bytes"))
            .otherwise(0L)).as("moved_bytes"))
        .withColumn("agree_ppm", expr("n_agree * 1000000 DIV n_files"))
        .localCheckpoint() // 3 rows
      val total = perTier.agg(sum(col("n_files")).as("n_files"),
          sum(col("bytes")).as("bytes"), sum(col("n_accesses")).as("n_accesses"),
          sum(col("n_agree")).as("n_agree"),
          sum(col("moved_bytes")).as("moved_bytes"))
        .select(lit("z_total").as("tier"), col("n_files"), col("bytes"),
          col("n_accesses"), col("n_agree"), col("moved_bytes"),
          expr("n_agree * 1000000 DIV n_files").as("agree_ppm"))
      perTier.unionByName(total).orderBy(col("tier"))
    },
    Some("""WITH files AS (
      SELECT DISTINCT o_orderkey % 97 AS file_id FROM orders),
    f AS (SELECT file_id, file_id * 1009 % 5000 + 100 AS size_bytes FROM files),
    acc AS (SELECT event_id % 97 AS file_id, COUNT(*) AS n_acc,
              MAX(epoch_us(ts)) AS last_us
            FROM events GROUP BY 1),
    base AS (SELECT f.file_id, f.size_bytes,
               COALESCE(acc.n_acc, 0) AS n_acc,
               COALESCE(acc.last_us, 0) AS last_us
             FROM f LEFT JOIN acc USING (file_id)),
    nn AS (SELECT COUNT(*) AS n FROM base),
    rk AS (SELECT *,
             ROW_NUMBER() OVER (ORDER BY last_us DESC, file_id) AS rr,
             ROW_NUMBER() OVER (ORDER BY n_acc DESC, file_id) AS rf
           FROM base),
    tt AS (SELECT *, (rr - 1) * 3 // (SELECT n FROM nn) AS t_rec,
             (rf - 1) * 3 // (SELECT n FROM nn) AS t_frq FROM rk),
    nm AS (SELECT *, CASE t_rec WHEN 0 THEN '0_hot' WHEN 1 THEN '1_warm'
             ELSE '2_cold' END AS tier FROM tt),
    pt AS (SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(size_bytes) AS BIGINT) AS bytes,
             CAST(SUM(n_acc) AS BIGINT) AS n_accesses,
             CAST(SUM(CASE WHEN t_rec = t_frq THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree,
             CAST(SUM(CASE WHEN t_rec <> t_frq THEN size_bytes ELSE 0 END)
               AS BIGINT) AS moved_bytes
           FROM nm GROUP BY 1)
    SELECT tier, n_files, bytes, n_accesses, n_agree, moved_bytes,
      CAST(n_agree * 1000000 // n_files AS BIGINT) AS agree_ppm
    FROM pt
    UNION ALL
    SELECT 'z_total', CAST(SUM(n_files) AS BIGINT), CAST(SUM(bytes) AS BIGINT),
      CAST(SUM(n_accesses) AS BIGINT), CAST(SUM(n_agree) AS BIGINT),
      CAST(SUM(moved_bytes) AS BIGINT),
      CAST(SUM(n_agree) * 1000000 // SUM(n_files) AS BIGINT)
    FROM pt
    ORDER BY tier"""))

  val defs: Seq[QueryDef] =
    Seq(q51, q52, q53, q67, q86, q116, q120, q121, q122, q123, q125, q126,
      q131, q144, q145, q152, q155, q156, q185, q186, q189, q194, q196,
      q197, q198, q201, q203, q204, q206)
}
