package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import Tables._

/**
 * The ingest-shaped queries over the `events` table, which stands in for the
 * billing stream (JSON `props` ≡ Kafka `value`, `event_type` ≡ `msgType`,
 * `ts` ≡ `date` → day partition). These exercise the reference pipeline's
 * load-bearing semantics as batch queries: JSON extraction (P2), typed cast
 * (P4), msgType filter routing (F1–F4), day-partition derivation (X1), and
 * the downstream per-partition aggregation the tables exist to serve.
 */
object Ingest {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  // ---------------------------------------------------------------- q15
  // Flagship: parse JSON props, derive the day partition, route by type,
  // aggregate per (event_type, day). Narrow ops until one partial-combined
  // aggregate shuffle — the shape that scales to 100 TB of events.
  private val q15 = QueryDef(
    "q15_ingest_route_counts",
    (s, dir) =>
      events(s, dir)
        .filter(col("event_type").isin("click", "view", "purchase", "signup", "error"))
        .select(
          col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("value"),
          from_json(col("props"), propsSchema).getField("k").as("k"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          sum(col("k").cast("long")).as("sum_k"))
        .orderBy(col("event_type"), col("day")),
    Some(s"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
      ${dsumSql("value")} AS sum_value,
      CAST(SUM(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
    GROUP BY 1, 2 ORDER BY event_type, day"""))

  // ---------------------------------------------------------------- q16
  // Tumbling one-hour buckets (batch twin of the streaming windowed agg).
  private val q16 = QueryDef(
    "q16_hourly_activity",
    (s, dir) =>
      events(s, dir)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("hour"), col("event_type")),
    Some("""SELECT strftime(ts, '%Y-%m-%d %H:00:00') AS hour, event_type,
      COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))

  // ---------------------------------------------------------------- q17
  // Typed-cast + filter routing parity: per-type value distribution of one
  // routed slice (≡ one msgType table), with try_cast null semantics.
  private val q17 = QueryDef(
    "q17_routed_purchases",
    (s, dir) =>
      events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"),
          col("value"),
          expr("try_cast(get_json_object(props, '$.k') AS int)").as("k"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("spend"), max(col("k")).as("max_k"))
        .filter(col("n") >= 2)
        .orderBy(col("user_id")),
    Some(s"""SELECT user_id, COUNT(*) AS n, ${dsumSql("value")} AS spend,
      MAX(TRY_CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS max_k
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id HAVING COUNT(*) >= 2 ORDER BY user_id"""))

  // ---------------------------------------------------------------- q23
  // Map-typed functions: parse props into map<string,string>, explode the
  // key set, histogram key frequency (the generic-JSON-telemetry shape —
  // no fixed schema needed). Narrow generate + one combined aggregate.
  private val q23 = QueryDef(
    "q23_props_key_histogram",
    (s, dir) =>
      events(s, dir)
        .select(explode(map_keys(
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k")),
    Some("""SELECT k, COUNT(*) AS n FROM (
      SELECT unnest(json_keys(props)) AS k FROM events)
    GROUP BY k ORDER BY k"""))

  // --------------------------------------------------------------- q193
  // DATA-FRESHNESS SLA AUDIT — the per-feed "is the pipeline still
  // flowing" report an on-call reads before anything else: per feed
  // (event_type here), event count, first/last event time, the feed's
  // own mean inter-arrival gap ((last − first) / (n − 1), exact integer
  // micros — no per-row gap materialization, no window), staleness =
  // how far the feed's last event lags the LAKE's newest event, and a
  // verdict: a feed is `stale` when its lag exceeds 3× its own mean
  // cadence — the self-calibrating rule that flags a dead hourly feed
  // within hours without false-alarming a daily one (a fixed global
  // threshold can't do both; q150 audits ORDER, q183 sizes the
  // watermark — this audits LIVENESS). One map-side-combined aggregate
  // per feed + a 1-row global max broadcast; all arithmetic in exact
  // epoch micros so verdicts hash-match.
  private val q193 = QueryDef(
    "q193_freshness_sla",
    (s, dir) => {
      val live = events(s, dir).select(col("event_type"),
        expr("unix_micros(ts)").as("us"))
      // a planted dead feed (its mirror stopped after the first week —
      // m16's contrast discipline): the stale=true branch must fire
      val ev = live.unionByName(
        live.filter(col("us") < 1704672000000000L) // < 2024-01-08T00:00Z
          .select(lit("zz_legacy").as("event_type"), col("us")))
      val feeds = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("us")).as("first_us"),
          max(col("us")).as("last_us"))
        .withColumn("mean_gap_us", expr("(last_us - first_us) DIV (n - 1)"))
      feeds.crossJoin(broadcast(ev.agg(max(col("us")).as("lake_max_us"))))
        .withColumn("lag_us", col("lake_max_us") - col("last_us"))
        .withColumn("stale", col("lag_us") > lit(3L) * col("mean_gap_us"))
        .select(col("event_type"), col("n"), col("first_us"), col("last_us"),
          col("mean_gap_us"), col("lag_us"), col("stale"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH live AS (SELECT event_type, epoch_us(ts) AS us FROM events),
    ev AS (SELECT * FROM live
           UNION ALL
           SELECT 'zz_legacy', us FROM live WHERE us < 1704672000000000),
    feeds AS (SELECT event_type, COUNT(*) AS n, MIN(us) AS first_us,
                MAX(us) AS last_us,
                (MAX(us) - MIN(us)) // (COUNT(*) - 1) AS mean_gap_us
              FROM ev GROUP BY 1),
    lake AS (SELECT MAX(us) AS lake_max_us FROM ev)
    SELECT event_type, CAST(n AS BIGINT) AS n,
      CAST(first_us AS BIGINT) AS first_us, CAST(last_us AS BIGINT) AS last_us,
      CAST(mean_gap_us AS BIGINT) AS mean_gap_us,
      CAST(lake_max_us - last_us AS BIGINT) AS lag_us,
      lake_max_us - last_us > 3 * mean_gap_us AS stale
    FROM feeds CROSS JOIN lake ORDER BY event_type"""))

  val defs: Seq[QueryDef] = Seq(q15, q16, q17, q23, q193)
}
