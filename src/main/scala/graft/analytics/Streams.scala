package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Tables._

/**
 * Approximate and streaming operators (SURVEY §2.8 open rows):
 * `approx_count_distinct` (HLL++ — the scale-safe form of q09's exact
 * multi-distinct) and a real Structured Streaming event-time window with
 * a watermark, run to completion with `Trigger.AvailableNow` against a
 * file source and collected through the memory sink.
 *
 * Scale notes (100 TB): q18 is one partial/final aggregate whose state is
 * a constant-size sketch per group — the plan that replaces q09's Expand
 * when exactness isn't required. q19's streaming agg keeps
 * |open windows × event types| rows of state per partition; the 1-hour
 * watermark bounds state for out-of-order arrival, which is the entire
 * point of the operator at scale.
 */
object Streams {

  // ---------------------------------------------------------------- q18
  // Approx distinct (HLL++). No oracle: DuckDB's approx_count_distinct is
  // a different sketch; the driver records the rows-only check.
  private val q18 = QueryDef(
    "q18_approx_distinct",
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("n_users_approx"),
          approx_count_distinct(col("props"), 0.02).as("n_props_approx"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
    None)

  // ---------------------------------------------------------------- q19
  // Streaming event-time tumbling window + watermark, drained with
  // AvailableNow into the memory sink; oracle = the batch equivalent
  // (no late data beyond the watermark in a bounded replay).
  private val q19 = QueryDef(
    "q19_stream_window",
    (s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // FileStreamSource needs a directory; the sf tables are single files.
      val streamDir = java.nio.file.Files.createTempDirectory("graft-q19")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val windowed = s.readStream
        .schema(schema)
        .parquet(streamDir.toString)
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      val sinkName = "q19_stream_window_sink"
      val q = windowed.writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.stop()
      s.table(sinkName)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
      event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))

  val defs: Seq[QueryDef] = Seq(q18, q19)
}
