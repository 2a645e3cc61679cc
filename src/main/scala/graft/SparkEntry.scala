package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship slice (SURVEY §7.3): parse the events table's JSON props
    * (≡ the Kafka `value`), route by event_type (≡ msgType), write a
    * day-partitioned parquet table (≡ the billing tables' layout), read
    * it back, and aggregate rows per (event_type, day) — P1–P5, F1, X1,
    * W1 and one aggregation in a single end-to-end path. */
  def entry(spark: SparkSession): DataFrame = {
    // fixed ABSOLUTE path under the system temp dir (overwritten per run,
    // not a fresh temp dir per invocation — repeated smoke runs must not
    // leak directories; anchored so the output location does not depend on
    // the JVM working directory, which a relative target/ path would)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-entry").toString
    // encoding-adaptive loader (the testdata ts encoding has flipped
    // between rounds; Tables.normalizeTs owns the dtype branch)
    val parsed = analytics.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
      .filter(col("event_type").isin("click", "view", "purchase", "signup", "error"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    parsed
      .select(col("event_id"), col("event_type"), col("value"), col("k"), col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    spark.read.parquet(out)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"))
      .orderBy(col("event_type"), col("day"))
  }

  /** One entry per implemented operator from SURVEY.md §2 / §2.8. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.Registry.oracleSql
}
