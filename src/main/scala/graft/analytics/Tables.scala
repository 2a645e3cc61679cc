package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders + numeric helpers shared by the analytics queries. */
object Tables {

  def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; read the raw int64 (`nanosAsLong`) and convert to a microsecond
    * timestamp with integral division (double division would lose precision
    * above 2^53 ns). Set at runtime so queries work under any session. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rd(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Deterministic cross-engine float aggregation: per-row values are cast
    * to DECIMAL (exact, associative sum — immune to partition-order float
    * drift AND identical between Spark and the DuckDB oracle), summed, and
    * the exact result converted back to DOUBLE. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** SQL-side twin of [[dsum]] for the DuckDB oracle strings. */
  def dsumSql(exprSql: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($exprSql AS DECIMAL(18,$scale))) AS DOUBLE)"
}
