package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** A streaming source of billing records: anything that yields a streaming
  * DataFrame with a `value` column (binary or string JSON), the shape a
  * Kafka topic scan produces. Prod = [[KafkaSource]]; tests and air-gapped
  * runs = [[TextFileSource]] / MemoryStream (SURVEY §1.4). */
trait BillingSource {
  def load(spark: SparkSession): DataFrame
}

/** Kafka scan with the reference's exact options
  * (`Dcache_kafka_to_hive.py:293-301`): subscribe by topic *pattern*,
  * include headers, tolerate missing offsets. Requires the Kafka connector
  * on the classpath (not shipped in this environment — construction is
  * cheap, `load` fails fast if the format is absent). */
final case class KafkaSource(
    bootstrapServers: String,
    subscribePattern: String,
    includeHeaders: Boolean = true,
    failOnDataLoss: Boolean = false) extends BillingSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribePattern", subscribePattern)
      .option("includeHeaders", includeHeaders.toString)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
}

/** Line-oriented JSON files in a directory, one record per line — the
  * Kafka stand-in for tests and local runs. `text` already names its
  * column `value`. */
final case class TextFileSource(dir: String) extends BillingSource {
  def load(spark: SparkSession): DataFrame =
    spark.readStream.text(dir).select(col("value"))
}
