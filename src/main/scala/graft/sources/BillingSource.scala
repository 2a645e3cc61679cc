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
    failOnDataLoss: Boolean = false,
    maxOffsetsPerTrigger: Option[Long] = None) extends BillingSource {
  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribePattern", subscribePattern)
      .option("includeHeaders", includeHeaders.toString)
      .option("failOnDataLoss", failOnDataLoss.toString)
    // backpressure: cap records per micro-batch so one oversized batch
    // can't blow executor memory or blow past the trigger interval —
    // at-scale replays (checkpoint far behind the head) NEED this cap
    maxOffsetsPerTrigger.foreach(n => reader.option("maxOffsetsPerTrigger", n.toString))
    reader.load()
  }
}

/** Line-oriented JSON files in a directory, one record per line — the
  * Kafka stand-in for tests and local runs. `text` already names its
  * column `value`. `maxFilesPerTrigger` is the file-source twin of
  * Kafka's offset cap: a bounded drain becomes several smaller
  * micro-batches instead of one giant one. */
final case class TextFileSource(
    dir: String,
    maxFilesPerTrigger: Option[Int] = None) extends BillingSource {
  def load(spark: SparkSession): DataFrame = {
    val reader = spark.readStream
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    reader.text(dir).select(col("value"))
  }
}
