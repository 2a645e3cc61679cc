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

  /** The exact option map handed to the Kafka reader — a first-class
    * value (not buried in builder calls) so the contract with the
    * reference's scan (`Dcache_kafka_to_hive.py:293-301`) is unit-
    * assertable even where the Kafka jar is absent. `maxOffsetsPerTrigger`
    * is the one addition: backpressure, capping records per micro-batch
    * so an at-scale replay (checkpoint far behind the head) can't blow
    * executor memory or the trigger interval. */
  def options: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribePattern" -> subscribePattern,
      "includeHeaders" -> includeHeaders.toString,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  def load(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka").options(options).load()
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
