package graft.compact

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.schema.BillingSchema

/**
 * Partition compaction: rewrite each day-partition of each billing table
 * into few large files.
 *
 * Reference: `Streaming.repartition` (`Dcache_kafka_to_hive.py:354-385`) —
 * per partition, `SELECT *` + `repartition(1)` + overwrite via a staging
 * table. Reference bugs fixed here (SURVEY §3.2, §4.2):
 *   - partition list is computed PER TABLE (the reference reuses the first
 *     table's list for all four);
 *   - the non-atomic staging-table two-step is replaced by a single dynamic
 *     `INSERT OVERWRITE` job (`partitionOverwriteMode=dynamic`), atomic per
 *     Spark job with no leftover `temporal` table;
 *   - `repartition(1)` (fixed single file, a full shuffle that caps a
 *     partition's rewrite at one task) becomes size-targeted: file count =
 *     ceil(partition bytes / targetFileBytes), so a 100 TB table compacts
 *     with cluster-wide parallelism while still producing ~1 GB files.
 */
class Compactor(
    spark: SparkSession,
    database: String = "default",
    targetFileBytes: Long = 1L << 30) {

  private def qualified(t: String) = s"$database.$t"

  /** Enumerate a table's partitions (reference `:369-372`), per table. */
  def partitionsOf(table: String): Seq[String] = {
    import spark.implicits._
    spark.sql(s"SHOW PARTITIONS ${qualified(table)}")
      .as[String].collect().toSeq
      .map(_.split("=")(1))
  }

  /** Bytes currently stored in one partition, from the file index. */
  private def partitionBytes(table: String, partition: String): Long = {
    val files = spark.sql(
      s"SELECT * FROM ${qualified(table)} WHERE ${BillingSchema.partitionField} = '${partition.replace("'", "")}'")
      .inputFiles
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }

  /** Compact the given partitions (None = all) of the given tables. */
  def compact(
      tables: Seq[String] = BillingSchema.tableSchemas.keys.toSeq.sorted,
      partitions: Option[Seq[String]] = None): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      tables.foreach { table =>
        val parts = partitions.getOrElse(partitionsOf(table))
        parts.foreach { p =>
          val df = spark.table(qualified(table))
            .where(col(BillingSchema.partitionField) === p)
          val nFiles = math.max(1,
            math.ceil(partitionBytes(table, p).toDouble / targetFileBytes).toInt)
          // dynamic overwrite touches only this partition; atomic per job
          df.repartition(nFiles)
            .write.mode("overwrite").insertInto(qualified(table))
        }
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
