package graft.compact

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
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
 *
 * Scale notes (100 TB):
 *   - partition sizes come from ONE catalog listing per table plus one
 *     `getContentSummary` RPC per partition directory — not a per-file
 *     `getFileStatus` loop on the driver (O(partitions), not O(files));
 *   - the read side is materialized with `localCheckpoint()` before the
 *     overwrite: the dynamic overwrite would otherwise delete the very
 *     files its own scan is reading (Spark rejects the plan with "Cannot
 *     overwrite a path that is also being read from"). The checkpoint
 *     bounds the exposure to one partition's worth of blocks at a time.
 */
class Compactor(
    spark: SparkSession,
    database: String = "default",
    targetFileBytes: Long = 1L << 30) {

  private def qualified(t: String) = s"$database.$t"

  /** SHOW PARTITIONS value Hive uses for a NULL partition key. */
  private val nullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Enumerate a table's partitions (reference `:369-372`), per table. */
  def partitionsOf(table: String): Seq[String] = {
    import spark.implicits._
    spark.sql(s"SHOW PARTITIONS ${qualified(table)}")
      .as[String].collect().toSeq
      .map(_.split("=")(1))
  }

  /** partition value → stored bytes: one catalog call for the locations,
    * one recursive content-summary RPC per partition directory. */
  private def partitionSizes(table: String): Map[String, Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    spark.sessionState.catalog
      .listPartitions(TableIdentifier(table, Some(database)))
      .map { part =>
        val value = part.spec.getOrElse(BillingSchema.partitionField, nullPartition)
        val loc = new Path(part.location)
        val bytes =
          try loc.getFileSystem(conf).getContentSummary(loc).getLength
          catch { case _: java.io.FileNotFoundException => 0L }
        value -> bytes
      }.toMap
  }

  /** Compact the given partitions (None = all) of the given tables. */
  def compact(
      tables: Seq[String] = BillingSchema.tableSchemas.keys.toSeq.sorted,
      partitions: Option[Seq[String]] = None): Unit = {
    val field = BillingSchema.partitionField
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      tables.foreach { table =>
        val sizes = partitionSizes(table)
        val parts = partitions.getOrElse(sizes.keys.toSeq.sorted)
        parts.foreach { p =>
          // SHOW PARTITIONS reports NULL keys as the Hive default-partition
          // sentinel; matching it with equality would select zero rows
          val predicate =
            if (p == nullPartition) col(field).isNull else col(field) === p
          val df = spark.table(qualified(table)).where(predicate)
          val nFiles = math.max(1,
            math.ceil(sizes.getOrElse(p, 0L).toDouble / targetFileBytes).toInt)
          // materialize before overwriting the files being read, then let
          // the dynamic overwrite atomically replace only this partition
          df.repartition(nFiles)
            .localCheckpoint()
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
