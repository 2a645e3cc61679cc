package graft.ddl

import org.apache.spark.sql.SparkSession
import graft.schema.BillingSchema

/**
 * Idempotent DDL for the four billing tables, equivalent to the reference's
 * `Tables` class (`Dcache_kafka_to_hive.py:147-269`): CREATE TABLE IF NOT
 * EXISTS, partitioned by `partition_date` (STRING, day granularity), stored
 * as Parquet.
 *
 * Differences from the reference, on purpose:
 *   - `USING PARQUET` (Spark-native datasource tables) instead of Hive
 *     `STORED AS PARQUET`, so the same DDL works with or without a Hive
 *     metastore; type parity is preserved (Hive REAL → Spark FLOAT).
 *   - table names are parameterized by database, not interpolated f-strings.
 */
class BillingTables(spark: SparkSession, database: String = "default") {

  def qualified(table: String): String = s"$database.$table"

  def createDatabase(): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")

  def createAll(): Unit = BillingSchema.tableSchemas.keys.toSeq.sorted.foreach(create)

  /** CREATE TABLE IF NOT EXISTS with the reference's exact column order and
    * types (`Dcache_kafka_to_hive.py:162-262`). */
  def create(table: String): Unit = {
    val cols = BillingSchema.tableSchemas(table)
      .map { case (c, t) => s"`$c` $t" }.mkString(",\n  ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS ${qualified(table)} (
         |  $cols,
         |  `${BillingSchema.partitionField}` STRING
         |) USING PARQUET
         |PARTITIONED BY (`${BillingSchema.partitionField}`)""".stripMargin)
  }

  /** DROP TABLE loop, `Dcache_kafka_to_hive.py:264-266`. */
  def drop(tables: Seq[String]): Unit =
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${qualified(t)}"))

  def dropAll(): Unit = drop(BillingSchema.tableSchemas.keys.toSeq)

  /** SHOW TABLES, `Dcache_kafka_to_hive.py:268-269`. Session temp views are
    * excluded: `Catalog.listTables(db)` reports them for EVERY database, but
    * they are not billing tables (and leak across callers sharing a session). */
  def list(): Seq[String] =
    spark.catalog.listTables(database).collect()
      .filter(!_.isTemporary).map(_.name).toSeq
}
