package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Contract of `plans/PartitionFilterGuard` (Hive strict mode / BigQuery
  * require_partition_filter semantics): with the guard conf naming a
  * partitioned table, an unfiltered scan of it fails at PLAN time; a
  * partition predicate, or a join on the partition column (the DPP
  * shape), satisfies it; writes to the table stay exempt; and the guard
  * is a strict no-op while the conf is unset. */
class PartitionFilterGuardSpec extends SparkSuite {

  private val conf = "spark.graft.requirePartitionFilter.tables"
  private val table = "g_guard_events"

  private def withGuard[T](body: => T): T = {
    spark.conf.set(conf, table)
    try body finally spark.conf.unset(conf)
  }

  private def ensureTable(): Unit =
    if (!spark.catalog.tableExists(table)) {
      spark.range(100)
        .select(col("id"), (col("id") % 5).cast("string").as("day"))
        .write.partitionBy("day").saveAsTable(table)
    }

  test("unfiltered scan of a protected table throws at plan time") {
    ensureTable()
    withGuard {
      val e = intercept[SparkException] { spark.table(table).count() }
      e.getMessage should include(table)
      e.getMessage should include("day")
    }
  }

  test("a partition predicate satisfies the guard; non-partition does not") {
    ensureTable()
    withGuard {
      spark.table(table).filter(col("day") === "3").count() shouldBe 20
      intercept[SparkException] {
        spark.table(table).filter(col("id") > 50).count()
      }
    }
  }

  test("a join on the partition column (the DPP shape) satisfies it") {
    ensureTable()
    withGuard {
      val dim = spark.range(2).select(col("id").cast("string").as("d"))
        .filter(col("d") === "1")
      spark.table(table).join(dim, col("day") === col("d"))
        .count() shouldBe 20
    }
  }

  test("writes to the protected table are exempt; a protected source in an insert-SELECT is not") {
    ensureTable()
    withGuard {
      // append targets the protected table with no scan filter: allowed
      spark.range(100, 105)
        .select(col("id"), lit("9").as("day"))
        .write.mode("append").insertInto(table)
      // reading it back unfiltered inside a write's SOURCE query: blocked
      intercept[SparkException] {
        spark.table(table).write.mode("overwrite")
          .saveAsTable("g_guard_copy")
      }
      spark.sql("DROP TABLE IF EXISTS g_guard_copy")
    }
  }

  test("guard is a no-op while the conf is unset") {
    ensureTable()
    spark.table(table).count() should be >= 100L
  }
}
