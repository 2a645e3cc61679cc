package graft

import graft.ddl.BillingTables
import graft.schema.BillingSchema
import org.apache.spark.sql.types.{FloatType, IntegerType, StringType}

/** DDL round-trip (SURVEY §5.2; reference `Dcache_kafka_to_hive.py:147-269`). */
class BillingTablesSpec extends SparkSuite {

  private lazy val tables = {
    val t = new BillingTables(spark, "ddltest")
    t.createDatabase()
    t
  }

  test("createAll registers the four billing tables") {
    tables.createAll()
    tables.list().toSet shouldBe Set("transfer", "request", "storage", "remove")
  }

  test("create is idempotent (CREATE TABLE IF NOT EXISTS)") {
    tables.createAll()
    noException should be thrownBy tables.create("transfer")
  }

  test("transfer table schema matches the reference DDL types") {
    tables.createAll()
    val fields = spark.table("ddltest.transfer").schema.fields
      .map(f => f.name -> f.dataType).toMap
    fields("date") shouldBe StringType
    fields("queuingTime") shouldBe IntegerType // INT in transfer only
    fields("transferTime") shouldBe FloatType
    fields(BillingSchema.partitionField) shouldBe StringType
    fields should have size 25 // 24 cols + partition
  }

  test("request table gets the REAL queuingTime override") {
    tables.createAll()
    val fields = spark.table("ddltest.request").schema.fields
      .map(f => f.name -> f.dataType).toMap
    fields("queuingTime") shouldBe FloatType
  }

  test("list excludes session temp views (cross-caller leak guard)") {
    tables.createAll()
    spark.range(1).createOrReplaceTempView("ddltest_leaked_view")
    try tables.list().toSet shouldBe Set("transfer", "request", "storage", "remove")
    finally spark.catalog.dropTempView("ddltest_leaked_view")
  }

  test("drop removes tables; dropAll empties the database") {
    tables.createAll()
    tables.drop(Seq("remove"))
    tables.list().toSet shouldBe Set("transfer", "request", "storage")
    tables.dropAll()
    tables.list() shouldBe empty
  }
}
