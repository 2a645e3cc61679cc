package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ddl.BillingTables
import graft.ingest.{BillingBackfill, BillingIngest}

/** Day-targeted replace semantics of the batch backfill: only requested
  * days change, a zero-row replay CLEARS a requested day, re-runs are
  * idempotent, and the replayed rows come from the live parse/route path. */
class BillingBackfillSpec extends SparkSuite {
  import spark.implicits._

  private val db = "backfilldb"

  private def freshTables(): Unit = {
    val t = new BillingTables(spark, db)
    t.createDatabase(); t.dropAll(); t.createAll()
  }

  private def seedLive(records: String*): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bf-ckpt").toString
    mem.addData(records: _*)
    new BillingIngest(spark, mem.toDF(), db).runBounded(ckpt)
  }

  private def counts(): Map[String, Long] =
    Seq("transfer", "request", "storage", "remove")
      .map(t => t -> spark.table(s"$db.$t").count()).toMap

  test("backfill replaces exactly the requested day, other days untouched") {
    freshTables()
    // live ingest seeded with a duplicated transfer record: day 2024-03-01
    // of the transfer table holds 2 rows where the archive's truth is 1
    seedLive(Fixtures.all :+ Fixtures.transferJson: _*)
    counts() shouldBe Map(
      "transfer" -> 2L, "request" -> 1L, "storage" -> 2L, "remove" -> 1L)
    // replay the archive for 2024-03-01 only; the store record in the raw
    // batch is day 2024-03-02 — NOT requested, so it must be ignored
    val raw = Seq(Fixtures.transferJson, Fixtures.requestJson, Fixtures.storeJson)
      .toDF("value")
    val written = new BillingBackfill(spark, db).backfill(raw, Seq("2024-03-01"))
    written shouldBe Map(
      "transfer" -> 1L, "request" -> 1L, "storage" -> 0L, "remove" -> 0L)
    counts() shouldBe Map(
      "transfer" -> 1L, "request" -> 1L, "storage" -> 2L, "remove" -> 1L)
    // the replaced day matches what the live path would have produced
    spark.table(s"$db.transfer")
      .where("partition_date = '2024-03-01'").count() shouldBe 1L
  }

  test("a requested day with a zero-row replay is CLEARED, not kept") {
    freshTables()
    seedLive(Fixtures.all: _*) // remove table: 1 row on 2024-03-03
    // the corrected archive for 2024-03-03 holds only a transfer record —
    // the remove row for that day was the corruption and must vanish
    val raw = Seq(Fixtures.transferJson.replace("2024-03-01", "2024-03-03"))
      .toDF("value")
    new BillingBackfill(spark, db).backfill(raw, Seq("2024-03-03"))
    counts() shouldBe Map(
      "transfer" -> 2L, "request" -> 1L, "storage" -> 2L, "remove" -> 0L)
  }

  test("re-running the same backfill is idempotent") {
    freshTables()
    seedLive(Fixtures.all: _*)
    val raw = Seq(Fixtures.transferJson).toDF("value")
    val bf = new BillingBackfill(spark, db)
    bf.backfill(raw, Seq("2024-03-01"))
    val after1 = counts()
    bf.backfill(raw, Seq("2024-03-01"))
    counts() shouldBe after1
    after1("transfer") shouldBe 1L
  }

  test("malformed day strings are rejected before any write") {
    freshTables()
    val bf = new BillingBackfill(spark, db)
    val raw = Seq(Fixtures.transferJson).toDF("value")
    an[IllegalArgumentException] should be thrownBy
      bf.backfill(raw, Seq("2024-03-01'; DROP TABLE x --"))
    an[IllegalArgumentException] should be thrownBy bf.backfill(raw, Seq.empty)
  }
}
