package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ddl.BillingTables
import graft.ingest.BillingIngest

/** End-to-end streaming ingest over MemoryStream (SURVEY §5.2 item 2):
  * foreachBatch parse→route→append, AvailableNow drain, checkpoint resume. */
class BillingIngestSpec extends SparkSuite {
  import spark.implicits._

  private val db = "ingestdb"

  private def freshTables(): Unit = {
    val t = new BillingTables(spark, db)
    t.createDatabase(); t.dropAll(); t.createAll()
  }

  private def counts(): Map[String, Long] =
    Seq("transfer", "request", "storage", "remove")
      .map(t => t -> spark.table(s"$db.$t").count()).toMap

  test("bounded drain routes one batch into the four tables") {
    freshTables()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    mem.addData(Fixtures.all: _*)
    new BillingIngest(spark, mem.toDF(), db).runBounded(ckpt)
    counts() shouldBe Map(
      "transfer" -> 1L, "request" -> 1L, "storage" -> 2L, "remove" -> 1L)
  }

  test("checkpoint resume: a second drain processes only new data") {
    freshTables()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ingest = new BillingIngest(spark, mem.toDF(), db)

    mem.addData(Fixtures.transferJson)
    ingest.runBounded(ckpt)
    counts()("transfer") shouldBe 1L

    mem.addData(Fixtures.transferJson, Fixtures.removeJson)
    ingest.runBounded(ckpt) // same checkpoint → offsets resume, no replay
    counts() shouldBe Map(
      "transfer" -> 2L, "request" -> 0L, "storage" -> 0L, "remove" -> 1L)
  }

  test("malformed and unknown-msgType records are dropped by routing, not fatal") {
    freshTables()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    mem.addData("not json at all", """{"msgType":"alien"}""", Fixtures.removeJson)
    new BillingIngest(spark, mem.toDF(), db).runBounded(ckpt)
    counts().values.sum shouldBe 1L
  }

  test("batch replay duplicates by default; idempotenceDir makes it exactly-once") {
    freshTables()
    import org.apache.spark.sql.functions.col
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(Fixtures.removeJson))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType))))

    // reference parity: replaying the same batch appends again
    val plain = new BillingIngest(spark, batch.select(col("value")), db)
    plain.processBatch(batch, 7L)
    plain.processBatch(batch, 7L)
    counts()("remove") shouldBe 2L

    freshTables()
    val ledger = java.nio.file.Files.createTempDirectory("graft-ledger").toString
    val once = new BillingIngest(spark, batch.select(col("value")), db, Some(ledger))
    once.processBatch(batch, 7L)
    once.processBatch(batch, 7L) // marker exists -> skipped
    counts()("remove") shouldBe 1L
    once.processBatch(batch, 8L) // a NEW batch id still appends
    counts()("remove") shouldBe 2L
  }

  test("rows land in the partition derived from their own embedded date") {
    freshTables()
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // a "late" event: old embedded date still lands in its own (old) day
    val late = Fixtures.transferJson.replace("2024-03-01 12:00:00.000",
      "2019-07-04 08:00:00.000")
    mem.addData(Fixtures.transferJson, late)
    new BillingIngest(spark, mem.toDF(), db).runBounded(ckpt)
    val parts = spark.table(s"$db.transfer")
      .select("partition_date").as[String].collect().sorted
    parts shouldBe Array("2019-07-04", "2024-03-01")
  }
}
