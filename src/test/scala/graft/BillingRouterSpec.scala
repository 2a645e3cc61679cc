package graft

import graft.parse.BillingParse
import graft.route.BillingRouter
import graft.schema.BillingSchema

/** Routing semantics (SURVEY §5.2 item 1; reference
  * `Dcache_kafka_to_hive.py:115-141`). */
class BillingRouterSpec extends SparkSuite {
  import spark.implicits._

  private lazy val parsed = BillingParse.parse(
    (Fixtures.all :+ """{"msgType":"mystery","date":"2024-01-01 00:00:00"}""")
      .toDF("value"))

  test("each msgType lands in exactly one table; store+restore share storage") {
    val routed = BillingRouter.route(parsed)
    routed.keySet shouldBe Set("transfer", "request", "storage", "remove")
    routed("transfer").count() shouldBe 1
    routed("request").count() shouldBe 1
    routed("storage").count() shouldBe 2 // store + restore
    routed("remove").count() shouldBe 1
  }

  test("unknown msgType routes nowhere") {
    val routed = BillingRouter.route(parsed)
    routed.values.map(_.count()).sum shouldBe 5 // 6 input rows, 1 dropped
  }

  test("projections are in DDL column order with partition_date appended") {
    val routed = BillingRouter.route(parsed)
    routed("transfer").columns.toSeq shouldBe
      BillingSchema.transferCols :+ BillingSchema.partitionField
    routed("request").columns.toSeq shouldBe
      BillingSchema.requestCols :+ BillingSchema.partitionField
    routed("storage").columns.toSeq shouldBe
      BillingSchema.storageCols :+ BillingSchema.partitionField
    routed("remove").columns.toSeq shouldBe
      BillingSchema.removeCols :+ BillingSchema.partitionField
  }

  test("partition_date = substr(date, 1, 10)") {
    val routed = BillingRouter.route(parsed)
    routed("transfer").select("partition_date").as[String].head() shouldBe "2024-03-01"
    routed("remove").select("partition_date").as[String].head() shouldBe "2024-03-03"
  }

  test("NULL date yields NULL partition_date (kept, not dropped)") {
    val p = BillingParse.parse(Seq("""{"msgType":"remove"}""").toDF("value"))
    val rows = BillingRouter.route(p)("remove")
      .select("partition_date").collect()
    rows should have length 1
    assert(rows.head.isNullAt(0))
  }

  test("short date passes through substring untruncated") {
    val p = BillingParse.parse(
      Seq("""{"msgType":"remove","date":"2024"}""").toDF("value"))
    BillingRouter.route(p)("remove")
      .select("partition_date").as[String].head() shouldBe "2024"
  }
}
