package graft

import graft.schema.BillingSchema._

/** Schema constants vs the reference DDL (`Dcache_kafka_to_hive.py:162-262`).
  * Pure — no Spark session needed. */
class BillingSchemaSpec extends SparkSuite {

  test("table column counts match the reference DDL (24/21/16/21)") {
    transferCols should have length 24
    requestCols should have length 21
    storageCols should have length 16
    removeCols should have length 21
  }

  test("queuingTime type drift: INTEGER in transfer, REAL elsewhere") {
    tableSchemas("transfer").toMap.apply("queuingTime") shouldBe "INT"
    tableSchemas("request").toMap.apply("queuingTime") shouldBe "FLOAT"
    tableSchemas("storage").toMap.apply("queuingTime") shouldBe "FLOAT"
    tableSchemas("remove").toMap.apply("queuingTime") shouldBe "FLOAT"
  }

  test("unlisted columns default to STRING; listed overrides hold") {
    val transfer = tableSchemas("transfer").toMap
    transfer("date") shouldBe "STRING"
    transfer("isWrite") shouldBe "STRING" // reference stores it STRING
    transfer("isP2p") shouldBe "BOOLEAN"
    transfer("transferTime") shouldBe "FLOAT"
    transfer("protocolInfo_port") shouldBe "INT"
    val request = tableSchemas("request").toMap
    request("sessionDuration") shouldBe "FLOAT" // cast int, declared REAL
  }

  test("cast targets cover the reference's ten casts") {
    castTargets.map(_._1).toSet shouldBe Set(
      "isP2p", "transferTime", "transferSize", "protocolInfo_port",
      "fileSize", "status_code", "mappedGID", "sessionDuration",
      "mappedUID", "queuingTime")
  }

  test("every table column exists in the parsed output surface") {
    val surface = (inputFields ++ flattenedFields).toSet
    tableSchemas.values.flatten.map(_._1).toSet.subsetOf(surface) shouldBe true
  }
}
