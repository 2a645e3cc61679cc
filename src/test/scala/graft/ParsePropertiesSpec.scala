package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.parse.BillingParse
import graft.route.BillingRouter

/** Property-based invariants (SURVEY §5.2 item 4): random field subsets and
  * garbage values per record; parse never throws, row counts are conserved
  * through routing, and partition derivation is always substr(date,1,10).
  * Generators are sampled with fixed seeds (the scalatest↔scalacheck bridge
  * artifact isn't in the offline cache), so runs are deterministic. */
class ParsePropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val knownTypes = Seq("transfer", "request", "store", "restore", "remove")

  private val fieldValue: Gen[String] = Gen.oneOf(
    Gen.const("\"plain\""), Gen.const("42"), Gen.const("4.5"),
    Gen.const("true"), Gen.const("\"\""), Gen.const("null"),
    Gen.const("\"garbage-not-a-number\""),
    Gen.const("{\"msg\":\"m\",\"code\":1}"),
    Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""))

  private val record: Gen[String] = for {
    msgType <- Gen.oneOf(knownTypes ++ Seq("alien", ""))
    date <- Gen.oneOf(
      "\"2024-03-01 12:00:00.000\"", "\"2023-12-31 23:59:59.999\"",
      "\"2024\"", "null")
    nExtra <- Gen.choose(0, 8)
    extraFields <- Gen.listOfN(nExtra, for {
      f <- Gen.oneOf(graft.schema.BillingSchema.inputFields.drop(2))
      v <- fieldValue
    } yield s""""$f":$v""")
  } yield {
    val base = Seq(s""""msgType":"$msgType"""", s""""date":$date""")
    (base ++ extraFields.distinct).mkString("{", ",", "}")
  }

  private val batch: Gen[List[String]] = for {
    n <- Gen.choose(1, 12)
    good <- Gen.listOfN(n, record)
    junk <- Gen.listOf(Gen.oneOf("not json", "{", "[1,2]", "17"))
  } yield good ++ junk

  test("parse preserves row count and never throws; routing conserves rows") {
    val params = Gen.Parameters.default
    (1 to 8).foreach { i =>
      val rows = batch.pureApply(params, Seed(i.toLong))
      withClue(s"seed=$i rows=$rows: ") {
        val parsed = BillingParse.parse(rows.toDF("value")).cache()
        try {
          parsed.count() shouldBe rows.length.toLong
          val knownRows = parsed.where($"msgType".isin(knownTypes: _*)).count()
          val routed = BillingRouter.route(parsed)
          routed.values.map(_.count()).sum shouldBe knownRows
          // every routed row's partition is substr of its own date
          routed.values.foreach { df =>
            df.where(
              ($"partition_date".isNull && $"date".isNotNull) ||
                ($"partition_date".isNotNull &&
                  $"partition_date" =!= substring($"date", 1, 10)))
              .count() shouldBe 0L
          }
        } finally parsed.unpersist()
      }
    }
  }
}
