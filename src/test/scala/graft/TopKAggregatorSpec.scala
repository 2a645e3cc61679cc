package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator

/** The bounded top-k UDAF must equal sort-descending-take-k regardless of
  * partitioning (merge associativity) and handle ties/short groups. */
class TopKAggregatorSpec extends SparkSuite {

  private def topkOf(values: Seq[Double], k: Int, parts: Int): Seq[Double] = {
    import spark.implicits._
    val col3 = TopKAggregator.topK(k)(col("v"))
    values.toDF("v").repartition(parts)
      .agg(col3.as("tops"))
      .first().getSeq[Double](0)
  }

  test("top-k equals sorted take(k) across partitionings") {
    val vs = Seq(5.0, 1.0, 9.0, 7.0, 3.0, 9.0, 2.0, 8.0, 6.0, 4.0)
    val expected = vs.sorted(Ordering[Double].reverse).take(3)
    topkOf(vs, 3, 1) shouldBe expected
    topkOf(vs, 3, 4) shouldBe expected
    topkOf(vs, 3, 10) shouldBe expected
  }

  test("ties occupy adjacent ranks; short groups return what exists") {
    topkOf(Seq(2.0, 2.0, 2.0, 1.0), 3, 2) shouldBe Seq(2.0, 2.0, 2.0)
    topkOf(Seq(1.5), 3, 1) shouldBe Seq(1.5)
  }

  test("k is validated") {
    an[IllegalArgumentException] should be thrownBy new TopKAggregator(0)
  }
}
