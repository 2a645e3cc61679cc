package graft

import org.apache.spark.sql.functions._

/** AQE's runtime skew-join splitting — the complement of the manual
  * [[graft.operators.SaltedJoin]] (SaltedJoinSpec): when a sort-merge
  * join partition is far larger than the median, AQE splits it into
  * multiple reader tasks at runtime. At cluster scale this is what turns
  * a one-straggler join into an even one when the skew only materializes
  * in the shuffled data. */
class AqeSkewJoinSpec extends SparkSuite {

  test("OptimizeSkewedJoin splits a hot-key partition at runtime") {
    graft.analytics.Tables.withConfs(spark,
      // force SMJ (no broadcast), make the skew detector eager enough to
      // fire on test-sized data
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "8") {
      // 90% of the left side lands on key 1; the right side is uniform
      val left = spark.range(200000)
        .select(expr("CASE WHEN id % 10 < 9 THEN 1 ELSE id % 100 END").as("k"),
          col("id").as("v"))
      val right = spark.range(100)
        .select(col("id").as("rk"), concat(lit("r"), col("id")).as("tag"))
      val joined = left.join(right, col("k") === col("rk"))
      // execute THIS QueryExecution (count() would plan a fresh one whose
      // AQE state we couldn't inspect)
      joined.queryExecution.toRdd.count() shouldBe 200000L

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    }
  }
}
