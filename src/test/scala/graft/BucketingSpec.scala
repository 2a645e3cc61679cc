package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: two tables bucketed on the join key
  * join with NO shuffle exchange — the pre-partitioning strategy that
  * makes repeated fact⋈fact joins affordable at 100 TB. */
class BucketingSpec extends SparkSuite {

  test("join of two tables bucketed on the key has no Exchange; results match") {
    val db = "bucketdb"
    val dir = "/root/testdata/sf0.001"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = bucketed.queryExecution.executedPlan.toString
      withClue(plan) { plan should not include "Exchange" }

      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      bucketed.count() shouldBe plain.count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
