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

  test("equality filter on the bucket column prunes to one bucket file") {
    // relies on the tables created by the join test (suites run in order
    // within a file); re-create defensively if running standalone
    val db = "bucketdb"
    if (!spark.catalog.tableExists(s"$db.orders_b")) {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      spark.sql(s"CREATE DATABASE $db")
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
    }
    val key = spark.table(s"$db.orders_b").select(col("o_orderkey"))
      .head().getLong(0)
    // autoBucketedScan drops bucketed reading (and with it the pruning)
    // for a bare scan that exploits no distribution — force it on, which
    // is what a production point-lookup path over a bucketed table does
    graft.analytics.Tables.withConfs(spark,
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val probe = spark.table(s"$db.orders_b").filter(col("o_orderkey") === key)
      probe.count() should be >= 1L
      // bucket pruning happens at the FILE SELECTION: a point lookup reads
      // 1 of 8 bucket files, not the table — the read-side half of the
      // bucketing bargain (q88 pins the shuffle-free join half)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in scan:\n$plan")
    }
  }
}
