package graft

import org.apache.spark.sql.functions._
import graft.analytics.Tables

/** Cost-based optimization via catalog statistics: `ANALYZE TABLE …
  * COMPUTE STATISTICS FOR COLUMNS` gives the optimizer NDV/min/max for a
  * dimension's filter column, so a selective equality filter shrinks the
  * dim's ESTIMATED size below the broadcast threshold and the join plans
  * as a broadcast hash join — without stats the filter's estimate stays at
  * the raw relation size and the same query shuffles both sides. At 100 TB
  * this is the difference between a map-side lookup and a full sort-merge
  * shuffle for every filtered-dim star join, bought with one offline
  * ANALYZE pass. */
class CboStatsSpec extends SparkSuite {

  test("ANALYZE column stats flip a selectively-filtered dim join to broadcast") {
    val db = "graft_cbo"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '${Tables.tmp("graft-cbo-db")}'")
    spark.sql(s"DROP TABLE IF EXISTS $db.dim")
    // ~200k rows, 200 distinct keys: an equality filter keeps ~0.5 %
    spark.range(200000).toDF("id")
      .withColumn("k", col("id") % 200)
      .withColumn("pad", expr("repeat('x', 32)"))
      .write.option("path", Tables.tmp("graft-cbo-dim")).saveAsTable(s"$db.dim")
    // large ESTIMATED fact side (plans only — never executed) so the
    // broadcast decision under test is the dim's, not the fact's
    val fact = spark.range(100000000L).toDF("fk").withColumn("fk", col("fk") % 200)

    def joinPlan(): String = Tables.withConfs(spark,
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true",
      "spark.sql.statistics.size.autoUpdate.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "false", // isolate the CBO decision from AQE's runtime one
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      val dim = spark.table(s"$db.dim").filter(col("k") === 7)
      fact.join(dim, col("fk") === col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
    }

    // table-level size only: the filter estimate equals the raw size
    // (several MB > 256 KB threshold) → no broadcast of the dim
    spark.sql(s"ANALYZE TABLE $db.dim COMPUTE STATISTICS")
    val before = joinPlan()
    assert(!before.contains("BroadcastHashJoin"),
      s"dim broadcast WITHOUT column stats — threshold too loose for the test:\n$before")

    // column stats: NDV(k)=200 ⇒ the k=7 filter keeps ~1/200 of the rows
    // and the estimated size drops below the threshold → broadcast
    spark.sql(s"ANALYZE TABLE $db.dim COMPUTE STATISTICS FOR COLUMNS k")
    val after = joinPlan()
    assert(after.contains("BroadcastHashJoin"),
      s"column stats did not flip the join to broadcast:\n$after")

    spark.sql(s"DROP TABLE $db.dim")
    spark.sql(s"DROP DATABASE $db")
  }
}
