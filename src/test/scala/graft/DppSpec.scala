package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning contract behind q85: a dim-side predicate the
  * fact scan cannot see statically must still prune the fact's hive
  * partitions at runtime via an injected DynamicPruningExpression — at
  * scale this is the difference between scanning every day directory of a
  * partitioned fact and scanning only the days the dim selects. */
class DppSpec extends SparkSuite {

  private def factScan(df: DataFrame): FileSourceScanExec = {
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan) // stages don't expose children
      case other                    => other.children
    }
    def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case other                 => unwrap(other).flatMap(find)
    }
    // the fact scan is the one with a partition filter on `day`
    find(df.queryExecution.executedPlan)
      .find(_.partitionFilters.nonEmpty)
      .getOrElse(fail("no partitioned FileSourceScanExec in plan"))
  }

  test("dim-side predicate prunes fact partitions at runtime") {
    // keep the partition column a STRING (type inference would read it
    // back as DATE and put a cast between the join key and the partition
    // column), and give the dim a SELECTIVE filter — DPP only fires when
    // the build side actually filters something
    graft.analytics.Tables.withConfs(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled" -> "false") {
      val out = java.nio.file.Files.createTempDirectory("graft-dpp-spec").toString
      // 10 days x 1000 rows, hive-partitioned by day
      spark.range(10000)
        .select(col("id"),
          concat(lit("2024-01-"), lpad((col("id") % 10 + 1).cast("string"), 2, "0"))
            .as("day"))
        .write.mode("overwrite").partitionBy("day").parquet(out)
      val dim = spark.range(1, 11)
        .select(concat(lit("2024-01-"), lpad(col("id").cast("string"), 2, "0")).as("d"))
        .filter(col("d").isin("2024-01-03", "2024-01-07"))
      val joined = spark.read.parquet(out).join(dim, col("day") === col("d"))

      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"no DynamicPruningExpression in fact scan partitionFilters:\n$planStr")

      joined.collect().length shouldBe 2000
      val scan = factScan(joined)
      // only the 2 selected day directories were read (2000 of 10000 rows)
      scan.metrics("numOutputRows").value shouldBe 2000
    }
  }
}
