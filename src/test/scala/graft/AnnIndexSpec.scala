package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Serving contract behind s12: the on-disk IVF index is hive-partitioned
  * by inverted-list label, and a probe (the query's nearest-2 centroids)
  * joins the index on that PARTITION column — so Catalyst must inject a
  * DynamicPruningExpression into the index scan, and only the probed list
  * directories are listed/read. At 100 TB this is the whole point of the
  * layout: ANN query IO = nprobe directories, not the corpus. */
class AnnIndexSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def prunedScan(df: DataFrame): FileSourceScanExec = {
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case other                 => unwrap(other).flatMap(find)
    }
    find(df.queryExecution.executedPlan)
      .find(_.partitionFilters.nonEmpty)
      .getOrElse(fail("no partitioned FileSourceScanExec in s12 plan"))
  }

  test("s12 index scan is dynamically pruned to the probed lists") {
    val df = SparkEntry.queries("s12_ivf_disk_index")(spark, dir)
    val rows = df.collect()
    rows.length should be > 0

    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no DynamicPruningExpression on the index scan:\n$planStr")

    // the index holds every vector exactly once (crnk === 1); the probed
    // scan must read strictly fewer rows than that — pruning happened at
    // the file listing, not post-scan
    val indexRows = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val scanned = prunedScan(df).metrics("numOutputRows").value
    scanned should be < indexRows
  }

  test("s12 disk index returns exactly s04's in-memory result") {
    val onDisk = SparkEntry.queries("s12_ivf_disk_index")(spark, dir)
      .collect().map(_.toString)
    val inMem = SparkEntry.queries("s04_ivf_topk")(spark, dir)
      .collect().map(_.toString)
    onDisk.toSeq shouldBe inMem.toSeq
  }
}
