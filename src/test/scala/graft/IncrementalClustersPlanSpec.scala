package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** d21's 100 TB scale claims, pinned as plan shapes (the registered
  * query's final plan is a post-localCheckpoint ExistingRDD, so the
  * internals are asserted on the factored-out builders — the
  * `LshIndexPlanSpec`/`KcorePlanSpec` discipline):
  *
  *  1. the delta→corpus probe reads the bucketed `sig_idx` with NO
  *     Exchange above the scan — corpus-side shuffle was paid once at
  *     publish time, so a delta merge is O(|delta|), never O(corpus);
  *  2. the merge labeling equals d07's full recompute (checked end-to-end
  *     by the DuckDB oracle; here we re-check equality in-engine at
  *     sf0.001 so the property fails by name when it breaks).
  */
class IncrementalClustersPlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("d21 probe: no Exchange between the join and the bucketed sig_idx scan") {
    // run the registered query once — publishes graft_d21.sig_idx/labels
    SparkEntry.queries("d21_incremental_clusters")(spark, dir).collect()
    graft.analytics.Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val delta = graft.analytics.Dedup.d21DeltaSigs(spark, dir)
      val plan = graft.analytics.Dedup.d21DeltaEdges(spark, delta)
        .queryExecution.executedPlan

      def pathTo(p: SparkPlan): Option[List[SparkPlan]] = p match {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == "sig_idx") => Some(List(f))
        case _ => p.children.view.flatMap(pathTo).headOption.map(p :: _)
      }
      val path = pathTo(plan)
        .getOrElse(fail(s"no sig_idx scan in d21's delta-edge plan:\n$plan"))
      val joinAt = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
      assert(joinAt >= 0, s"no join above the sig_idx scan:\n$plan")
      val idxSide = path.drop(joinAt + 1)
      withClue(s"Exchange on the index side of d21's probe join:\n$plan\n") {
        idxSide.filter(_.isInstanceOf[Exchange]) shouldBe empty
      }
      // the delta side DOES shuffle to the bucket layout (non-vacuity)
      val join = path(joinAt).asInstanceOf[BaseJoinExec]
      val deltaChild = join.children.find(c => pathTo(c).isEmpty)
        .getOrElse(fail(s"both join children reach sig_idx?\n$plan"))
      withClue(s"expected the delta side to shuffle:\n$plan\n") {
        deltaChild.collect { case e: Exchange => e } should not be empty
      }
    }
  }

  test("d21 incremental merge equals the from-scratch d07-style recompute") {
    val incr = SparkEntry.queries("d21_incremental_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // from-scratch: CC over ALL near-dup pairs (d07's own machinery)
    val pairs = graft.analytics.Dedup.simhashPairs(spark, dir)
    val full = graft.operators.ConnectedComponents.label(pairs)
      .groupBy(org.apache.spark.sql.functions.col("comp"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    pairs.unpersist()
    incr.sorted shouldBe full.sorted
  }
}
