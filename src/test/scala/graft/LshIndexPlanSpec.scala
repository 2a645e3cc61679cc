package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** d16's 100 TB scale claim, pinned as a PLAN SHAPE rather than argued by
  * analogy: the persisted LSH signature index is written bucketed by the
  * band key, so the delta probe's equi-join must read the index with NO
  * Exchange above the `sig_idx` scan — the bucket files ARE the shuffle,
  * paid once at publish time. Only the delta side may shuffle (|delta|
  * rows — the property that makes nightly dedup O(|delta|)). The sibling
  * pins: q88/`BucketingSpec` for the generic bucketed join,
  * `AnnIndexSpec` for s12's partition-pruned ANN probe. */
class LshIndexPlanSpec extends SparkSuite {

  test("d16 probe: no Exchange between the join and the bucketed sig_idx scan") {
    // AQE off so executedPlan is the concrete tree; broadcast off so the
    // join exercises the bucketed-distribution path a 100 TB index needs
    // (at scale the index side could never broadcast anyway)
    graft.analytics.Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("d16_persisted_lsh_index")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan

      // root-to-scan path of the sig_idx FileSourceScan
      def pathTo(p: SparkPlan): Option[List[SparkPlan]] = p match {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == "sig_idx") => Some(List(f))
        case _ => p.children.view.flatMap(pathTo).headOption.map(p :: _)
      }
      val path = pathTo(plan)
        .getOrElse(fail(s"no sig_idx scan in d16's plan:\n$plan"))
      val joinAt = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
      assert(joinAt >= 0, s"no join above the sig_idx scan:\n$plan")

      // index side: zero Exchange between the probe join and the scan
      val idxSide = path.drop(joinAt + 1)
      withClue(s"Exchange on the index side of d16's probe join:\n$plan\n") {
        idxSide.filter(_.isInstanceOf[Exchange]) shouldBe empty
      }

      // delta side: DOES shuffle (its |delta| rows hash to the bucket
      // layout) — guards against the assertion passing vacuously
      val join = path(joinAt).asInstanceOf[BaseJoinExec]
      val deltaChild = join.children.find(c => pathTo(c).isEmpty)
        .getOrElse(fail(s"both join children reach sig_idx?\n$plan"))
      val deltaExchanges = deltaChild.collect { case e: Exchange => e }
      withClue(s"expected the delta side to shuffle:\n$plan\n") {
        deltaExchanges should not be empty
      }
    }
  }
}
