package graft

import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.analytics.{Registry, Tables}

/** Plan pins for the round-16 operators whose SCALE arguments live in
  * specific plan facts (the KcorePlanSpec discipline): q144's per-lang
  * control join must stay a broadcast because it is hinted (a 5-row
  * build side silently falling to a sort-merge join would shuffle the
  * whole corpus on `lang` — a 5-key skew funnel at 100 TB), and both
  * q144's selection count and t35's per-doc token count must combine
  * map-side so the only wide exchanges carry aggregated partials, not
  * the raw token/doc stream. s20/s21 are not pinned here: s20
  * localCheckpoints its internals (ExistingRDD plan, the d18 situation
  * — its invariants are pinned in NewOpsInvariantSpec) and s21's
  * iterations collect 64-value rows eagerly, so the registered query's
  * final plan is a LocalTableScan by construction. */
class NewOpsPlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def partialCountAggs(plan: org.apache.spark.sql.execution.SparkPlan) =
    plan.collect { case a: BaseAggregateExec
      if a.aggregateExpressions.exists(_.toString.contains("partial_count")) => a }

  test("q144: hinted control joins survive autoBroadcast=-1; counts combine map-side") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("q144_mixture_sample")(spark, dir)
        .queryExecution.executedPlan
      // the doc-side selection join keys on lang against the hinted 5-row
      // control table — with auto-broadcast off, only the hint keeps it
      // off the 5-key shuffle path
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      withClue(s"no broadcast control join:\n$plan\n") { bhj should not be empty }
      // per-lang doc counts fold map-side before any exchange
      val partialBelowEx = plan.collect {
        case e: Exchange if e.collect { case a: HashAggregateExec
          if a.aggregateExpressions.exists(_.toString.contains("partial_count")) => a
        }.nonEmpty => e
      }
      withClue(s"selection count not combined map-side:\n$plan\n") {
        partialBelowEx should not be empty
      }
    }
  }

  test("t35: the token-volume counts combine map-side below their shuffles") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("t35_ccnet_ppl_buckets")(spark, dir)
        .queryExecution.executedPlan
      withClue(s"no map-side partial counts at all:\n$plan\n") {
        partialCountAggs(plan) should not be empty
      }
      // every token-volume aggregate (the LM count and the per-doc vocab
      // count) sits below an Exchange — the shuffles move partials
      val partialBelowEx = plan.collect {
        case e: Exchange if e.collect { case a: HashAggregateExec
          if a.aggregateExpressions.exists(_.toString.contains("partial_count")) => a
        }.nonEmpty => e
      }
      withClue(s"token counts not combined map-side:\n$plan\n") {
        partialBelowEx.size should be >= 2
      }
    }
  }
}
