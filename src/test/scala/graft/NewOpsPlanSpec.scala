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

  test("t36: top-50 is TakeOrdered, and one token exchange feeds both LMs") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("t36_dsir_importance")(spark, dir)
        .queryExecution.executedPlan
      // the selection is a per-partition-heads merge, not a global sort
      val topk = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t }
      withClue(s"no TakeOrderedAndProject:\n$plan\n") { topk should not be empty }
      // the (doc, term) partial aggregate is computed ONCE: the raw-LM
      // branch reuses the per-doc branch's token exchange instead of
      // re-scanning and re-shuffling the token stream
      val reused = plan.collect {
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r }
      withClue(s"token exchange not reused across LM branches:\n$plan\n") {
        reused should not be empty
      }
    }
  }

  test("s22: the prune verdict is window-free and the centroid join stays broadcast") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("s22_prototype_prune")(spark, dir)
        .queryExecution.executedPlan
      // the scale argument: prune is a per-row threshold, never a rank
      // window over the K-bounded cluster key
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      withClue(s"unexpected window in prune plan:\n$plan\n") { windows shouldBe empty }
      // hinted K-row centroid build side survives autoBroadcast=-1
      val bhj = plan.collect { case b: BroadcastHashJoinExec => b }
      withClue(s"centroid join fell off broadcast:\n$plan\n") { bhj should not be empty }
    }
  }

  test("d31: the bloom probe is a native scan-stage filter, not a shuffle") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("d31_bloom_dedup_gate")(spark, dir)
        .queryExecution.executedPlan
      val probeFilters = plan.collect {
        case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("might_contain") => f }
      withClue(s"no native might_contain filter:\n${plan.toString.take(4000)}\n") {
        probeFilters should not be empty
      }
      // the probe filter evaluates directly on the scan stage: no
      // Exchange below it — admitting a bloom-negative row costs zero
      // shuffle
      probeFilters.foreach { f =>
        val below = f.collect {
          case e: org.apache.spark.sql.execution.exchange.Exchange => e }
        withClue(s"exchange below the bloom probe:\n${f.toString.take(4000)}\n") {
          below shouldBe empty
        }
      }
    }
  }

  test("q145: the as-of argmax combines map-side (max_by partials below the shuffle)") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("q145_bitemporal_asof")(spark, dir)
        .queryExecution.executedPlan
      val partialBelowEx = plan.collect {
        case e: Exchange if e.collect { case a: HashAggregateExec
          if a.aggregateExpressions.exists(_.toString.contains("partial_max_by")) => a
        }.nonEmpty => e
      }
      withClue(s"argmax not combined map-side:\n$plan\n") {
        partialBelowEx should not be empty
      }
      // a rank-window formulation would show up here; the aggregate form
      // must keep the plan window-free
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      } shouldBe empty
    }
  }

  test("q146: profile stats flow through one (col, epoch, value) pre-aggregate") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("q146_schema_drift")(spark, dir)
        .queryExecution.executedPlan
      // the distinct-value volume shuffles exactly once: a partial count
      // on (col_name, epoch, v) below its exchange, then only bounded
      // per-column rows move
      val partialBelowEx = plan.collect {
        case e: Exchange if e.collect { case a: HashAggregateExec
          if a.aggregateExpressions.exists(_.toString.contains("partial_count")) &&
            a.groupingExpressions.size == 3 => a
        }.nonEmpty => e
      }
      withClue(s"(col, epoch, value) pre-aggregate not map-side:\n$plan\n") {
        partialBelowEx should not be empty
      }
    }
  }

  test("d34: eval join stays broadcast; the argmax combines map-side, window-free") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("d34_semantic_decontam")(spark, dir)
        .queryExecution.executedPlan
      // the eval set is fixed-size by construction — only the explicit
      // hint keeps the |corpus| × 64 sim pass off a shuffle join path
      // (the pairing is conditionless, so it lowers to a broadcast
      // nested-loop, the intended |corpus|-scan × 64-row shape)
      plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      } should not be empty
      // the per-vector argmax is max(struct(sim, -eval_id)): a partial
      // max below its exchange, so the shuffle carries ≤ one candidate
      // per vector per partition, not the ×64 sim stream (struct max
      // lowers to a SortAggregate — match the aggregate base class)
      val partialMaxBelowEx = plan.collect {
        case e: Exchange if e.collect { case a: BaseAggregateExec
          if a.aggregateExpressions.exists(_.toString.contains("partial_max")) => a
        }.nonEmpty => e
      }
      withClue(s"argmax not combined map-side:\n$plan\n") {
        partialMaxBelowEx should not be empty
      }
      // a rank-window argmax would sort the full sim stream per vector
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      } shouldBe empty
    }
  }

  test("s26: the dim sums combine map-side — the one-scan-at-scale fact") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = Registry.queries("s26_anisotropy_probe")(spark, dir)
        .queryExecution.executedPlan
      // the posexplode stream folds to ≤ labels × 64 partial rows per
      // partition BEFORE any exchange — the shuffle never carries the
      // N×64 element stream
      val partialSumBelowEx = plan.collect {
        case e: Exchange if e.collect { case a: HashAggregateExec
          if a.aggregateExpressions.exists(_.toString.contains("partial_sum")) => a
        }.nonEmpty => e
      }
      withClue(s"dim sums not combined map-side:\n$plan\n") {
        partialSumBelowEx should not be empty
      }
      // no window anywhere — the Σ-trick needs no ordering at all
      plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      } shouldBe empty
    }
  }

  test("q161: every derived frame reads the cached count tables, not the base") {
    val plan = Registry.queries("q161_join_estimate")(spark, dir)
      .queryExecution.executedPlan
    // the scan-count fix: the base tables materialize into the cached
    // per-key count tables once; hitter splits / residual summaries /
    // exact-sum / containment anti-joins all read InMemoryTableScan.
    // AdaptiveSparkPlanExec is a leaf to TreeNode.collect — recurse the
    // PlanLintSpec way.
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children ++ other.subqueries
      }
      p +: kids.flatMap(allNodes)
    }
    val cacheScans = allNodes(plan).collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }
    withClue(s"no cache scans in:\n$plan\n") {
      cacheScans.size should be >= 8 // ≥ 2 reads per edge × 4 edges
    }
  }

  test("t42/q162: rank windows are keyed; the RFM plan is window-free") {
    Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false") {
      // t42's suggestion rank partitions by the typo — a global
      // ORDER BY would serialize the (vocabulary-sized) candidate table
      val t42 = Registry.queries("t42_symspell_correct")(spark, dir)
        .queryExecution.executedPlan
      val unkeyed = t42.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      withClue(s"unpartitioned window in t42:\n$t42\n") { unkeyed shouldBe empty }
      // q162 scores quintiles with expressions against one percentile
      // row — NO ntile/rank window, which would globally sort users
      val q162 = Registry.queries("q162_rfm_segments")(spark, dir)
        .queryExecution.executedPlan
      q162.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      } shouldBe empty
    }
  }
}
