package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.Exchange

/** q173's 100 TB scale claim, pinned as a plan shape: the snapshot-diff
  * fold reads ONLY the append-only digest ledger — |buckets|×|generations|
  * rows — never the table's row files. If the fold ever rescanned rows,
  * the "maintained digest" would be a lie (the whole point of the ledger
  * is that 100 TB of rows are digested once, incrementally, at ingest).
  */
class StreamDiffPlanSpec extends SparkSuite {
  import spark.implicits._

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    (p +: p.children.flatMap(c => c.collect { case f: FileSourceScanExec => f }))
      .collect { case f: FileSourceScanExec => f }

  test("q173 digest fold scans only the ledger, one Exchange, no row files") {
    val ledgerDir = graft.analytics.Tables.tmp("q173-plan-ledger")
    val rowsDir = graft.analytics.Tables.tmp("q173-plan-rows")
    // a 2-generation ledger plus a decoy row file that must NOT be read
    Seq((0L, 2L, 10L), (1L, 1L, 7L)).toDF("bucket", "n", "ck")
      .write.parquet(ledgerDir)
    Seq((0L, 1L, 3L), (3L, 1L, 5L)).toDF("bucket", "n", "ck")
      .write.mode("append").parquet(ledgerDir)
    Seq((0L, 100L), (1L, 200L)).toDF("k", "cents").write.parquet(rowsDir)

    val fold = graft.analytics.Streams.q173DigestFold(spark, ledgerDir)
    val plan = graft.analytics.Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false") {
      graft.analytics.Streams.q173DigestFold(spark, ledgerDir)
        .queryExecution.executedPlan
    }
    val fileScans = plan.collect { case f: FileSourceScanExec => f }
    withClue(s"fold plan:\n$plan\n") {
      fileScans should have size 1
      // every path the scan reads is inside the ledger dir — the row
      // files (rowsDir decoy) are untouched by the fold
      val ledgerName = new java.io.File(ledgerDir).getName
      fileScans.head.relation.location.rootPaths.foreach { p =>
        p.toString should include(ledgerName)
      }
      // exactly the one bucket-key Exchange of the fold aggregate
      plan.collect { case e: Exchange => e } should have size 1
    }
    // the fold is the correct monoid sum: gen-0 + gen-1 per bucket
    fold.orderBy("bucket").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((0L, 3L, 13L), (1L, 1L, 7L), (3L, 1L, 5L))
  }
}
