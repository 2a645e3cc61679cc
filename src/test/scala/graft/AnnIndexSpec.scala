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

  test("s13 incrementally-maintained index returns exactly s04's result") {
    val incr = SparkEntry.queries("s13_ivf_incremental")(spark, dir)
      .collect().map(_.toString)
    val inMem = SparkEntry.queries("s04_ivf_topk")(spark, dir)
      .collect().map(_.toString)
    incr.toSeq shouldBe inMem.toSeq
  }

  test("delta append into the index layout never rewrites a base file (s13 mechanics)") {
    import spark.implicits._
    def dataFiles(root: String): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val out = java.nio.file.Files.createTempDirectory("graft-annincr-spec").toString
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("vec_id", "list_label")
      .write.mode("overwrite").partitionBy("list_label").parquet(out)
    val base = dataFiles(out)
    // delta touches only list "a"; list "b"'s files must survive verbatim
    Seq((10L, "a")).toDF("vec_id", "list_label")
      .write.mode("append").partitionBy("list_label").parquet(out)
    val after = dataFiles(out)
    base.keySet.foreach { p =>
      assert(after.contains(p), s"base file removed by append: $p")
      after(p) shouldBe base(p) // untouched, not rewritten in place
    }
    after.size should be > base.size
    spark.read.parquet(out).count() shouldBe 4L
  }

  test("s15 MMR: greedy trajectory invariants hold per anchor") {
    import org.apache.spark.sql.functions._
    val out = graft.analytics.Registry.queries("s15_mmr_rerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .groupBy(_._1)
    out.keySet shouldBe (0L until 8L).toSet // every anchor served
    // rel ranking source of truth: s01's brute top-5 shares the pool head,
    // so pick 1 (pure relevance) must equal s01's rank-1 hit per anchor
    val s01Top = graft.analytics.Registry.queries("s01_cosine_topk")(spark, dir)
      .filter(col("rnk") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach { case (q, picks) =>
      val byRank = picks.sortBy(_._2)
      byRank.map(_._2).toSeq shouldBe (1L to 5L) // exactly K picks, ranked
      byRank.map(_._3).distinct.length shouldBe 5 // no candidate repeats
      byRank.head._3 shouldBe s01Top(q)
      byRank.head._5 shouldBe byRank.head._4 // rank 1: mmr == rel (no penalty)
      // rank-1 pick maximizes relevance over the whole selection
      byRank.tail.foreach(p => assert(p._4 <= byRank.head._4 + 1e-9))
      // greedy MMR scores are non-increasing from rank 2 on: a later pick
      // was available earlier with a no-larger redundancy penalty
      byRank.tail.sliding(2).foreach {
        case Array(a, b) => assert(b._5 <= a._5 + 1e-9,
          s"anchor $q: mmr rose from rank ${a._2} (${a._5}) to ${b._2} (${b._5})")
        case _ =>
      }
    }
  }

  test("s16 recall equals the direct s01-truth vs s04-ivf set diff") {
    def topSets(name: String) = graft.analytics.Registry.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val truth = topSets("s01_cosine_topk") // (q_id -> (q, rnk, c_id))
    val ivf = topSets("s04_ivf_topk")
    val got = graft.analytics.Registry.queries("s16_recall_at_k")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    got.keySet shouldBe truth.keySet
    got.foreach { case (q, (nHits, recallPct, firstMiss)) =>
      val tRanked = truth(q).sortBy(_._2)
      val ivfIds = ivf(q).map(_._3).toSet
      val hits = tRanked.count(t => ivfIds.contains(t._3))
      nHits shouldBe hits.toLong
      recallPct shouldBe hits.toLong * 20
      firstMiss shouldBe tRanked.find(t => !ivfIds.contains(t._3)).map(_._2)
    }
  }
}
