package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.analytics.Registry

/** d26/d27 exact-substring family: span localization semantics on a
  * hand-built corpus (known duplicated span at known offsets), and the
  * plan-shape pins (the KcorePlanSpec discipline) — the gram volume must
  * shuffle exactly ONCE (the "distributed suffix sort"), with the island
  * window reusing the per-doc partitioning instead of re-shuffling. */
class SubstringDedupSpec extends SparkSuite {
  import spark.implicits._

  /** Two docs sharing one exact 20-token span (offsets 3 and 5); all
    * other tokens are unique, so no other 8-gram repeats anywhere. */
  private def corpus(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("d26spec").toString
    val span = (1 to 20).map(i => s"shared$i").mkString(" ")
    val doc1 = ((1 to 3).map(i => s"u$i") :+ span) ++ (4 to 12).map(i => s"u$i")
    val doc2 = ((1 to 5).map(i => s"v$i") :+ span) ++ (6 to 14).map(i => s"v$i")
    Seq(
      (1L, doc1.mkString(" "), "en", "webA", 0L),
      (2L, doc2.mkString(" "), "en", "webB", 0L),
      (3L, (1 to 30).map(i => s"w$i").mkString(" "), "en", "webA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("d26 localizes the exact duplicated span at its exact offsets") {
    val tmp = corpus()
    val out = Registry.queries("d26_exact_substring_spans")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // one 20-token span per owning doc; doc 3 (webA) is clean but webA
    // still aggregates doc 1's span. span_start: doc1 tokens 0-2 are
    // filler → grams 3..15 duplicated → span [3, 23); doc2 → [5, 25).
    val m = 1000000007L
    out shouldBe Seq(
      ("webA", 1L, 1L, 20L, 20L),
      ("webB", 1L, 1L, 20L, 20L))
    val ck = Registry.queries("d26_exact_substring_spans")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(5))).toMap
    ck("webA") shouldBe (1L * 1000003L + 3L) % m
    ck("webB") shouldBe (2L * 1000003L + 5L) % m
  }

  test("d27 keeps the first occurrence and cuts the second") {
    val tmp = corpus()
    val out = Registry.queries("d27_substring_dedup_apply")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // doc1 (webA) owns the first occurrence → kept; doc2 (webB) loses its
    // 20 tokens. webA: docs 1+3, 32 + 30 tokens; webB: doc 2, 34 tokens.
    out shouldBe Seq(
      ("webA", 2L, 62L, 1L, 0L, 0L, 62L),
      ("webB", 1L, 34L, 1L, 1L, 20L, 14L))
  }

  test("d26 plan: gram volume shuffles once; island window reuses doc partitioning") {
    graft.analytics.Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false") {
      val tmp = corpus()
      val plan = Registry.queries("d26_exact_substring_spans")(spark, tmp)
        .queryExecution.executedPlan
      val parts = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning.toString }
      // the occurrence count partitions the grams by hash exactly once —
      // a second gh shuffle would mean the agg+join-back shape regressed
      withClue(s"gram shuffles:\n${parts.mkString("\n")}\n") {
        parts.count(_.contains("gh#")) shouldBe 1
      }
      // the span aggregate groups by (doc_id, isl) but must ride the
      // island window's doc_id partitioning — no isl-keyed re-shuffle
      withClue(s"island re-shuffle:\n${parts.mkString("\n")}\n") {
        parts.count(_.contains("isl#")) shouldBe 0
      }
    }
  }

  test("d27 plan: still exactly one gram shuffle") {
    graft.analytics.Tables.withConfs(spark,
      "spark.sql.adaptive.enabled" -> "false") {
      val tmp = corpus()
      val plan = Registry.queries("d27_substring_dedup_apply")(spark, tmp)
        .queryExecution.executedPlan
      val parts = plan.collect { case e: ShuffleExchangeExec =>
        e.outputPartitioning.toString }
      withClue(s"gram shuffles:\n${parts.mkString("\n")}\n") {
        parts.count(_.contains("gh#")) shouldBe 1
      }
    }
  }
}
