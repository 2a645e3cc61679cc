package graft

import graft.analytics.Registry

/** Hand-derivable invariants for the r14 operators whose oracles prove
  * cross-engine equality but not the ALGEBRA: q132's MAD rule against a
  * by-hand median/MAD, m14's packing conservation + budget bound, and
  * d28's containment on a constructed quoted-document corpus. */
class NewOpsInvariantSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("q132 computes the hand-derivable median/MAD and flags only the spike") {
    val tmp = java.nio.file.Files.createTempDirectory("q132inv").toString
    // group 'click': values 1, 2, 3, 4, 100 → median 3 (med2 = 600 cents
    // ×2), deviations 2 1 0 1 97 → MAD 1 (mad4 = 400), 3-MAD rule flags
    // only 100 (|100−3| = 97 > 3)
    Seq(1.0, 2.0, 3.0, 4.0, 100.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i * 60), 1L, "click", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q132_mad_outliers")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    out shouldBe Seq(("click", 5L, 600L, 400L, 1L))
  }

  test("m14 packing conserves items and respects the pixel budget bound") {
    val tmp = java.nio.file.Files.createTempDirectory("m14inv").toString
    // 60 docs of assorted lengths ≥ 16 chars (geometry is hash-derived,
    // so the invariants — not exact values — are the assertion surface)
    (1 to 60).map { i =>
      (i.toLong, (s"doc$i " * (3 + i % 7)).trim + " tail words here okay",
        "en", s"src${i % 4}", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Registry.queries("m14_aspect_bucket_pack")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // every doc lands in exactly one batch
    rows.map(_._2).sum shouldBe 60L
    rows.foreach { case (bucket, items, batches, totalPx, maxBatchPx, fill) =>
      withClue(s"bucket $bucket: ") {
        // a batch holds its running sum ≤ budget + one item (w,h ≤ 512)
        assert(maxBatchPx <= 1048576L + 512L * 512L)
        assert(batches >= 1L && items >= batches)
        assert(totalPx >= maxBatchPx)
        assert(fill <= 1000000L + 512L * 512L * 1000000L / 1048576L)
      }
    }
  }

  test("d28 flags the quoted document against its host, not unrelated docs") {
    val tmp = java.nio.file.Files.createTempDirectory("d28inv").toString
    // doc 1 = the quote (20 tokens); doc 2 embeds it verbatim inside
    // unique filler → containment(1→2) = 1.0; doc 3 shares nothing.
    // Rare-shingle candidates need df ∈ [2, 5]: the shared shingles
    // appear in exactly docs 1 and 2 → df = 2 ✓.
    val quote = (1 to 20).map(i => s"quoted$i").mkString(" ")
    Seq(
      (1L, quote, "en", "webA", 0L),
      (2L, ((1 to 6).map(i => s"h$i") :+ quote).mkString(" ") + " " +
        (7 to 12).map(i => s"h$i").mkString(" "), "en", "webB", 0L),
      (3L, (1 to 25).map(i => s"z$i").mkString(" "), "en", "webC", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d28_containment_dedup")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // exactly one flagged pair: (1, 2) at full containment of the quote
    out shouldBe Seq((1L, 2L, 1000000L))
  }
}
