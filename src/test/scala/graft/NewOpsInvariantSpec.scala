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

  test("q137 counts violating rows and risk exactly on a hand-built dimension") {
    val tmp = java.nio.file.Files.createTempDirectory("q137inv").toString
    // segment A: one class of 6 (k-safe) + one singleton → 1 violating
    // row; risk = 6·(1e6 DIV 6) + 1·1e6 = 999996 + 1000000
    val rows =
      (1 to 6).map(i => (i.toLong, "Customer#%09d".format(i), 1, 100.0, "A")) ++
      Seq((7L, "Customer#000000007", 2, 100.0, "A")) ++
      (8 to 12).map(i => (i.toLong, "Customer#%09d".format(i), 3, 100.0, "B"))
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val out = Registry.queries("q137_k_anonymity")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    out shouldBe Seq(
      ("A", 7L, 2L, 1L, 1L, 6L * (1000000L / 6L) + 1000000L),
      ("B", 5L, 1L, 0L, 5L, 5L * (1000000L / 5L)))
  }

  test("q138 sweeps exactly the subject rows with exact value mass") {
    val tmp = java.nio.file.Files.createTempDirectory("q138inv").toString
    // subjects: key % 1000 == 7 → custkeys 7 and 1007 only
    Seq((7L, "c7", 1, 10.50, "A"), (1007L, "c1007", 1, 4.25, "A"),
      (8L, "c8", 1, 99.99, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((100L, 7L, "O", 20.00, ts(0), "1-URGENT"),
      (101L, 8L, "O", 30.00, ts(0), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, ts(60), 7L, "click", 1.25, ""), (2L, ts(61), 9L, "view", 7.00, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q138_deletion_sweep")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    out shouldBe Seq(
      ("customer", 2L, 2L, 1050L + 425L),
      ("events", 1L, 1L, 125L),
      ("orders", 1L, 1L, 2000L))
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

  test("q143 buckets hand-built day partitions by age with exact band edges") {
    val tmp = java.nio.file.Files.createTempDirectory("q143inv").toString
    // days 0, 8, 25 → as_of 25; ages 25, 17, 0 → bands 3 (past the
    // 21-day horizon), 2, 0; cents exact per band
    def atDay(day: Long, sec: Long) = ts(day * 86400L + sec)
    Seq(
      (1L, atDay(0, 10), 1L, "click", 1.00, ""),
      (2L, atDay(0, 20), 2L, "click", 2.00, ""),
      (3L, atDay(8, 30), 3L, "view", 3.50, ""),
      (4L, atDay(25, 40), 4L, "view", 10.00, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q143_retention_audit")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    out shouldBe Seq(
      (0L, 0L, 1L, 1L, 1000L, 25L, 25L),
      (2L, 0L, 1L, 1L, 350L, 8L, 8L),
      (3L, 1L, 1L, 2L, 300L, 0L, 0L))
  }

  test("d30 drops exactly the dominated duplicates inside each cluster") {
    val tmp = java.nio.file.Files.createTempDirectory("d30inv").toString
    // cluster 0 = three copies of e1 → ids 2, 3 dominated by id 1;
    // cluster 1 = two copies of e2 → id 5 dominated by id 4. The two
    // centroids are exactly e1 and e2 (orthogonal), so assignment is
    // unambiguous and every intra-cluster pair has cosine 1.
    def unit(axis: Int) = Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    Seq(
      (1L, unit(0), 0), (2L, unit(0), 0), (3L, unit(0), 0),
      (4L, unit(1), 1), (5L, unit(1), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("d30_semantic_dedup")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    out shouldBe Seq(
      (0, 3L, 2L, 333333L, 5L),
      (1, 2L, 1L, 500000L, 5L))
  }

  test("d29 gates sequentially: accepted deltas extend, rejected never do") {
    val tmp = java.nio.file.Files.createTempDirectory("d29inv").toString
    // corpus doc 2 = c1..c30. Batch 1 (ids %6=1): doc 1 all-novel
    // (accepted), doc 7 = c1..c20 + d1..d15 (20 of 35 dup → flagged).
    // Batch 2 (ids %6=3): doc 3 copies ACCEPTED doc 1's u-prefix →
    // flagged only because batch 1 grew the index; doc 9 copies REJECTED
    // doc 7's d-tail → clean, because rejected docs never index.
    // Batch 3 (id %6=5): doc 5 copies doc 1's u-prefix → flagged.
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (2L, toks("c", 30)),
      (1L, toks("u", 30)),
      (7L, toks("c", 20) + " " + toks("d", 15)),
      (3L, toks("u", 20) + " " + toks("w", 4)),
      (9L, toks("d", 15) + " " + toks("y", 5)),
      (5L, toks("u", 20) + " " + toks("z", 4)))
    docs.map { case (id, text) => (id, text, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d29_stream_substring_gate")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // 5 delta docs; flagged = 7 (corpus dup), 3 and 5 (accepted-delta
    // dup); each flagged doc's duplicated span is exactly 20 tokens
    out shouldBe Seq(("s", 5L, 3L, 60L, 15L))
  }

  test("q144 derives temperature weights and thresholds exactly by hand") {
    val tmp = java.nio.file.Files.createTempDirectory("q144inv").toString
    // lang aa: 8 docs × 100 chars → mass 800, isqrt 28; lang bb: 2 docs →
    // mass 200, isqrt 14. sw = 42, budget = 10·2 DIV 5 = 4. aa target =
    // 4·28 DIV 42 = 2 → sel_ppm 250000, keeps {5, 7} under the hash rule;
    // bb target = 1 → sel_ppm 500000, keeps {10} (verified in python)
    val docs = (1L to 8L).map(i => (i, "x", "aa", "s", 100L)) ++
      Seq((9L, "x", "bb", "s", 100L), (10L, "x", "bb", "s", 100L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("q144_mixture_sample")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    out shouldBe Seq(
      ("aa", 8L, 800L, 666666L, 2L, 2L, 12L),
      ("bb", 2L, 200L, 333333L, 1L, 1L, 10L))
  }

  test("s20 builds the hand-derivable kNN graph inside each IVF cell") {
    val tmp = java.nio.file.Files.createTempDirectory("s20inv").toString
    // cluster 0 = five identical unit(0) vectors (ids 1–5): every
    // intra-cell sim is exactly 1, so top-3 edges tie-break to the three
    // lowest other ids — 1..4 form a mutual clique (6 mutual pairs), 5's
    // edges are one-way. cluster 1 = two unit(1) vectors: one mutual pair.
    def unit(axis: Int) = Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    ((1L to 5L).map(i => (i, unit(0), 0)) ++ Seq((6L, unit(1), 1), (7L, unit(1), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("s20_knn_graph")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // mutual checksums: Σ(src·1000003 + dst): cluster 0 pairs (1,2) (1,3)
    // (1,4) (2,3) (2,4) (3,4) → 10000050; cluster 1 pair (6,7) → 6000025
    out shouldBe Seq(
      (0, 5L, 15L, 6L, 10000050L),
      (1, 2L, 2L, 1L, 6000025L))
  }

  test("s21 recovers a hand-built dominant axis with full explained variance") {
    val tmp = java.nio.file.Files.createTempDirectory("s21inv").toString
    // six vectors ±0.5 on axis 4 (1-based), zero elsewhere: mean is
    // exactly 0, all variance lives on one axis → the power iteration
    // must converge to loading 1e6 at pos 4, 0 elsewhere, ev_ppm = 1e6
    def axis(v: Float) = Array.tabulate(64)(i => if (i == 3) v else 0.0f)
    ((1L to 3L).map(i => (i, axis(0.5f), 0)) ++
      (4L to 6L).map(i => (i, axis(-0.5f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("s21_pca_power")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    out should have size 64
    out.foreach { case (pos, loading, evPpm) =>
      withClue(s"pos $pos: ") {
        loading shouldBe (if (pos == 4L) 1000000L else 0L)
        evPpm shouldBe 1000000L
      }
    }
  }

  test("t35 buckets hand-computed NLL scores at the exact integer edges") {
    val tmp = java.nio.file.Files.createTempDirectory("t35inv").toString
    // reference slice (%7) = two copies of "a a a b": c(a)=6, c(b)=2,
    // T+V = 10 → lnQ units: NLL(a) = 23026−19459 = 3567, NLL(b) =
    // 23026−10986 = 12040, refq = 45482 DIV 8 = 5685. doc 1 scores
    // exactly refq → head; doc 2 (35×a + 12×b) scores 269325 DIV 47 =
    // 5730, inside the 2% band (5730·50 ≤ 5685·51) → middle; doc 3
    // all-unseen scores lnQ(10) = 23026 → tail
    val ref = "a a a b"
    Seq((7L, ref), (14L, ref), (1L, ref),
      (2L, (Seq.fill(35)("a") ++ Seq.fill(12)("b")).mkString(" ")),
      (3L, "z z z z"))
      .map { case (id, text) => (id, text, "aa", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t35_ccnet_ppl_buckets")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    out shouldBe Seq(
      ("aa", "head", 3L, 12L, 5685L, 22L),
      ("aa", "middle", 1L, 47L, 5730L, 2L),
      ("aa", "tail", 1L, 4L, 23026L, 3L))
  }

  test("d28 rare-shingle candidates reach 100% recall vs exact containment at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    // ground truth: brute-force all-pairs containment over the same
    // shingle/hash representation (test-only hook; 500 docs → 125k pairs).
    // d28's verify stage is exact, so its output is always a subset of
    // the truth — set equality IS recall = 100%. The heuristic under
    // audit is candidate generation (df ∈ [2,5] rare shingles, ≥2 shared
    // witnesses); measured here: every true ≥50%-contained pair carries
    // at least two rare witnesses on this corpus.
    val truth = graft.analytics.Dedup.containmentExactPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Registry.queries("d28_containment_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withClue(s"truth=${truth.size} flagged=${got.size}: ") {
      assert(truth.nonEmpty, "fixture corpus must contain true containment pairs")
      got shouldBe truth
    }
  }

  test("d31 admits exactly batch-minus-history whatever the blooms say") {
    val tmp = java.nio.file.Files.createTempDirectory("d31inv").toString
    // batch block = ids 0..19 ((id DIV 20) % 5 == 0); history = 20..99.
    // doc 0 shares its 8-token prefix with history doc 25 (a truncation
    // duplicate — different tail, same fingerprint) → blocked; doc 1 is
    // unique → admitted. The assertion pins the EXACTNESS contract: the
    // output is batch ∖ history regardless of bloom false positives.
    val pre = "w1 w2 w3 w4 w5 w6 w7 w8"
    Seq(
      (0L, s"$pre batch tail", "en", "s", 0L),
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8 unique tail", "en", "s", 0L),
      (25L, s"$pre history tail differs", "en", "s", 0L),
      (30L, "h1 h2 h3 h4 h5 h6 h7 h8 other", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d31_bloom_dedup_gate")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    out shouldBe Seq(("s", 2L, 1L, 1L)) // only doc 1 admitted; checksum = 1
  }

  test("s22 prunes exactly the vectors anti-correlated with their centroid") {
    val tmp = java.nio.file.Files.createTempDirectory("s22inv").toString
    // label 0: two vectors at +0.5 on axis 0, one at -0.5 → centroid
    // points +, vec 2 has sim < 0 and is the only prune; label 1: both
    // aligned → no prunes.
    def v(x: Float) = Array.fill(64)(0.0f).updated(0, x)
    Seq((0L, v(0.5f), 0), (1L, v(0.4f), 0), (2L, v(-0.5f), 0),
      (3L, v(0.3f), 1), (4L, v(0.2f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("s22_prototype_prune")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSeq
    out shouldBe Seq((0L, 3L, 1L, 2L), (1L, 2L, 0L, 0L))
  }

  test("t36 ranks target-like documents above off-target ones") {
    val tmp = java.nio.file.Files.createTempDirectory("t36inv").toString
    // target slice (doc_id % 7 == 0) speaks 'aim'; raw doc 1 mimics the
    // target distribution, raw doc 2 speaks only off-target 'off' → the
    // importance ratio must order doc 1 strictly above doc 2.
    Seq(
      (0L, "aim aim aim aim common", "en", "s", 0L),
      (7L, "aim aim common common aim", "en", "s", 0L),
      (1L, "aim aim aim common aim", "en", "s", 0L),
      (2L, "off off off common off", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ranked = Registry.queries("t36_dsir_importance")(spark, tmp)
      .collect().map(_.getLong(1)).toSeq
    ranked.indexOf(1L) should be < ranked.indexOf(2L)
    // and the target slice itself scores high (it IS the target dist)
    ranked.indexOf(0L) should be < ranked.indexOf(2L)
  }

  test("q145 resolves the hand-built bitemporal ledger at all three probes") {
    val tmp = java.nio.file.Files.createTempDirectory("q145inv").toString
    // okey 1 (1 % 3 = 1 → revisions r=0,1): odate 1996-06-25, base 100 →
    //   r0: vf=rec=06-25, val 10000; r1: vf=07-02, rec=06-26, val 10100.
    // okey 3 (3 % 3 = 0 → r=0 only): odate 1996-01-10, base 200 → 20000.
    // probe 1 (T=1997-01-01, V=1997-01-01): both keys, okey1→r1 → 30100.
    // probe 2 (T=1996-01-01, V=1999-06-30): nothing recorded yet → no row.
    // probe 3 (T=2002-01-01, V=1996-06-30): okey1 r1's vf > V → r0 → 30000.
    def d(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    Seq((1L, 10L, "O", 100.5, d("1996-06-25"), "1-URGENT"),
      (3L, 11L, "O", 200.5, d("1996-01-10"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Registry.queries("q145_bitemporal_asof")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    out shouldBe Seq(
      (1L, 2L, 30100L, 30100L),
      (3L, 2L, 30000L, 30000L))
  }

  test("t37 attributes each planted defect to exactly its named rule") {
    val tmp = java.nio.file.Files.createTempDirectory("t37inv").toString
    // aa: 60 distinct tokens, 3 stopwords, mean len ~4.9 → passes all six.
    // bb: 10 clean tokens → fails ONLY the 50-token floor.
    // cc: 60 tokens with 'xxx' interleaved 30× (distinct neighbors, so no
    //     trigram dups), mean len 3.5 → fails ONLY max-token ≤ 20%.
    // letter-only suffixes — a digit in a token would trip f_alpha
    def suf(i: Int) = "" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
    val passTokens = Seq("the", "a", "of") ++ (4 to 60).map(i => "tok" + suf(i))
    val ccTokens = Seq("xxx", "the", "xxx", "a") ++
      (3 to 30).flatMap(i => Seq("xxx", "wrd" + suf(i)))
    val bbTokens = Seq("the", "a") ++ (3 to 10).map(i => "tok" + suf(i))
    val rows = Seq(
      (1L, passTokens.mkString(" "), "aa"),
      (2L, bbTokens.mkString(" "), "bb"),
      (3L, ccTokens.mkString(" "), "cc"))
      .map { case (id, text, lang) => (id, text, lang, "s", text.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t37_gopher_rules")(spark, tmp)
      .collect().map(r => (r.getString(0), (1 to 8).map(r.getLong).toList)).toMap
    // (n_docs, fail_wordcount, fail_meanlen, fail_stopword, fail_maxtok,
    //  fail_duptri, fail_alpha, n_pass)
    out("aa") shouldBe List(1L, 0L, 0L, 0L, 0L, 0L, 0L, 1L)
    out("bb") shouldBe List(1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)
    out("cc") shouldBe List(1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L)
  }

  test("d32 cluster-policy splits are structurally leak-free at sf0.001") {
    val out = Registry.queries("d32_leakage_safe_split")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (ct, cv, cs, cl) = out("by_cluster")
    val (dt, dv, ds0, dl) = out("by_doc")
    // both policies partition the full corpus
    ct + cv + cs shouldBe 500L
    dt + dv + ds0 shouldBe 500L
    // the load-bearing claim: cluster-representative hashing makes a
    // cross-split near-dup pair impossible; doc hashing leaks
    cl shouldBe 0L
    withClue("fixture corpus must exhibit by-doc leakage: ") { dl should be > 0L }
  }

  test("m15 admits every as-crawled pair by construction at sf0.001") {
    val out = Registry.queries("m15_clip_gate")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (alignedPairs, alignedPass) = out(true)
    val (swappedPairs, swappedPass) = out(false)
    // shared featurizer ⇒ an aligned pair scores cos = 1 ≥ any threshold
    alignedPass shouldBe alignedPairs
    // swapped captions score at content-overlap level; the 0.95 gate
    // must reject most of them or it gates nothing
    withClue(s"swapped pass $swappedPass/$swappedPairs: ") {
      swappedPass * 2 should be < swappedPairs
    }
  }

  test("s23 recall is monotone in the probe budget (candidate sets nest)") {
    val rows = Registry.queries("s23_recall_probe_sweep")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    rows.map(_._1) shouldBe Seq(1L, 2L, 3L)
    rows.foreach { case (_, nTruth, nHits, ppm) =>
      nTruth shouldBe 40L // 8 anchors × k=5 ground-truth rows each
      ppm shouldBe nHits * 1000000L / 40L
    }
    // probing one more centroid can only ADD candidates — recall at
    // budget p+1 below budget p would mean the sweep broke set nesting
    rows.map(_._3) shouldBe rows.map(_._3).sorted
  }

  test("q147 flags exactly the partition with the extra file generation") {
    val out = Registry.queries("q147_compaction_planner")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    out("A")._1 shouldBe 2L
    out("A")._3 shouldBe true
    Seq("N", "R").foreach { f =>
      out(f)._1 shouldBe 1L
      out(f)._3 shouldBe false
    }
  }

  test("t38 scores the twin docs non-novel and the unique doc fully novel") {
    val tmp = java.nio.file.Files.createTempDirectory("t38inv").toString
    // docs 1/2 share their full 10-token text (every 8-gram df = 2 →
    // novelty 0); doc 3 is disjoint (every 8-gram df = 1 → novelty 1e6);
    // doc 4 has 5 tokens → no 8-grams → counted as short, never divided
    val shared = (1 to 10).map(i => "sh" + ('a' + i).toChar).mkString(" ")
    val unique = (1 to 10).map(i => "un" + ('a' + i).toChar).mkString(" ")
    Seq((1L, shared, "en", "s1", 0L), (2L, shared, "en", "s1", 0L),
      (3L, unique, "en", "s2", 0L), (4L, "a b c d e", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t38_novelty_scores")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    out shouldBe Seq(
      ("s1", 2L, 0L, 6L, 0L, 0L),        // 3 grams each, all df=2
      ("s2", 1L, 1L, 3L, 3L, 1000000L))  // doc 3 scored, doc 4 short
  }

  test("q148 datasheet cells reconcile with hand counts on a planted corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("q148inv").toString
    // two docs share a 40-char prefix (dup-exposed); one passes the
    // quality rules (25 clean tokens, 1 stopword), one fails (5 tokens)
    val prefix = "p" * 45
    val keepTokens = Seq("the") ++ (2 to 25).map(i => "tok" + ('a' + i).toChar)
    Seq(
      (1L, prefix + " tail one", "en", "s", (prefix + " tail one").length.toLong),
      (2L, prefix + " tail two", "en", "s", (prefix + " tail two").length.toLong),
      (3L, keepTokens.mkString(" "), "en", "s", keepTokens.mkString(" ").length.toLong),
      (4L, "a b c d e", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("q148_corpus_datasheet")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5), r.getLong(6))).toSeq
    // (lang, source, n_docs, n_dup_exposed, n_keep)
    out shouldBe Seq(("en", "s", 4L, 2L, 1L))
  }

  test("q149 KS statistic and size-scaled verdict are exact on planted shifts") {
    val tmp = java.nio.file.Files.createTempDirectory("q149inv").toString
    val splitA = "2024-01-10 00:00:00"
    val splitB = "2024-01-20 00:00:00"
    def t(s0: String) = java.sql.Timestamp.valueOf(s0)
    // 'shift': a = {1.0×10, 2.0×10}, b = {2.0×10, 3.0×10} → D = 0.5,
    //   gmax = |10·20 − 0·20| = 200 at x = 100 cents; 200²·1000 = 4e7 >
    //   1844·40·20·20 = 2.95e7 → drifted. 'same': identical → D = 0.
    val rows =
      (1 to 10).map(i => (i.toLong, t(splitA), 1L, "shift", 1.0, "")) ++
      (11 to 20).map(i => (i.toLong, t(splitA), 1L, "shift", 2.0, "")) ++
      (21 to 30).map(i => (i.toLong, t(splitB), 1L, "shift", 2.0, "")) ++
      (31 to 40).map(i => (i.toLong, t(splitB), 1L, "shift", 3.0, "")) ++
      (41 to 50).map(i => (i.toLong, t(splitA), 1L, "same", 1.0, "")) ++
      (51 to 60).map(i => (i.toLong, t(splitB), 1L, "same", 1.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q149_ks_drift")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    out("shift") shouldBe (20L, 20L, 500000L, 100L, true)
    out("same") shouldBe (10L, 10L, 0L, 100L, false)
  }

  test("d33 weights every cluster to exactly one effective document") {
    val out = Registry.queries("d33_soft_dedup_weights")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nDocs = out.map(_._1).sum
    val effPpm = out.map(_._3).sum
    nDocs shouldBe 500L
    // Σ over a cluster of 10⁶ DIV size differs from 10⁶ only by the
    // floor remainder (< size per cluster) — effective mass never
    // exceeds one doc per cluster and never undercounts by a whole doc
    effPpm should be <= 500L * 1000000L
    out.foreach { case (n, inCl, eff, minW) =>
      eff should be >= (n - inCl) * 1000000L // singletons carry full weight
      minW should be >= 1L
    }
  }

  test("q150 coverage is cumulative and closes at exactly 10^6 ppm") {
    val rows = Registry.queries("q150_disorder_audit")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    rows.map(_._1) shouldBe rows.map(_._1).sorted // tier order = output order
    rows.last._4 shouldBe 1000000L
    rows.map(_._4) shouldBe rows.map(_._4).sorted // coverage monotone
    // every non-ontime tier's max lateness sits inside its bound
    val bounds = Map("1_under_1m" -> 60000000L, "2_under_5m" -> 300000000L,
      "3_under_15m" -> 900000000L, "4_under_1h" -> 3600000000L)
    rows.foreach { case (tier, _, maxLate, _) =>
      bounds.get(tier).foreach(b => maxLate should be < b)
      if (tier == "0_ontime") maxLate shouldBe 0L
    }
  }

  test("q151 token bucket drains, refills, and seeds new users at cap") {
    val tmp = java.nio.file.Files.createTempDirectory("q151inv").toString
    // user 1: six events in batch 0 (ids 0,3,..,15 ≡ 0 mod 3) → admit 4
    // (cap), bucket → min(4, 4−4+2) = 2; two in batch 1 (ids 1,4) →
    // admit 2; one in batch 2 (id 2) → admit 1. user 2 first appears in
    // batch 2 (id 5) → seeded at cap, admitted.
    val ids = Seq(0L, 3L, 6L, 9L, 12L, 15L, 1L, 4L, 2L, 5L)
    val rows = ids.map { id =>
      val user = if (id == 5L) 2L else 1L
      (id, ts(1000 + id), user, "click", 1.0, "")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q151_stream_rate_limit")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSeq
    out shouldBe Seq(
      (0L, 6L, 4L, 0L + 3L + 6L + 9L), // four earliest admitted
      (1L, 2L, 2L, 1L + 4L),           // refilled to 2, both admitted
      (2L, 2L, 2L, 2L + 5L))           // user 1 refilled, user 2 seeded
  }

  test("q146 flags the planted null, cardinality, and key-set drifts") {
    val tmp = java.nio.file.Files.createTempDirectory("q146inv").toString
    // epoch a (before 2024-01-16): types x/y/z (3 distinct), no nulls,
    // props key k. epoch b: all type x (1 distinct → distinct_shift), one
    // null user_id (→ null_shift), props key m (k dropped, m added).
    def t(s0: String) = java.sql.Timestamp.valueOf(s0)
    val rows = Seq(
      (1L, t("2024-01-10 00:00:00"), Option(1L), "x", 1.0, """{"k": 1}"""),
      (2L, t("2024-01-11 00:00:00"), Option(2L), "y", 2.0, """{"k": 2}"""),
      (3L, t("2024-01-12 00:00:00"), Option(3L), "z", 3.0, """{"k": 3}"""),
      (4L, t("2024-01-20 00:00:00"), Option(4L), "x", 1.0, """{"m": 5}"""),
      (5L, t("2024-01-21 00:00:00"), None: Option[Long], "x", 2.0, """{"m": 6}"""),
      (6L, t("2024-01-22 00:00:00"), Option(5L), "x", 3.0, """{"m": 7}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q146_schema_drift")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(7))).toMap
    out shouldBe Map(
      "event_type" -> "distinct_shift",
      "props" -> "stable",
      "props.k" -> "dropped",
      "props.m" -> "added",
      "user_id" -> "null_shift",
      "value" -> "stable")
  }

  test("d34 tiers a planted copy, a borderline vector, and an orthogonal one") {
    val tmp = java.nio.file.Files.createTempDirectory("d34inv").toString
    // evals (vec_id < 64): e0 = x̂, e1 = ŷ. train: 100 is a scaled copy of
    // e1 (cos = 1 → contaminated, argmax eval 1), 101 sits at cos 0.37
    // against e0 and 0 against e1 (→ suspect, eval 0), 102 is orthogonal
    // to both (→ absent from the report)
    Seq(
      (0L,   Array(1.0f, 0f, 0f, 0f),      0),
      (1L,   Array(0f, 1.0f, 0f, 0f),      1),
      (100L, Array(0f, 0.5f, 0f, 0f),      2),
      (101L, Array(0.37f, 0f, 0.929f, 0f), 3),
      (102L, Array(0f, 0f, 0f, 1.0f),      4))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("d34_semantic_decontam")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    out.map(t => (t._1, t._2, t._4)).toSeq shouldBe
      Seq((100L, 1L, "contaminated"), (101L, 0L, "suspect"))
    out(0)._3 shouldBe 1.0 +- 1e-6
    out(1)._3 shouldBe 0.37 +- 1e-3
  }

  test("s24 candidate counts equal the predicate's share and recall is consistent") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("s24_filtered_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    out.map(_._1).toSeq shouldBe (0L until 8L)
    // n_cands must equal the direct per-query predicate count (label ≡
    // q_id mod 3, anchor itself excluded)
    val byMod = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label"))
    out.foreach { case (q, k, nCands, nHits, pct, miss) =>
      k shouldBe 5L
      val expect = byMod.count { case (id, lab) => id != q && lab % 3 == q % 3 }
      withClue(s"q=$q: ") { nCands shouldBe expect.toLong }
      pct shouldBe nHits * 20L
      if (nHits == 5L) miss shouldBe None else miss.get should be >= 1L
    }
  }

  test("q152 two-level reservoir equals the single-window top-n and is mergeable") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("q152_weighted_reservoir")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 5 strata × 8 draws, distinct keys inside each stratum
    out.groupBy(_._1).values.foreach { g =>
      g.map(_._2).toSeq.sorted shouldBe (1L to 8L)
      g.map(_._3).distinct.length shouldBe 8
    }
    // the two-level refine must equal the direct single-window top-n on
    // the same priority expression (the A-ES mergeability property)
    import graft.analytics.Tables
    val direct = spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderpriority AS stratum", "o_orderkey AS key",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w")
      .selectExpr("stratum", "key",
        s"CAST(${Tables.lnQ(s"(2 * (${Tables.strHashExpr("CAST(key AS STRING)")} % 1000000) + 1) / 2000000.0D")} AS DOUBLE) / w AS prio")
      .selectExpr("stratum", "key",
        "CAST(ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY prio DESC, key) AS BIGINT) AS rnk")
      .where("rnk <= 8")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(1)))
    out.toSet shouldBe direct.toSet
  }

  test("t39 flags planted fertility disparity between merge-served and starved langs") {
    val tmp = java.nio.file.Files.createTempDirectory("t39inv").toString
    // lang bb dominates, so the 3 merge rounds learn (a b) then (ab ab) —
    // "abab" collapses to ONE token (fertility 1). Round 3 only reaches
    // 'x y', so lang aa's "xyzq" stays [xy, z, q] — 3 tokens/word.
    // corpus fertility = (30·1 + 6·3)/36 = 4/3: aa is > 1.25× (high),
    // bb is < 0.8× (low)
    val docs =
      (1 to 10).map(i => (i.toLong, "abab abab abab", "bb", "src", 14L)) ++
        Seq((100L, "xyzq xyzq xyzq", "aa", "src", 14L), (101L, "xyzq xyzq xyzq", "aa", "src", 14L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t39_tokenizer_fertility")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    out.toSeq shouldBe Seq(
      ("aa", 6L, 18L, 3000000L, 1333333L, "high_fertility"),
      ("bb", 30L, 30L, 1000000L, 4000000L, "low_fertility"))
  }

  test("d35 confusion cells reconcile with the registered d02/d05 edge sets") {
    val dir = "/root/testdata/sf0.001"
    val Array(row) = Registry.queries("d35_detector_agreement")(spark, dir).collect()
    val (nM, nS, nBoth, nUnion, ppm) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    // the audit must count exactly the registered detectors' outputs
    nM shouldBe Registry.queries("d02_minhash_lsh")(spark, dir).count()
    nS shouldBe Registry.queries("d05_simhash_pairs")(spark, dir).count()
    nBoth should be <= math.min(nM, nS)
    nUnion shouldBe nM + nS - nBoth
    ppm shouldBe nBoth * 1000000L / nUnion
  }

  test("q154 routes only behind-watermark rows and batch 0 never routes") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("q154_stream_late_router")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L)
    out.foreach { case (_, n, passed, routed, _) => passed + routed shouldBe n }
    // every event lands in exactly one batch
    val ev = graft.analytics.Tables.events(spark, dir)
    out.map(_._2).sum shouldBe ev.count()
    // no watermark exists before batch 0
    out(0)._4 shouldBe 0L
    // the jitter design must actually produce late data (the two
    // zero-routed first cuts are the regression this pins)
    out(1)._4 should be > 0L
    out(2)._4 should be > 0L
    // a routed row can be at most (jitter span − lateness) behind:
    // us ≥ arr − jmod and wm ≤ batch-boundary max − lateness
    val mm = ev.selectExpr("unix_micros(ts) AS us")
      .agg(org.apache.spark.sql.functions.min("us"),
        org.apache.spark.sql.functions.max("us")).head
    val span = mm.getLong(1) - mm.getLong(0) + 1
    out.map(_._5).max should be < span / 6 - span / 24
  }

  test("q155 merges all four bilinear delta quadrants on a hand-built ledger") {
    val tmp = java.nio.file.Files.createTempDirectory("q155inv").toString
    def t(s0: String) = java.sql.Timestamp.valueOf(s0 + " 00:00:00")
    // quadrants: (cust1, old) = A_old⋈B_old, (cust1, new) = ΔA⋈B_old,
    // (cust20, old) = A_old⋈ΔB, (cust20, new) = ΔA⋈ΔB — dropping ANY
    // term of the delta rule loses a quadrant and breaks the total
    Seq(
      (1L, 1L, "O", 10.0, t("1997-01-01"), "1-URGENT"),
      (2L, 1L, "O", 20.0, t("1997-07-01"), "1-URGENT"),
      (3L, 20L, "O", 40.0, t("1997-01-02"), "1-URGENT"),
      (4L, 20L, "O", 80.0, t("1997-08-01"), "1-URGENT"),
      (5L, 2L, "O", 5.0, t("1996-05-05"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1L, "SEG_A"), (20L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val out = Registry.queries("q155_incremental_join_view")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out.toSeq shouldBe Seq(("SEG_A", 4L, 150.0), ("SEG_B", 1L, 5.0))
  }

  test("d36 sweep is monotone in the threshold and anchored at d02's pair count") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("d36_threshold_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    out.map(_._1) shouldBe Seq(5000L, 20000L, 500000L, 950000L, 980000L)
    // raising the bar can only shrink the surviving pair and drop sets
    out.map(_._2) shouldBe out.map(_._2).sorted.reverse
    out.map(_._3) shouldBe out.map(_._3).sorted.reverse
    // the lowest bar is d02's own output threshold — same pair count
    out.head._2 shouldBe Registry.queries("d02_minhash_lsh")(spark, dir).count()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    out.foreach { case (_, _, dropped, ppm) => ppm shouldBe dropped * 1000000L / nDocs }
  }

  test("m16 attributes each planted fault class to exactly its reason cell") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queries("m16_payload_quarantine")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val mod = graft.analytics.Tables.HashMod
    def cells(p: Long => Boolean) = {
      val ids = docs.map(_._1).filter(p)
      (ids.length.toLong, ids.map(_ % mod).sum % mod)
    }
    // planted classes land in their reason, whatever the kind split
    // (collect on the SEQ of entries — Map.collect would rebuild a map
    // keyed on the first tuple slot and silently drop equal-n cells)
    val mm = out.toSeq.collect { case ((_, "meta_mismatch"), v) => v }
    (mm.map(_._1).sum, mm.map(_._2).sum % mod) shouldBe cells(_ % 23 == 0)
    val bh = out.toSeq.collect { case ((_, "bad_header"), v) => v }
    (bh.map(_._1).sum, bh.map(_._2).sum % mod) shouldBe cells(id => id % 23 != 0 && id % 29 == 0)
    // conservation: every payload lands in exactly one cell
    out.values.map(_._1).sum shouldBe docs.length.toLong
  }

  test("s25 scores separated clusters high and counts the planted misfit") {
    val tmp = java.nio.file.Files.createTempDirectory("s25inv").toString
    // label 0 clusters on x̂, label 1 on ŷ; vec 100 is labeled 0 but sits
    // on ŷ — the one vector closer to a foreign centroid
    Seq(
      (0L, Array(1.0f, 0f, 0f, 0f), 0), (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0.95f, 0.05f, 0f, 0f), 0),
      (10L, Array(0f, 1.0f, 0f, 0f), 1), (11L, Array(0.1f, 0.9f, 0f, 0f), 1),
      (12L, Array(0.05f, 0.95f, 0f, 0f), 1),
      (100L, Array(0f, 1.0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("s25_simplified_silhouette")(spark, tmp)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val (n0, mis0, sil0) = out(0)
    val (n1, mis1, sil1) = out(1)
    (n0, n1) shouldBe (4L, 3L)
    mis0 shouldBe 1L // exactly the planted foreign vector
    mis1 shouldBe 0L
    sil1 should be > 0.8 // tight cluster, far centroid
    sil0 should be < sil1 // the misfit's negative silhouette drags label 0
  }

  test("t40 tiers burned/partial/clean eval docs on a planted overlap corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("t40inv").toString
    // eval docs are doc_id % 97 = 0. doc 0 shares 1 of its 2 4-grams with
    // train doc 1 (burned at exactly 50%), doc 194 shares 1 of 3
    // (partial), doc 97 shares none (clean)
    Seq(
      (0L, "a b c d e"), (97L, "p q r s t u"), (194L, "m n o p q r"),
      (1L, "a b c d x"), (2L, "z m n o p z2"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t40_burned_benchmark")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    out.toSeq shouldBe Seq(
      (0L, 2L, 1L, "burned"),
      (97L, 3L, 0L, "clean"),
      (194L, 3L, 1L, "partial"))
  }

  test("q156 reads a perfectly separating score as a clean two-bin diagram") {
    val tmp = java.nio.file.Files.createTempDirectory("q156inv").toString
    // en docs are pure stopwords (score 1e6 → bin 9), zh docs contain
    // none (bin 0): base rate 1/2, so bin 9 must read lift 200%
    val docs =
      (1 to 3).map(i => (i.toLong, "the of and to a the", "en", "s", 18L)) ++
        (4 to 6).map(i => (i.toLong, "wu mao liang qi ba jiu", "zh", "s", 22L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("q156_score_calibration")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.toSeq shouldBe Seq(
      (0L, 3L, 0L, 0L, 500000L, 0L),
      (9L, 3L, 3L, 1000000L, 500000L, 200L))
  }

  test("d37 mines the colinear cross-lang pairs whatever the id/lang order") {
    val tmp = java.nio.file.Files.createTempDirectory("d37inv").toString
    // vectors 1 (en), 2 (fr), 3 (en) are colinear: unordered cross-lang
    // pairs are {1,2} (id order agrees with lang order) and {2,3} (id
    // order DISAGREES — the pair a lang1<lang2 join gate would drop);
    // {1,3} is same-language and must not appear
    Seq((1L, Array(1.0f, 0f, 0f, 0f), 0), (2L, Array(0.9f, 0f, 0f, 0f), 1),
      (3L, Array(0.8f, 0f, 0f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    Seq((1L, "en"), (2L, "fr"), (3L, "en")).toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d37_translation_pairs")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    out.length shouldBe 1
    val (lo, hi, n, mx) = out(0)
    (lo, hi, n) shouldBe ("en", "fr", 2L)
    mx shouldBe 1.0 +- 1e-5 // colinear ⇒ cosine 1
  }

  test("q157 replays hand-built SCD2 transitions: close, no-op, last-write-wins") {
    val tmp = java.nio.file.Files.createTempDirectory("q157inv").toString
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // µs → ms epoch
    // time thirds over us ∈ [0, 200]: b0 = [0,66], b1 = [67,133], b2 = [134,200]
    // user 1: b0 'w' then 'x' (last-write-wins: 'w' must never reach the
    // history), b1 'y' (closes x), b2 'y' (no-op) → x closed, y open
    // user 2: only b1 'z' → z open
    val rows = Seq(
      (1L, ts(1000000L), 1L, "w", 0.0, ""),
      (2L, ts(50000000L), 1L, "x", 0.0, ""),
      (3L, ts(100000000L), 1L, "y", 0.0, ""),
      (4L, ts(200000000L), 1L, "y", 0.0, ""),
      (5L, ts(101000000L), 2L, "z", 0.0, ""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q157_stream_scd2")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(("x", 1L, 0L), ("y", 1L, 1L), ("z", 1L, 1L))
  }

  test("q158 flags only the experiment with the planted assignment imbalance") {
    val tmp = java.nio.file.Files.createTempDirectory("q158inv").toString
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // exp_bad: 9 even-id users vs 1 odd → (9−1)²·100 = 6400 > 384·10
    // exp_ok: 5 vs 5 → χ² = 0
    val bad = (1 to 9).map(i => (i.toLong, ts(i * 60L), i * 2L, "exp_bad", 1.0, "")) :+
      (10L, ts(600L), 1L, "exp_bad", 1.0, "")
    val ok = (1 to 10).map(i => (100L + i, ts(1000L + i * 60L), i.toLong, "exp_ok", 1.0, ""))
    (bad ++ ok).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q158_srm_audit")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    out.toSeq shouldBe Seq(
      ("exp_bad", 9L, 1L, 6400000L, true),
      ("exp_ok", 5L, 5L, 0L, false))
  }

  test("q153 scores hand-built uniform and diverse classes exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("q153inv").toString
    // nation 1, band 0: 3 rows all BUILDING → l = 1 (violating), share 1e6
    // nation 1, band 1: one row each of three segments → l = 3, share ⌊1e6/3⌋
    Seq(
      (1, 100.0, "BUILDING"), (1, 200.0, "BUILDING"), (1, 300.0, "BUILDING"),
      (1, 1100.0, "BUILDING"), (1, 1200.0, "AUTOMOBILE"), (1, 1300.0, "MACHINERY"))
      .toDF("c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val out = Registry.queries("q153_l_diversity")(spark, tmp)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.toSeq shouldBe Seq((1, 2L, 6L, 1L, 1L, 1000000L))
  }

  test("s26 matches the closed-form anisotropy of colinear and cancelling clouds") {
    val tmp = java.nio.file.Files.createTempDirectory("s26inv").toString
    // label 0: four copies of 0.5·e₀ — every pair dot = 0.25, so
    // avg_pair_dot = 0.25 and anisotropy = 1 (a pure ray).
    // label 1: ±0.5·e₀, ±0.5·e₁ — Σv = 0, so Σ_{u≠v}<u,v> = −Σ||v||²
    // and avg_pair_dot = −0.25·4/12 = −1/12, anisotropy = −1/3.
    // all (8 vecs): Σv = 2·e₀ → ||Σ||² = 4, Σ||v||² = 2, num = 2,
    // pairs = 56 → avg_pair_dot = 1/28, anisotropy = 2/(7·2) = 1/7.
    def axis(a: Int, v: Float) = Array.tabulate(64)(i => if (i == a) v else 0.0f)
    (Seq.fill(4)(axis(0, 0.5f)).zipWithIndex.map { case (e, i) => (i.toLong, e, 0) } ++
      Seq((4L, axis(0, 0.5f), 1), (5L, axis(0, -0.5f), 1),
        (6L, axis(1, 0.5f), 1), (7L, axis(1, -0.5f), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("s26_anisotropy_probe")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // ±0.5 quantizes exactly (floor(±5000000.0)), so every expected
    // value below is closed-form, no quantization residue
    out.toSeq shouldBe Seq(
      ("0", 4L, 0.25, 1.0),
      ("1", 4L, -0.083333, -0.333333),
      ("all", 8L, 0.035714, 0.142857))
  }

  test("t41 reads a planted frequency spectrum: N_r table, gaps, and r*") {
    val tmp = java.nio.file.Files.createTempDirectory("t41inv").toString
    // types: x→1, y→2, z→4 ⇒ N₁=1, N₂=1, N₄=1. Ranked head:
    // r=1: N₂=1 → r* = 2·1/1 = 2.0; r=2: N₃=0 → NULL; r=4: N₅=0 → NULL.
    Seq((1L, "x", "en", "s0", 1L), (2L, "y y", "en", "s0", 3L),
      (3L, "z z z z", "en", "s0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t41_good_turing")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    out.toSeq shouldBe Seq(
      (1L, 1L, 1L, 1L, Some(2.0)),
      (2L, 2L, 1L, 0L, None),
      (3L, 4L, 1L, 0L, None))
  }

  test("q159 attributes each planted orphan (incl. a NULL FK) to its edge") {
    val tmp = java.nio.file.Files.createTempDirectory("q159inv").toString
    // FK graph with one planted break per child edge; NULL l_partkey
    // counts as an orphan (the strict-audit convention the scaladoc pins)
    Seq((1L, Option(100L), 7L), (2L, Option(100L), 7L),
      (3L, Option(200L), 7L), (1L, None, 9L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((1L, 10L), (2L, 99L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((10L, 0)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((7L, 100)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$tmp/supplier.parquet")
    Seq((0, 0)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$tmp/nation.parquet")
    Seq(Tuple1(0)).toDF("r_regionkey")
      .write.mode("overwrite").parquet(s"$tmp/region.parquet")
    Seq(Tuple1(100L), Tuple1(200L)).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val out = Registry.queries("q159_referential_orphans")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("customer.c_nationkey->nation", 1L, 0L, 0L),
      ("lineitem.l_orderkey->orders", 4L, 1L, 250000L),
      ("lineitem.l_partkey->part", 4L, 1L, 250000L),
      ("lineitem.l_suppkey->supplier", 4L, 1L, 250000L),
      ("nation.n_regionkey->region", 1L, 0L, 0L),
      ("orders.o_custkey->customer", 2L, 1L, 500000L),
      ("supplier.s_nationkey->nation", 1L, 1L, 1000000L))
  }

  test("d38 coherence reconciles with the registered d05 edges and d07 clusters") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.queries("d38_cluster_coherence")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // the audit must describe exactly the registered detector/cluster pair
    rows.map(_._3).sum shouldBe Registry.queries("d05_simhash_pairs")(spark, dir).count()
    val d07 = Registry.queries("d07_dup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.map(r => (r._1, r._2)).toMap shouldBe d07
    rows.foreach { case (rep, n, e, ppm, verdict) =>
      withClue(s"cluster $rep: ") {
        // spanning-connected and at most a clique
        assert(n >= 2L && e >= n - 1 && e <= n * (n - 1) / 2)
        ppm shouldBe e * 2000000L / (n * (n - 1))
        verdict shouldBe (if (n == 2) "pair"
                          else if (ppm < 600000L) "chained" else "cohesive")
        if (n == 2) { e shouldBe 1L; ppm shouldBe 1000000L }
      }
    }
  }

  test("t42 corrects planted typos to the highest-frequency distance-1 word") {
    val tmp = java.nio.file.Files.createTempDirectory("t42inv").toString
    // doc 97 is the typo channel: its ≥4-char tokens re-emit with the
    // 2nd char dropped → queries 'tble' and 'cble'. 'tble' has TWO
    // distance-1 dictionary neighbors (table freq 4, tible freq 5) —
    // pins the (distance, dict_freq DESC) tie-break; 'cble' has one.
    Seq((1L, "table table table", "en", "s0", 17L),
      (2L, "tible tible tible tible tible", "en", "s0", 29L),
      (97L, "table cable", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t42_symspell_correct")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    out.toSeq shouldBe Seq(
      ("cble", 1L, "cable", 1L, 1L),
      ("tble", 1L, "tible", 1L, 5L))
  }

  test("q160 profiles a hand-built orders table: unique key, dup ratios") {
    val tmp = java.nio.file.Files.createTempDirectory("q160inv").toString
    val d1 = ts(86400); val d2 = ts(2 * 86400)
    Seq((1L, 1L, "O", 10.0, d1, "1-URGENT"), (2L, 1L, "O", 20.0, d1, "1-URGENT"),
      (3L, 2L, "F", 30.0, d1, "1-URGENT"), (4L, 2L, "F", 40.0, d2, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Registry.queries("q160_candidate_keys")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    out.toSeq shouldBe Seq(
      ("o_custkey", 4L, 2L, false, 500000L),
      ("o_custkey,o_orderdate", 4L, 3L, false, 250000L),
      ("o_orderdate", 4L, 2L, false, 500000L),
      ("o_orderkey", 4L, 4L, true, 0L),
      ("o_orderstatus,o_orderpriority", 4L, 2L, false, 500000L))
  }

  test("q161 estimates hand-built edges exactly when every key is a hitter") {
    val tmp = java.nio.file.Files.createTempDirectory("q161inv").toString
    // at 9 rows the 1/500 threshold makes every key a heavy hitter, so
    // the estimate must equal Σ cA·cB exactly — including a planted
    // A-side hitter (orderkey 9, custkey 20) with NO parent: its
    // containment term multiplies into an empty residual (ndv = 0) and
    // must contribute 0, exactly as it does to the true cardinality
    Seq(1L, 1L, 1L, 2L, 9L).map(k => (k, 100L, 7L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq(Tuple1(10L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    Seq((1L, ts(0), 1L, "a", 1.0, ""), (2L, ts(60), 1L, "a", 1.0, ""),
      (3L, ts(120), 2L, "a", 1.0, ""), (4L, ts(180), 3L, "b", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q161_join_estimate")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("e1_lineitem_orders_orderkey", 4L, 4L, 0L),
      ("e2_orders_customer_custkey", 2L, 2L, 0L),
      ("e3_events_self_user_id", 6L, 6L, 0L),
      ("e4_events_self_event_type", 10L, 10L, 0L))
  }

  test("q161 exact cardinalities reconcile with directly materialized joins") {
    val dir = "/root/testdata/sf0.001"
    val rows = Registry.queries("q161_join_estimate")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    import graft.analytics.Tables
    val li = Tables.rd(spark, dir, "lineitem")
    val o = Tables.rd(spark, dir, "orders")
    rows("e1_lineitem_orders_orderkey")._1 shouldBe
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    val ev = Tables.events(spark, dir)
    val sumSq = ev.groupBy("event_type").count()
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("count") *
          org.apache.spark.sql.functions.col("count"))).head.getLong(0)
    rows("e4_events_self_event_type")._1 shouldBe sumSq
    rows.values.foreach { case (exact, est, err) =>
      exact should be > 0L
      est should be > 0L
      err shouldBe math.abs(est - exact) * 1000000L / exact
    }
  }

  test("t43 continuation/fertility counts on a hand-built bigram type set") {
    val tmp = java.nio.file.Files.createTempDirectory("t43inv").toString
    // bigram TYPES: (a,b) (c,b) (b,a) — doc 4 is sub-bigram and drops.
    // cont: b←{a,c}=2, a←{b}=1, c←{}=0; fert: a→1, b→1, c→1; total = 3.
    Seq((1L, "a b", "en", "s0", 3L), (2L, "c b", "en", "s0", 3L),
      (3L, "b a", "en", "s0", 3L), (4L, "x", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("t43_kneser_ney")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("a", 1L, 1L, 333333L),
      ("b", 2L, 1L, 666666L),
      ("c", 0L, 1L, 0L))
  }

  test("q162 scores five cleanly separated users onto the RFM diagonal") {
    val tmp = java.nio.file.Files.createTempDirectory("q162inv").toString
    // user u: u events, last at u·1000 s, each worth u·10 → every
    // quintile boundary falls strictly between adjacent users, so user u
    // scores exactly (u,u,u) and monetary u²·10 survives to its segment
    val rows = for { u <- 1 to 5; i <- 1 to u } yield
      ((u * 10 + i).toLong, ts(u * 1000L - (u - i) * 60L), u.toLong, "buy",
        u * 10.0, "")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q162_rfm_segments")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out.toSeq shouldBe Seq(
      ("1-1-1", 1L, 10.0), ("2-2-2", 1L, 40.0), ("3-3-3", 1L, 90.0),
      ("4-4-4", 1L, 160.0), ("5-5-5", 1L, 250.0))
  }

  test("q163 attributes each planted contract violation to exactly its rule") {
    val tmp = java.nio.file.Files.createTempDirectory("q163inv").toString
    // one violation per rule: NULL key (r01), negative price (r02),
    // status 'X' (r03), quantity 99 (r04), discount 0.5 (r05),
    // returnflag 'Z' (r06), a 1999 timestamp (r07)
    Seq((Option(1L), 10.0, "O"), (Option.empty[Long], 20.0, "F"),
      (Option(3L), -5.0, "X"))
      .toDF("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    Seq((1.0, 0.05, "N"), (99.0, 0.5, "Z"))
      .toDF("l_quantity", "l_discount", "l_returnflag")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    Seq((1L, ts(915148800L), 1L, "a", 1.0, ""),   // 1999-01-01 → implausible
      (2L, ts(1704067200L), 1L, "a", 1.0, ""))    // 2024-01-01 → fine
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q163_contract_check")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    out.toSeq shouldBe Seq(
      ("r01_orderkey_not_null", "orders", 3L, 1L, false),
      ("r02_totalprice_positive", "orders", 3L, 1L, false),
      ("r03_status_domain", "orders", 3L, 1L, false),
      ("r04_quantity_range", "lineitem", 2L, 1L, false),
      ("r05_discount_range", "lineitem", 2L, 1L, false),
      ("r06_returnflag_domain", "lineitem", 2L, 1L, false),
      ("r07_ts_plausible", "events", 2L, 1L, false))
  }

  test("s27 usage cells reconcile with the registered s10 code assignments") {
    val dir = "/root/testdata/sf0.001"
    val s10 = Registry.queries("s10_pq_encode")(spark, dir).collect()
    val out = Registry.queries("s27_pq_distortion")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out should have size 4
    out.foreach { case (m, n, used, topCode, topShare, distortion) =>
      withClue(s"subspace $m: ") {
        n shouldBe s10.length.toLong
        // independent recount of the SAME codes s10 ships (column 1+m)
        val codes = s10.map(_.getLong(1 + m.toInt))
        used shouldBe codes.distinct.length.toLong
        val (mode, cnt) = codes.groupBy(identity).view.mapValues(_.length)
          .toSeq.maxBy { case (c, k) => (k, -c) }
        topCode shouldBe mode
        topShare shouldBe cnt.toLong * 1000000L / n
        distortion should be >= 0L
      }
    }
  }

  test("q164 routes each planted fault class to its rule, first match wins") {
    val tmp = java.nio.file.Files.createTempDirectory("q164inv").toString
    // batch = id % 3; id 69 → mod-23 negated value, 87 → mod-29 bad
    // type, 93 → mod-31 1999 timestamp, 1/2/3 → clean
    val good = ts(1704067200L) // 2024-01-01
    Seq(69L, 87L, 93L, 3L, 1L, 2L).map(id =>
      (id, good, 1L, "click", 5.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q164_stream_contract_gate")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      (0L, "ok", 1L, 3L),
      (0L, "r1_value_negative", 1L, 69L),
      (0L, "r2_type_domain", 1L, 87L),
      (0L, "r3_ts_implausible", 1L, 93L),
      (1L, "ok", 1L, 1L),
      (2L, "ok", 1L, 2L))
  }

  test("m18 separates byte-identical re-fetches from resized variants") {
    val tmp = java.nio.file.Files.createTempDirectory("m18inv").toString
    // id 7 and 91 → byte-identical re-fetch (91 is also ≡0 mod 13 — the
    // mod-7 branch wins); id 13 → resized re-fetch; id 1 → singleton
    Seq((1L, "alpha words", "en", "s0", 11L), (7L, "bravo words", "en", "s0", 11L),
      (13L, "delta words", "en", "s0", 11L), (91L, "gamma words", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("m18_template_captions")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("true_dup", 2L, 4L, 98L),
      ("variant", 1L, 2L, 13L))
  }

  test("q165 carries each account's close forward and sums across accounts") {
    val tmp = java.nio.file.Files.createTempDirectory("q165inv").toString
    // user 1: day 0 closes at 20 (last write wins), silent day 1, day 2
    // closes 30; user 2 activates day 1 at 5, silent day 2 → totals
    // 20 / 25 / 35 with account counts 1 / 2 / 2
    Seq((1L, ts(10), 1L, "a", 10.0, ""), (2L, ts(3600), 1L, "a", 20.0, ""),
      (3L, ts(86400 + 5), 2L, "a", 5.0, ""),
      (4L, ts(2 * 86400 + 5), 1L, "a", 30.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q165_semi_additive")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.toSeq shouldBe Seq((0L, 1L, 20.0), (1L, 2L, 25.0), (2L, 2L, 35.0))
  }

  test("q166 triages planted CSV faults; PERMISSIVE recovers well-formed fields") {
    val tmp = java.nio.file.Files.createTempDirectory("q166inv").toString
    // id 17 → type-garbage value; 19 → truncated line; 323 = 17·19 →
    // the mod-17 channel wins; 1, 2 → clean. The bad_value checksum
    // (17 + 323) pins that the parser recovered event_id from bad rows.
    Seq((1L, 1.5), (2L, 2.5), (17L, 9.9), (19L, 9.9), (323L, 9.9))
      .map { case (id, v) => (id, ts(1704067200L), 1L, "click", v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q166_csv_quarantine")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.toSeq shouldBe Seq(
      ("bad_value", 2L, 340L, 0.0),
      ("ok", 2L, 3L, 4.0),
      ("short_row", 1L, 19L, 0.0))
  }

  test("q167 locates a planted level shift and stays flat on a flat series") {
    val tmp = java.nio.file.Files.createTempDirectory("q167inv").toString
    // 'shift': 4 days at 10 then 4 at 30 → target 20, drawup 1000·k
    // after the shift → max 4000 cents at day 7. 'flat': all-zero CUSUM,
    // argmax tie breaks to the earliest day.
    val shift = (0 until 8).map(k =>
      ((k + 1).toLong, ts(k * 86400L + 10), 1L, "shift",
        if (k < 4) 10.0 else 30.0, ""))
    val flat = (0 until 4).map(k =>
      ((100 + k).toLong, ts(k * 86400L + 20), 2L, "flat", 10.0, ""))
    (shift ++ flat)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q167_cusum_changepoint")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(("flat", 4L, 0L, 0L), ("shift", 8L, 4000L, 7L))
  }

  test("s28 equals s04 minus tombstones: prefix property, none surface") {
    val dir = "/root/testdata/sf0.001"
    val s04 = Registry.queries("s04_ivf_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val s28 = Registry.queries("s28_tombstone_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    s28.values.flatten.foreach { case (_, cId) => cId % 9 should not be 0L }
    // deleting candidates never reorders survivors: s04's non-deleted
    // top-5 entries, in order, are a prefix of s28's ranking
    s04.foreach { case (qId, rows) =>
      val survivors = rows.map(_._2).filter(_ % 9 != 0)
      withClue(s"query $qId: ") {
        s28(qId).map(_._2).take(survivors.length).toSeq shouldBe survivors.toSeq
      }
    }
  }

  test("d39 prices a planted hot bucket and holds the band identities") {
    val tmp = java.nio.file.Files.createTempDirectory("d39inv").toString
    // 10 byte-identical docs share every minhash → every band has a
    // bucket of ≥ 10 → pairs_bound ≥ 45 per band; 5 distinct docs fill
    // the rest. n_docs must equal the signed population in EVERY band.
    val hot = (1 to 10).map(i =>
      (i.toLong, "the fast query scans the wide table", "en", "s0", 35L))
    val cold = (11 to 15).map(i =>
      (i.toLong, s"unique doc $i with filter merge join sort batch", "en", "s0", 40L))
    (hot ++ cold).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d39_lsh_bucket_audit")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // band_idx -1 is the SimHash bucket table (r17 extension); 0..3 the
    // MinHash bands
    out.map(_._1).toSeq shouldBe Seq(-1L, 0L, 1L, 2L, 3L)
    out.foreach { case (idx, nBuckets, nDocs, maxB, pairsBound, share,
        pairsCapped, keptPpm) =>
      withClue(s"band $idx: ") {
        nDocs shouldBe 15L
        maxB should be >= 10L
        nBuckets should be <= 6L // 10 identical + ≤ 5 singleton buckets
        pairsBound should be >= 45L
        share shouldBe maxB * 1000000L / 15L
        // every bucket here is far under the production cap (128): the
        // capped generator sacrifices nothing on this fixture
        pairsCapped shouldBe pairsBound
        keptPpm shouldBe 1000000L
      }
    }
  }

  test("t44 coverage equals an independent per-side n-gram type recount") {
    val tmp = java.nio.file.Files.createTempDirectory("t44inv").toString
    val texts = (1 to 12).map { i =>
      (i.toLong, s"alpha beta gamma delta tail$i extra words here", "en", "s0", 40L)
    }
    texts.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // learn each doc's split side through the registered hash, then
    // recount the per-order type sets independently in plain Scala
    val side = spark.read.parquet(s"$tmp/documents.parquet")
      .selectExpr("doc_id",
        s"${graft.analytics.Tables.strHashExpr("CAST(doc_id AS STRING)")} % 10 < 8 AS tr")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expected = (1 to 4).map { n =>
      def types(train: Boolean) = texts
        .filter(t => side(t._1) == train)
        .flatMap(_._2.split(" ").sliding(n).map(_.mkString(" ")))
        .toSet
      val (tr, te) = (types(true), types(false))
      val cov = (tr & te).size.toLong
      (n.toLong, tr.size.toLong, te.size.toLong, cov, cov * 1000000L / te.size)
    }
    assert(side.values.exists(identity) && side.values.exists(!_),
      "fixture must populate both split sides")
    val out = Registry.queries("t44_ngram_coverage")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.toSeq shouldBe expected
  }

  test("d40 caps the planted hot bucket and prices the sacrifice exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("d40inv").toString
    val hot = (1 to 10).map(i =>
      (i.toLong, "the fast query scans the wide table", "en", "s0", 35L))
    val cold = (11 to 15).map(i =>
      (i.toLong, s"unique doc $i with filter merge join sort batch", "en", "s0", 40L))
    (hot ++ cold).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d40_bucket_split_pairs")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    out.foreach { case (idx, before, after, ppm) =>
      withClue(s"band $idx: ") {
        before should be >= 45L // the size-10 bucket alone
        after should be <= before
        ppm shouldBe after * 1000000L / before
        // k = ⌈10/3⌉ = 4 sub-buckets over 10 docs: by pigeonhole the
        // largest sub holds ≤ 10 − 3 = 7 docs, so at least
        // C(10,2) − C(7,2) − C(3,2)·… pairs go; the loose safe bound is
        // after ≤ before − 9 (the minimum sacrifice when subs are 7+1+1+1)
        after should be <= before - 9L
      }
    }
  }

  test("q168 emits a salt map only for keys over the per-task target") {
    val tmp = java.nio.file.Files.createTempDirectory("q168inv").toString
    // events: 360 'hot' + 40 singleton types → total 400, target 2 →
    // hot salts at 180, singletons (cnt 1) stay unflagged.
    val ev = (1 to 360).map(i =>
      (i.toLong, ts(i * 60L), 1L, "hot", 1.0, "")) ++
      (1 to 40).map(i => ((1000 + i).toLong, ts(i * 60L), 1L, s"t$i", 1.0, ""))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    // orders: strictly unique custkeys → cnt 1 everywhere → empty side
    (1 to 30).map(i => (i.toLong, (100 + i).toLong))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Registry.queries("q168_salt_planner")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(("events.event_type", "hot", 360L, 180L))
  }

  test("s29 curve rows partition the corpus and bound recall") {
    val dir = "/root/testdata/sf0.001"
    val n = Registry.queries("d04_simhash")(spark, dir).sparkSession
      .read.parquet(s"$dir/embeddings.parquet").count()
    val out = Registry.queries("s29_delete_recall_curve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.map(_._1).toSeq shouldBe Seq(2L, 3L, 5L, 9L)
    out.foreach { case (m, deleted, live, recall) =>
      withClue(s"mod $m: ") {
        deleted + live shouldBe n
        deleted shouldBe (0L until n).count(_ % m == 0).toLong
        recall should be >= 0L
        recall should be <= 1000000L
      }
    }
  }

  test("q169 enriches each event with the dim version valid at EVENT time") {
    val tmp = java.nio.file.Files.createTempDirectory("q169inv").toString
    // span [0 s, 100 s] → mid = 50 s; events straddle it per user, and
    // batch = id % 3 scatters versions across batches
    Seq((3L, ts(0), 1L, "a", 1.0, ""), (4L, ts(100), 1L, "a", 2.0, ""),
      (5L, ts(40), 2L, "a", 3.0, ""), (6L, ts(60), 2L, "a", 4.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q169_stream_temporal_enrich")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.toSeq shouldBe Seq(
      (0L, 1L, 1L, 100L, 3L),   // id 3 at t=0  → v1 of user 1 (tier 1)
      (0L, 12L, 1L, 400L, 6L),  // id 6 at t=60 → v2 of user 2 (tier 12)
      (1L, 11L, 1L, 200L, 4L),  // id 4 at t=100 → v2 of user 1
      (2L, 2L, 1L, 300L, 5L))   // id 5 at t=40 → v1 of user 2
  }

  test("q170 manifest reconciles with d33 populations and its own bounds") {
    val dir = "/root/testdata/sf0.001"
    val d33 = Registry.queries("d33_soft_dedup_weights")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tok = graft.analytics.Tables.docs(spark, dir)
      .selectExpr("source", "CAST(size(split(text, ' ')) AS LONG) AS t")
      .groupBy("source").agg(org.apache.spark.sql.functions.sum("t").as("nt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Registry.queries("q170_training_manifest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    out.map(_._1).toSet shouldBe d33.keySet
    out.foreach { case (src, nDocs, nTokens, eff, quota, share) =>
      withClue(s"source $src: ") {
        nDocs shouldBe d33(src)              // same population as d33
        nTokens shouldBe tok(src)            // independent token recount
        eff should be <= nTokens * 1000000L  // weights never exceed 1
        // the mixing rate is bounded in [10, 89] by construction
        quota should be >= eff * 10L
        quota should be <= eff * 89L
      }
    }
    // floor divisions undershoot by < 1 ppm per source
    val shares = out.map(_._6).sum
    shares should be <= 1000000L
    shares should be >= 1000000L - out.length
  }

  test("q171 diffs only the planted buckets and classifies every mutation") {
    val tmp = java.nio.file.Files.createTempDirectory("q171inv").toString
    // keys 1/2/64 untouched (buckets 1, 2, 0 must NOT differ); 41 →
    // changed, 43 → removed, 47 → added twin at 1000047 (bucket 47)
    Seq(1L, 2L, 41L, 43L, 47L, 64L).map(k => (k, 10.0))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Registry.queries("q171_table_diff")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq(
      ("added", 1L, 1000047L),
      ("buckets_differing", 3L, 131L), // buckets 41 + 43 + 47
      ("changed", 1L, 41L),
      ("removed", 1L, 43L))
  }

  test("s30 counts nested radii exactly on hand-placed directions") {
    val tmp = java.nio.file.Files.createTempDirectory("s30inv").toString
    def v(a: Float, b: Float) =
      Array.tabulate(64)(i => if (i == 0) a else if (i == 1) b else 0.0f)
    // anchor 0 sees: dup (cos 1), a 12-13-5 direction (cos ≈ .923), a
    // 3-4-5 direction (cos .6); anchor 1 sees the 3-4-5 at exactly .8
    Seq((0L, v(1f, 0f), 0), (1L, v(0f, 1f), 0), (8L, v(1f, 0f), 1),
      (9L, v(12f / 13f, 5f / 13f), 1), (10L, v(0.6f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = Registry.queries("s30_radius_search")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    out.toSeq shouldBe Seq(
      (0L, 2L, 2L, 1L, 8L),
      (1L, 1L, 0L, 0L, 0L))
  }

  test("q172 triages the metronome, the burster, and the human exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("q172inv").toString
    val rows =
      // user 1: 5 events every 10 s exactly → zero variance → bot
      (1 to 5).map(i => (i.toLong, i * 10.0, 1L)) ++
      // user 2: gaps 0.1 / 0.4 / 0.9 s → cv² = 50% but mean < 1 s → burst
      Seq((11L, 0.0, 2L), (12L, 0.1, 2L), (13L, 0.5, 2L), (14L, 1.4, 2L)) ++
      // user 3: the same shape ×100 → cv² = 50%, mean 46.6 s → human
      Seq((21L, 0.0, 3L), (22L, 10.0, 3L), (23L, 50.0, 3L), (24L, 140.0, 3L)) ++
      // user 4: one gap only → below the n_gaps ≥ 3 floor, excluded
      Seq((31L, 0.0, 4L), (32L, 60.0, 4L))
    rows.map { case (id, sec, u) =>
      (id, java.sql.Timestamp.from(
        java.time.Instant.ofEpochMilli((sec * 1000).toLong)), u, "a", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q172_bot_screen")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq(
      ("bot", 1L, 5L, 1L),
      ("burst", 1L, 4L, 2L),
      ("human", 1L, 4L, 3L))
  }

  test("m17 token budget reconciles with m14's geometry and the grid bounds") {
    val dir = "/root/testdata/sf0.001"
    val m17 = Registry.queries("m17_vision_token_budget")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val m14 = Registry.queries("m14_aspect_bucket_pack")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    m17.map(_._1).toSet shouldBe m14.keySet
    m17.foreach { case (bucket, n, px, t14, t16, max14, ratio) =>
      withClue(s"bucket $bucket: ") {
        // same population and pixel mass as the packer's view
        (n, px) shouldBe m14(bucket)
        // dims are 64..512 → per-image grid between ⌈64/14⌉² and ⌈512/14⌉²
        t14 should be >= n * 25L
        max14 should be <= 1369L
        // a 16-px patch never needs more tokens than a 14-px patch
        t16 should be <= t14
        ratio shouldBe t14 * 1000000L / (n * 1024L)
      }
    }
  }

  test("cappedSelfPairs bounds a hot identical-simhash bucket, keeping only same-sub pairs") {
    import org.apache.spark.sql.functions._
    // 300 docs with IDENTICAL simhash — one template family in one
    // Hamming bucket. Uncapped, the self-join emits 300·299/2 = 44850
    // pairs; the production cap (128) splits the bucket into
    // ⌈300/128⌉ = 3 hash sub-cells and only same-cell pairs survive.
    val sigs = (1 to 300).map(i => (i.toLong, (42L << 8) + 7L))
      .toDF("doc_id", "simhash")
      .withColumn("bucket", expr("shiftright(simhash, 8)"))
    val pairs = graft.analytics.Dedup.cappedSelfPairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // cell assignment via the same content-independent doc hash the
    // generator uses (k = 3 for this bucket)
    val cell = sigs.selectExpr("doc_id", "poly_hash(CAST(doc_id AS STRING)) % 3 AS c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = cell.values.groupBy(identity).values.map(_.size.toLong)
      .map(c => c * (c - 1) / 2).sum
    pairs.length.toLong shouldBe expected
    pairs.length should be < 44850
    // every surviving pair is same-cell (cross-sub pairs sacrificed)
    pairs.foreach { case (a, b) => cell(a) shouldBe cell(b) }
  }

  test("d41 rotated table finds the high-byte pair the base table structurally misses") {
    import org.apache.spark.sql.functions._
    // doc 1/4 identical; doc 2 differs from 1 ONLY in the high byte
    // (hamming 1, invisible to the high-byte bucket); doc 3 differs from
    // 1 only in the low byte (hamming 2, invisible to the rot-8 table)
    val sigs = Seq((1L, 0x0341L), (2L, 0x4341L), (3L, 0x0342L), (4L, 0x0341L))
      .toDF("doc_id", "simhash")
    // base single-table scheme: misses (1,2) — diffs in the high byte
    val base = graft.analytics.Dedup.cappedSelfPairs(
      sigs.withColumn("bucket", expr("shiftright(simhash, 8)")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.contains((1L, 2L)) shouldBe false
    base should contain allOf ((1L, 3L), (1L, 4L))
    // rotated 2-table scheme: finds it, and reports which pairs only one
    // table could see (n_tables = 1) vs both (identical pair, n = 2)
    val rot = graft.analytics.Dedup.simhashRotatedPairsOf(sigs)
      .orderBy(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    rot shouldBe Seq(
      (1L, 2L, 1L, 1L), // high-byte diff: rot-8 table only
      (1L, 3L, 2L, 1L), // low-byte diff: base table only
      (1L, 4L, 0L, 2L), // identical: both tables
      (2L, 4L, 1L, 1L),
      (3L, 4L, 2L, 1L))
    // (2,3) straddles the byte boundary — found by NEITHER table; the
    // scheme's residual blind spot, priced by d35's detector-agreement
    rot.map(p => (p._1, p._2)).contains((2L, 3L)) shouldBe false
  }

  test("d42 star contraction labels an adversarial chain in O(log) rounds, agreeing with min-label CC") {
    // a 64-node path: diameter 63 — the topology diameter-bounded loops
    // pay for, and the one star contraction must beat
    val chain = (0L until 63L).map(i => (i, i + 1))
    // plus a disjoint second component with min 100 (star + extra edge)
    val edges = (chain ++ Seq((100L, 101L), (100L, 102L), (200L, 101L)))
      .toDF("id1", "id2")
    val (labelsDf, rounds) =
      graft.operators.StarContraction.labelWithRounds(edges)
    val star = labelsDf.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    star.keySet shouldBe ((0L to 63L).toSet ++ Set(100L, 101L, 102L, 200L))
    (0L to 63L).foreach(n => star(n) shouldBe 0L)
    Seq(100L, 101L, 102L, 200L).foreach(n => star(n) shouldBe 100L)
    // O(log² n) bound, far under the chain's diameter
    rounds should be <= 8
    // algorithm-independent agreement with the deployed min-label CC
    val cc = graft.operators.ConnectedComponents.label(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    cc shouldBe star
  }

  test("q177 water-fills the hand-derivable allocation exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("q177inv").toString
    // demands 1/2/10/100 (tenants 1..4), capacity = 113 DIV 2 = 56:
    // j = 3 (the first three fit under the level), level t = 56−13 = 43,
    // leftover 0 → shares 1, 2, 10, 43 and only the whale is saturated
    val rows = Seq((1L, 1)) ++ Seq.fill(2)((2L, 1)) ++
      Seq.fill(10)((3L, 1)) ++ Seq.fill(100)((4L, 1))
    rows.zipWithIndex.map { case ((u, _), i) =>
      (i.toLong, ts(i * 60), u, "click", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.queries("q177_fair_share")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    out shouldBe Seq(
      (1L, 1L, 1L, false),
      (2L, 2L, 2L, false),
      (3L, 10L, 10L, false),
      (4L, 100L, 43L, true))
    // conservation: allocated exactly the capacity
    out.map(_._3).sum shouldBe 56L
  }

  test("s33 recall curve is monotone in nprobe and consistent with s32 at nprobe 2") {
    val dir = "/root/testdata/sf0.001"
    val curve = Registry.queries("s33_filtered_probe_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    curve.map(_._1) shouldBe Seq(1L, 2L, 3L, 4L)
    // probing more cells can only add candidates: hits (hence recall)
    // are monotone nondecreasing, and every variant shares one truth
    curve.map(_._2).distinct should have size 1
    curve.map(_._3) shouldBe curve.map(_._3).sorted
    curve.foreach { case (_, nt, nh, ppm) =>
      nh should be <= nt
      ppm shouldBe nh * 1000000L / nt
    }
    // s32 is the same composed path at nprobe = 2 — totals must agree
    val s32hits = Registry.queries("s32_production_search")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    s32hits.map(_._1).sum shouldBe curve.find(_._1 == 2L).get._2
    s32hits.map(_._2).sum shouldBe curve.find(_._1 == 2L).get._3
  }

  test("d43 budget truncates a planted hot index bucket and prices the lost matches") {
    val tmp = java.nio.file.Files.createTempDirectory("d43inv").toString
    // 10 byte-identical EVEN docs form a hot index bucket in every band;
    // ONE identical odd doc is the delta that probes it. Unique odd/even
    // docs pad the corpus so the audit isn't degenerate.
    val hotIdx = (1 to 10).map(i =>
      (2L * i, "the fast query scans the wide table", "en", "s0", 35L))
    val delta = Seq((1L, "the fast query scans the wide table", "en", "s0", 35L))
    val pad = (30 to 40).map(i =>
      (i.toLong, s"unique doc $i with filter merge join sort batch", "en", "s0", 40L))
    (hotIdx ++ delta ++ pad).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Registry.queries("d43_probe_budget")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    out.map(_._1).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    out.foreach { case (idx, full, budget, keptPpm, mFull, mBudget) =>
      withClue(s"band $idx: ") {
        // the delta doc meets all 10 identical index entries un-budgeted
        full should be >= 10L
        mFull should be >= 10L
        // the budget admits exactly 2 of the hot bucket
        budget should be <= (full - 8L)
        mBudget should be <= (mFull - 8L)
        keptPpm should be < 1000000L
        keptPpm shouldBe budget * 1000000L / full
      }
    }
  }
}
