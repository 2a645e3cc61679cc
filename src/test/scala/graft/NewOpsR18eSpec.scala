package graft

import graft.analytics.Registry

/** Algebra invariants for the round-18 wave-E operators: the streaming
  * expiry gate's ledger≡rebuild proof and retention progression (q199),
  * cluster-stability identities (d52), entropy-rate inequalities (t53),
  * shot-segmentation accounting (m24), and the adaptive-nprobe margin
  * curve's monotonicity (s43). All run on the sf0.001 fixtures. */
class NewOpsR18eSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q199 stream expiry: ledger folds match rebuilds, expiry emerges at batch 2") {
    val rows = Registry.queries("q199_stream_expiry_gate")(spark, dir).collect()
    rows.map(_.getAs[Long]("batch_id")).sorted shouldBe Array(0L, 1L, 2L)
    rows.foreach { r =>
      withClue(s"batch ${r.getAs[Long]("batch_id")}: ") {
        r.getAs[Boolean]("matches_rebuild") shouldBe true
        r.getAs[Long]("max_ver") shouldBe 2 * r.getAs[Long]("batch_id") + 2
      }
    }
    // keep-last-3 retains every version present in the first two
    // prefixes, so nothing is expirable before the third batch
    val byBatch = rows.map(r => r.getAs[Long]("batch_id") -> r).toMap
    byBatch(0L).getAs[Long]("n_deletable") shouldBe 0L
    byBatch(1L).getAs[Long]("n_deletable") shouldBe 0L
    byBatch(2L).getAs[Long]("n_deletable") should be > 0L
    // the op stream only grows
    rows.sortBy(_.getAs[Long]("batch_id")).map(_.getAs[Long]("n_ops"))
      .sliding(2).foreach { case Array(a, b) => b should be > a }
  }

  test("d52 cluster stability: pair-count identities hold and the metric is a Jaccard") {
    val r = Registry.queries("d52_cluster_stability")(spark, dir).collect().head
    val (pf, ps, pb) = (r.getAs[Long]("pairs_full"), r.getAs[Long]("pairs_sub"),
      r.getAs[Long]("pairs_both"))
    // the contingency refines both marginals
    pb should be <= pf
    pb should be <= ps
    r.getAs[Long]("stability_ppm") should be <= 1000000L
    r.getAs[Long]("stability_ppm") should be >= 0L
    // splits and stability must agree: a perfectly stable partition has
    // no split clusters and identical pair counts
    if (r.getAs[Long]("stability_ppm") == 1000000L) {
      r.getAs[Long]("n_split_clusters") shouldBe 0L
      pf shouldBe pb
      ps shouldBe pb
    }
    r.getAs[Long]("n_clusters_sub") should be >= r.getAs[Long]("n_clusters_full")
  }

  test("t53 entropy rate: conditioning never increases entropy, redundancy in (0,1)") {
    val rows = Registry.queries("t53_entropy_rate")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"source ${r.getAs[String]("source")}: ") {
        val hu = r.getAs[Double]("h_uni")
        val hc = r.getAs[Double]("h_cond")
        hu should be > 0.0
        // H(W2|W1) <= H(W2) ~= H(W) — conditioning cannot add entropy
        // (quantized logs can drift the bound by ~1e-4 nats; allow that)
        hc should be <= hu + 0.001
        val red = r.getAs[Double]("redundancy")
        red should be > 0.0
        red should be <= 1.0
      }
    }
  }

  test("m24 shot boundaries: totals fold, shot accounting is exact per video") {
    val rows = Registry.queries("m24_shot_boundaries")(spark, dir).collect()
    val (total, videos) = rows.partition(_.getAs[Long]("media_id") == -1L)
    total should have length 1
    videos should not be empty
    videos.foreach { r =>
      withClue(s"video ${r.getAs[Long]("media_id")}: ") {
        r.getAs[Long]("n_shots") should be >= 1L
        r.getAs[Long]("n_shots") should be <= r.getAs[Long]("n_frames")
        r.getAs[Long]("max_shot_len") should be <= r.getAs[Long]("n_frames")
        // mean shot length × shots covers the frames exactly (x1000 floor)
        r.getAs[Long]("avg_shot_len_x1000") shouldBe
          r.getAs[Long]("n_frames") * 1000 / r.getAs[Long]("n_shots")
      }
    }
    total.head.getAs[Long]("n_frames") shouldBe videos.map(_.getAs[Long]("n_frames")).sum
    total.head.getAs[Long]("n_shots") shouldBe videos.map(_.getAs[Long]("n_shots")).sum
    // the detector must actually cut somewhere on this corpus
    videos.map(_.getAs[Long]("n_shots")).max should be > 1L
  }

  test("s43 adaptive nprobe: wider margins probe more and never lose recall") {
    val rows = Registry.queries("s43_adaptive_nprobe")(spark, dir).collect()
    rows.length shouldBe 24 // 3 margins × 8 queries
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("margin_x100"))
      withClue(s"query $qid: ") {
        sorted.sliding(2).foreach { case Array(a, b) =>
          // a wider stop margin can only extend the probed prefix
          b.getAs[Long]("n_cells_probed") should be >= a.getAs[Long]("n_cells_probed")
          b.getAs[Long]("n_candidates") should be >= a.getAs[Long]("n_candidates")
          b.getAs[Long]("recall5_ppm") should be >= a.getAs[Long]("recall5_ppm")
        }
        sorted.foreach { r =>
          r.getAs[Long]("n_cells_probed") should be >= 1L
          r.getAs[Long]("recall5_ppm") should be <= 1000000L
        }
      }
    }
    // the sweep must show a real trade on this corpus: the widest margin
    // buys strictly more recall than the tightest somewhere
    val tight = rows.filter(_.getAs[Long]("margin_x100") == 5L)
      .map(_.getAs[Long]("recall5_ppm")).sum
    val wide = rows.filter(_.getAs[Long]("margin_x100") == 30L)
      .map(_.getAs[Long]("recall5_ppm")).sum
    wide should be > tight
  }
}
