package graft

import graft.analytics.Registry

/** Algebra invariants for the round-19 operators, beyond the oracles'
  * cross-engine equality: q203's per-phase maintenance invariants and
  * its planted hazards, s46's nested-candidate recall monotonicity,
  * and q204's shuffle balance/decorrelation facts. All run on the
  * sf0.001 fixtures. */
class NewOpsR19Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q203 maintenance session: every phase invariant holds, hazards fire") {
    val rows = Registry.queries("q203_maintenance_session")(spark, dir).collect()
    rows.length shouldBe 6
    val byPhase = rows.map(r => r.getAs[String]("phase") -> r).toMap
    // per-phase ok is that phase's invariant: MOR==eager, compaction
    // content-preserving, expiry reclaims the compacted originals,
    // vacuum never touches referenced files, OCC verdict consistent,
    // end-to-end digest equality
    rows.foreach { r =>
      withClue(s"phase ${r.getAs[String]("phase")}: ") {
        r.getAs[Boolean]("ok") shouldBe true
      }
    }
    // the full-file recall (%32 = 3) is the only file over the 20% bar
    // at this SF, and it is FULLY deleted -> its compaction adds no
    // gen-2 rows (the planted empty-file hazard)
    byPhase("b_compaction").getAs[Long]("n_a") shouldBe 1L
    byPhase("b_compaction").getAs[Long]("n_b") shouldBe 0L
    // expiry reclaims exactly the rewritten base file + its DV sidecar
    byPhase("c_expiry").getAs[Long]("n_b") shouldBe 2L
    // vacuum: one aged temp swept, one young temp kept per rewritten file
    byPhase("d_vacuum").getAs[Long]("n_b") shouldBe 1L
    byPhase("d_vacuum").getAs[Long]("n_c") shouldBe 1L
    // e_occ's ok IS the conflict flag; n_b is the overlapping-file count
    byPhase("e_occ").getAs[Boolean]("ok") shouldBe
      (byPhase("e_occ").getAs[Long]("n_b") > 0L)
    // the session never invents or loses rows: final live count equals
    // the DV-delete phase's live mass (W updates in place)
    byPhase("z_session").getAs[Long]("n_a") should be > 0L
  }

  test("s46 rerank depth: recall monotone non-decreasing in R, serving exactly k") {
    val rows = Registry.queries("s46_rerank_depth")(spark, dir).collect()
    rows.length shouldBe 4
    rows.foreach { r =>
      withClue(s"depth ${r.getAs[Long]("r_depth")}: ") {
        // 8 anchors x top-5 re-ranked answers served at every depth
        r.getAs[Long]("n_served") shouldBe 40L
        r.getAs[Long]("fetches_per_q") shouldBe r.getAs[Long]("r_depth")
      }
    }
    val byDepth = rows.sortBy(_.getAs[Long]("r_depth")).map(_.getAs[Long]("recall_ppm"))
    // candidate sets are nested, so re-ranked recall cannot drop with R
    byDepth.sliding(2).foreach { case Array(lo, hi) =>
      hi should be >= lo
    }
    // deeper re-ranking must actually buy something on this fixture —
    // a flat curve means the coarse scorer is secretly exact and the
    // query measures nothing
    withClue("recall flat across all depths: ") {
      byDepth.distinct.length should be > 1
    }
  }

  test("q204 epoch shuffle: balanced fill, mix within TV bounds, epochs decorrelate") {
    val rows = Registry.queries("q204_epoch_shuffle")(spark, dir).collect()
    val (total, batches) = rows.partition(_.getAs[Long]("batch") == -1L)
    total should have length 1
    batches.length shouldBe 16 // all batches occupied at 500 docs
    total.head.getAs[Long]("n_docs") shouldBe batches.map(_.getAs[Long]("n_docs")).sum
    total.head.getAs[Long]("tok_mass") shouldBe batches.map(_.getAs[Long]("tok_mass")).sum
    total.head.getAs[Long]("tv_ppm") shouldBe batches.map(_.getAs[Long]("tv_ppm")).max
    batches.foreach { b =>
      withClue(s"batch ${b.getAs[Long]("batch")}: ") {
        b.getAs[Long]("n_docs") should be > 0L
        b.getAs[Long]("n_sources") should be > 0L
        // TV against the corpus mix is a proper fraction in ppm
        b.getAs[Long]("tv_ppm") should (be >= 0L and be <= 1000000L)
      }
    }
    // epoch-2 reseeding moves ~15/16 of docs; binomial 3-sigma at N=500
    total.head.getAs[Long]("moved_ppm") should (be > 850000L and be < 995000L)
  }

  test("d56 residual audit: survivor universe shrinks, counts fold, rate identity") {
    val rows = Registry.queries("d56_residual_dup_audit")(spark, dir).collect()
    rows.length shouldBe 3
    val m = rows.map(r => r.getAs[String]("stage") -> r).toMap
    val nb = m("a_before").getAs[Long]("n_docs")
    val pb = m("a_before").getAs[Long]("n_pairs")
    val na = m("b_after").getAs[Long]("n_docs")
    val pa = m("b_after").getAs[Long]("n_pairs")
    nb should be > 0L
    na should be <= nb
    // uncapped at this SF: survivor pairs are a subset of before pairs
    pa should be <= pb
    m("z_verdict").getAs[Long]("n_docs") shouldBe nb - na
    m("z_verdict").getAs[Long]("n_pairs") shouldBe pb - pa
    m("a_before").getAs[Long]("rate_ppm") shouldBe pb * 1000000L / (nb * (nb - 1) / 2)
    // every residual pair is by construction a pair the deployed
    // detector never saw; on this corpus the pass is recall-dominant
    m("z_verdict").getAs[Long]("residual_share_ppm") should be < 500000L
  }

  test("persisted edge index: repeat calls agree and survive caller unpersist") {
    // the r19 persisted-index contract: simhashPairs computes once per
    // (JVM, sfDir) and later calls read the same stored edge list — in
    // particular a consumer's historical unpersist() must NOT evict it
    val p1 = graft.analytics.Dedup.simhashPairs(spark, dir)
    val c1 = p1.count()
    c1 should be > 0L
    p1.unpersist()
    val p2 = graft.analytics.Dedup.simhashPairs(spark, dir)
    p2.count() shouldBe c1
    p2.except(p1).count() shouldBe 0L
    p1.except(p2).count() shouldBe 0L
    // the bipartite CC index (private) gets the same contract through
    // its consumer: two d49 runs must return identical rows
    val r1 = Registry.queries("d49_bipartite_components")(spark, dir).collect()
    val r2 = Registry.queries("d49_bipartite_components")(spark, dir).collect()
    r1 should contain theSameElementsInOrderAs r2
  }
}
