package graft

import graft.analytics.Registry

/** Algebra invariants for the round-20 operators, beyond the oracles'
  * cross-engine equality: q205's per-phase streaming-maintenance hazards
  * (replay no-op, expired-but-referenced retention, late routing vs the
  * deterministic replay), m26's hysteresis/dead-band facts, and s47's
  * per-family recall monotonicity plus the Pareto-dominance audit. All
  * run on the sf0.001 fixtures. */
class NewOpsR20Spec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q205 streaming maintenance: every phase invariant holds, hazards fire") {
    val rows = Registry.queries("q205_stream_maintenance")(spark, dir).collect()
    rows.length shouldBe 5
    val m = rows.map(r => r.getAs[String]("phase") -> r).toMap
    // per-phase ok IS the phase's invariant: merged state == one-shot
    // batch answer, replay is a digest-stable no-op, retention holds
    // exactly {v1, v2}, ledger fold == deterministic replay, and
    // conservation (admitted + routed = total)
    rows.foreach { r =>
      withClue(s"phase ${r.getAs[String]("phase")}: ") {
        r.getAs[Boolean]("ok") shouldBe true
      }
    }
    // the late-data hazard actually fires at this SF (the jitter is an
    // id-scale-free modular scramble precisely so this is nonzero)
    m("d_late_routing").getAs[Long]("n_b") should be > 0L
    // ledger and replay agree row-for-row: routed counts identical
    m("d_late_routing").getAs[Long]("n_b") shouldBe
      m("d_late_routing").getAs[Long]("n_c")
    // the autotuner picked a tier strictly inside the sweep (neither
    // the tightest nor the lossless fallback) — the SLA bar does work
    m("a_merge").getAs[Long]("n_c") shouldBe 259200000000L
    // replay left exactly two retained versions (v0 reclaimed, v1 kept
    // for the CDC reader, v2 current) and did not append a third
    m("b_replay").getAs[Long]("n_c") shouldBe 2L
    m("c_expiry_cdc").getAs[Long]("n_a") shouldBe 2L
    m("c_expiry_cdc").getAs[Long]("n_c") shouldBe 1L
    // CDC across the retained pair is non-trivial: batch 2 touched keys
    m("c_expiry_cdc").getAs[Long]("n_b") should be > 0L
    // conservation: admitted + routed = total, and the state digest
    // column is shared between a_merge (pre-replay) and z (post-replay)
    m("z_session").getAs[Long]("n_a") shouldBe
      m("z_session").getAs[Long]("n_b") + m("z_session").getAs[Long]("n_c")
    m("z_session").getAs[Long]("ck") shouldBe m("a_merge").getAs[Long]("ck")
  }

  test("m26 speech segments: hysteresis dead band is real, totals fold") {
    val rows = Registry.queries("m26_speech_segments")(spark, dir).collect()
    val (totals, sources) = rows.partition(_.getAs[String]("source") == "z_total")
    totals should have length 1
    val t = totals.head
    // the z_total row folds the per-source rows exactly
    t.getAs[Long]("n_media") shouldBe sources.map(_.getAs[Long]("n_media")).sum
    t.getAs[Long]("n_frames") shouldBe sources.map(_.getAs[Long]("n_frames")).sum
    t.getAs[Long]("n_speech") shouldBe sources.map(_.getAs[Long]("n_speech")).sum
    t.getAs[Long]("n_segments") shouldBe
      sources.map(_.getAs[Long]("n_segments")).sum
    // the dead band carries real mass at this SF — a single-threshold
    // VAD would diverge from this output, which is the point of the
    // hysteresis machinery
    t.getAs[Long]("n_carry") should be > 0L
    // and the gate is not degenerate: speech is neither empty nor total
    t.getAs[Long]("n_speech") should be > 0L
    t.getAs[Long]("n_speech") should be < t.getAs[Long]("n_frames")
    t.getAs[Long]("n_segments") should be > 0L
    // segments can't outnumber speech frames (each has >= 1 frame)
    t.getAs[Long]("n_segments") should be <= t.getAs[Long]("n_speech")
    sources.foreach { r =>
      withClue(s"source ${r.getAs[String]("source")}: ") {
        r.getAs[Long]("speech_ppm") should (be >= 0L and be <= 1000000L)
      }
    }
  }

  test("s47 frontier: recall monotone within families, dominance is sound") {
    val rows = Registry.queries("s47_ann_frontier")(spark, dir).collect()
    rows.length shouldBe 13
    // within each family the candidate sets are nested as the lever
    // opens, so recall is monotone non-decreasing in cost
    rows.groupBy(_.getAs[String]("family")).foreach { case (fam, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("cost_milli_pq"))
      ordered.map(_.getAs[Long]("recall_ppm")).sliding(2).foreach {
        case Array(lo, hi) =>
          withClue(s"family $fam recall not monotone: ") { hi should be >= lo }
        case _ => ()
      }
    }
    // Pareto soundness: every frontier row is undominated, every
    // non-frontier row is dominated by at least one FRONTIER row
    val all = rows.map(r => (r.getAs[Long]("cost_milli_pq"),
      r.getAs[Long]("recall_ppm"), r.getAs[Boolean]("frontier")))
    def dominates(a: (Long, Long), b: (Long, Long)) =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    all.foreach { case (c, r, f) =>
      val dominated = all.exists(o => dominates((o._1, o._2), (c, r)))
      withClue(s"cost=$c recall=$r frontier=$f: ") {
        f shouldBe !dominated
      }
      if (!f) {
        // transitivity of the dominance order guarantees a frontier
        // witness exists for every dominated row
        all.exists(o => o._3 && dominates((o._1, o._2), (c, r))) shouldBe true
      }
    }
    // the table is a real trade surface, not a single winner: at least
    // two strategies survive, from more than one family
    val front = rows.filter(_.getAs[Boolean]("frontier"))
    front.length should be > 1
    front.map(_.getAs[String]("family")).distinct.length should be > 1
  }

  test("d57 detector frontier: truth bounds, z-row folds, dominance sound") {
    val rows = Registry.queries("d57_detector_frontier")(spark, dir).collect()
    rows.length shouldBe 5
    val (z, dets) = rows.partition(_.getAs[String]("detector") == "z_union")
    val nTruth = z.head.getAs[Long]("n_true")
    nTruth should be > 0L
    // the union row IS the reference: recall 10^6 by construction, and
    // every detector's candidates and trues are bounded by it
    z.head.getAs[Long]("recall_ppm") shouldBe 1000000L
    dets.foreach { r =>
      withClue(s"detector ${r.getAs[String]("detector")}: ") {
        r.getAs[Long]("n_cand") should be <= z.head.getAs[Long]("n_cand")
        r.getAs[Long]("n_true") should be <= nTruth
        r.getAs[Long]("precision_ppm") should (be >= 0L and be <= 1000000L)
      }
    }
    // band layouts are nested in candidate sets (every 2x4 band match
    // implies a 4x2 band match implies an 8x1 match), so candidates and
    // trues are monotone across the MinHash shapes
    val byName = dets.map(r => r.getAs[String]("detector") -> r).toMap
    byName("mh_b2_r4").getAs[Long]("n_cand") should be <=
      byName("mh_b4_r2").getAs[Long]("n_cand")
    byName("mh_b4_r2").getAs[Long]("n_cand") should be <=
      byName("mh_b8_r1").getAs[Long]("n_cand")
    byName("mh_b2_r4").getAs[Long]("n_true") should be <=
      byName("mh_b4_r2").getAs[Long]("n_true")
    // Pareto soundness over the four detectors
    val all = dets.map(r => (r.getAs[Long]("cost_ppm"),
      r.getAs[Long]("recall_ppm"), r.getAs[Boolean]("frontier")))
    all.foreach { case (c, r, f) =>
      val dominated = all.exists(o =>
        o._1 <= c && o._2 >= r && (o._1 < c || o._2 > r))
      withClue(s"cost=$c recall=$r: ") { f shouldBe !dominated }
    }
    all.count(_._3) should be >= 1
  }

  test("q206 tier planner: conservation, equal terciles, moved-bytes identity") {
    val rows = Registry.queries("q206_tier_planner")(spark, dir).collect()
    rows.length shouldBe 4
    val (z, tiers) = rows.partition(_.getAs[String]("tier") == "z_total")
    val t = z.head
    // the z row folds the tiers exactly
    t.getAs[Long]("n_files") shouldBe tiers.map(_.getAs[Long]("n_files")).sum
    t.getAs[Long]("bytes") shouldBe tiers.map(_.getAs[Long]("bytes")).sum
    t.getAs[Long]("n_accesses") shouldBe
      tiers.map(_.getAs[Long]("n_accesses")).sum
    // rank-based terciles are equal-sized by construction (±1)
    val sizes = tiers.map(_.getAs[Long]("n_files"))
    (sizes.max - sizes.min) should be <= 1L
    tiers.foreach { r =>
      withClue(s"tier ${r.getAs[String]("tier")}: ") {
        // a file either agrees or contributes moved bytes — never both;
        // moved bytes can't exceed the tier's total
        r.getAs[Long]("n_agree") should be <= r.getAs[Long]("n_files")
        r.getAs[Long]("moved_bytes") should be <= r.getAs[Long]("bytes")
      }
    }
    // the two policies genuinely differ on this log (the migration-cost
    // column is the deliverable, so it must be non-trivial)
    t.getAs[Long]("moved_bytes") should be > 0L
    t.getAs[Long]("n_agree") should be > 0L
  }
}
