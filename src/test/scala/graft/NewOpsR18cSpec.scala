package graft

import graft.analytics.Registry

/** Algebra invariants for the round-18 wave-B/C operators: every
  * in-query proof boolean is asserted here BY NAME, so a fixture
  * regeneration that flips one fails as a labeled test instead of an
  * opaque multi-query hash mismatch. All run on the sf0.001 fixtures. */
class NewOpsR18cSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q187 lambda cutover: no double-feed, no gaps, combined == one-shot") {
    val rows = Registry.queries("q187_lambda_cutover")(spark, dir).collect()
    val c = rows.find(_.getAs[String]("side") == "combined").get
    c.getAs[Long]("overlap_days") shouldBe 0L
    c.getAs[Long]("gap_days") shouldBe 0L
    c.getAs[Boolean]("matches_oneshot") shouldBe true
    // the two sides partition the day range
    rows.filter(_.getAs[String]("side") != "combined")
      .map(_.getAs[Long]("n_days")).sum shouldBe c.getAs[Long]("n_days")
  }

  test("q189 OCC: disjoint writers commute, overlapping writers conflict") {
    val rows = Registry.queries("q189_occ_conflicts")(spark, dir).collect()
    val dis = rows.find(_.getAs[String]("scenario") == "a_vs_b_disjoint").get
    dis.getAs[Long]("n_overlap") shouldBe 0L
    dis.getAs[Boolean]("conflict") shouldBe false
    dis.getAs[Boolean]("order_independent") shouldBe true
    val ov = rows.find(_.getAs[String]("scenario") == "a_vs_c_overlap").get
    ov.getAs[Long]("n_overlap") should be > 0L
    ov.getAs[Boolean]("conflict") shouldBe true
  }

  test("q191 crypto-shred: exact scope, exact round-trip, wrong key is garbage") {
    val r = Registry.queries("q191_crypto_shred")(spark, dir).collect().head
    r.getAs[Boolean]("shred_exact") shouldBe true
    r.getAs[Boolean]("decrypt_exact") shouldBe true
    r.getAs[Boolean]("wrong_key_garbage") shouldBe true
    r.getAs[Long]("n_unreadable") should be > 0L // the request set is non-empty
  }

  test("q192 WAP: staged batch blocked, repaired batch publishes clean") {
    val rows = Registry.queries("q192_wap_gate")(spark, dir).collect()
    def verdict(stage: String) =
      rows.find(r => r.getAs[String]("stage") == stage &&
        r.getAs[String]("rule") == "zz_verdict").get
    verdict("a_staged").getAs[Boolean]("publish") shouldBe false
    verdict("b_repaired").getAs[Boolean]("publish") shouldBe true
    // every planted fault class actually fired on the staged batch
    rows.filter(r => r.getAs[String]("stage") == "a_staged" &&
        r.getAs[String]("rule") != "zz_verdict")
      .foreach(_.getAs[Long]("n") should be > 0L)
    // and the repair removed all of them
    rows.filter(r => r.getAs[String]("stage") == "b_repaired" &&
        r.getAs[String]("rule") != "zz_verdict")
      .foreach(_.getAs[Long]("n") shouldBe 0L)
  }

  test("q194 checkpointing: compacted reads match the full log") {
    val rows = Registry.queries("q194_log_checkpoint")(spark, dir).collect()
    rows.filter(_.getAs[String]("readout") != "a_ckpt_base")
      .foreach(_.getAs[Boolean]("matches_full_log") shouldBe true)
  }

  test("q195 schema evolution: merged read matches the source union") {
    val r = Registry.queries("q195_schema_evolution")(spark, dir).collect().head
    r.getAs[Boolean]("matches_source") shouldBe true
    r.getAs[Long]("n_null_channel") should be > 0L // the old generation exists
  }

  test("d49 bipartite groups: multi-doc, shingle-witnessed, disjoint docs") {
    val rows = Registry.queries("d49_bipartite_components")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getAs[Long]("n_docs") should be >= 2L
      r.getAs[Long]("n_shingle_nodes") should be >= 1L // a witness shingle exists
    }
    // components partition the flagged docs: Σ n_docs counts each doc once
    val labels = rows.map(_.getAs[Long]("comp"))
    labels.distinct.length shouldBe labels.length
  }

  test("d50 purity verify: every group verified, pair counts complete") {
    val rows = Registry.queries("d50_bipartite_purity")(spark, dir).collect()
    val total = rows.find(_.getAs[Long]("comp") == -1L).get
    total.getAs[Long]("n_oversized") shouldBe 0L // nothing silently skipped here
    rows.filter(_.getAs[Long]("comp") >= 0L).foreach { r =>
      val n = r.getAs[Long]("n_docs")
      r.getAs[Long]("n_pairs") shouldBe n * (n - 1) / 2 // all pairs verified
      r.getAs[Long]("max_cont_ppm") should be <= 1000000L
    }
  }

  test("t50 dedup-LM readout: shared held-out set, dedup strictly shrinks train") {
    val rows = Registry.queries("t50_dedup_lm_effect")(spark, dir)
      .collect().sortBy(_.getAs[String]("variant"))
    val Array(raw, dedup) = rows
    // both variants score the IDENTICAL held-out set — the property that
    // makes the two CE numbers comparable at all
    raw.getAs[Long]("n_test_bigrams") shouldBe dedup.getAs[Long]("n_test_bigrams")
    dedup.getAs[Long]("n_train_docs") should be < raw.getAs[Long]("n_train_docs")
    dedup.getAs[Long]("n_train_bigrams") should be < raw.getAs[Long]("n_train_bigrams")
    raw.getAs[Double]("ce") should be > 0.0
    dedup.getAs[Double]("ce") should be > 0.0
  }
}
