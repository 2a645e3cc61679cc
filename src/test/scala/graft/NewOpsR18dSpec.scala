package graft

import graft.analytics.Registry

/** Algebra invariants for the round-18 wave-D operators, beyond the
  * oracles' cross-engine equality: the GC planners' safety proofs
  * (q196/q197), the capacity planner's roll-up (q198), the
  * smoothing-family ordering (t51), MATTR's range/weighting algebra
  * (t52), the residual quantizer's per-cell improvement (s41),
  * NN-descent recall monotonicity (s42), weighted-vs-set Jaccard
  * coherence (d51), and the redaction contract per policy class (m23).
  * All run on the sf0.001 fixtures. */
class NewOpsR18dSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q196 snapshot expiry: GC never deletes a retained-live file, totals fold") {
    val rows = Registry.queries("q196_snapshot_expiry")(spark, dir).collect()
    val (total, files) = rows.partition(_.getAs[Long]("file_id") == -1L)
    total should have length 1
    files should not be empty
    files.foreach { r =>
      withClue(s"file ${r.getAs[Long]("file_id")}: ") {
        r.getAs[Boolean]("safe") shouldBe true
        // live at HEAD implies live in some retained snapshot (v6 is retained)
        if (r.getAs[Boolean]("live_latest"))
          r.getAs[Boolean]("live_in_retained") shouldBe true
        // deletable is exactly the complement of retained-liveness
        r.getAs[Boolean]("deletable") shouldBe !r.getAs[Boolean]("live_in_retained")
      }
    }
    total.head.getAs[Boolean]("safe") shouldBe true
    total.head.getAs[Long]("freed_bytes") shouldBe
      files.filter(_.getAs[Boolean]("deletable")).map(_.getAs[Long]("size_bytes")).sum
    // the fixture plants all three lifecycle classes — some deletable,
    // some retained-but-dead-at-head, some resurrected
    files.count(_.getAs[Boolean]("deletable")) should be > 0
    files.count(r => r.getAs[Boolean]("live_in_retained") &&
      !r.getAs[Boolean]("live_latest")) should be > 0
  }

  test("q197 orphan vacuum: no referenced file is vacuumed, grace class exists") {
    val rows = Registry.queries("q197_orphan_vacuum")(spark, dir).collect()
    val byClass = rows.map(r => r.getAs[String]("verdict") -> r).toMap
    byClass.keySet shouldBe Set("a_kept_referenced", "b_kept_in_grace", "c_vacuum", "z_total")
    byClass("c_vacuum").getAs[Boolean]("group_unreferenced") shouldBe true
    byClass("b_kept_in_grace").getAs[Boolean]("group_unreferenced") shouldBe true
    byClass("a_kept_referenced").getAs[Boolean]("group_unreferenced") shouldBe false
    byClass("z_total").getAs[Long]("n_files") shouldBe
      rows.filter(_.getAs[String]("verdict") != "z_total").map(_.getAs[Long]("n_files")).sum
  }

  test("q198 capacity planner: partitions cover bytes, cluster row folds the tables") {
    val rows = Registry.queries("q198_capacity_planner")(spark, dir).collect()
    val (cluster, tables) = rows.partition(_.getAs[String]("table_name") == "z_cluster")
    cluster should have length 1
    tables should have length 5
    tables.foreach { r =>
      withClue(s"table ${r.getAs[String]("table_name")}: ") {
        val p = r.getAs[Long]("target_partitions")
        p should be >= 1L
        // ceil division: p partitions at 128 MB cover the estimate
        (p * 134217728L) should be >= r.getAs[Long]("est_bytes")
        ((p - 1) * 134217728L) should be < math.max(r.getAs[Long]("est_bytes"), 1L)
      }
    }
    cluster.head.getAs[Long]("target_partitions") shouldBe
      tables.map(_.getAs[Long]("target_partitions")).sum
    cluster.head.getAs[Long]("executors") shouldBe
      (cluster.head.getAs[Long]("target_partitions") + 3) / 4
  }

  test("t51 stupid backoff: rates in range and smoothing family ordered sanely") {
    val rows = Registry.queries("t51_stupid_backoff")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"source ${r.getAs[String]("source")}: ") {
        val bp = r.getAs[Long]("backoff_ppm")
        bp should be >= 0L
        bp should be <= 1000000L
        r.getAs[Double]("ce_sb").isNaN shouldBe false
        r.getAs[Double]("ce_jm").isNaN shouldBe false
      }
    }
    // on this corpus some test bigram is always unseen — the backoff
    // path must actually fire somewhere or the CASE is dead code
    rows.map(_.getAs[Long]("backoff_ppm")).max should be > 0L
  }

  test("t52 MATTR: ppm ranges valid, total row is window-weighted (not doc-mean)") {
    val rows = Registry.queries("t52_mattr_diversity")(spark, dir).collect()
    val (total, buckets) = rows.partition(_.getAs[Long]("bucket") == -1L)
    total should have length 1
    buckets should not be empty
    buckets.foreach { r =>
      withClue(s"bucket ${r.getAs[Long]("bucket")}: ") {
        r.getAs[Long]("bucket") should be >= 0L
        r.getAs[Long]("bucket") should be <= 10L
        r.getAs[Long]("min_ppm") should be >= 0L
        r.getAs[Long]("max_ppm") should be <= 1000000L
        // rows land in their own decile
        r.getAs[Long]("min_ppm") / 100000L shouldBe r.getAs[Long]("bucket")
      }
    }
    total.head.getAs[Long]("n_docs") shouldBe buckets.map(_.getAs[Long]("n_docs")).sum
    // a 20-token window has at least 1 distinct token -> >= 50000 ppm
    total.head.getAs[Long]("avg_mattr_ppm") should be >= 50000L
  }

  test("s41 residual quantizer: second stage improves EVERY cell and the total") {
    val rows = Registry.queries("s41_residual_quantizer")(spark, dir).collect()
    val (total, cells) = rows.partition(_.getAs[Long]("label") == -1L)
    total should have length 1
    cells should not be empty
    rows.foreach { r =>
      withClue(s"cell ${r.getAs[Long]("label")}: ") {
        r.getAs[Boolean]("improved") shouldBe true
        r.getAs[Long]("drop_ppm") should be >= 0L
        r.getAs[Long]("drop_ppm") should be <= 1000000L
      }
    }
    total.head.getAs[Long]("err_coarse") shouldBe cells.map(_.getAs[Long]("err_coarse")).sum
    total.head.getAs[Long]("err_residual") shouldBe cells.map(_.getAs[Long]("err_residual")).sum
    // the residual stage must be a real refinement, not a wash
    total.head.getAs[Long]("drop_ppm") should be > 0L
  }

  test("s42 NN-descent: recall never drops, and the round keeps cross-cell edges") {
    val rows = Registry.queries("s42_nn_descent")(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      withClue(s"cell ${r.getAs[Long]("cell")}: ") {
        r.getAs[Boolean]("improved") shouldBe true
        r.getAs[Long]("recall1_ppm") should be >= r.getAs[Long]("recall0_ppm")
        r.getAs[Long]("recall1_ppm") should be <= 1000000L
      }
    }
    // ~75% of true top-3 edges cross IVF cells on this corpus — the
    // refined graph must keep cross-cell edges somewhere, or the ring
    // seed / 2-hop expansion is dead code
    rows.map(_.getAs[Long]("n_cross1")).sum should be > 0L
    // the round must actually lift recall somewhere, not just hold it
    rows.map(r => r.getAs[Long]("recall1_ppm") - r.getAs[Long]("recall0_ppm")).max should be > 0L
  }

  test("d51 weighted Jaccard: ppm scores in range, totals fold the classes") {
    val rows = Registry.queries("d51_weighted_jaccard")(spark, dir).collect()
    val (total, classes) = rows.partition(_.getAs[String]("cls") == "z_total")
    total should have length 1
    classes should not be empty
    total.head.getAs[Long]("n_pairs") shouldBe classes.map(_.getAs[Long]("n_pairs")).sum
    rows.foreach { r =>
      r.getAs[Long]("mean_abs_gap_ppm") should be >= 0L
      r.getAs[Long]("max_abs_gap_ppm") should be <= 1000000L
      r.getAs[Long]("mean_abs_gap_ppm") should be <= r.getAs[Long]("max_abs_gap_ppm")
    }
  }

  test("m23 metadata redaction: every policy class meets its contract") {
    val rows = Registry.queries("m23_metadata_redaction")(spark, dir).collect()
    rows.map(_.getAs[String]("key")).sorted shouldBe
      Array("author", "codec", "device_serial", "duration_ms", "gps_lat", "gps_lon")
    rows.foreach { r =>
      withClue(s"key ${r.getAs[String]("key")}: ") {
        r.getAs[Boolean]("scrub_ok") shouldBe true
      }
    }
    val byKey = rows.map(r => r.getAs[String]("key") -> r).toMap
    byKey("gps_lat").getAs[Long]("n_after") shouldBe 0L
    byKey("author").getAs[Long]("n_after") shouldBe 0L
    byKey("device_serial").getAs[Long]("n_after") shouldBe
      byKey("device_serial").getAs[Long]("n_entries")
    byKey("codec").getAs[Long]("ck_after") shouldBe byKey("codec").getAs[Long]("ck_before")
  }
}
