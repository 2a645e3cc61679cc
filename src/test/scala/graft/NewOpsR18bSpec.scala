package graft

import graft.analytics.Registry

/** Algebra invariants for the round-18 second-batch operators, beyond
  * the oracles' cross-engine equality: q184's noise-bound and budget
  * accounting, q185's MOR≡eager and compaction verdicts, and s38's
  * probe-budget monotonicity. All run on the sf0.001 fixtures. */
class NewOpsR18bSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q184 DP release: noise is bounded by the hash-lattice worst case and not degenerate") {
    val rows = Registry.queries("q184_dp_release")(spark, dir).collect()
    rows should not be empty
    // the uniform draw is capped at |u-1/2| <= 499999/1e6, so the ln
    // magnitude is at most lnQ(1e6) - lnQ(2) = 138155 - 6931 = 131224
    // 1e-4 units -> count noise <= 13, sum noise <= ClipCents * 13.1224
    rows.foreach { r =>
      r.getAs[Long]("count_abs_err") should be <= 13L
      r.getAs[Long]("sum_abs_err") should be <= (500000L * 131224L) / 10000L
      r.getAs[Long]("eps_ppm") shouldBe 2000000L
    }
    // a release whose noise is identically zero means the draw collapsed
    withClue("all noise draws were zero — the hash plumbing is broken: ") {
      rows.map(_.getAs[Long]("count_abs_err")).sum +
        rows.map(_.getAs[Long]("sum_abs_err")).sum should be > 0L
    }
  }

  test("q185 deletion vectors: MOR == eager everywhere, full-file recall trips rewrite") {
    val rows = Registry.queries("q185_deletion_vectors")(spark, dir).collect()
    rows.length shouldBe 33 // 32 files + the __total__ row
    rows.foreach { r =>
      withClue(s"file ${r.getAs[Long]("file_id")}: ") {
        r.getAs[Boolean]("mor_equals_eager") shouldBe true
        // idempotent apply: distinct positions never exceed op writes
        r.getAs[Long]("n_dv_writes") should be >= r.getAs[Long]("n_deleted")
        // the read's live count is exactly rows minus distinct deletes
        r.getAs[Long]("live_n") shouldBe
          r.getAs[Long]("n_rows") - r.getAs[Long]("n_deleted")
      }
    }
    val f3 = rows.find(_.getAs[Long]("file_id") == 3L).get
    f3.getAs[Long]("del_ppm") shouldBe 1000000L // full recall
    f3.getAs[Boolean]("rewrite") shouldBe true
    // the uniform ~11% predicate mass must NOT trip the 20% bar
    rows.filter { r =>
      val id = r.getAs[Long]("file_id"); id >= 0 && id != 3
    }.foreach(_.getAs[Boolean]("rewrite") shouldBe false)
  }

  test("s40 index staleness: total row folds the cells, reassignments bounded") {
    val rows = Registry.queries("s40_index_staleness")(spark, dir).collect()
    val (total, cells) = rows.partition(_.getAs[Long]("cell") == -1L)
    total should have length 1
    cells should not be empty
    total.head.getAs[Long]("n_members") shouldBe cells.map(_.getAs[Long]("n_members")).sum
    total.head.getAs[Long]("n_reassigned") shouldBe cells.map(_.getAs[Long]("n_reassigned")).sum
    total.head.getAs[Long]("disp2") shouldBe cells.map(_.getAs[Long]("disp2")).sum
    rows.foreach { r =>
      r.getAs[Long]("n_reassigned") should be <= r.getAs[Long]("n_members")
      r.getAs[Long]("disp2") should be >= 0L
    }
  }

  test("d48 sparsifier: the cap binds on a dense clique and CC survives it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // an 8-clique (uniform weight 1.0) bridged to a 3-path — the fixture
    // corpus never exceeds degree 3, so this is the branch's only exercise
    val clique = (for (a <- 0 to 7; b <- (a + 1) to 7) yield (a.toLong, b.toLong, 1.0))
    val bridge = Seq((7L, 100L, 0.9), (100L, 101L, 0.8))
    val edges = (clique ++ bridge).toDF("id1", "id2", "jacc")
    val kept = graft.analytics.Dedup.sparsifyTopK(edges, 3)
    val nKept = kept.count()
    nKept should be < edges.count() // the cap actually dropped edges
    // either-endpoint-keeps preserves symmetry and, on this graph, the
    // component structure: everything still reaches node 0
    val cc = graft.operators.ConnectedComponents.label(kept)
    cc.select(countDistinct(col("comp"))).head.getLong(0) shouldBe 1L
    cc.count() shouldBe 10L // all 10 nodes survive sparsification
  }

  test("q188: both generation scans prune on their own partition spec") {
    val df = Registry.queries("q188_partition_evolution")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the week-layout scan must carry a wk partition predicate and the
    // day-layout scan a d predicate — a data-column filter alone would
    // leave PartitionFilters empty and the read quietly unpruned
    (plan should include).regex("PartitionFilters: \\[[^\\]]*wk")
    (plan should include).regex("PartitionFilters: \\[[^\\]]*d#")
    df.collect().find(_.getAs[String]("gen") == "combined").get
      .getAs[Boolean]("matches_source") shouldBe true
  }

  test("d46 dedup survey: sample contained in corpus, estimate within its CI here") {
    val r = Registry.queries("d46_dedup_survey")(spark, dir).collect().head
    r.getAs[Long]("n_sampled") should be <= r.getAs[Long]("n_total")
    r.getAs[Long]("n_hit") should be <= r.getAs[Long]("n_sampled")
    r.getAs[Long]("n_dup_exact") should be <= r.getAs[Long]("n_total")
    // the hash gate is a fixed draw: on THESE fixtures it lands inside
    // the binomial CI (verified at both SFs when the gate was chosen) —
    // a fixture regeneration that breaks this should fail loudly here,
    // not as an opaque judgement call downstream
    r.getAs[Boolean]("within_ci") shouldBe true
    r.getAs[Long]("est_ppm") should be > 0L
    r.getAs[Long]("est_ppm") should be < 1000000L
  }

  test("s39 kmeans++ seeding: picks distinct, draws in range, inertia non-increasing") {
    val rows = Registry.queries("s39_kmeanspp_seeding")(spark, dir)
      .collect().sortBy(_.getAs[Long]("round"))
    rows.map(_.getAs[Long]("round")).toSeq shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    val picks = rows.filter(_.getAs[Long]("round") <= 4).map(_.getAs[Long]("center_id"))
    picks.distinct.length shouldBe picks.length // D² mass at a chosen center is 0
    rows.filter(r => r.getAs[Long]("round") >= 2 && r.getAs[Long]("round") <= 4)
      .foreach { r =>
        val u = r.getAs[Long]("u_ppm")
        u should be >= 0L
        u should be < 1000000L
      }
    // adding a center can only shrink every dmin², so the trajectory of
    // Σdmin² (ppm of the one-center baseline) is non-increasing
    val inertia = rows.filter(_.getAs[Long]("round") >= 2).map(_.getAs[Long]("inertia_ppm"))
    inertia.head shouldBe 1000000L
    inertia.sliding(2).foreach { case Array(a, b) => b should be <= a }
  }

  test("s38 multi-probe: candidates and hits are monotone in the probe budget") {
    val rows = Registry.queries("s38_multiprobe_lsh")(spark, dir)
      .collect().sortBy(_.getAs[Long]("n_probes"))
    rows.map(_.getAs[String]("strategy")).toSeq shouldBe
      Seq("p1_single", "p4_multi", "p9_multi")
    // each budget's probe set contains the previous one's, so candidate
    // and hit counts can only grow
    rows.sliding(2).foreach { case Array(lo, hi) =>
      hi.getAs[Long]("n_cand") should be >= lo.getAs[Long]("n_cand")
      hi.getAs[Long]("hits") should be >= lo.getAs[Long]("hits")
    }
    // the widest budget still examines a small fraction of the brute space
    rows.last.getAs[Long]("cand_ppm") should be < 100000L
    // and the measured fixture shows a real lift, not a trivial tie
    rows.last.getAs[Long]("hits") should be > rows.head.getAs[Long]("hits")
  }
}
