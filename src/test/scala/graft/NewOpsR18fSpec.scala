package graft

import graft.analytics.Registry

/** Algebra invariants for the round-18 wave-F operators: the b-bit
  * minwise error curve's width monotonicity (d53), the bisecting
  * split's conservation and improvement (s44), and the per-role
  * security contracts (q200). All run on the sf0.001 fixtures. */
class NewOpsR18fSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("d53 b-bit minhash: more bits never hurt, full width is the floor") {
    val rows = Registry.queries("d53_bbit_minhash")(spark, dir).collect()
      .sortBy(_.getAs[Long]("b"))
    rows.map(_.getAs[Long]("b")) shouldBe Array(1L, 2L, 4L, 64L)
    // the same pair set under every width
    rows.map(_.getAs[Long]("n_pairs")).distinct should have length 1
    rows.map(_.getAs[Long]("mean_exact_ppm")).distinct should have length 1
    // collision correction: mean abs error shrinks as b grows
    rows.sliding(2).foreach { case Array(a, b) =>
      withClue(s"b ${a.getAs[Long]("b")} -> ${b.getAs[Long]("b")}: ") {
        b.getAs[Long]("mean_abs_err_ppm") should be <= a.getAs[Long]("mean_abs_err_ppm")
      }
    }
    // one bit per perm must still be far from random (error < r_b = 50%)
    rows.head.getAs[Long]("mean_abs_err_ppm") should be < 500000L
  }

  test("s44 bisect: halves conserve the cell, inertia drops, global max shrinks") {
    val r = Registry.queries("s44_bisect_hot_cell")(spark, dir).collect().head
    r.getAs[Long]("side_small") + r.getAs[Long]("side_large") shouldBe
      r.getAs[Long]("old_size")
    r.getAs[Long]("side_small") should be >= 1L
    r.getAs[Boolean]("improved") shouldBe true
    r.getAs[Long]("drop_ppm") should be > 0L
    // splitting the max cell can only lower (or hold) the global max
    r.getAs[Long]("maxsz_after") should be <= r.getAs[Long]("old_size")
  }

  test("q200 RLS/masking: both role contracts hold and pseudonyms differ from raw") {
    val rows = Registry.queries("q200_rls_mask")(spark, dir).collect()
    rows should have length 2
    rows.foreach { r =>
      withClue(s"role ${r.getAs[String]("role")}: ") {
        r.getAs[Boolean]("policy_ok") shouldBe true
      }
    }
    val byRole = rows.map(r => r.getAs[String]("role") -> r).toMap
    // the analyst row filter actually removes rows
    byRole("analyst").getAs[Long]("n_rows") should
      be < byRole("admin").getAs[Long]("n_rows")
    byRole("analyst").getAs[Long]("n_rows") should be > 0L
    // hashing transformed the name column (checksums cannot match raw's
    // on a strict subset with changed values)
    byRole("analyst").getAs[Long]("name_ck") should
      not be byRole("admin").getAs[Long]("name_ck")
  }
}
