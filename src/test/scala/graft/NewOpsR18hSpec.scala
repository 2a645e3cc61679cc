package graft

import graft.analytics.Registry

/** Algebra invariants for the round-18 wave-H operators: the ablation
  * matrix's accounting identities (t55), dup-aware sampling's
  * representative and bias algebra (d54), and the DSAR bundle's
  * completeness proofs (q202). All run on the sf0.001 fixtures. */
class NewOpsR18hSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("t55 filter ablation: unique <= total per rule, uniques fold into the battery row") {
    val rows = Registry.queries("t55_filter_ablation")(spark, dir).collect()
    val (total, rules) = rows.partition(_.getAs[String]("rule") == "z_total")
    total should have length 1
    rules.map(_.getAs[String]("rule")).sorted shouldBe
      Array("alpha", "duptri", "maxtok", "meanlen", "stopword", "wordcount")
    rules.foreach { r =>
      withClue(s"rule ${r.getAs[String]("rule")}: ") {
        r.getAs[Long]("n_unique_fail") should be <= r.getAs[Long]("n_fail")
        r.getAs[Long]("overlap_ppm") should be <= 1000000L
      }
    }
    // docs failing exactly one rule are exactly the union of per-rule uniques
    rules.map(_.getAs[Long]("n_unique_fail")).sum shouldBe
      total.head.getAs[Long]("n_unique_fail")
    // any-fail is bounded by the sum of per-rule fails (inclusion-exclusion)
    total.head.getAs[Long]("n_fail") should be <= rules.map(_.getAs[Long]("n_fail")).sum
  }

  test("d54 dup-aware sampling: one rep per cluster everywhere, content sample kills dup bias") {
    val rows = Registry.queries("d54_dup_aware_sampling")(spark, dir).collect()
    val (total, buckets) = rows.partition(_.getAs[String]("bucket") == "z_total")
    total should have length 1
    rows.foreach { r =>
      withClue(s"bucket ${r.getAs[String]("bucket")}: ") {
        r.getAs[Boolean]("one_per_cluster") shouldBe true
        r.getAs[Long]("content_sampled") shouldBe r.getAs[Long]("n_clusters")
      }
    }
    total.head.getAs[Long]("n_docs") shouldBe buckets.map(_.getAs[Long]("n_docs")).sum
    // the corpus is template-heavy: the naive sample must carry MORE
    // duplicate mass than the content-uniform sample
    total.head.getAs[Long]("naive_dup_ppm") should be >
      total.head.getAs[Long]("content_dup_ppm")
  }

  test("d55 transitivity audit: wedge accounting closes and classes partition the opens") {
    val r = Registry.queries("d55_transitivity_audit")(spark, dir).collect().head
    r.getAs[Long]("n_closed") + r.getAs[Long]("n_open") shouldBe
      r.getAs[Long]("n_endpoint_pairs")
    r.getAs[Long]("n_open_near") + r.getAs[Long]("n_chain_artifacts") shouldBe
      r.getAs[Long]("n_open")
    r.getAs[Long]("closed_ppm") should be <= 1000000L
    // the d52 clique finding, restated at wedge level: this corpus's
    // SimHash graph is perfectly transitive at the correctness SFs
    r.getAs[Long]("closed_ppm") shouldBe 1000000L
  }

  test("q202 DSAR export: bundle covers the closure and both completeness proofs hold") {
    val rows = Registry.queries("q202_dsar_export")(spark, dir).collect()
    rows.map(_.getAs[String]("table_name")) shouldBe
      Array("a_customer", "b_orders", "c_lineitem")
    val byT = rows.map(r => r.getAs[String]("table_name") -> r).toMap
    byT("a_customer").getAs[Long]("n_rows") shouldBe 1L
    byT("b_orders").getAs[Boolean]("complete") shouldBe true
    byT("c_lineitem").getAs[Boolean]("complete") shouldBe true
    // a subject with orders must also surface lineitems through the FK
    if (byT("b_orders").getAs[Long]("n_rows") > 0)
      byT("c_lineitem").getAs[Long]("n_rows") should be > 0L
  }
}
