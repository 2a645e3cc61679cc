package graft

import graft.operators.TriangleCount

/** TriangleCount must agree with brute-force triple enumeration on graphs
  * that stress the orientation logic: hubs (skewed degrees), cliques
  * (dense closing edges), and seeded pseudo-random graphs; input
  * normalization (duplicates, both orientations, self-loops) must not
  * change the counts. */
class TriangleCountSpec extends SparkSuite {

  private def countsOf(pairs: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = TriangleCount.counts(pairs.toDF("u", "v")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Reference: normalize, then enumerate all vertex triples over the
    * adjacency set. */
  private def brute(pairs: Seq[(Long, Long)]): (Long, Long, Long) = {
    val es = pairs.collect { case (a, b) if a != b => (a min b, a max b) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tri = nodes.combinations(3).count {
      case Seq(a, b, c) => es((a, b)) && es((a, c)) && es((b, c))
    }
    (nodes.size.toLong, es.size.toLong, tri.toLong)
  }

  private def check(pairs: Seq[(Long, Long)]): Unit = {
    val (n, e, _, t) = countsOf(pairs)
    val (bn, be, bt) = brute(pairs)
    (n, e, t) shouldBe ((bn, be, bt))
  }

  test("clique K5 has C(5,3) triangles") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val (n, e, w, t) = countsOf(k5)
    (n, e, t) shouldBe ((5L, 10L, 10L))
    // oriented out-degrees of K5 are 4,3,2,1,0 -> C(4,2)+C(3,2)+C(2,2) wedges
    w shouldBe 10L
  }

  test("star graphs have wedges only at the hub's low-rank neighbors, no triangles") {
    val star = (1L to 10L).map(i => (0L, i))
    val (n, e, w, t) = countsOf(star)
    (n, e, t) shouldBe ((11L, 10L, 0L))
    // the hub ranks LAST (max degree), every edge orients leaf->hub, so
    // all wedges would need two out-edges from one leaf: none exist
    w shouldBe 0L
  }

  test("duplicate, reversed, and self edges are normalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
    val (n, e, _, t) = countsOf(messy)
    (n, e, t) shouldBe ((3L, 3L, 1L))
  }

  test("seeded pseudo-random graphs match brute force") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(80)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      check(pairs)
    }
  }

  test("hub-plus-clique mix (skewed degrees) matches brute force") {
    val clique = for (i <- 0L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val hub = (6L to 15L).map(i => (0L, i))
    check(clique ++ hub)
  }
}
