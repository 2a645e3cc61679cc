package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** ConnectedComponents must label every endpoint with its component's
  * minimum id, on the graph shapes that stress the algorithm: a long
  * chain (diameter = n, the pointer-jumping case), a star, disjoint
  * cliques, and self/duplicate edges. */
class ConnectedComponentsSpec extends SparkSuite {

  private def edgesOf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("id1", "id2")
  }

  private def labelsOf(pairs: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    ConnectedComponents.label(edgesOf(pairs), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 64-node chain resolves to one component (log-diameter rounds)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    // 50-round cap would also pass for a linear algorithm on 64 nodes;
    // a tight cap proves pointer jumping: reach doubles per round, so
    // ~log2(64)+slack rounds must suffice (a pure Pregel min-propagation
    // needs ~63)
    val got = labelsOf(chain, maxIter = 12)
    got.size shouldBe 64
    got.values.toSet shouldBe Set(0L)
  }

  test("star and disjoint cliques get per-component minima") {
    val star = (1L to 5L).map(i => (100L, 100L + i))
    val cliqueA = for (i <- 0 to 2; j <- (i + 1) to 2) yield (10L + i, 10L + j)
    val cliqueB = for (i <- 0 to 3; j <- (i + 1) to 3) yield (20L + i, 20L + j)
    val got = labelsOf(star ++ cliqueA ++ cliqueB)
    (100L to 105L).foreach(n => got(n) shouldBe 100L)
    (10L to 12L).foreach(n => got(n) shouldBe 10L)
    (20L to 23L).foreach(n => got(n) shouldBe 20L)
  }

  test("duplicate and self edges are harmless") {
    val got = labelsOf(Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (1L, 2L)))
    got shouldBe Map(1L -> 1L, 2L -> 1L)
  }

  test("an unreachable cap fails fast instead of returning partial labels") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    an[IllegalStateException] should be thrownBy labelsOf(chain, maxIter = 2)
  }

  test("random graphs match a union-find reference") {
    // seeded RNG: deterministic across runs (no wall-clock in tests)
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val n = 10 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(2 * n)
      val pairs = Seq.fill(nEdges)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        // driver-side union-find ground truth
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val expected = nodes
          .map(v => v -> nodes.filter(u => find(u) == find(v)).min)
          .toMap
        labelsOf(pairs) shouldBe expected
      }
    }
  }
}
