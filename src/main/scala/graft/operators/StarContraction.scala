package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components by alternating large-star / small-star
 * contraction (Kiveris et al., "Connected Components in MapReduce and
 * Beyond") — the scale path [[ConnectedComponents]]'s own Scaladoc
 * points at for adversarial graphs: min-label propagation's round
 * count is bounded by component diameter (pointer jumping brings it to
 * O(log d), but each round still JOINS the full label table), while
 * star contraction rewrites the EDGE SET itself toward a forest of
 * stars in O(log² n) rounds regardless of diameter, with every round a
 * pair of (groupBy-min + join) passes over the current edges — no
 * label table, no |nodes| broadcast question at all.
 *
 * Large-star (one round): every node u connects its strictly-larger
 * neighbors to m(u) = min(Γ(u) ∪ {u}). Small-star: every node u
 * connects its ≤-neighbors and itself to the minimum among them. At
 * the fixpoint the edges form stars whose centers are the component
 * minima — the labeling is read straight off the final edge list.
 *
 * Edges are kept canonical ((u < v), distinct) between rounds;
 * convergence is the canonical edge set reaching a fixpoint, detected
 * by (count, order-independent checksum) equality — large-star and
 * small-star are both idempotent-at-fixpoint rewrites, so an unchanged
 * set means the stars are final. Per-round localCheckpoint keeps the
 * plan constant-size (the [[ConnectedComponents]] discipline).
 */
object StarContraction {

  private val CkMod = 1000000007L

  /** @return (labels, rounds): `labels` is `(node, comp)` over every
    *         endpoint of `edges`, comp = component-minimum node id;
    *         `rounds` = alternating rounds until fixpoint (exposed so
    *         the chain-graph spec can pin the O(log) behavior). */
  def labelWithRounds(edges: DataFrame, maxIterations: Int = 50): (DataFrame, Int) = {
    require(maxIterations > 0, s"maxIterations must be positive, got $maxIterations")
    val canon0 = edges
      .select(least(col("id1"), col("id2")).as("u"),
        greatest(col("id1"), col("id2")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // LAZY checkpoint: the entry fingerprint below is the action that
    // materializes (and caches) the canonical set — one job, not two.
    // allNodes is read once, after the loop, straight off that cache:
    // checkpointing it bought nothing (r21 measurement) and cost an
    // eager distinct job up front.
    var e = canon0.localCheckpoint(eager = false)
    val allNodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()

    def canonical(df: DataFrame): DataFrame = df
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

    // directed neighbor view of the canonical set
    def directed(cur: DataFrame): DataFrame =
      cur.select(col("u"), col("v"))
        .union(cur.select(col("v").as("u"), col("u").as("v")))

    def largeStar(cur: DataFrame): DataFrame = {
      val d = directed(cur)
      val mins = d.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      canonical(d.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
    }

    def smallStar(cur: DataFrame): DataFrame = {
      val n = directed(cur).filter(col("v") < col("u")) // u's smaller neighbors
      val mins = n.groupBy(col("u")).agg(min(col("v")).as("m"))
      canonical(
        n.join(mins, "u").select(col("v").as("a"), col("m").as("b"))
          .union(mins.select(col("u").as("a"), col("m").as("b"))))
    }

    def fingerprint(cur: DataFrame): (Long, Long) = {
      val r = cur.agg(count(lit(1)),
        coalesce(sum((col("u") * 1000003L + col("v")) % CkMod) % CkMod, lit(0L)))
        .first()
      (r.getLong(0), r.getLong(1))
    }

    var prevEdges = e
    var prev = fingerprint(e)
    var rounds = 0
    var changed = true
    while (changed && rounds < maxIterations) {
      // lazy: the fingerprint action materializes the round's edge set
      e = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val cur = fingerprint(e)
      // fingerprint equality is the cheap signal; STOPPING additionally
      // requires exact set equality (same count + empty anti-join), so a
      // checksum collision on a non-fixpoint round can never end the
      // loop with wrong labels — the confirm join runs only on the
      // (rare) fingerprint-match round, over the shrunken edge set
      changed = cur != prev ||
        e.join(prevEdges, Seq("u", "v"), "left_anti").limit(1).count() > 0
      prev = cur
      prevEdges = e
      rounds += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"star contraction did not converge within $rounds rounds")
    // final edges are stars (m, v) with m the component min: non-center
    // nodes read their label off the edge, centers (and singletons in
    // the input node set) label themselves
    val labels = allNodes
      .join(e.select(col("v").as("node"), col("u").as("comp")), Seq("node"), "left")
      .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
    (labels, rounds)
  }

  /** [[labelWithRounds]] without the round count — drop-in for
    * [[ConnectedComponents.label]]. */
  def label(edges: DataFrame, maxIterations: Int = 50): DataFrame =
    labelWithRounds(edges, maxIterations)._1
}
