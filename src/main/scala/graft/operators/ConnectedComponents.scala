package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components by min-label propagation with pointer
 * jumping — the cluster-resolution step between "near-dup pairs" and
 * "one representative per duplicate group" in a dedup pipeline.
 *
 * Input: an undirected edge list `(id1, id2)` (each pair in either or
 * both orientations). Output: `(node, comp)` where `comp` is the
 * minimum node id of the node's component; every endpoint appears.
 *
 * Each round is ONE action built from two label sources unioned into a
 * min-aggregate:
 *   - neighbors' labels — the Pregel propagation step;
 *   - the label's own label (pointer jump: labels are node ids, so the
 *     self-join always hits) — doubles label reach per round, giving
 *     O(log diameter) rounds instead of O(diameter), the difference
 *     between ~a dozen shuffles and hundreds on a 100 TB chain graph.
 * The label table is |nodes|-sized — small relative to edges, but at
 * 100 TB |nodes| is "documents appearing in near-dup pairs", i.e.
 * potentially billions of rows, so the broadcast hint into the two
 * joins is GATED on an exact one-time node count (the same guard d09
 * uses — see Dedup.scala d09 block): ~16 B/row means 2 M nodes ≈ 32 MB
 * build side, comfortably inside executor broadcast budgets; past that
 * the hint drops and AQE picks the join strategy (shuffle-hash on the
 * edge key at true scale). The count is free — labels is already
 * localCheckpoint-materialized and the loop runs an action per round
 * anyway. The (much larger) edge list is only ever map-scanned when
 * the broadcast applies, never shuffled.
 * Convergence is detected by the monotone label-sum — comp never
 * increases, so an unchanged sum means a fixpoint — avoiding a join
 * against the previous round.
 */
object ConnectedComponents {

  /** Broadcast the label table only below this exact node count.
    * The BroadcastHashJoin build side costs ~40-64 B/row (UnsafeRow +
    * LongToUnsafeRowMap overhead, not the 16 B of raw longs), so the
    * cap prices at ≈100 MB on the driver and each executor — inside
    * the default budgets here; lower it if driver memory is tight.
    * Beyond the cap AQE picks the join strategy. Same threshold as
    * d09's PageRank guard. */
  private val BroadcastNodeCap = 2000000L

  /** @param edges        edge list with columns `id1`, `id2` (LongType)
    * @param maxIterations fail-fast bound on propagation rounds
    * @return (node, comp) labeling, comp = component-minimum node id */
  def label(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    require(maxIterations > 0, s"maxIterations must be positive, got $maxIterations")
    val both = edges.select(col("id1"), col("id2"))
      .union(edges.select(col("id2").as("id1"), col("id1").as("id2")))
    // Every round references `labels` three times (neighbor join + both
    // sides of the parent hop), so building rounds on cached lineage
    // TRIPLES the logical plan per iteration — exponential plan growth
    // that OOMs the driver around a dozen rounds. localCheckpoint
    // materializes the round AND truncates lineage, keeping the plan
    // constant-size; on a cluster you'd periodically `checkpoint()` to
    // reliable storage instead (same idea, executor-loss-safe).
    //
    // SEEDED round 0: with identity labels, the first propagation round
    // reduces to comp₀(v) = min(v, min Γ(v)) — one aggregate over the
    // edge list, no join. Seeding with that aggregate replaces what used
    // to be a full 2-join round (r21 measurement: one fewer round per
    // call site, ~14 call sites across the catalog). The checkpoint is
    // LAZY so the seed is materialized by the same action that prices
    // the broadcast gate and initializes the convergence sum — one job,
    // where eager-checkpoint + count + sum was three.
    var labels = both.groupBy(col("id1"))
      .agg(least(min(col("id2")), col("id1")).as("comp"))
      .select(col("id1").as("node"), col("comp"))
      .localCheckpoint(eager = false)
    val seed = labels
      .agg(count(lit(1)), coalesce(sum(col("comp")), lit(0L))).first()
    // every round's aggregate preserves the node set, so one count at
    // entry prices the broadcast gate for the whole propagation
    val nn = seed.getLong(0)
    def gated(df: DataFrame): DataFrame =
      if (nn <= BroadcastNodeCap) broadcast(df) else df
    var prevSum = seed.getLong(1)
    var changed = true
    var iter = 0
    while (changed && iter < maxIterations) {
      val neighbor = both
        .join(gated(labels), col("id2") === col("node"))
        .select(col("id1").as("n2"), col("comp"))
      // the parent hop also provides the monotonicity floor: for every
      // node v, comp(comp(v)) <= comp(v), so a separate self branch is
      // redundant
      val parent = labels
        .join(gated(labels.select(col("node").as("pnode"), col("comp").as("hcomp"))),
          col("comp") === col("pnode"))
        .select(col("node").as("n2"), col("hcomp").as("comp"))
      // LAZY checkpoint: the convergence aggregate below is the action
      // that materializes (and caches) the round — one job per round,
      // where eager checkpoint + separate sum was two
      val next = neighbor.union(parent)
        .groupBy(col("n2")).agg(min(col("comp")).as("comp"))
        .select(col("n2").as("node"), col("comp"))
        .localCheckpoint(eager = false)
      // coalesce: an EMPTY edge list (a delta batch with no near-dup
      // candidates) makes the aggregate row NULL; 0 converges on round 2
      val sumComp = next.agg(coalesce(sum(col("comp")), lit(0L))).first().getLong(0)
      changed = sumComp != prevSum
      prevSum = sumComp
      labels = next // previous round's checkpoint RDD is GC'd by the ContextCleaner
      iter += 1
    }
    if (changed)
      throw new IllegalStateException(
        s"connected components did not converge within $iter iterations; " +
          "component diameter exceeds the cap")
    labels
  }
}
