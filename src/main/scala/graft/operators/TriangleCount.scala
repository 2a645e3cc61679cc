package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed triangle counting with degree-ordered edge orientation —
 * the standard bound on the wedge explosion: orient every edge from its
 * (degree, id)-smaller endpoint to the larger, so every node's
 * out-degree is O(sqrt(m)) and the wedge join emits O(m^1.5) rows
 * instead of sum(deg²) (which one hub node makes quadratic). Each
 * triangle is counted exactly once — as the wedge at its
 * (degree, id)-smallest vertex, closed by the oriented third edge.
 *
 * Input: an undirected edge list `(u, v)` (self-loops, duplicates, and
 * either orientation tolerated — normalized away). Output: one row
 * `(n_nodes, n_edges, n_wedges, n_triangles)`.
 *
 * Orientation compares the raw (degree, node) tuple LOCALLY at each
 * edge (two keyed joins against the |V|-sized degree table) — the same
 * total order a global row_number rank would induce, with no
 * single-partition window and no |nodes|-sized rank broadcast, so
 * nothing funnels through one partition or one executor's memory at
 * any |V|. (This is the d25 clustering-coefficient discipline applied
 * to the global count; the earlier rank-window formulation was the one
 * scale chokepoint here.)
 *
 * Shuffle inventory at scale: one distinct on the normalized edge
 * pair, one |nodes|-sized degree aggregate, two keyed joins attaching
 * endpoint degrees (AQE broadcasts the degree table when it is small,
 * shuffle-hash otherwise — no unconditional hint), the wedge self-join
 * partitioned on the wedge apex, and the closing-edge join partitioned
 * on the (v, w) pair key.
 */
object TriangleCount {

  /** @param edges edge list with integral columns `u`, `v`
    * @return single row (n_nodes, n_edges, n_wedges, n_triangles) */
  def counts(edges: DataFrame): DataFrame = {
    val e0 = edges
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).cast("long").as("u"),
        greatest(col("u"), col("v")).cast("long").as("v"))
      .distinct().cache()
    e0.count()
    val deg = e0.select(col("u").as("node")).unionAll(e0.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .cache()
    val nNodes = deg.count()
    // orient low→high by the (degree, node) tuple, carrying the head's
    // degree so the wedge join can order out-neighbors without another
    // lookup
    val lt = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = e0
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(lt, col("u")).otherwise(col("v")).as("src"),
        when(lt, col("v")).otherwise(col("u")).as("dst"),
        when(lt, col("dv")).otherwise(col("du")).as("dd"))
      .cache()
    val nEdges = o.count()
    // pair each apex's out-neighbors in the same tuple order, so the
    // candidate closing edge (v, w) is itself oriented v→w — one
    // equi-join probes it, and a LEFT probe counts wedges (all rows)
    // and triangles (matched rows) in a single pass over the dominant
    // join (materializing the wedge stream twice doubled it)
    val wedges = o.select(col("src"), col("dst").as("v"), col("dd").as("dv"))
      .join(o.select(col("src").as("src2"), col("dst").as("w"), col("dd").as("dw")),
        col("src") === col("src2") &&
          (col("dv") < col("dw") ||
            (col("dv") === col("dw") && col("v") < col("w"))))
      .select(col("v"), col("w"))
    val out = wedges
      .join(o.select(col("src").as("v"), col("dst").as("w"))
        .withColumn("closed", lit(1)), Seq("v", "w"), "left")
      .agg(count(lit(1)).as("n_wedges"), count(col("closed")).as("n_triangles"))
      .select(lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
        col("n_wedges"), col("n_triangles"))
      .localCheckpoint()
    e0.unpersist()
    deg.unpersist()
    o.unpersist()
    out
  }
}
