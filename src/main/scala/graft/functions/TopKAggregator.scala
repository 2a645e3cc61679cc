package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Column, Encoder}

/**
 * Bounded top-k typed aggregate: keeps the k largest values seen, as a
 * descending-sorted array. The custom-UDAF member of the operator
 * catalog (`Aggregator[IN, BUF, OUT]` + `functions.udaf`), demonstrating
 * the third extension tier after built-in functions and the native
 * codegen expression ([[PolyHash]]).
 *
 * Scale notes (100 TB): the buffer is O(k) regardless of input size and
 * `merge` is associative/commutative, so Spark runs it as a partial
 * (map-side) + final aggregate — per-group traffic through the shuffle
 * is k doubles, never the raw values. This is the scale-safe shape for
 * "top prices per flag"-style questions where a window over a
 * low-cardinality partition key would funnel everything into one task
 * per group (the q04 skew problem, solved structurally here).
 *
 * Ties: values (not rows) are ranked, so equal values occupy adjacent
 * ranks and the result multiset is deterministic — no tie-break needed
 * for the value-hash gate.
 */
class TopKAggregator(k: Int) extends Aggregator[Double, Array[Double], Array[Double]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Double] = Array.emptyDoubleArray

  /** Insert keeping the buffer sorted descending and capped at k: an
    * O(k) insertion, no resort. */
  override def reduce(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length == k && v <= buf(k - 1)) buf
    else {
      val out = new Array[Double](math.min(buf.length + 1, k))
      var i = 0
      // copy the prefix larger than v
      while (i < buf.length && i < out.length && buf(i) > v) { out(i) = buf(i); i += 1 }
      if (i < out.length) { out(i) = v; i += 1 }
      var j = i - 1 // buf index resumes after the inserted slot
      while (i < out.length) { out(i) = buf(j); i += 1; j += 1 }
      out
    }
  }

  /** Merge two sorted-descending buffers (classic two-pointer merge). */
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b.length || (i < a.length && a(i) >= b(j))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(r: Array[Double]): Array[Double] = r

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

object TopKAggregator {
  /** `top_k` as an untyped aggregate Column usable in `df.agg`. */
  def topK(k: Int)(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k)).apply(c)
}
