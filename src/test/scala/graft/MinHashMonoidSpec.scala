package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** d19's scale claim is an ALGEBRAIC one: a source's MinHash signature
  * (componentwise min of permuted shingle hashes) is a commutative
  * monoid, so per-partition partial signatures combine losslessly —
  * sig(A ∪ B) = min(sig(A), sig(B)) componentwise, for ANY split of the
  * rows. This spec pins that law directly: signatures computed over
  * arbitrary two-way splits of a hash set equal the signature of the
  * whole, merged with element-wise min. */
class MinHashMonoidSpec extends SparkSuite {

  private val perm: Seq[(Long, Long)] =
    Seq((2L, 1L), (3L, 2L), (5L, 3L), (7L, 4L), (11L, 5L), (13L, 6L), (17L, 7L), (19L, 8L))
  private val Mod = graft.functions.PolyHash.Mod

  private def sig(df: DataFrame): Seq[Long] = {
    val row = df.agg(
      min(expr(s"(${perm.head._1} * h + ${perm.head._2}) % $Mod")),
      perm.tail.map { case (a, b) => min(expr(s"($a * h + $b) % $Mod")) }: _*
    ).head()
    (0 until perm.size).map(row.getLong)
  }

  test("sig(A union B) equals componentwise min of sig(A) and sig(B), any split") {
    import spark.implicits._
    // hash sets with collisions across splits, a singleton, and skew
    val hashes = Seq(12L, 905L, 44021L, 7L, 999999999L, 31L, 12L, 500L)
    val all = hashes.distinct.toDF("h")
    val whole = sig(all)
    // three different two-way splits, including empty-vs-all
    val splits = Seq(2, 4, hashes.distinct.size)
    splits.foreach { cut =>
      val (l, r) = hashes.distinct.splitAt(cut)
      val sl = if (l.isEmpty) Seq.fill(perm.size)(Long.MaxValue) else sig(l.toDF("h"))
      val sr = if (r.isEmpty) Seq.fill(perm.size)(Long.MaxValue) else sig(r.toDF("h"))
      val merged = sl.zip(sr).map { case (x, y) => math.min(x, y) }
      withClue(s"split at $cut: ") { merged shouldBe whole }
    }
  }

  test("signature is insensitive to duplication and order (set semantics)") {
    import spark.implicits._
    val base = Seq(3L, 17L, 290L, 88L)
    val a = sig(base.toDF("h"))
    val b = sig((base.reverse ++ base ++ base).toDF("h"))
    a shouldBe b
  }
}
