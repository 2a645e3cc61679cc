package graft

import org.apache.spark.sql.functions._

/** Pins `gram_str_hashes(w, n)` to the expression form it replaced in
  * the d49/d50 bipartite index build: poly_hash over the concat_ws(' ')
  * window strings. The polynomial fold composes exactly
  * (H(A∘B) = H(A)·31^|B| + H(B) mod M), so the two must agree on every
  * window of every real corpus row — this spec asserts that on the
  * sf0.001 documents table (the input class the build actually sees)
  * plus the edge shapes (empty tokens from double spaces, unicode,
  * exactly-n arrays, shorter-than-n arrays). */
class GramStrHashesSpec extends SparkSuite {

  import graft.analytics.Tables.strHashExpr

  private val W = 8
  private def hofExpr(n: Int): String = {
    val parts = (1 to n).map(j => s"element_at(w, i + ${j - 1})")
      .mkString("concat_ws(' ', ", ", ", ")")
    s"transform(sequence(1, size(w) - ${n - 1}), i -> ${strHashExpr(parts)})"
  }

  test("gram_str_hashes equals poly_hash over concat_ws windows on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(expr(s"size(w) >= $W"))
    val n = docs.count()
    n should be > 0L
    val mismatches = docs
      .select(col("doc_id"),
        expr(s"gram_str_hashes(w, $W)").as("fast"),
        expr(hofExpr(W)).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    mismatches shouldBe 0L
  }

  test("gram_str_hashes edge shapes match the HOF form") {
    val rows = Seq(
      "a b c d e f g h i j",          // plain
      "a  b c d e f g h",             // double space -> empty token
      "ünïcodé tokens λ μ ν ξ ο π ρ", // non-ASCII code points
      "x1 x2 x3 x4 x5 x6 x7 x8",      // exactly W tokens -> 1 window
      "short row only")                // < W tokens -> empty array
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("text")
      .select(split(col("text"), " ").as("w"))
    val bad = df.select(
        expr(s"gram_str_hashes(w, $W)").as("fast"),
        expr(s"CASE WHEN size(w) >= $W THEN ${hofExpr(W)} ELSE array() END").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    bad shouldBe 0L
  }

  test("NULL array elements are skipped exactly like concat_ws (ADVICE r21)") {
    // concat_ws drops a NULL element AND its separator; the fast path
    // must agree even though no current caller produces NULL tokens
    val df = spark.sql(
      """SELECT array('a', CAST(NULL AS STRING), 'b', 'c', NULL, 'd', 'e', 'f', 'g') AS w
         UNION ALL
         SELECT array(CAST(NULL AS STRING), NULL, NULL, NULL, NULL, NULL, NULL, NULL)""")
    val bad = df.select(
        expr(s"gram_str_hashes(w, $W)").as("fast"),
        expr(hofExpr(W)).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    bad shouldBe 0L
  }
}
