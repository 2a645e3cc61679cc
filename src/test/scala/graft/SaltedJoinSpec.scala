package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

/** SaltedJoin must be value-identical to the plain join while spreading a
  * hot key over all shards. */
class SaltedJoinSpec extends SparkSuite {

  private def skewedFact = {
    import spark.implicits._
    // 90% of rows share key 0 — the classic hot-key shape
    (0 until 5000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong + 1L else 0L
      (k, i.toLong, s"payload_$i")
    }.toDF("k", "seq", "payload")
  }

  private def dim = {
    import spark.implicits._
    (0L to 7L).map(k => (k, s"dim_$k")).toDF("dk", "name")
  }

  test("salted join returns exactly the plain join's rows") {
    val plain = skewedFact.join(dim, col("k") === col("dk"))
      .select(col("seq"), col("name"))
    val salted = SaltedJoin.join(skewedFact, dim, "k", "dk",
      saltSource = Seq("seq", "payload"), shards = 16)
      .select(col("seq"), col("name"))
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  test("the hot key's rows spread across every shard") {
    val salted = skewedFact.withColumn("__salt",
      SaltedJoin.saltExpr(Seq("seq", "payload"), 16))
    val shardsHit = salted.filter(col("k") === 0L)
      .select(col("__salt")).distinct().count()
    shardsHit shouldBe 16L
  }

  test("salt is deterministic across evaluations") {
    val a = skewedFact.withColumn("s", SaltedJoin.saltExpr(Seq("seq"), 8))
      .select(col("seq"), col("s"))
    val b = skewedFact.withColumn("s", SaltedJoin.saltExpr(Seq("seq"), 8))
      .select(col("seq"), col("s"))
    a.exceptAll(b).count() shouldBe 0L
  }

  test("self-join on shared lineage resolves both sides independently") {
    // fact and dim derived from the SAME frame: pre-fix, the join condition
    // used the input frames' attribute ids, which collide here and either
    // throw an ambiguity error or degenerate to a trivially-true predicate
    val base = skewedFact
    val keyed = base.select(col("k"), col("seq"))
    val perKey = keyed.groupBy(col("k").as("dk")).agg(count(lit(1)).as("n_rows"))
    val plain = keyed.join(perKey, col("k") === col("dk"))
      .select(col("seq"), col("n_rows"))
    val salted = SaltedJoin.join(keyed, perKey, "k", "dk",
      saltSource = Seq("seq"), shards = 8)
      .select(col("seq"), col("n_rows"))
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  test("shards and saltSource are validated") {
    an[IllegalArgumentException] should be thrownBy
      SaltedJoin.join(skewedFact, dim, "k", "dk", Seq("seq"), shards = 0)
    an[IllegalArgumentException] should be thrownBy
      SaltedJoin.join(skewedFact, dim, "k", "dk", Seq.empty)
  }
}
