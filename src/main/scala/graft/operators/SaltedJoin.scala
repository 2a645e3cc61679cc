package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigated equi-join: salt the (skewed) fact side's key with a
 * deterministic shard id, replicate the dim side once per shard, and join
 * on (key, salt) — so a hot key's rows spread over `shards` tasks instead
 * of funneling into one.
 *
 * This is the manual form of what AQE's skew-join optimization does at
 * runtime; it exists for the cases AQE can't touch (skew appearing after
 * an upstream transform, streaming joins where AQE is disabled, or a
 * deliberately pinned physical shape). The salt is `pmod(hash(...), n)`
 * over the fact row's OTHER columns — deterministic (no `rand()`, results
 * replayable) and independent of the join key (so a hot key still spreads).
 *
 * Cost model: dim side is scanned `shards` times via explode — appropriate
 * when |dim| ≪ |fact| (the usual skew shape). For dim sides too large to
 * replicate, split the fact by hot/cold keys instead and union two joins.
 */
object SaltedJoin {

  /** Inner equi-join `fact(key) = dim(key)` with the fact side salted
    * across `shards`. `saltSource` columns must be non-key fact columns
    * (they feed the deterministic shard hash). */
  def join(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      saltSource: Seq[String],
      shards: Int = 16): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(saltSource.nonEmpty, "saltSource columns are required for a deterministic salt")
    // Resolve the join condition against the salted/replicated frames, not
    // the input frames: when fact and dim share lineage (self-join on a
    // derived frame) `fact(factKey)`/`dim(dimKey)` carry colliding
    // attribute ids and Spark either throws an ambiguity error or resolves
    // both sides to the same column. Renaming the dim key keeps resolution
    // unambiguous even for factKey == dimKey self-joins.
    val salted = fact.withColumn("__salt",
      pmod(hash(saltSource.map(col): _*), lit(shards)))
    val replicated = dim
      .withColumnRenamed(dimKey, "__dim_key")
      .withColumn("__dim_salt", explode(array((0 until shards).map(lit): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__dim_salt") &&
          salted(factKey) === replicated("__dim_key"))
      .withColumn(dimKey, col("__dim_key"))
      .drop("__salt", "__dim_salt", "__dim_key")
  }

  /** Convenience: salted join keyed on equal column names. */
  def join(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Seq[String]): DataFrame =
    join(fact, dim, key, key, saltSource)

  /** The salt expression, exposed for plans that inline it (q04's salted
    * top-k uses the same idea against a window, not a join). */
  def saltExpr(saltSource: Seq[String], shards: Int): Column =
    pmod(hash(saltSource.map(col): _*), lit(shards))
}
