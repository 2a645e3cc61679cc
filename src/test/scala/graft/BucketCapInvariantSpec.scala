package graft

import org.apache.spark.sql.functions._

/** The correctness contract behind every bucket-CAPPED candidate
  * generator (`Dedup.SimhashBucketCap`): the DuckDB oracles of
  * d02/d05/d07/d17/d18/d20/d21/d22/d23/d24/d25/d42/d44 and the
  * q119/q170 compositions mirror the UNCAPPED self-join, so their
  * hash-match holds only while no SimHash Hamming bucket and no MinHash
  * band bucket at the correctness SFs (sf0.001, sf0.01) reaches the cap
  * — above it the engine sub-splits the bucket and deterministically
  * drops cross-sub pairs the oracle still emits. The measurements the
  * cap was chosen from (max 83 at both SFs) lived only in comments; a
  * regenerated fixture would surface as an opaque multi-query gate
  * failure. This spec turns the invariant into one named assertion per
  * (SF, generator) with the offending bucket size in the message.
  */
class BucketCapInvariantSpec extends SparkSuite {

  private val cap = graft.analytics.Dedup.SimhashBucketCap
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  for (dir <- sfs) {
    test(s"SimHash Hamming buckets stay below SimhashBucketCap=$cap at $dir") {
      val maxBucket = graft.analytics.Dedup.simhashDf(spark, dir)
        .withColumn("bucket", expr("shiftright(simhash, 8)"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("sz"))
        .agg(max(col("sz"))).collect()(0).getLong(0)
      withClue(
        s"max SimHash bucket = $maxBucket at $dir: the capped generator would " +
          "sub-split it while the uncapped oracles would not — regenerate the " +
          "cap (Dedup.SimhashBucketCap) or the fixture expectation:\n") {
        maxBucket should be < cap
      }
    }

    test(s"MinHash band buckets stay below SimhashBucketCap=$cap at $dir") {
      val maxBand = graft.analytics.Dedup.bandKeysOf(spark, dir)
        .groupBy(col("band")).agg(count(lit(1)).as("sz"))
        .agg(max(col("sz"))).collect()(0).getLong(0)
      withClue(
        s"max MinHash band bucket = $maxBand at $dir: d02's capped band join " +
          "would diverge from its uncapped oracle:\n") {
        maxBand should be < cap
      }
    }

    // d57's extra band layouts (ADVICE r20): the 8×1 single-signature
    // bands are the most cap-prone bucket shape in the repo, and the
    // 2×4 bands are its precision twin — both oracles mirror the
    // UNCAPPED self-joins, so the invariant must hold for them too.
    // Band keys come from the same bandExprFor the query joins on.
    for ((rows, tag) <- Seq(1 -> "b8_r1", 4 -> "b2_r4")) {
      test(s"d57 $tag band buckets stay below SimhashBucketCap=$cap at $dir") {
        val maxBand = graft.analytics.Dedup.bandKeysOfLayout(spark, dir, rows)
          .groupBy(col("band")).agg(count(lit(1)).as("sz"))
          .agg(max(col("sz"))).collect()(0).getLong(0)
        withClue(
          s"max $tag band bucket = $maxBand at $dir: d57's capped $tag join " +
            "would diverge from its uncapped oracle:\n") {
          maxBand should be < cap
        }
      }
    }
  }
}
