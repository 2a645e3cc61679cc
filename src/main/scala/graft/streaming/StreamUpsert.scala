package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming UPSERT-maintained aggregate table — the `foreachBatch` merge
 * pattern every production pipeline uses to keep a queryable result table
 * current while a stream runs: each micro-batch is reduced to per-key
 * PARTIAL measures, and the partials merge additively into the stored
 * table (read → union → re-aggregate → atomic overwrite).
 *
 * Correctness contract: measures must be ADDITIVE (counts, exact DECIMAL
 * sums) so merge order and batch boundaries cannot change the final
 * table — that is what makes the drained result equal the one-shot batch
 * aggregate, which is how the operator is verified.
 *
 * Scale notes (100 TB): the stored table is |keys|-sized (bounded by the
 * key domain, not the stream), so the merge join is table-vs-partials
 * small; in production the overwrite would be a dynamic-partition
 * overwrite touching only the key partitions present in the batch, and a
 * batch-id ledger would guard replayed batches (micro-batch retries) —
 * with `Trigger.AvailableNow` on a file source each batch is delivered
 * once, so the ledger is elided here. `localCheckpoint` materializes the
 * merge before the overwrite — Spark refuses to overwrite a path that is
 * also being read in the same plan.
 */
object StreamUpsert {

  /** @param stream      streaming DataFrame (micro-batched by the source)
    * @param partials    reduces one batch to per-key partial measures
    * @param keyCols     grouping key columns of the partials
    * @param measureCols additive measure columns of the partials
    * @param tablePath   parquet path of the maintained result table
    * @param onBatch     test hook, called with each batch id
    * @return the started query (AvailableNow trigger — drains and stops) */
  def run(
      stream: DataFrame,
      partials: DataFrame => DataFrame,
      keyCols: Seq[String],
      measureCols: Seq[String],
      tablePath: String,
      onBatch: Long => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onBatch(batchId)
        val ss = batch.sparkSession
        val part = partials(batch)
        val fsPath = new org.apache.hadoop.fs.Path(tablePath)
        val fs = fsPath.getFileSystem(ss.sparkContext.hadoopConfiguration)
        val cur = if (fs.exists(fsPath)) Some(ss.read.parquet(tablePath)) else None
        val merged = cur.fold(part)(_.unionByName(part))
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col(measureCols.head)).as(measureCols.head),
            measureCols.tail.map(m => sum(col(m)).as(m)): _*)
          .localCheckpoint()
        merged.write.mode("overwrite").parquet(tablePath)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
