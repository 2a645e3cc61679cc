package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Streaming UPSERT-maintained aggregate table — the `foreachBatch` merge
 * pattern every production pipeline uses to keep a queryable result table
 * current while a stream runs: each micro-batch is reduced to per-key
 * PARTIAL measures, and the partials merge additively into the stored
 * table (read current version → union → re-aggregate → commit).
 *
 * Correctness contract: measures must be ADDITIVE (counts, exact DECIMAL
 * sums) so merge order and batch boundaries cannot change the final
 * table — that is what makes the drained result equal the one-shot batch
 * aggregate, which is how the operator is verified.
 *
 * Exactly-once under retries: `foreachBatch` is at-least-once — a batch
 * can be re-delivered after a crash. The table is therefore maintained as
 * versioned snapshot dirs (`v<batchId>/`) with a `_latest` pointer file
 * committed by ATOMIC RENAME after the snapshot write. Batch ids are
 * monotonic, so the pointer doubles as the replay ledger: a re-delivered
 * batch id ≤ the committed id is skipped; a crash between snapshot write
 * and pointer rename simply rewrites the (uncommitted, invisible)
 * snapshot on retry. This is the two-phase commit at the heart of every
 * table format's exactly-once sink, in ~20 lines.
 *
 * Scale notes (100 TB): the stored table is |keys|-sized (bounded by the
 * key domain, not the stream), so the merge join is table-vs-partials
 * small; in production the snapshot write would be a dynamic-partition
 * overwrite touching only the key partitions present in the batch, and
 * old versions would be vacuumed asynchronously. `localCheckpoint`
 * materializes the merge before writing — the merge plan reads the
 * previous snapshot and Spark refuses self-overwriting plans.
 */
object StreamUpsert {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed batch id, or -1 before the first commit. */
  def committedBatch(spark: SparkSession, tablePath: String): Long = {
    val ptr = new Path(tablePath, "_latest")
    val fs = fsOf(spark, ptr)
    if (!fs.exists(ptr)) -1L
    else {
      val in = fs.open(ptr)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** Read the current committed snapshot of the maintained table. */
  def readTable(spark: SparkSession, tablePath: String): DataFrame = {
    val v = committedBatch(spark, tablePath)
    require(v >= 0, s"no committed version at $tablePath")
    spark.read.parquet(s"$tablePath/v$v")
  }

  /** @param stream      streaming DataFrame (micro-batched by the source)
    * @param partials    reduces one batch to per-key partial measures
    * @param keyCols     grouping key columns of the partials
    * @param measureCols additive measure columns of the partials
    * @param tablePath   root dir of the versioned result table
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
        applyBatch(batch, batchId, partials, keyCols, measureCols, tablePath,
          onBatch)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** One merge-and-commit step; public so the retry contract is directly
    * testable (calling it twice with the same batchId must be a no-op the
    * second time). */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      partials: DataFrame => DataFrame,
      keyCols: Seq[String],
      measureCols: Seq[String],
      tablePath: String,
      onBatch: Long => Unit = _ => ()): Unit = {
    val ss = batch.sparkSession
    val committed = committedBatch(ss, tablePath)
    if (batchId <= committed) return // replayed batch — already applied
    onBatch(batchId)
    val part = partials(batch)
    val cur = if (committed >= 0) Some(readTable(ss, tablePath)) else None
    val merged = cur.fold(part)(_.unionByName(part))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(measureCols.head)).as(measureCols.head),
        measureCols.tail.map(m => sum(col(m)).as(m)): _*)
      .localCheckpoint()
    merged.write.mode("overwrite").parquet(s"$tablePath/v$batchId")
    // two-phase commit: snapshot first, then the pointer via atomic rename
    val fs = fsOf(ss, new Path(tablePath))
    val tmp = new Path(tablePath, s"_latest.tmp$batchId")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(tablePath, "_latest")
    if (!fs.rename(tmp, ptr)) {
      // local/HDFS rename won't replace an existing file — delete + rename
      // is fine: concurrent committers don't exist (one query per table)
      fs.delete(ptr, false)
      if (!fs.rename(tmp, ptr))
        sys.error(s"could not commit pointer for batch $batchId")
    }
    ()
  }
}
