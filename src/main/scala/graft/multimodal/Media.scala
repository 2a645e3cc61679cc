package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** An opaque multimodal record: media as a `binary` payload plus typed
  * metadata — the at-rest shape a 100 TB training-data lake uses for
  * images/audio/video (content-addressed bytes + columnar metadata). */
final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

/** Typed features produced by the (stubbed) decode step. */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    avg_byte: Double,
    n_frames: Int)

/**
 * Media decode / feature extraction over binary payloads.
 *
 * The Spark-side plumbing is real — typed `Dataset`, `mapPartitions`
 * with explicit batching (the same batch shape a vectorized/Arrow UDF
 * would see), schema, and partition behavior — but the decoder itself is
 * a STUB: this container has no image/audio codecs, so `decodeBatch`
 * computes deterministic fake features from the raw bytes. Swapping in a
 * real codec changes only the body of `decodeBatch`.
 */
object MediaDecode {

  val BatchSize = 64

  /** STUB decoder: deterministic fake features in place of a real codec.
    * "width"/"height" are parsed from the first payload bytes as a fake
    * header; frame sampling is length-derived for `video` payloads. */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val p = r.payload
      val width = 1 + (if (p.nonEmpty) p(0) & 0x7f else 0)
      val height = 1 + (if (p.length > 1) p(1) & 0x7f else 0)
      val avg =
        if (p.isEmpty) 0.0
        else math.floor(p.map(b => (b & 0xff).toLong).sum.toDouble / p.length)
      val frames = if (r.kind == "video") p.length / 100 + 1 else 1
      MediaFeatures(r.media_id, r.kind, p.length.toLong, width, height, avg, frames)
    }

  /** Distributed decode: per-partition batched iteration — no driver
    * collect, no shuffle; scales with input partitioning. */
  def features(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))(
      Encoders.product[MediaFeatures])
}
